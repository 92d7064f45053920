#!/usr/bin/env python
"""Benchmark the fused identity-bottleneck Pallas kernel vs XLA.

Reproduces the measurements recorded in ops/pallas_resnet.py's docstring
and BENCH.md: per-block wall time for the fused kernel vs XLA's unfused
op sequence at ResNet50 layer1/2/3 shapes, plus a pure-copy kernel that
establishes the Pallas block-pipeline bandwidth floor.

Run on TPU:  python tools/bench_fused_block.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from irp_tpu.ops.pallas_resnet import (fused_identity_bottleneck,
                                       reference_identity_bottleneck)

SHAPES = [  # (B, H, W, C, M, label)
    (256, 56, 56, 256, 64, "layer1"),
    (256, 28, 28, 512, 128, "layer2"),
    (256, 14, 14, 1024, 256, "layer3"),
]


def bench(fn, args, iters=20, reps=4):
    """Scan-based timing with a forced data dependence (BENCH.md
    methodology: block_until_ready is unreliable through the tunnel)."""

    def step(x, _):
        return fn(x, *args[1:]), ()

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(step, x, None, length=iters)
        return jnp.float32(y[(0,) * y.ndim])

    run(args[0]).block_until_ready()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(args[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def copy_floor(x):
    """Pure relu-copy Pallas kernel over the same blocks: the pipeline's
    bandwidth floor — no fused kernel can beat this."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(x_ref, o_ref):
        o_ref[...] = jnp.maximum(x_ref[...], 0)

    b, h, w, c = x.shape
    return pl.pallas_call(
        k, grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)


def main():
    rng = np.random.default_rng(0)
    for b, h, w, c, m, label in SHAPES:
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(c, m)) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(size=(3, 3, m, m)) * 0.05, jnp.bfloat16)
        w3 = jnp.asarray(rng.normal(size=(m, c)) * 0.05, jnp.bfloat16)
        b1 = jnp.asarray(rng.normal(size=(m,)), jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(m,)), jnp.float32)
        b3 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        args = (x, w1, b1, w2, b2, w3, b3)
        diff = float(jnp.max(jnp.abs(
            fused_identity_bottleneck(*args).astype(jnp.float32)
            - reference_identity_bottleneck(*args).astype(jnp.float32))))
        t_fused = bench(fused_identity_bottleneck, args)
        t_xla = bench(reference_identity_bottleneck, args)
        t_copy = bench(copy_floor, (x,))
        traffic_gb = 2 * b * h * w * c * 2 / 1e9
        print(f"{label}: fused {t_fused:.2f} ms  xla {t_xla:.2f} ms  "
              f"copy-floor {t_copy:.2f} ms "
              f"({traffic_gb / (t_copy / 1e3):.0f} GB/s)  "
              f"maxdiff {diff:.4f}")


if __name__ == "__main__":
    main()
