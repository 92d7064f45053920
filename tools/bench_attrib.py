"""Step-cost attribution on the real TPU: which part of the fused train
step costs what.

Measures scanned variants of the hot path with bench.py's methodology
(single-dispatch lax.scan, hard scalar sync, best-of-reps on the
time-shared chip).  Variants:

  full          slice + augment(medium) + fwd/bwd + adam   (== bench.py)
  noaug         slice + eval normalize + fwd/bwd + adam
  model         fwd/bwd + adam on a loop-invariant bf16 batch
  model_sliced  per-step slice of a pre-augmented bf16 HBM set + fwd/bwd + adam
  aug_only      slice + augment(medium), no model
  aug_low       slice + augment(low), no model
  slice_only    slice + bf16 convert only

All variants take the dataset as a jit ARGUMENT (closure-captured device
arrays become jit constants and stall compilation — BENCH.md).

Usage: python tools/bench_attrib.py [variant ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(variants):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    jax.config.update("jax_compilation_cache_dir", "/tmp/irp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from irp_tpu.config import (IMAGENET_MEAN, IMAGENET_STD, MeshConfig,
                                ModelConfig, TrainConfig)
    from irp_tpu.data.pipeline import CachedDataset, EpochSampler, HBMDataset
    from irp_tpu.models import init_classifier
    from irp_tpu.ops.preprocess import augment_batch_fused, center_crop
    from irp_tpu.parallel.mesh import DATA_AXIS, make_mesh, shard_variables
    from irp_tpu.train.state import create_train_state
    from irp_tpu.train.step import _loss_and_updates, _slice_batch

    batch, steps, reps = 256, 20, 4
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    model_cfg = ModelConfig(depth=50, num_classes=10, image_size=224,
                            compute_dtype="bfloat16")
    train_cfg = TrainConfig(learning_rate=1e-3, weight_decay=1e-4,
                            batch_size=batch)
    rng = np.random.default_rng(0)
    n = 4096
    cached = CachedDataset(
        images=rng.integers(0, 255, (n, 256, 256, 3), dtype=np.uint8),
        labels=rng.integers(0, 10, n).astype(np.int32),
        keys=[str(i) for i in range(n)],
        class_names=tuple(str(i) for i in range(10)))
    model, variables = init_classifier(model_cfg, jax.random.PRNGKey(0), 224)
    variables = shard_variables(mesh, variables)
    hbm = HBMDataset(cached, mesh)
    sampler = EpochSampler(hbm, batch, seed=0)
    bl = sampler.per_device

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)

    def aug(images_u8, key, intensity="medium"):
        return augment_batch_fused(images_u8, key, intensity, 224,
                                   IMAGENET_MEAN, IMAGENET_STD,
                                   jnp.bfloat16, work_dtype=jnp.bfloat16)

    def evalprep(images_u8):
        x = center_crop(images_u8, 224).astype(jnp.float32) / 255.0
        return ((x - mean) / std).astype(jnp.bfloat16)

    def fresh_state():
        # copy: each variant's jit donates its state, whose leaves would
        # otherwise alias the shared `variables` buffers
        v = jax.tree_util.tree_map(jnp.copy, variables)
        return create_train_state(model, v, train_cfg, model_cfg,
                                  steps_per_epoch=steps)

    def timed(name, fn, init_carry, args):
        """Warm up (compile + first exec), then best-of-reps wall time."""
        key = jax.random.PRNGKey(1)
        offs = jnp.asarray(sampler.epoch_offsets(steps))
        carry, out = fn(init_carry, *args, offs, key)
        float(np.asarray(out).reshape(-1)[-1])  # hard sync (D2H)
        best = float("inf")
        all_ms = []
        for r in range(reps):
            offs = jnp.asarray(sampler.epoch_offsets(steps))
            t0 = time.perf_counter()
            carry, out = fn(carry, *args, offs, jax.random.fold_in(key, r))
            float(np.asarray(out).reshape(-1)[-1])
            dt = time.perf_counter() - t0
            all_ms.append(round(1000 * dt / steps, 2))
            best = min(best, dt)
        ms = 1000 * best / steps
        print(f"{name:12s} {ms:7.2f} ms/step  "
              f"{steps * batch / best:8.0f} imgs/s  reps={all_ms}",
              flush=True)
        return ms

    def train_scan(prep):
        """Scanned train epoch; ``prep(images, i, key) -> model input``."""

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fn(state, data, labels, offsets, key):
            def body(state, step_in):
                i, off = step_in
                im, lb = _slice_batch(data, labels, off, bl)
                k = jax.random.fold_in(key, i)
                ka, kd = jax.random.split(k)
                x = prep(im, ka)
                s, m = _loss_and_updates(state, x, lb, kd, None)
                return s, m["loss"]
            return jax.lax.scan(
                body, state, (jnp.arange(offsets.shape[0]), offsets))
        return fn

    def preaug_hbm():
        """Pre-augmented bf16 dataset resident in HBM, sharded on data."""
        d_ax = mesh.shape[DATA_AXIS]
        n_loc = hbm.local_count
        pre = jnp.asarray(
            rng.standard_normal((d_ax, n_loc, 224, 224, 3)), jnp.bfloat16)
        pre = jax.device_put(pre, NamedSharding(
            mesh, P(DATA_AXIS, None, None, None, None)))
        labs = jax.device_put(
            jnp.asarray(rng.integers(0, 10, (d_ax, n_loc)), jnp.int32),
            NamedSharding(mesh, P(DATA_AXIS, None)))
        return pre, labs

    results = {}
    for v in variants:
        if v == "full":
            fn = train_scan(lambda im, k: aug(im, k))
            results[v] = timed(v, fn, fresh_state(),
                               (hbm.images, hbm.labels))
        elif v == "noaug":
            fn = train_scan(lambda im, k: evalprep(im))
            results[v] = timed(v, fn, fresh_state(),
                               (hbm.images, hbm.labels))
        elif v == "aug_low":
            fn = train_scan(lambda im, k: aug(im, k, intensity="low"))
            results[v] = timed(v, fn, fresh_state(),
                               (hbm.images, hbm.labels))
        elif v == "model_sliced":
            pre, labs = preaug_hbm()

            @functools.partial(jax.jit, donate_argnums=(0,))
            def fn(state, data, labels, offsets, key):
                def body(state, step_in):
                    i, off = step_in
                    x, lb = _slice_batch(data, labels, off, bl)
                    kd = jax.random.fold_in(key, i)
                    s, m = _loss_and_updates(state, x, lb, kd, None)
                    return s, m["loss"]
                return jax.lax.scan(
                    body, state, (jnp.arange(offsets.shape[0]), offsets))
            results[v] = timed(v, fn, fresh_state(), (pre, labs))
        elif v == "model":
            pre = jnp.asarray(
                rng.standard_normal((batch, 224, 224, 3)), jnp.bfloat16)
            labs = jnp.asarray(rng.integers(0, 10, batch), jnp.int32)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def fn(state, x, lb, offsets, key):
                def body(state, i):
                    kd = jax.random.fold_in(key, i)
                    s, m = _loss_and_updates(state, x, lb, kd, None)
                    return s, m["loss"]
                return jax.lax.scan(body, state,
                                    jnp.arange(offsets.shape[0]))
            results[v] = timed(v, fn, fresh_state(), (pre, labs))
        elif v in ("aug_only", "slice_only"):
            if v == "aug_only":
                prep = lambda im, k: aug(im, k)  # noqa: E731
            else:
                prep = lambda im, k: im.astype(jnp.bfloat16)  # noqa: E731

            @jax.jit
            def fn(carry, data, labels, offsets, key, prep=prep):
                def body(carry, step_in):
                    i, off = step_in
                    im, _ = _slice_batch(data, labels, off, bl)
                    x = prep(im, jax.random.fold_in(key, i))
                    return carry + jnp.mean(x, dtype=jnp.float32), carry
                return jax.lax.scan(
                    body, carry, (jnp.arange(offsets.shape[0]), offsets))
            results[v] = timed(v, fn, jnp.float32(0),
                               (hbm.images, hbm.labels))
        else:
            print(f"unknown variant: {v}", file=sys.stderr)
    print({k: round(val, 2) for k, val in results.items()})


if __name__ == "__main__":
    vs = sys.argv[1:] or ["full", "noaug", "model", "model_sliced",
                          "aug_only", "slice_only"]
    main(vs)
