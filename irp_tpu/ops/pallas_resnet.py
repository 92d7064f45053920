"""Pallas TPU kernel: fused frozen-prefix ResNet bottleneck blocks.

The trace-derived step breakdown (BENCH.md) shows the fine-tune hot path is
HBM-bandwidth-bound on the FROZEN prefix's activation traffic: XLA cannot
fuse across convolutions, so every conv in a bottleneck block reads and
writes the full (B, H, W, C) activation map to HBM.  An identity bottleneck
(1x1 -> 3x3 -> 1x1 + residual, stride 1 — the majority of blocks in
layers 1-3, reference functions/model.py:17-23 freezes exactly those) costs
XLA ~5 full-map HBM round trips; this kernel does the whole block in ONE
read + ONE write by keeping the entire per-image spatial map resident in
VMEM (layer1: 56*56*256*bf16 = 1.5 MiB/image — comfortably under the
~16 MiB VMEM budget; later stages are smaller still).

Why this is possible only for the frozen prefix in its default
inference-BN form (`bn_stats_mode='trainable_only'`, config.py):
- inference BatchNorm is a per-channel affine, folded here into the conv
  weights/bias ahead of the kernel (no batch statistics to reduce);
- the prefix is behind `stop_gradient` (resnet.py), so the kernel needs no
  VJP — forward-only, zero rematerialization concerns.

Kernel shape strategy (see /opt/skills/guides/pallas_guide.md):
- grid over the batch; each grid step owns one image's full feature map.
  Pallas double-buffers the HBM<->VMEM block transfers across grid steps.
- the 1x1 convs are channel-contraction `dot_general`s on the MXU over the
  (H, W, C) map (leading dims are rows).
- the 3x3 stride-1 conv is 9 shifted MXU matmuls over a zero-padded copy
  of the mid map, accumulated in f32.

MEASURED OUTCOME (TPU v5e, batch 256, ResNet50 shapes — kept as a
flag-gated validated experiment, `ModelConfig.fused_frozen_blocks`,
default 'off'): the kernel is correct (bit-identical to the XLA op order
in bf16) but 1.3-1.7x SLOWER than XLA's unfused block (layer1
4.55 ms vs 3.16 ms; layer2 3.87 vs 2.30; layer3 2.64 vs 1.94).  The
limiting factor is not the kernel body: a pure copy kernel over the same
blocks takes 3.89 ms regardless of block granularity (1, 2, or 1/2 image
per step, or flat row tiles), i.e. the Pallas automatic block pipeline
sustains ~420 GB/s on this part while a plain XLA elementwise pass
sustains ~616 GB/s.  With the one-read-one-write floor at 3.89 ms >
XLA's whole multi-pass block at 3.16 ms, single-pass fusion cannot win
here no matter how good the compute schedule is.  Numbers reproduced by
tools/bench_fused_block.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# contract the channel (last) dim of the activation map with dim 0 of the
# (C_in, C_out) weight: (H, W, C) @ (C, M) -> (H, W, M)
_CHAN_DOT = (((2,), (0,)), ((), ()))


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Inference-form BatchNorm as a per-channel (scale, bias) affine."""
    s = scale / jnp.sqrt(var + eps)
    return s, bias - mean * s


def fold_bn_into_conv(kernel, scale, bias, mean, var, eps: float = 1e-5):
    """Fold an inference-form BN into the preceding conv (no-bias conv).

    kernel: (kh, kw, C_in, C_out) HWIO.  Returns (folded_kernel, bias_out)
    with bias shaped (C_out,); all math in the kernel's dtype (call with
    f32 params, cast after).
    """
    s, b = fold_bn(scale, bias, mean, var, eps)
    return kernel * s, b


def _bottleneck_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                       b3_ref, out_ref):
    # VMEM discipline (the 16 MiB budget is tight at layer1 shapes): the
    # expanding 1x1 conv back to C channels would materialize an
    # (H, W, C) f32 map (3.2 MiB at layer1) — Mosaic requires 32-bit
    # matmul accumulators, so instead the final dot + bias + residual +
    # relu run over row chunks, keeping the live f32 temp to one chunk.
    x = x_ref[0]                                   # (H, W, C) bf16
    h, w, _ = x.shape
    dt = x.dtype
    f32 = jnp.float32
    a = jax.lax.dot_general(x, w1_ref[...], _CHAN_DOT,
                            preferred_element_type=f32)
    a = jnp.maximum(a + b1_ref[...], 0.0).astype(dt)        # (H, W, M)
    ap = jnp.pad(a, ((1, 1), (1, 1), (0, 0)))
    acc = jax.lax.dot_general(ap[0:h, 0:w], w2_ref[0, 0], _CHAN_DOT,
                              preferred_element_type=f32)
    for dy in range(3):
        for dx in range(3):
            if dy == 0 and dx == 0:
                continue
            acc = acc + jax.lax.dot_general(
                ap[dy:dy + h, dx:dx + w], w2_ref[dy, dx], _CHAN_DOT,
                preferred_element_type=f32)
    bmap = jnp.maximum(acc + b2_ref[...], 0.0).astype(dt)
    rows = h
    while rows * w * x.shape[2] * 4 > 2 ** 21 and rows % 2 == 0:
        rows //= 2                                 # f32 chunk <= 2 MiB
    for r in range(0, h, rows):
        y = jax.lax.dot_general(bmap[r:r + rows], w3_ref[...], _CHAN_DOT,
                                preferred_element_type=f32)
        y = (y + b3_ref[...]).astype(dt)
        out_ref[0, r:r + rows] = jnp.maximum(x[r:r + rows] + y, 0)


def fused_identity_bottleneck(x, w1, b1, w2, b2, w3, b3, *,
                              interpret: bool = False):
    """One fused identity bottleneck block: relu(x + f(x)).

    f = 1x1 conv (w1,b1) -> relu -> 3x3 same-pad conv (w2,b2) -> relu ->
    1x1 conv (w3,b3), all BN pre-folded into the weights (fold_bn_into_conv).

    x: (B, H, W, C) activation map (bf16 on the hot path).
    w1: (C, M), w2: (3, 3, M, M), w3: (M, C) in x.dtype;
    b1/b2: (M,), b3: (C,) float32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, h, w, c = x.shape
    m = w1.shape[1]
    assert w1.shape == (c, m) and w2.shape == (3, 3, m, m) \
        and w3.shape == (m, c), (x.shape, w1.shape, w2.shape, w3.shape)

    b1 = b1.reshape(1, 1, m).astype(jnp.float32)
    b2 = b2.reshape(1, 1, m).astype(jnp.float32)
    b3 = b3.reshape(1, 1, c).astype(jnp.float32)

    def _full(shape):
        ndim = len(shape)
        return pl.BlockSpec(shape, lambda b, _n=ndim: (0,) * _n,
                            memory_space=pltpu.VMEM)

    flops = 2 * batch * h * w * (c * m + 9 * m * m + m * c)
    bytesize = jnp.dtype(x.dtype).itemsize
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=2 * batch * h * w * c * bytesize,
        transcendentals=0)
    return pl.pallas_call(
        _bottleneck_kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _full((c, m)), _full((1, 1, m)),
            _full((3, 3, m, m)), _full((1, 1, m)),
            _full((m, c)), _full((1, 1, c)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3)


def reference_identity_bottleneck(x, w1, b1, w2, b2, w3, b3):
    """XLA reference of the same math (for tests / non-TPU fallback)."""
    f32 = jnp.float32
    dn4 = (((3,), (0,)), ((), ()))  # (B, H, W, C) @ (C, M)
    a = jax.lax.dot_general(x, w1, dn4, preferred_element_type=f32)
    a = jnp.maximum(a + b1.reshape(1, 1, 1, -1), 0.0).astype(x.dtype)
    acc = jax.lax.conv_general_dilated(
        a.astype(f32), w2.astype(f32), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bmap = jnp.maximum(acc + b2.reshape(1, 1, 1, -1), 0.0).astype(x.dtype)
    y = jax.lax.dot_general(bmap, w3, dn4, preferred_element_type=f32)
    y = (y + b3.reshape(1, 1, 1, -1)).astype(x.dtype)
    return jnp.maximum(x + y, 0)
