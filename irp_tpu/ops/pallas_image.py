"""Pallas TPU kernels for the image paths — VALIDATED EXPERIMENTS.

Neither kernel is on a default path: both are correct on hardware but
measured 1.3-1.8x slower than XLA's own fusion of the same computation
(BENCH.md), so the shipping code uses the XLA implementations
(ops.preprocess.eval_preprocess_batch; data.outliers.knn) and these stay
available behind explicit opt-in.  Known scale limit: pallas_pairwise_dist
blocks only the M axis — the full (d, n) rhs block must fit in VMEM, so
it serves blocked/tiled sub-problems (as outliers.knn's chunking would
present), not a monolithic 20k x 2048 feature matrix.

- ``pallas_eval_preprocess``: fused uint8 -> center-crop(224) -> /255 ->
  ImageNet-normalize -> bf16, one VMEM pass per image.  The channel-last
  (C=3) layout is hostile to the (8,128) VPU tile, so images are viewed as
  (H, W*C) rows with per-lane scale/bias vectors that encode the per-channel
  normalization — every lane does one multiply-add.
- ``pallas_pairwise_dist``: blocked ||a-b||^2 distance matrix on the MXU
  (d = |a|^2 + |b|^2 - 2ab) for the kNN used by UMAP/LOF (BASELINE.json:
  "kNN-distance matmuls on TPU").
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from irp_tpu.config import IMAGENET_MEAN, IMAGENET_STD


def _norm_rows(width: int, mean, std):
    """Per-lane scale/bias rows for the (H, W*C) view: out = x*scale+bias
    == (x/255 - mean_c) / std_c for lane l with c = l % 3."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    scale_c = 1.0 / (255.0 * std)
    bias_c = -mean / std
    scale = np.tile(scale_c, width)[None, :]
    bias = np.tile(bias_c, width)[None, :]
    return jnp.asarray(scale), jnp.asarray(bias)


def pallas_eval_preprocess(images_u8, out_size: int = 224,
                           mean: Sequence[float] = IMAGENET_MEAN,
                           std: Sequence[float] = IMAGENET_STD,
                           dtype=jnp.bfloat16, interpret: bool = False):
    """Fused center-crop + normalize kernel.

    images_u8: (B, S, S, 3) uint8 -> (B, out, out, 3) ``dtype``.
    """
    from jax.experimental import pallas as pl

    b, s, _, c = images_u8.shape
    assert c == 3, "RGB expected"
    top = (s - out_size) // 2
    lanes_in = s * c
    lanes_out = out_size * c
    col0 = top * c

    scale, bias = _norm_rows(out_size, mean, std)
    x2d = images_u8.reshape(b, s, lanes_in)

    def kernel(in_ref, scale_ref, bias_ref, out_ref):
        blk = in_ref[...]
        if blk.ndim == 3:  # interpret mode keeps the singleton batch dim
            blk = blk[0]
        crop = blk[top:top + out_size, col0:col0 + lanes_out]
        # Mosaic has no direct u8->f32 cast; hop through int32.
        x = crop.astype(jnp.int32).astype(jnp.float32)
        res = (x * scale_ref[...].reshape(1, lanes_out)
               + bias_ref[...].reshape(1, lanes_out)).astype(dtype)
        if out_ref.ndim == 3:
            out_ref[0] = res
        else:
            out_ref[...] = res

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, lanes_in), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, lanes_out), lambda i: (0, 0)),
            pl.BlockSpec((1, lanes_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, out_size, lanes_out),
                               lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, out_size, lanes_out), dtype),
        interpret=interpret,
    )(x2d, scale, bias)
    return out.reshape(b, out_size, out_size, c)


def pallas_pairwise_dist(a, b=None, block_m: int = 256,
                         interpret: bool = False):
    """Squared Euclidean distance matrix (M,N) via MXU matmuls.

    a: (M,D) f32; b: (N,D) f32 (defaults to a).  Row blocks stream through
    VMEM; each block computes |a|^2 + |b|^2 - 2 a b^T with a single MXU
    contraction.
    """
    from jax.experimental import pallas as pl

    if b is None:
        b = a
    m, d = a.shape
    n = b.shape[0]
    # pad M to a block multiple (static shapes)
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        a = jnp.pad(a, ((0, m_pad - m), (0, 0)))

    a_sq = jnp.sum(a * a, axis=1, keepdims=True)  # (Mp,1)
    b_sq = jnp.sum(b * b, axis=1, keepdims=True).T  # (1,N)

    def kernel(a_ref, bt_ref, asq_ref, bsq_ref, out_ref):
        prod = jnp.dot(a_ref[:], bt_ref[:],
                       preferred_element_type=jnp.float32)
        out_ref[:] = jnp.maximum(
            asq_ref[:] + bsq_ref[:] - 2.0 * prod, 0.0)

    out = pl.pallas_call(
        kernel,
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0)),
            pl.BlockSpec((d, n), lambda i: (0, 0)),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=interpret,
    )(a, b.T, a_sq, b_sq)
    return out[:m]
