"""Pallas kernel tests (interpreter mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irp_tpu.ops.pallas_image import (pallas_eval_preprocess,
                                      pallas_pairwise_dist)
from irp_tpu.ops.preprocess import eval_preprocess_batch


def test_pallas_eval_preprocess_matches_xla():
    rng = np.random.default_rng(0)
    imgs = jnp.array(rng.integers(0, 255, (3, 256, 256, 3), dtype=np.uint8))
    ours = np.asarray(pallas_eval_preprocess(imgs, interpret=True,
                                             dtype=jnp.float32))
    ref = np.asarray(eval_preprocess_batch(imgs, dtype=jnp.float32))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pallas_pairwise_dist_matches_numpy():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(200, 32)).astype(np.float32)
    d = np.asarray(pallas_pairwise_dist(jnp.array(a), block_m=64,
                                        interpret=True))
    ref = ((a[:, None, :] - a[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=1e-3)
    assert d.shape == (200, 200)


def test_pallas_pairwise_dist_rectangular():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(100, 16)).astype(np.float32)
    b = rng.normal(size=(50, 16)).astype(np.float32)
    d = np.asarray(pallas_pairwise_dist(jnp.array(a), jnp.array(b),
                                        block_m=64, interpret=True))
    ref = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, ref, atol=1e-3)
    assert d.shape == (100, 50)
