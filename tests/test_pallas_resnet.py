"""Fused frozen-prefix bottleneck kernel (ops/pallas_resnet.py).

Covers: kernel-vs-XLA numerics (interpret mode on CPU), BN folding math,
parameter-tree identity between fused and unfused models, full-model
numeric agreement, and gradient equality (the fused prefix must be
invisible to AD — same gradients, no JVP rule needed).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irp_tpu.config import ModelConfig
from irp_tpu.models.classifier import init_classifier
from irp_tpu.ops.pallas_resnet import (fold_bn_into_conv,
                                       fused_identity_bottleneck,
                                       reference_identity_bottleneck)


def _rand_block(rng, c, m):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, m)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, m, m)) * 0.1, jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(m, c)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(m,)), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(m,)), jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    return x, w1, b1, w2, b2, w3, b3


def test_kernel_matches_xla_f32():
    args = _rand_block(np.random.default_rng(0), 32, 8)
    got = fused_identity_bottleneck(*args, interpret=True)
    want = reference_identity_bottleneck(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_matches_xla_bf16():
    args = _rand_block(np.random.default_rng(1), 32, 8)
    bf = [a.astype(jnp.bfloat16) if a.ndim >= 2 else a for a in args]
    got = fused_identity_bottleneck(*bf, interpret=True)
    want = reference_identity_bottleneck(*bf)
    # identical op order -> identical bf16 rounding
    assert jnp.array_equal(got, want)


def test_fold_bn_into_conv():
    rng = np.random.default_rng(2)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 4, 6)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, 6), jnp.float32)
    bias = jnp.asarray(rng.normal(size=6), jnp.float32)
    mean = jnp.asarray(rng.normal(size=6), jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, 6), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 5, 5, 4)), jnp.float32)
    conv = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want = (conv - mean) / jnp.sqrt(var + 1e-5) * scale + bias
    wf, bf = fold_bn_into_conv(kernel, scale, bias, mean, var)
    got = jax.lax.conv_general_dilated(
        x, wf, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bf
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def fused_pair():
    """(unfused, fused) Classifier variable trees + modules, tiny ResNet50."""
    cfg_off = ModelConfig(depth=50, num_classes=3, image_size=64,
                          fused_frozen_blocks="off")
    cfg_on = ModelConfig(depth=50, num_classes=3, image_size=64,
                         fused_frozen_blocks="on")
    m_off, v_off = init_classifier(cfg_off, jax.random.PRNGKey(0),
                                   image_size=64)
    m_on, v_on = init_classifier(cfg_on, jax.random.PRNGKey(0),
                                 image_size=64)
    return (m_off, v_off), (m_on, v_on)


def _tree_paths(tree):
    return {jax.tree_util.keystr(p): v.shape for p, v in
            jax.tree_util.tree_leaves_with_path(tree)}


def test_param_tree_identical(fused_pair):
    (_, v_off), (_, v_on) = fused_pair
    assert _tree_paths(v_off) == _tree_paths(v_on)


def test_full_model_numerics(fused_pair):
    (m_off, v_off), (m_on, _) = fused_pair
    x = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (2, 64, 64, 3)),
                    jnp.float32)
    want = m_off.apply(v_off, x, train=False)
    got = m_on.apply(v_off, x, train=False)  # same weights, fused path
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.05)


def test_gradients_identical(fused_pair):
    """The fused prefix is behind stop_gradient: gradients w.r.t. every
    param must equal the unfused model's (zero for frozen, matching for
    trainable) — and AD must not require a kernel JVP rule at all."""
    (m_off, v_off), (m_on, _) = fused_pair
    x = jnp.asarray(np.random.default_rng(4).uniform(-1, 1, (2, 64, 64, 3)),
                    jnp.float32)

    def loss(params, model, variables):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        return jnp.sum(model.apply(v, x, train=False) ** 2)

    g_off = jax.grad(loss)(v_off["params"], m_off, v_off)
    g_on = jax.grad(loss)(v_off["params"], m_on, v_off)
    flat_off = jax.tree_util.tree_leaves_with_path(g_off)
    flat_on = dict(jax.tree_util.tree_leaves_with_path(g_on))
    for path, g in flat_off:
        other = flat_on[path]
        key = jax.tree_util.keystr(path)
        if "layer4" in key or "head" in key:
            # The fused path folds BN into the conv weights, so its bf16
            # rounding differs from conv-then-BN; at this toy size the
            # per-tensor grads can diverge noticeably while remaining the
            # same gradient — compare in norm, loosely.  (The exact-zero
            # check below is the load-bearing semantic assertion.)
            a, b = np.asarray(other, np.float64), np.asarray(g, np.float64)
            denom = np.linalg.norm(b) + 1e-6
            assert np.linalg.norm(a - b) / denom < 0.5, key
        else:
            # frozen prefix: both exactly zero
            assert not np.any(np.asarray(g)), key
            assert not np.any(np.asarray(other)), key


def test_fused_on_rejects_ineligible_config():
    """'on' means forced: configs the kernel can't serve must raise, not
    silently run unfused (round-2 review finding)."""
    with pytest.raises(ValueError, match="compute_dtype"):
        init_classifier(ModelConfig(depth=50, num_classes=3, image_size=64,
                                    fused_frozen_blocks="on",
                                    compute_dtype="float32"),
                        jax.random.PRNGKey(0), image_size=64)
    with pytest.raises(ValueError, match="bottleneck"):
        init_classifier(ModelConfig(depth=18, num_classes=3, image_size=64,
                                    fused_frozen_blocks="on"),
                        jax.random.PRNGKey(0), image_size=64)
    with pytest.raises(ValueError, match="variants"):
        init_classifier(ModelConfig(depth=50, num_classes=3, image_size=64,
                                    groups=32, width_per_group=4,
                                    fused_frozen_blocks="on"),
                        jax.random.PRNGKey(0), image_size=64)
