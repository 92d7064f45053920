"""Model tests: shapes, param counts, freeze semantics, torch parity.

Semantics tests use ResNet-18 at 32x32 (compile time on the 1-core CPU host);
ResNet-50 structure is validated shape-only via jax.eval_shape, and its full
numerics via the e2e slice + bench on real hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irp_tpu.config import ModelConfig
from irp_tpu.models import (
    Classifier,
    init_classifier,
    weighted_cross_entropy,
    torch_state_dict_to_variables,
    flax_variables_to_torch_state_dict,
)
from irp_tpu.models.convert import torch_key_to_flax
from irp_tpu.models.resnet import STAGE_NAMES

# bn_stats_mode='all' pinned: these fixtures exercise the torch-parity
# semantics (PyTorch .train() updates BN stats on frozen layers too).
CFG18 = ModelConfig(depth=18, num_classes=10, dropout_rate=0.2,
                    compute_dtype="float32", bn_stats_mode="all")
CFG50 = ModelConfig(depth=50, num_classes=10, dropout_rate=0.2,
                    compute_dtype="float32", bn_stats_mode="all")


@pytest.fixture(scope="module")
def model18():
    return init_classifier(CFG18, jax.random.PRNGKey(0), image_size=32)


@pytest.fixture(scope="module")
def vars50_shapes():
    model = Classifier(config=CFG50)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    return model, jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, dummy,
                           train=False))


def n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_output_shapes(model18):
    model, variables = model18
    x = jnp.zeros((2, 32, 32, 3))
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 10)
    assert logits.dtype == jnp.float32


def test_r50_param_count_matches_torchvision(vars50_shapes):
    """torchvision resnet50 has 25,557,032 params incl. fc(2048->1000).

    Our backbone (fc removed, reference model.py:27) must have
    25,557,032 - (2048*1000 + 1000) = 23,508,032; the MLP head
    (2048->512->10, reference model.py:30-36) adds 1,054,218.
    """
    _, variables = vars50_shapes
    backbone = n_params(variables["params"]["backbone"])
    head = n_params(variables["params"]) - backbone
    assert backbone == 23_508_032
    assert head == (2048 * 512 + 512) + (512 * 10 + 10)


@pytest.mark.parametrize("depth,tv_total,fc_in", [
    (34, 21_797_672, 512),
    (101, 44_549_160, 2048),
    (152, 60_192_808, 2048),
])
def test_model_zoo_param_counts(depth, tv_total, fc_in):
    """Whole ResNet family matches torchvision param counts (minus fc)."""
    cfg = ModelConfig(depth=depth, num_classes=10, compute_dtype="float32")
    model = Classifier(config=cfg)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, dummy,
                           train=False))
    backbone = n_params(shapes["params"]["backbone"])
    assert backbone == tv_total - (fc_in * 1000 + 1000)


@pytest.mark.parametrize("depth,groups,wpg,tv_total", [
    (50, 32, 4, 25_028_904),     # resnext50_32x4d
    (50, 1, 128, 68_883_240),    # wide_resnet50_2
    (101, 32, 8, 88_791_336),    # resnext101_32x8d
])
def test_variant_param_counts(depth, groups, wpg, tv_total):
    """ResNeXt / Wide-ResNet variants match torchvision's published
    totals (minus fc) AND the in-repo torch reference model, parameter
    for parameter — two independent anchors for the grouped-conv and
    width plumbing."""
    torch = pytest.importorskip("torch")
    from irp_tpu.models.torch_ref import Bottleneck as TorchBottleneck
    from irp_tpu.models.torch_ref import ResNet as TorchResNet

    cfg = ModelConfig(depth=depth, num_classes=10, groups=groups,
                      width_per_group=wpg, compute_dtype="float32")
    model = Classifier(config=cfg)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, dummy,
                           train=False))
    backbone = n_params(shapes["params"]["backbone"])
    assert backbone == tv_total - (2048 * 1000 + 1000)
    layers = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}[depth]
    tmodel = TorchResNet(TorchBottleneck, layers, groups=groups,
                         width_per_group=wpg)
    assert backbone == sum(p.numel() for p in tmodel.parameters())


def test_variants_require_bottleneck_depths():
    from irp_tpu.models.resnet import ResNet

    with pytest.raises(ValueError, match="bottleneck depth"):
        jax.eval_shape(lambda: ResNet(depth=18, groups=32,
                                      width_per_group=4).init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 32, 32, 3), jnp.float32)))
    # the torch reference must fail the same way (torchvision raises
    # here too) — not silently build a vanilla basic-block net
    torch = pytest.importorskip("torch")
    from irp_tpu.models.torch_ref import TorchAnimalClassifier

    with pytest.raises(ValueError, match="BasicBlock"):
        TorchAnimalClassifier(depth=18, groups=32, width_per_group=4)


def test_remat_trainable_blocks_memory_and_numerics():
    """remat_trainable_blocks trades FLOPs for memory: the backward
    pass must need measurably less temp memory (XLA's own compiled
    memory analysis), while the parameter tree, outputs, and gradients
    are unchanged — it is a pure memory knob, safe to flip on any
    checkpoint."""
    import dataclasses

    cfg = ModelConfig(depth=18, num_classes=4, image_size=64,
                      hidden_dim=32, compute_dtype="float32",
                      trainable_stages=STAGE_NAMES)  # all stages backprop
    rcfg = dataclasses.replace(cfg, remat_trainable_blocks=True)
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                       image_size=64)
    rmodel = Classifier(config=rcfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 64, 64, 3))

    def make_loss(m):
        def loss(params):
            out = m.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          x, train=False)
            return jnp.sum(out ** 2)
        return loss

    # identical variable tree (checkpoints interchange) and numerics
    rvars = rmodel.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 64, 64, 3)), train=False)
    assert (jax.tree_util.tree_structure(rvars["params"])
            == jax.tree_util.tree_structure(variables["params"]))
    g_plain = jax.jit(jax.grad(make_loss(model)))(variables["params"])
    g_remat = jax.jit(jax.grad(make_loss(rmodel)))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    # The point of the knob: fewer activations held across the
    # forward->backward boundary.  Measured as bytes of TOP-LEVEL grad
    # jaxpr intermediates: remat moves block internals inside the
    # checkpoint call (recomputed transients), so they stop being
    # persistently materialized values.  (XLA:CPU's compiled
    # memory_analysis() can't see this — its peak temp is dominated by
    # per-conv im2col scratch, identical in both versions; the HBM win
    # is a TPU property, asserted here structurally.)
    def materialized_bytes(m):
        jaxpr = jax.make_jaxpr(jax.grad(make_loss(m)))(
            variables["params"]).jaxpr
        return sum(
            int(np.prod(v.aval.shape, dtype=np.int64)) * v.aval.dtype.itemsize
            for eqn in jaxpr.eqns for v in eqn.outvars
            if hasattr(v.aval, "shape"))

    plain, remat = materialized_bytes(model), materialized_bytes(rmodel)
    assert remat < 0.8 * plain, (plain, remat)


def test_r18_param_count_matches_torchvision(model18):
    """torchvision resnet18: 11,689,512 incl. fc(512->1000)."""
    _, variables = model18
    backbone = n_params(variables["params"]["backbone"])
    assert backbone == 11_689_512 - (512 * 1000 + 1000)


def test_frozen_prefix_stops_gradients(model18):
    """layer1-3 grads must be exactly zero; layer4 + head nonzero
    (freeze semantics of reference model.py:17-23)."""
    model, variables = model18
    x = jnp.ones((2, 32, 32, 3))
    labels = jnp.array([1, 2])

    def loss_fn(params):
        logits = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=False)
        return weighted_cross_entropy(logits, labels)

    grads = jax.grad(loss_fn)(variables["params"])
    bb = grads["backbone"]
    for stage in ("conv1", "bn1", "layer1_block0", "layer2_block0",
                  "layer3_block0"):
        g = jax.tree_util.tree_leaves(bb[stage])
        assert all(float(jnp.abs(x).max()) == 0.0 for x in g), stage
    l4 = jax.tree_util.tree_leaves(bb["layer4_block0"])
    assert any(float(jnp.abs(x).max()) > 0 for x in l4)
    head = jax.tree_util.tree_leaves(grads["head_dense2"])
    assert any(float(jnp.abs(x).max()) > 0 for x in head)


def test_bn_stats_update_in_train_mode(model18):
    """BN running stats update under train=True even in frozen stages
    (PyTorch .train() semantics, SURVEY §7 fidelity trap)."""
    model, variables = model18
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3)) * 3 + 1
    _, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    before = variables["batch_stats"]["backbone"]["bn1"]["mean"]
    after = mutated["batch_stats"]["backbone"]["bn1"]["mean"]
    assert float(jnp.abs(after - before).max()) > 0


def test_bn_stats_trainable_only_mode():
    cfg = ModelConfig(depth=18, num_classes=10, compute_dtype="float32",
                      bn_stats_mode="trainable_only")
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0), 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3)) * 3 + 1
    _, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    frozen_before = variables["batch_stats"]["backbone"]["bn1"]["mean"]
    frozen_after = mutated["batch_stats"]["backbone"]["bn1"]["mean"]
    assert float(jnp.abs(frozen_after - frozen_before).max()) == 0
    l4_before = variables["batch_stats"]["backbone"]["layer4_block0"]["bn1"]["mean"]
    l4_after = mutated["batch_stats"]["backbone"]["layer4_block0"]["bn1"]["mean"]
    assert float(jnp.abs(l4_after - l4_before).max()) > 0


def test_weighted_ce_matches_torch():
    """Weighted CE must equal torch CrossEntropyLoss(weight=w):
    sum(w_y * ce) / sum(w_y) (reference model.py:50-54)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=8)
    w = rng.uniform(0.5, 2.0, size=5).astype(np.float32)
    ours = float(weighted_cross_entropy(jnp.array(logits), jnp.array(labels),
                                        class_weights=w))
    theirs = float(torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
        torch.tensor(logits), torch.tensor(labels)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_torch_key_mapping():
    assert torch_key_to_flax("conv1.weight") == (
        "params", ("backbone", "conv1", "kernel"), "conv")
    assert torch_key_to_flax("layer2.3.bn2.running_var") == (
        "batch_stats", ("backbone", "layer2_block3", "bn2", "var"), "bn")
    assert torch_key_to_flax("layer1.0.downsample.0.weight") == (
        "params", ("backbone", "layer1_block0", "downsample_conv", "kernel"),
        "conv")
    assert torch_key_to_flax("backbone.layer4.2.conv3.weight") == (
        "params", ("backbone", "layer4_block2", "conv3", "kernel"), "conv")
    assert torch_key_to_flax("classifier.4.bias") == (
        "params", ("head_dense2", "bias"), "linear")
    assert torch_key_to_flax("fc.weight") is None
    assert torch_key_to_flax("bn1.num_batches_tracked") is None


def test_convert_roundtrip(model18):
    """flax -> torch-layout -> flax is the identity (so real torchvision
    checkpoints load without loss)."""
    _, variables = model18
    sd = flax_variables_to_torch_state_dict(variables, depth=18)
    assert sd["backbone.conv1.weight"].shape == (64, 3, 7, 7)
    assert sd["classifier.1.weight"].shape == (512, 512)
    back = torch_state_dict_to_variables(sd)
    for coll in ("params", "batch_stats"):
        flat_orig = jax.tree_util.tree_flatten_with_path(variables[coll])[0]
        for path, leaf in flat_orig:
            node = back[coll]
            for p in path:
                node = node[p.key]
            np.testing.assert_allclose(np.asarray(leaf), node, rtol=1e-6)


def test_r50_torch_key_coverage(vars50_shapes):
    """Every flax R50 leaf maps to a distinct torch key and back."""
    _, variables = vars50_shapes
    sd_keys = set()
    sd = flax_variables_to_torch_state_dict(
        jax.tree_util.tree_map(lambda s: np.zeros(s.shape, np.float32),
                               variables), depth=50)
    assert "backbone.layer3.5.conv3.weight" in sd
    assert sd["backbone.layer4.0.downsample.0.weight"].shape == (2048, 1024, 1, 1)
    n_leaves = len(jax.tree_util.tree_leaves(variables["params"])) + len(
        jax.tree_util.tree_leaves(variables["batch_stats"]))
    assert len(sd) == n_leaves


def test_torch_conv_bn_parity():
    """conv 3x3 stride-2 pad-1 + BN eval vs torch with converted weights.

    Uses HIGHEST precision — JAX's default conv precision is bf16-class
    even in f32, ~1e-2 off torch; the fidelity path must set
    ModelConfig.precision='highest'.
    """
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from flax import linen as nn

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    w = rng.normal(size=(16, 8, 3, 3)).astype(np.float32) * 0.1
    gamma = rng.uniform(0.5, 1.5, 16).astype(np.float32)
    beta = rng.normal(size=16).astype(np.float32)
    mean = rng.normal(size=16).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 16).astype(np.float32)

    tx = torch.tensor(x).permute(0, 3, 1, 2)
    ty = F.conv2d(tx, torch.tensor(w), stride=2, padding=1)
    ty = F.batch_norm(ty, torch.tensor(mean), torch.tensor(var),
                      torch.tensor(gamma), torch.tensor(beta),
                      training=False, eps=1e-5)
    ty = ty.permute(0, 2, 3, 1).numpy()

    conv = nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                   use_bias=False, precision=jax.lax.Precision.HIGHEST)
    bn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    jy = conv.apply({"params": {"kernel": jnp.array(w.transpose(2, 3, 1, 0))}},
                    jnp.array(x))
    jy = bn.apply({"params": {"scale": jnp.array(gamma), "bias": jnp.array(beta)},
                   "batch_stats": {"mean": jnp.array(mean), "var": jnp.array(var)}},
                  jy)
    np.testing.assert_allclose(np.asarray(jy), ty, atol=2e-5)


def test_features_method(model18):
    model, variables = model18
    x = jnp.zeros((2, 32, 32, 3))
    feats = model.apply(variables, x, method=Classifier.features)
    assert feats.shape == (2, 512)


def test_runtime_dropout_rate_override():
    """Classifier accepts a (traced) call-time dropout_rate that overrides
    the config rate — the sweep injects the trial's rate at runtime so
    distinct rates share one compiled program (round-2 review: continuous
    dropout_rate in ModelConfig forced a recompile per trial)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from irp_tpu.config import ModelConfig
    from irp_tpu.models.classifier import init_classifier

    cfg = ModelConfig(depth=18, num_classes=3, image_size=64,
                      dropout_rate=0.0, compute_dtype="float32")
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                       image_size=64)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)),
                    jnp.float32)
    rngs = {"dropout": jax.random.PRNGKey(1)}

    base = model.apply(variables, x, train=True, mutable=["batch_stats"],
                       rngs=rngs)[0]
    # rate 0 override == config rate 0 (identical bits)
    zero = model.apply(variables, x, train=True,
                       dropout_rate=jnp.float32(0.0),
                       mutable=["batch_stats"], rngs=rngs)[0]
    np.testing.assert_array_equal(np.asarray(base), np.asarray(zero))
    # high rate visibly changes the logits
    heavy = model.apply(variables, x, train=True,
                        dropout_rate=jnp.float32(0.9),
                        mutable=["batch_stats"], rngs=rngs)[0]
    assert np.abs(np.asarray(heavy) - np.asarray(base)).max() > 1e-3
    # eval ignores dropout entirely
    e1 = model.apply(variables, x, train=False)
    e2 = model.apply(variables, x, train=False,
                     dropout_rate=jnp.float32(0.9))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
