"""EfficientNet model family: shapes, freeze semantics, torch fidelity,
conversion round-trip, config inference, Grad-CAM.

Beyond-reference breadth (the reference stack is ResNet-only, reference
functions/model.py:15): the EfficientNet backbone must slot into every
path the ResNet family uses — Classifier head, trainable-mask freezing,
train step, Predictor, convert, explain — with torchvision
efficientnet_b* state_dict interchange (same 1e-3 eval-fidelity bar as
the ResNet family, BASELINE.md).

Tiny geometry throughout (32px, width/depth mult 0.5 — 10 MBConv blocks)
for CPU compile time; the scaling math itself is pinned against
torchvision's published B0 channel ladder and parameter count.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irp_tpu.config import ModelConfig, TrainConfig
from irp_tpu.models import (
    flax_variables_to_torch_state_dict,
    init_classifier,
    resolve_trainable_stages,
    torch_state_dict_to_variables,
)
from irp_tpu.models.efficientnet import (
    EFFICIENTNET_VARIANTS,
    bn_constants,
    efficientnet_model_config,
    make_divisible,
    scaled_setting,
    top_channels,
)

# width/depth mult 0.5: stem 16ch, stage blocks (1,1,1,2,2,2,1) — a real
# scaled EfficientNet small enough for CPU tests.
EFF_CFG = ModelConfig(family="efficientnet", width_mult=0.5, depth_mult=0.5,
                      num_classes=5, hidden_dim=32, image_size=32,
                      dropout_rate=0.0, stochastic_depth=0.0,
                      compute_dtype="float32")


def _randomized(variables, seed=0, scale=0.05):
    """Random params AND positive BN variances (zero-init scales would
    hide transpose bugs; negative randomized vars would NaN rsqrt)."""
    rng = np.random.RandomState(seed)

    def rand(leaf):
        return jnp.asarray(rng.normal(0.0, scale, leaf.shape), leaf.dtype)

    params = jax.tree_util.tree_map(rand, variables["params"])

    def rand_stats(path, leaf):
        arr = rng.normal(0.0, scale, leaf.shape)
        if getattr(path[-1], "key", "") == "var":
            arr = np.abs(arr) + 0.5
        return jnp.asarray(arr, leaf.dtype)

    stats = jax.tree_util.tree_map_with_path(rand_stats,
                                             variables["batch_stats"])
    return {"params": params, "batch_stats": stats}


@pytest.fixture(scope="module")
def eff_model():
    model, variables = init_classifier(EFF_CFG, jax.random.PRNGKey(0),
                                       image_size=32)
    return model, _randomized(variables)


# --------------------------------------------------------- scaling math

def test_b0_channel_ladder_matches_torchvision():
    setting = scaled_setting(1.0, 1.0)
    assert setting[0][3] == 32                      # stem out
    assert [s[4] for s in setting] == [16, 24, 40, 80, 112, 192, 320]
    assert [s[5] for s in setting] == [1, 2, 2, 3, 3, 4, 1]
    assert top_channels(1.0) == 1280


def test_b4_scaling_matches_torchvision():
    # b4 = (1.4, 1.8): torchvision efficientnet_b4 ladder
    setting = scaled_setting(1.4, 1.8)
    assert setting[0][3] == make_divisible(32 * 1.4) == 48
    assert [s[4] for s in setting] == [24, 32, 56, 112, 160, 272, 448]
    assert [s[5] for s in setting] == [2, 4, 4, 6, 6, 8, 2]
    assert top_channels(1.4) == 1792


def test_b0_param_count_matches_torchvision(eff_model):
    # torchvision efficientnet_b0: 5,288,548 total with the 1000-way
    # classifier (1280*1000 + 1000) => backbone-only 4,007,548
    cfg = dataclasses.replace(EFF_CFG, width_mult=1.0, depth_mult=1.0)
    _, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                   image_size=32)
    n = sum(int(np.prod(np.shape(l))) for l in
            jax.tree_util.tree_leaves(variables["params"]["backbone"]))
    assert n == 5288548 - (1280 * 1000 + 1000)


def test_variants_table_and_bn_constants():
    b0 = efficientnet_model_config("b0", num_classes=10)
    assert (b0.family, b0.width_mult, b0.depth_mult,
            b0.image_size) == ("efficientnet", 1.0, 1.0, 224)
    b7 = efficientnet_model_config("b7")
    assert (b7.width_mult, b7.depth_mult, b7.image_size) == (2.0, 3.1, 600)
    with pytest.raises(ValueError, match="unknown EfficientNet variant"):
        efficientnet_model_config("b8")
    # B0-B4 use nn.BatchNorm2d defaults; B5-B7 the TF-port constants
    assert bn_constants(1.0, 1.0) == (1e-5, 0.9)
    for name in ("b5", "b6", "b7"):
        v = EFFICIENTNET_VARIANTS[name]
        assert bn_constants(v["width_mult"], v["depth_mult"]) == (1e-3, 0.99)


# ---------------------------------------------------------------- forward

def test_forward_shape_and_batch_stats(eff_model):
    model, variables = eff_model
    assert "batch_stats" in variables  # BatchNorm family, unlike ViT
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 5)
    assert logits.dtype == jnp.float32


def test_stochastic_depth_train_only():
    cfg = dataclasses.replace(EFF_CFG, stochastic_depth=0.5)
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                       image_size=32)
    variables = _randomized(variables, seed=5)
    x = jnp.asarray(np.random.RandomState(1).normal(
        size=(4, 32, 32, 3)).astype(np.float32))
    # eval: deterministic, no rng needed
    e1 = model.apply(variables, x, train=False)
    e2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    # train: different dropout rngs drop different residual branches
    t1 = model.apply(variables, x, train=True, mutable=["batch_stats"],
                     rngs={"dropout": jax.random.PRNGKey(1)})[0]
    t2 = model.apply(variables, x, train=True, mutable=["batch_stats"],
                     rngs={"dropout": jax.random.PRNGKey(2)})[0]
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 0


# ---------------------------------------------------------- freeze masks

def test_default_stages_map_to_stage7_plus_top():
    assert resolve_trainable_stages(EFF_CFG) == ("stage7", "top")
    explicit = dataclasses.replace(EFF_CFG, trainable_stages=("stage5",))
    assert resolve_trainable_stages(explicit) == ("stage5",)


def test_trainable_mask_efficientnet(eff_model):
    from irp_tpu.train.state import trainable_mask

    _, variables = eff_model
    mask = trainable_mask(variables["params"], EFF_CFG)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    on = {"/".join(getattr(p, "key", str(p)) for p in path)
          for path, v in flat if v}
    assert "head_dense1/kernel" in on and "head_dense2/kernel" in on
    assert any(k.startswith("backbone/stage7_block0/") for k in on)
    assert any(k.startswith("backbone/top_conv/") for k in on)
    for frozen in ("backbone/stem_conv/", "backbone/stage1_block0/",
                   "backbone/stage6_block0/"):
        assert not any(k.startswith(frozen) for k in on)


def test_train_step_freezes_prefix_and_updates_suffix(eff_model):
    # 64px input and batch 4 so the trainable stage-7 feature map is 2x2:
    # at 1x1 spatial with batch 2, train-form BN normalizes exactly two
    # values per channel and its output degenerates to sign(a1-a2) —
    # piecewise constant in the conv weights, i.e. exactly-zero conv
    # grads, which would falsely look like frozen parameters here.
    from irp_tpu.train.state import create_train_state
    from irp_tpu.train.step import make_train_step

    model, variables = eff_model
    before_p = jax.tree_util.tree_map(np.asarray, variables["params"])
    before_s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    tc = TrainConfig(learning_rate=1e-2, weight_decay=0.0, max_epochs=2)
    state = create_train_state(model, variables, tc, EFF_CFG,
                               steps_per_epoch=2)
    step = make_train_step(out_size=64, compute_dtype=jnp.float32)
    imgs = np.random.RandomState(0).randint(
        0, 255, (4, 72, 72, 3)).astype(np.uint8)
    new_state, metrics = step(state, imgs, jnp.zeros((4,), jnp.int32),
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    after_p = jax.tree_util.tree_map(np.asarray, new_state.params)
    after_s = jax.tree_util.tree_map(np.asarray, new_state.batch_stats)
    bb_b, bb_a = before_p["backbone"], after_p["backbone"]
    np.testing.assert_array_equal(bb_b["stem_conv"]["kernel"],
                                  bb_a["stem_conv"]["kernel"])
    np.testing.assert_array_equal(
        bb_b["stage1_block0"]["dw_conv"]["kernel"],
        bb_a["stage1_block0"]["dw_conv"]["kernel"])
    assert (bb_b["stage7_block0"]["project_conv"]["kernel"]
            != bb_a["stage7_block0"]["project_conv"]["kernel"]).any()
    assert (before_p["head_dense2"]["kernel"]
            != after_p["head_dense2"]["kernel"]).any()
    # bn_stats_mode='trainable_only' (default): frozen-stage BN stats
    # stay in inference form, trainable-stage stats update
    sb, sa = before_s["backbone"], after_s["backbone"]
    np.testing.assert_array_equal(sb["stem_bn"]["mean"],
                                  sa["stem_bn"]["mean"])
    np.testing.assert_array_equal(sb["stage6_block0"]["dw_bn"]["mean"],
                                  sa["stage6_block0"]["dw_bn"]["mean"])
    assert (sb["stage7_block0"]["dw_bn"]["mean"]
            != sa["stage7_block0"]["dw_bn"]["mean"]).any()
    assert (sb["top_bn"]["mean"] != sa["top_bn"]["mean"]).any()


# ------------------------------------------------------------ validation

def test_bad_stage_name_rejected():
    cfg = dataclasses.replace(EFF_CFG, trainable_stages=("layer2",))
    with pytest.raises(ValueError, match="unknown EfficientNet trainable"):
        init_classifier(cfg, jax.random.PRNGKey(0), image_size=32)


def test_out_of_range_stage_rejected():
    cfg = dataclasses.replace(EFF_CFG, trainable_stages=("stage8",))
    with pytest.raises(ValueError, match="out of range"):
        init_classifier(cfg, jax.random.PRNGKey(0), image_size=32)


def test_fused_frozen_blocks_on_rejected():
    cfg = dataclasses.replace(EFF_CFG, fused_frozen_blocks="on")
    with pytest.raises(ValueError, match="ResNet"):
        init_classifier(cfg, jax.random.PRNGKey(0), image_size=32)


# ----------------------------------------------------- torch interchange

def test_non_mbconv_features_state_dict_gets_clear_error():
    """ADVICE r3: VGG/DenseNet/MobileNet/ConvNeXt also use a 'features.'
    layout — they must raise a named unsupported-family error, not a
    misleading EfficientNet key error deep in the MBConv mapper."""
    import numpy as np

    vgg_like = {  # torchvision VGG layout: features.<idx>.<weight|bias>
        "features.0.weight": np.zeros((64, 3, 3, 3), np.float32),
        "features.0.bias": np.zeros((64,), np.float32),
        "classifier.0.weight": np.zeros((4096, 25088), np.float32),
    }
    with pytest.raises(ValueError, match="unsupported torchvision family"):
        torch_state_dict_to_variables(vgg_like)
    # an MBConv-shaped key still routes to the EfficientNet converter
    from irp_tpu.models.convert import _is_efficientnet_state_dict

    assert _is_efficientnet_state_dict(
        {"features.1.0.block.0.0.weight": None})
    assert not _is_efficientnet_state_dict(vgg_like)


def test_torch_fidelity_and_round_trip(eff_model):
    """Flax forward vs the torchvision-layout torch EfficientNet with the
    SAME weights (1e-3 bar; depthwise/SE/projection transposes and the
    block-index role mapping all covered), then torch state_dict -> flax
    round-trip must be exact."""
    torch = pytest.importorskip("torch")
    from irp_tpu.models.torch_ref import TorchEfficientNetClassifier

    model, variables = eff_model
    x = np.random.RandomState(2).normal(
        size=(2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    sd = flax_variables_to_torch_state_dict(variables)
    tmodel = TorchEfficientNetClassifier(num_classes=5, hidden=32,
                                         width_mult=0.5, depth_mult=0.5)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected
    tmodel.eval()
    with torch.no_grad():
        theirs = tmodel(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    diff = np.abs(ours - theirs).max()
    assert diff < 1e-3, f"max |flax - torch| = {diff}"

    # exact round-trip: torch sd -> flax variables -> same logits
    v2 = torch_state_dict_to_variables(sd)
    back = np.asarray(model.apply(
        {"params": v2["params"], "batch_stats": v2["batch_stats"]},
        jnp.asarray(x), train=False))
    np.testing.assert_array_equal(back, ours)


def test_backbone_only_checkpoint_merges(eff_model):
    """A torchvision-style backbone checkpoint (1000-way classifier, no
    MLP head) must convert with the torch head skipped and merge over a
    random init (the pretrained-weights path, reference model.py:14)."""
    model, variables = eff_model
    sd = flax_variables_to_torch_state_dict(variables)
    # simulate torchvision's own head: single Linear at classifier.1
    backbone_sd = {k: v for k, v in sd.items()
                   if not k.startswith("classifier.")}
    backbone_sd["classifier.1.weight"] = np.zeros((1000, 320), np.float32)
    backbone_sd["classifier.1.bias"] = np.zeros((1000,), np.float32)
    converted = torch_state_dict_to_variables(backbone_sd)
    assert "head_dense1" not in converted["params"]
    from irp_tpu.models.convert import merge_pretrained

    merged = merge_pretrained(variables, converted)
    x = jnp.asarray(np.random.RandomState(3).normal(
        size=(1, 32, 32, 3)).astype(np.float32))
    full = np.asarray(model.apply(variables, x, train=False))
    via = np.asarray(model.apply(merged, x, train=False))
    np.testing.assert_allclose(via, full, atol=1e-6)


def test_infer_model_config_recovers_b0():
    from irp_tpu.infer import infer_model_config

    cfg = dataclasses.replace(EFF_CFG, width_mult=1.0, depth_mult=1.0,
                              num_classes=7, hidden_dim=64)
    _, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                   image_size=32)
    got = infer_model_config(variables["params"], image_size=224)
    assert (got.family, got.width_mult, got.depth_mult, got.num_classes,
            got.hidden_dim) == ("efficientnet", 1.0, 1.0, 7, 64)


def test_infer_model_config_rejects_unnamed_mults(eff_model):
    from irp_tpu.infer import infer_model_config

    _, variables = eff_model  # 0.5/0.5 is no named variant
    with pytest.raises(ValueError, match="no named B0-B7 variant"):
        infer_model_config(variables["params"])


# --------------------------------------------------------------- explain

def test_explain_equivalence_and_gradcam(eff_model):
    from irp_tpu.explain import GradCAM
    from irp_tpu.infer import make_predictor

    model, variables = eff_model
    x = jnp.asarray(np.random.RandomState(3).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    full = np.asarray(model.apply(variables, x, train=False))
    spatial = model.apply(variables, x, method="spatial_features")
    via = np.asarray(model.apply(variables, spatial.mean(axis=(1, 2)),
                                 method="head"))
    np.testing.assert_allclose(via, full, atol=1e-5)

    pred = make_predictor(dict(variables),
                          class_names=[str(i) for i in range(5)],
                          cfg=EFF_CFG, batch_size=2)
    cam = GradCAM(pred, batch_size=2)
    imgs = np.random.RandomState(4).randint(
        0, 255, (3, 40, 40, 3)).astype(np.uint8)
    cams, logits = cam.explain(imgs)
    assert cams.shape == (3, 32, 32) and logits.shape == (3, 5)
    assert cams.min() >= 0.0 and cams.max() <= 1.0
    probs = pred.predict_probs(imgs)
    assert (np.argmax(logits, 1) == np.argmax(probs, 1)).all()


# ------------------------------------------------------------------ e2e

@pytest.mark.slow
def test_efficientnet_fit_e2e_hbm_8dev(tmp_path_factory):
    """Tiny EfficientNet through the full fit stack on the 8-device mesh:
    shard IO -> cache -> HBM-resident dataset -> augment -> train step
    (batch_stats collection) -> early-stopped fit -> eval."""
    from tests.synth import make_synthetic_shards
    from irp_tpu.config import MeshConfig, TrainConfig
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.parallel.mesh import make_mesh
    from irp_tpu.train import fit

    root = tmp_path_factory.mktemp("eff_e2e")
    meta = make_synthetic_shards(str(root), num_classes=4, per_class=40,
                                 samples_per_shard=50, seed=1, size=40)
    info = analyze_webdataset(meta["shards"])
    data = build_cache(meta["shards"], info.class_names,
                       cache_dir=str(root / "cache"), size=40)
    # From-scratch (no pretrained weights exist here): train ALL stages,
    # gently and long enough for BN running stats to stabilize.  Unlike
    # the ResNet e2e, EfficientNet is BN-fragile at toy scale: with a
    # fast lr over few steps the running stats lag the moving weights,
    # and eval-form SiLU + sigmoid SE gates collapse the off-center
    # activations to near-constants (train acc 95% / val acc exactly
    # chance).  lr 1e-3 x 8 epochs reaches 100% val top-1 (measured);
    # ReLU + additive residuals make ResNet robust to the same lag.
    cfg = dataclasses.replace(EFF_CFG, num_classes=4, image_size=32,
                              dropout_rate=0.1,
                              trainable_stages=(
                                  "stem", "stage1", "stage2", "stage3",
                                  "stage4", "stage5", "stage6", "stage7",
                                  "top"))
    tcfg = TrainConfig(learning_rate=1e-3, weight_decay=1e-5,
                       batch_size=16, max_epochs=8, patience=5,
                       aug_intensity="low", train_samples_per_epoch=None,
                       eval_samples=None, seed=0)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    result = fit(data, data, info, cfg, tcfg, mesh=mesh, mode="hbm")
    assert len(result.history["train_loss"]) >= 5
    assert (result.history["train_loss"][-1]
            < result.history["train_loss"][0])
    assert result.best_val_acc > 90.0
