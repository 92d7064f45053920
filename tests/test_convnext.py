"""ConvNeXt model family: shapes, freeze semantics, torch fidelity,
conversion round-trip, config inference, Grad-CAM.

Beyond-reference breadth (the reference stack is ResNet-only, reference
functions/model.py:15): the ConvNeXt backbone must slot into every path
the ResNet family uses — Classifier head, trainable-mask freezing, train
step, Predictor, convert, explain — with torchvision convnext_*
state_dict interchange (same 1e-3 eval-fidelity bar as the ResNet
family, BASELINE.md).

Tiny geometry throughout (dims (8,16,24,32), depths (1,1,2,1)) for CPU
compile time; the real ladder is pinned against torchvision's published
convnext_tiny parameter count.
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
from irp_tpu.models.convnext import (
    CONVNEXT_VARIANTS,
    convnext_model_config,
)

CNX_CFG = ModelConfig(family="convnext", convnext_dims=(8, 16, 24, 32),
                      convnext_depths=(1, 1, 2, 1), num_classes=5,
                      hidden_dim=32, image_size=32, dropout_rate=0.0,
                      stochastic_depth=0.0, compute_dtype="float32")


def _randomized(variables, seed=0, scale=0.05):
    rng = np.random.RandomState(seed)

    def rand(leaf):
        return jnp.asarray(rng.normal(0.0, scale, leaf.shape), leaf.dtype)

    return {"params": jax.tree_util.tree_map(rand, variables["params"]),
            "batch_stats": variables.get("batch_stats", {})}


@pytest.fixture(scope="module")
def cnx_model():
    model, variables = init_classifier(CNX_CFG, jax.random.PRNGKey(0),
                                       image_size=32)
    return model, _randomized(variables)


# --------------------------------------------------------- variant table

def test_variants_table():
    tiny = convnext_model_config("tiny", num_classes=10)
    assert (tiny.family, tiny.convnext_dims, tiny.convnext_depths,
            tiny.stochastic_depth) == ("convnext", (96, 192, 384, 768),
                                       (3, 3, 9, 3), 0.1)
    large = convnext_model_config("large")
    assert (large.convnext_dims, large.convnext_depths,
            large.stochastic_depth) == ((192, 384, 768, 1536),
                                        (3, 3, 27, 3), 0.5)
    with pytest.raises(ValueError, match="unknown ConvNeXt variant"):
        convnext_model_config("xlarge")
    assert set(CONVNEXT_VARIANTS) == {"tiny", "small", "base", "large"}


def test_tiny_param_count_matches_torchvision():
    # torchvision convnext_tiny: 28,589,128 total with its LayerNorm +
    # 1000-way Linear classifier; our backbone tree includes that final
    # LayerNorm (classifier.0), so backbone-only = total - the Linear.
    cfg = convnext_model_config("tiny", num_classes=5, hidden_dim=32,
                                image_size=32, compute_dtype="float32")
    _, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                   image_size=32)
    n = sum(int(np.prod(np.shape(l))) for l in
            jax.tree_util.tree_leaves(variables["params"]["backbone"]))
    assert n == 28589128 - (768 * 1000 + 1000)


# ---------------------------------------------------------------- forward

def test_forward_shape_and_no_batch_stats(cnx_model):
    model, variables = cnx_model
    # LayerNorm family: no running statistics anywhere (like ViT)
    assert not variables.get("batch_stats")
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 5)
    assert logits.dtype == jnp.float32


def test_stochastic_depth_train_only():
    cfg = dataclasses.replace(CNX_CFG, stochastic_depth=0.5)
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                       image_size=32)
    variables = _randomized(variables, seed=5)
    x = jnp.asarray(np.random.RandomState(1).normal(
        size=(4, 32, 32, 3)).astype(np.float32))
    e1 = model.apply(variables, x, train=False)
    e2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    t1 = model.apply(variables, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = model.apply(variables, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 0


# ---------------------------------------------------------- freeze masks

def test_default_stages_map_to_stage4_plus_ln():
    assert resolve_trainable_stages(CNX_CFG) == ("stage4", "ln")
    explicit = dataclasses.replace(CNX_CFG, trainable_stages=("stage2",))
    assert resolve_trainable_stages(explicit) == ("stage2",)


def test_trainable_mask_convnext(cnx_model):
    from irp_tpu.train.state import trainable_mask

    _, variables = cnx_model
    mask = trainable_mask(variables["params"], CNX_CFG)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    on = {"/".join(getattr(p, "key", str(p)) for p in path)
          for path, v in flat if v}
    assert "head_dense1/kernel" in on and "head_dense2/kernel" in on
    assert any(k.startswith("backbone/stage4_block0/") for k in on)
    # the downsample INTO stage 4 trains with stage 4
    assert any(k.startswith("backbone/stage4_downsample_") for k in on)
    assert "backbone/ln/scale" in on  # the post-pool LayerNorm
    for frozen in ("backbone/stem_conv/", "backbone/stage1_block0/",
                   "backbone/stage3_block0/",
                   "backbone/stage3_downsample_"):
        assert not any(k.startswith(frozen) for k in on)


def test_train_step_freezes_prefix_and_updates_suffix(cnx_model):
    from irp_tpu.train.state import create_train_state
    from irp_tpu.train.step import make_train_step

    model, variables = cnx_model
    before = jax.tree_util.tree_map(np.asarray, variables["params"])
    tc = TrainConfig(learning_rate=1e-2, weight_decay=0.0, max_epochs=2)
    state = create_train_state(model, variables, tc, CNX_CFG,
                               steps_per_epoch=2)
    step = make_train_step(out_size=32, compute_dtype=jnp.float32)
    imgs = np.random.RandomState(0).randint(
        0, 255, (4, 40, 40, 3)).astype(np.uint8)
    new_state, metrics = step(state, imgs, jnp.zeros((4,), jnp.int32),
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    after = jax.tree_util.tree_map(np.asarray, new_state.params)
    bb_b, bb_a = before["backbone"], after["backbone"]
    np.testing.assert_array_equal(bb_b["stem_conv"]["kernel"],
                                  bb_a["stem_conv"]["kernel"])
    np.testing.assert_array_equal(
        bb_b["stage3_block0"]["dw_conv"]["kernel"],
        bb_a["stage3_block0"]["dw_conv"]["kernel"])
    assert (bb_b["stage4_block0"]["mlp_dense1"]["kernel"]
            != bb_a["stage4_block0"]["mlp_dense1"]["kernel"]).any()
    assert (bb_b["stage4_downsample_conv"]["kernel"]
            != bb_a["stage4_downsample_conv"]["kernel"]).any()
    assert (bb_b["ln"]["scale"] != bb_a["ln"]["scale"]).any()
    assert (before["head_dense2"]["kernel"]
            != after["head_dense2"]["kernel"]).any()


# ------------------------------------------------------------ validation

def test_bad_stage_name_rejected():
    cfg = dataclasses.replace(CNX_CFG, trainable_stages=("layer2",))
    with pytest.raises(ValueError, match="unknown ConvNeXt trainable"):
        init_classifier(cfg, jax.random.PRNGKey(0), image_size=32)


def test_out_of_range_stage_rejected():
    cfg = dataclasses.replace(CNX_CFG, trainable_stages=("stage5",))
    with pytest.raises(ValueError, match="out of range"):
        init_classifier(cfg, jax.random.PRNGKey(0), image_size=32)


def test_fused_frozen_blocks_on_rejected():
    cfg = dataclasses.replace(CNX_CFG, fused_frozen_blocks="on")
    with pytest.raises(ValueError, match="ResNet"):
        init_classifier(cfg, jax.random.PRNGKey(0), image_size=32)


# ----------------------------------------------------- torch interchange

def test_torch_fidelity_and_round_trip(cnx_model):
    """Flax forward vs the torchvision-layout torch ConvNeXt with the
    SAME weights (1e-3 bar; depthwise/linear transposes, layer_scale
    reshape, and the stage/downsample index mapping all covered), then
    torch state_dict -> flax round-trip must be exact."""
    torch = pytest.importorskip("torch")
    from irp_tpu.models.torch_ref import TorchConvNeXtClassifier

    model, variables = cnx_model
    x = np.random.RandomState(2).normal(
        size=(2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    sd = flax_variables_to_torch_state_dict(variables)
    tmodel = TorchConvNeXtClassifier(num_classes=5, hidden=32,
                                     dims=(8, 16, 24, 32),
                                     depths=(1, 1, 2, 1))
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


def test_torchvision_native_layout_converts(cnx_model):
    """A torchvision-native checkpoint keeps the post-pool LayerNorm at
    classifier.0 and its own Linear at classifier.2 — it must convert
    with the LN captured and the torch head skipped, then merge over a
    random init (the pretrained-weights path, reference model.py:14)."""
    model, variables = cnx_model
    sd = flax_variables_to_torch_state_dict(variables)
    # rewrite our export into torchvision's native layout
    tv_sd = {}
    for k, v in sd.items():
        if k == "backbone.ln.weight":
            tv_sd["classifier.0.weight"] = v
        elif k == "backbone.ln.bias":
            tv_sd["classifier.0.bias"] = v
        elif k.startswith("classifier."):
            continue  # drop our MLP head
        else:
            tv_sd[k[len("backbone."):]] = v
    tv_sd["classifier.2.weight"] = np.zeros((1000, 32), np.float32)
    tv_sd["classifier.2.bias"] = np.zeros((1000,), np.float32)
    converted = torch_state_dict_to_variables(tv_sd)
    assert "head_dense1" not in converted["params"]
    assert "ln" in converted["params"]["backbone"]
    from irp_tpu.models.convert import merge_pretrained

    merged = merge_pretrained(variables, converted)
    x = jnp.asarray(np.random.RandomState(3).normal(
        size=(1, 32, 32, 3)).astype(np.float32))
    full = np.asarray(model.apply(variables, x, train=False))
    via = np.asarray(model.apply(merged, x, train=False))
    np.testing.assert_allclose(via, full, atol=1e-6)


def test_infer_model_config_recovers_structure():
    from irp_tpu.infer import infer_model_config

    cfg = dataclasses.replace(CNX_CFG, num_classes=7, hidden_dim=64)
    _, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                   image_size=32)
    got = infer_model_config(variables["params"], image_size=224)
    assert (got.family, got.convnext_dims, got.convnext_depths,
            got.num_classes, got.hidden_dim) == (
        "convnext", (8, 16, 24, 32), (1, 1, 2, 1), 7, 64)


# --------------------------------------------------------------- explain

def test_explain_equivalence_and_gradcam(cnx_model):
    """head_from_spatial must recombine pool + final LN + head exactly
    (a bare pool+head WOULD diverge — the final LayerNorm sits after the
    pool for this family), and Grad-CAM end-to-end stays in [0,1] with
    logits matching the predictor."""
    from irp_tpu.explain import GradCAM
    from irp_tpu.infer import make_predictor

    model, variables = cnx_model
    x = jnp.asarray(np.random.RandomState(3).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    full = np.asarray(model.apply(variables, x, train=False))
    spatial = model.apply(variables, x, method="spatial_features")
    via = np.asarray(model.apply(variables, spatial,
                                 method="head_from_spatial"))
    np.testing.assert_allclose(via, full, atol=1e-5)
    # the naive pool+head (no final LN) is NOT equivalent for ConvNeXt
    naive = np.asarray(model.apply(variables, spatial.mean(axis=(1, 2)),
                                   method="head"))
    assert np.abs(naive - full).max() > 1e-3

    pred = make_predictor(dict(variables),
                          class_names=[str(i) for i in range(5)],
                          cfg=CNX_CFG, batch_size=2)
    cam = GradCAM(pred, batch_size=2)
    imgs = np.random.RandomState(4).randint(
        0, 255, (3, 40, 40, 3)).astype(np.uint8)
    cams, logits = cam.explain(imgs)
    assert cams.shape == (3, 32, 32) and logits.shape == (3, 5)
    assert cams.min() >= 0.0 and cams.max() <= 1.0
    probs = pred.predict_probs(imgs)
    assert (np.argmax(logits, 1) == np.argmax(probs, 1)).all()


# --------------------------------------------------------- parallelism

def test_convnext_tp_forward_matches_replicated(cnx_model):
    """dp4 x tp2 forward must equal the unsharded one: the block MLP pair
    is named mlp_dense1/mlp_dense2 precisely so the mesh layout's
    Megatron rules (parallel/mesh.py) column/row-shard ConvNeXt blocks
    with zero extra wiring (shardings change layout, never numerics)."""
    from irp_tpu.config import MeshConfig
    from irp_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                       param_shardings, shard_variables)
    from jax.sharding import PartitionSpec as P

    model, variables = cnx_model
    x = np.random.RandomState(8).normal(
        size=(4, 32, 32, 3)).astype(np.float32)
    base = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    mesh = make_mesh(MeshConfig(data=4, model=2))
    sh = param_shardings(mesh, variables)
    spec = sh["params"]["backbone"]["stage4_block0"]["mlp_dense1"][
        "kernel"].spec
    assert spec == P(None, "model")  # column-parallel by name
    spec2 = sh["params"]["backbone"]["stage4_block0"]["mlp_dense2"][
        "kernel"].spec
    assert spec2 == P("model", None)  # row-parallel by name
    sharded_vars = shard_variables(mesh, variables)
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    fwd = jax.jit(lambda v, a: model.apply(v, a, train=False))
    out = np.asarray(fwd(sharded_vars, xs))
    np.testing.assert_allclose(out, base, atol=1e-5)


# ------------------------------------------------------------------ e2e

@pytest.mark.slow
def test_convnext_fit_e2e_hbm_8dev(tmp_path_factory):
    """Tiny ConvNeXt through the full fit stack on the 8-device mesh:
    shard IO -> cache -> HBM-resident dataset -> augment -> train step
    (no batch_stats) -> early-stopped fit -> eval."""
    from tests.synth import make_synthetic_shards
    from irp_tpu.config import MeshConfig, TrainConfig
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.parallel.mesh import make_mesh
    from irp_tpu.train import fit

    root = tmp_path_factory.mktemp("cnx_e2e")
    meta = make_synthetic_shards(str(root), num_classes=4, per_class=40,
                                 samples_per_shard=50, seed=1, size=40)
    info = analyze_webdataset(meta["shards"])
    data = build_cache(meta["shards"], info.class_names,
                       cache_dir=str(root / "cache"), size=40)
    # From-scratch (no pretrained weights exist here): train all stages.
    cfg = dataclasses.replace(CNX_CFG, num_classes=4, image_size=32,
                              dropout_rate=0.1,
                              trainable_stages=("stem", "stage1", "stage2",
                                                "stage3", "stage4", "ln"))
    tcfg = TrainConfig(learning_rate=3e-3, weight_decay=1e-5,
                       batch_size=16, max_epochs=8, patience=5,
                       aug_intensity="low", train_samples_per_epoch=None,
                       eval_samples=None, seed=0)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    result = fit(data, data, info, cfg, tcfg, mesh=mesh, mode="hbm")
    assert len(result.history["train_loss"]) >= 5
    assert (result.history["train_loss"][-1]
            < result.history["train_loss"][0])
    assert result.best_val_acc > 90.0
