"""ViT model family: shapes, freeze semantics, torch fidelity, conversion
round-trip, config inference, Grad-CAM.

Beyond-reference breadth (the reference stack is ResNet-only, reference
functions/model.py:15): the ViT backbone must slot into every path the
ResNet family uses — Classifier head, trainable-mask freezing, train step,
Predictor, convert, explain — with torchvision vit_* state_dict
interchange (same 1e-3 eval-fidelity bar as the ResNet family,
BASELINE.md).

Tiny geometry throughout (32px, patch 8, 3 layers, embed 64) for CPU
compile time.
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

VIT_CFG = ModelConfig(family="vit", patch_size=8, embed_dim=64,
                      num_layers=3, mlp_dim=128, num_classes=5,
                      hidden_dim=32, image_size=32, dropout_rate=0.0,
                      compute_dtype="float32")


def _randomized(variables, seed=0, scale=0.05):
    """Random weights everywhere: zero-init class_token / LN biases would
    hide transpose or slicing bugs in the conversion tests."""
    leaves, tree = jax.tree_util.tree_flatten(variables)
    rng = np.random.RandomState(seed)
    return jax.tree_util.tree_unflatten(
        tree, [jnp.asarray(rng.normal(0.0, scale, l.shape), l.dtype)
               for l in leaves])


@pytest.fixture(scope="module")
def vit_model():
    model, variables = init_classifier(VIT_CFG, jax.random.PRNGKey(0),
                                       image_size=32)
    return model, _randomized(variables)


# ---------------------------------------------------------------- forward

def test_forward_shape_and_no_batch_stats(vit_model):
    model, variables = vit_model
    assert "batch_stats" not in variables  # LayerNorm: no running stats
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 5)
    assert logits.dtype == jnp.float32


def test_train_eval_forward_identical_without_dropout(vit_model):
    # no BatchNorm and dropout_rate=0: train and eval forms must agree
    # (the frozen-BN fidelity trap of SURVEY §7 does not exist for ViT)
    model, variables = vit_model
    x = jnp.asarray(np.random.RandomState(1).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    eval_logits = model.apply(variables, x, train=False)
    train_logits = model.apply(variables, x, train=True,
                               rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(train_logits),
                               np.asarray(eval_logits), atol=1e-6)


def test_pos_embedding_geometry_mismatch_errors(vit_model):
    model, variables = vit_model
    with pytest.raises(ValueError, match="patch grid"):
        model.apply(variables, jnp.ones((1, 48, 48, 3)), train=False)


# ---------------------------------------------------------- freeze masks

def test_default_stages_map_to_last_block_plus_ln():
    assert resolve_trainable_stages(VIT_CFG) == ("block2", "ln")
    # explicit tuples pass through literally
    explicit = dataclasses.replace(VIT_CFG, trainable_stages=("block1",))
    assert resolve_trainable_stages(explicit) == ("block1",)


def test_trainable_mask_vit(vit_model):
    from irp_tpu.train.state import trainable_mask

    _, variables = vit_model
    mask = trainable_mask(variables["params"], VIT_CFG)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    on = {"/".join(getattr(p, "key", str(p)) for p in path)
          for path, v in flat if v}
    # head + block2 + final ln trainable, nothing else
    assert "head_dense1/kernel" in on and "head_dense2/kernel" in on
    assert "backbone/ln/scale" in on
    assert any(k.startswith("backbone/block2/") for k in on)
    assert not any(k.startswith("backbone/block0/") for k in on)
    assert not any(k.startswith("backbone/block1/") for k in on)
    assert "backbone/class_token" not in on
    assert "backbone/pos_embedding" not in on


def test_trainable_mask_vit_embed_stage(vit_model):
    from irp_tpu.train.state import trainable_mask

    _, variables = vit_model
    cfg = dataclasses.replace(VIT_CFG, trainable_stages=("embed", "block0"))
    mask = trainable_mask(variables["params"], cfg)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    on = {"/".join(getattr(p, "key", str(p)) for p in path)
          for path, v in flat if v}
    assert {"backbone/class_token", "backbone/pos_embedding"} <= on
    assert any(k.startswith("backbone/conv_proj/") for k in on)
    assert any(k.startswith("backbone/block0/") for k in on)
    assert not any(k.startswith("backbone/block2/") for k in on)


def test_train_step_freezes_prefix_and_updates_suffix(vit_model):
    from irp_tpu.train.state import create_train_state
    from irp_tpu.train.step import make_train_step

    model, variables = vit_model
    before = jax.tree_util.tree_map(np.asarray, variables["params"])
    tc = TrainConfig(learning_rate=1e-2, weight_decay=0.0, max_epochs=2)
    state = create_train_state(model, variables, tc, VIT_CFG,
                               steps_per_epoch=2)
    assert state.batch_stats == {}
    step = make_train_step(out_size=32, compute_dtype=jnp.float32)
    imgs = np.random.RandomState(0).randint(
        0, 255, (2, 40, 40, 3)).astype(np.uint8)
    new_state, metrics = step(state, imgs, jnp.zeros((2,), jnp.int32),
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    after = jax.tree_util.tree_map(np.asarray, new_state.params)
    bb_b, bb_a = before["backbone"], after["backbone"]
    np.testing.assert_array_equal(bb_b["block0"]["attn_q"]["kernel"],
                                  bb_a["block0"]["attn_q"]["kernel"])
    np.testing.assert_array_equal(bb_b["pos_embedding"],
                                  bb_a["pos_embedding"])
    assert (bb_b["block2"]["attn_q"]["kernel"]
            != bb_a["block2"]["attn_q"]["kernel"]).any()
    assert (before["head_dense2"]["kernel"]
            != after["head_dense2"]["kernel"]).any()


# ------------------------------------------------------------ validation

def test_unknown_family_rejected():
    cfg = dataclasses.replace(VIT_CFG, family="mlp")
    with pytest.raises(ValueError, match="unknown model family"):
        init_classifier(cfg, jax.random.PRNGKey(0), image_size=32)


def test_fused_frozen_blocks_on_rejected_for_vit():
    cfg = dataclasses.replace(VIT_CFG, fused_frozen_blocks="on")
    with pytest.raises(ValueError, match="ResNet"):
        init_classifier(cfg, jax.random.PRNGKey(0), image_size=32)


def test_bad_vit_stage_name_rejected():
    cfg = dataclasses.replace(VIT_CFG, trainable_stages=("layer2",))
    with pytest.raises(ValueError, match="unknown ViT trainable stage"):
        init_classifier(cfg, jax.random.PRNGKey(0), image_size=32)


def test_out_of_range_block_rejected():
    cfg = dataclasses.replace(VIT_CFG, trainable_stages=("block7",))
    with pytest.raises(ValueError, match="out of range"):
        init_classifier(cfg, jax.random.PRNGKey(0), image_size=32)


# ----------------------------------------------------- torch interchange

def test_torch_fidelity_and_round_trip(vit_model):
    """Flax forward vs the torchvision-layout torch ViT with the SAME
    weights (1e-3 bar; in-proj packing and every transpose covered), then
    torch state_dict -> flax round-trip must be exact."""
    torch = pytest.importorskip("torch")
    from irp_tpu.models.torch_ref import TorchViTClassifier

    model, variables = vit_model
    x = np.random.RandomState(2).normal(
        size=(2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    sd = flax_variables_to_torch_state_dict(variables)
    tmodel = TorchViTClassifier(num_classes=5, hidden=32, patch_size=8,
                                embed_dim=64, num_layers=3, num_heads=1,
                                mlp_dim=128, image_size=32)
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
    assert v2["batch_stats"] == {}
    back = np.asarray(model.apply({"params": v2["params"]},
                                  jnp.asarray(x), train=False))
    np.testing.assert_array_equal(back, ours)


def test_infer_model_config_recovers_vit(vit_model):
    from irp_tpu.infer import infer_model_config

    _, variables = vit_model
    cfg = infer_model_config(variables["params"])
    assert (cfg.family, cfg.patch_size, cfg.embed_dim, cfg.num_layers,
            cfg.mlp_dim, cfg.image_size, cfg.num_classes,
            cfg.hidden_dim) == ("vit", 8, 64, 3, 128, 32, 5, 32)


# --------------------------------------------------------------- explain

def test_vit_explain_equivalence(vit_model):
    # the explain path relies on suffix(prefix(x)) == __call__(x) exactly
    model, variables = vit_model
    x = jnp.asarray(np.random.RandomState(3).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    full = np.asarray(model.apply(variables, x, train=False))
    tokens = model.apply(variables, x, method="vit_tokens")
    assert tokens.shape == (2, (32 // 8) ** 2 + 1, 64)
    via = np.asarray(model.apply(variables, tokens,
                                 method="vit_logits_from_tokens"))
    np.testing.assert_allclose(via, full, atol=1e-6)


def test_vit_gradcam(vit_model):
    from irp_tpu.explain import GradCAM
    from irp_tpu.infer import make_predictor

    _, variables = vit_model
    pred = make_predictor(dict(variables),
                          class_names=[str(i) for i in range(5)],
                          cfg=VIT_CFG, batch_size=2)
    cam = GradCAM(pred, batch_size=2)
    imgs = np.random.RandomState(4).randint(
        0, 255, (3, 40, 40, 3)).astype(np.uint8)
    cams, logits = cam.explain(imgs)
    assert cams.shape == (3, 32, 32) and logits.shape == (3, 5)
    assert cams.min() >= 0.0 and cams.max() <= 1.0
    # maps must be non-degenerate and match the serving-path prediction
    assert all(np.ptp(c) > 0.1 for c in cams)
    probs = pred.predict_probs(imgs)
    assert (np.argmax(logits, 1) == np.argmax(probs, 1)).all()
    # explaining a fixed class still works and normalizes
    cams2, _ = cam.explain(imgs, class_idx=np.array([1, 1, 1]))
    assert cams2.shape == (3, 32, 32)


# ------------------------------------------------------ variants + mesh

def test_vit_variants_table():
    from irp_tpu.models.vit import vit_model_config

    b16 = vit_model_config("b_16", num_classes=10)
    assert (b16.family, b16.patch_size, b16.embed_dim,
            b16.num_layers) == ("vit", 16, 768, 12)
    assert b16.num_heads == 0  # auto: 768 // 64 = 12
    h14 = vit_model_config("h_14")
    assert h14.num_heads == 16  # head_dim 80: NOT embed_dim // 64
    with pytest.raises(ValueError, match="unknown ViT variant"):
        vit_model_config("g_14")


def test_vit_param_shardings(vit_model):
    from irp_tpu.config import MeshConfig
    from irp_tpu.parallel.mesh import make_mesh, param_shardings

    _, variables = vit_model
    mesh = make_mesh(MeshConfig(data=4, model=2))
    sh = param_shardings(mesh, variables)
    blk = sh["params"]["backbone"]["block0"]
    assert tuple(blk["attn_q"]["kernel"].spec) == (None, "model")
    assert tuple(blk["attn_q"]["bias"].spec) == ("model",)
    assert tuple(blk["attn_out"]["kernel"].spec) == ("model", None)
    assert tuple(blk["attn_out"]["bias"].spec) == ()
    assert tuple(blk["mlp_dense1"]["kernel"].spec) == (None, "model")
    assert tuple(blk["mlp_dense2"]["kernel"].spec) == ("model", None)
    assert tuple(blk["ln1"]["scale"].spec) == ()
    assert tuple(sh["params"]["backbone"]["pos_embedding"].spec) == ()
    assert tuple(sh["params"]["head_dense1"]["kernel"].spec) == (None,
                                                                 "model")


def test_vit_tp_forward_matches_replicated():
    """dp4 x tp2 Megatron-sharded forward must equal the unsharded one
    (GSPMD shardings change layout, never numerics; 2 heads so whole
    heads land on each of the 2 model-axis devices)."""
    from irp_tpu.config import MeshConfig
    from irp_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                       shard_variables)

    cfg = dataclasses.replace(VIT_CFG, embed_dim=128, mlp_dim=256,
                              num_layers=2)
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                       image_size=32)
    variables = _randomized(variables, seed=7)
    x = np.random.RandomState(8).normal(
        size=(4, 32, 32, 3)).astype(np.float32)
    base = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    mesh = make_mesh(MeshConfig(data=4, model=2))
    sharded_vars = shard_variables(mesh, variables)
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    fwd = jax.jit(lambda v, a: model.apply(v, a, train=False))
    out = np.asarray(fwd(sharded_vars, xs))
    np.testing.assert_allclose(out, base, atol=1e-5)


@pytest.mark.slow
def test_vit_fit_e2e_hbm_8dev(tmp_path_factory):
    """Tiny ViT through the full fit stack on the 8-device mesh: shard IO
    -> cache -> HBM-resident dataset -> augment -> train step (no
    batch_stats collection) -> early-stopped fit -> eval."""
    from tests.synth import make_synthetic_shards
    from irp_tpu.config import MeshConfig, TrainConfig
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.parallel.mesh import make_mesh
    from irp_tpu.train import fit

    root = tmp_path_factory.mktemp("vit_e2e")
    meta = make_synthetic_shards(str(root), num_classes=4, per_class=40,
                                 samples_per_shard=50, seed=1, size=40)
    info = analyze_webdataset(meta["shards"])
    data = build_cache(meta["shards"], info.class_names,
                       cache_dir=str(root / "cache"), size=40)
    cfg = dataclasses.replace(VIT_CFG, num_classes=4, image_size=32,
                              dropout_rate=0.1)
    tcfg = TrainConfig(learning_rate=3e-3, weight_decay=1e-5,
                       batch_size=16, max_epochs=3, patience=5,
                       aug_intensity="low", train_samples_per_epoch=None,
                       eval_samples=None, seed=0)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    result = fit(data, data, info, cfg, tcfg, mesh=mesh, mode="hbm")
    assert len(result.history["train_loss"]) == 3
    assert (result.history["train_loss"][-1]
            < result.history["train_loss"][0])
    assert result.best_val_acc > 40.0
