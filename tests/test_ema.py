"""EMA weight averaging (TrainConfig.ema_decay, train/state._params_ema).

Beyond-reference recipe support (the reference has no weight averaging).
The EMA tree rides in opt_state as the last optax-chain slot, so it
scans/donates/checkpoints with the state; fit() evaluates, best-snapshots,
and returns the EMA weights when enabled.  Everything here runs tiny on
the virtual CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irp_tpu.config import ModelConfig, TrainConfig
from irp_tpu.models import init_classifier
from irp_tpu.train.state import create_train_state, ema_params
from irp_tpu.train.step import make_train_step

DECAY = 0.5  # large (1-decay) so drift is visible within 3 steps


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(depth=18, num_classes=4, image_size=32,
                      dropout_rate=0.0, compute_dtype="float32")
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0), 32)
    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.integers(0, 255, (8, 40, 40, 3)), jnp.uint8)
    labels = jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3], jnp.int32)
    return cfg, model, variables, images, labels


def _fresh(model, variables, tcfg, cfg):
    # steps donate their TrainState; give each run its own buffer tree
    return create_train_state(
        model, jax.tree_util.tree_map(jnp.copy, variables), tcfg, cfg, 1)


def test_ema_tracks_post_update_params(setup):
    """ema_t = decay*ema_{t-1} + (1-decay)*params_t over the ACTUAL param
    trajectory (which EMA tracking must not perturb)."""
    cfg, model, variables, images, labels = setup
    step = make_train_step(None, "low", out_size=32,
                           compute_dtype=jnp.float32)
    tcfg_ema = TrainConfig(batch_size=8, learning_rate=1e-2,
                           ema_decay=DECAY)
    tcfg_plain = TrainConfig(batch_size=8, learning_rate=1e-2)
    s_ema = _fresh(model, variables, tcfg_ema, cfg)
    s_plain = _fresh(model, variables, tcfg_plain, cfg)

    leaf = lambda tree: np.asarray(tree["head_dense2"]["kernel"])
    expect = leaf(variables["params"])  # init: ema = params_0
    for i in range(3):
        key = jax.random.PRNGKey(100 + i)
        s_ema, _ = step(s_ema, images, labels, key)
        s_plain, _ = step(s_plain, images, labels, key)
        # EMA must not perturb the underlying optimization trajectory
        np.testing.assert_allclose(leaf(s_ema.params),
                                   leaf(s_plain.params), atol=1e-6)
        expect = DECAY * expect + (1.0 - DECAY) * leaf(s_ema.params)
    got = ema_params(s_ema)
    assert got is not None
    np.testing.assert_allclose(leaf(got), expect, atol=1e-6)
    # and the EMA genuinely lags the live weights
    assert not np.allclose(leaf(got), leaf(s_ema.params), atol=1e-7)


def test_ema_frozen_leaves_stay_bitwise_equal(setup):
    """Frozen-stage leaves get exact-zero updates, so their EMA stays
    bitwise equal to the weights — the full-tree EMA wastes no fidelity."""
    cfg, model, variables, images, labels = setup
    step = make_train_step(None, "low", out_size=32,
                           compute_dtype=jnp.float32)
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-2, ema_decay=0.9)
    s = _fresh(model, variables, tcfg, cfg)
    for i in range(2):
        s, _ = step(s, images, labels, jax.random.PRNGKey(i))
    frozen = s.params["backbone"]["layer1_block0"]["conv1"]["kernel"]
    frozen_ema = ema_params(s)["backbone"]["layer1_block0"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(frozen),
                                  np.asarray(frozen_ema))


def test_decay_zero_keeps_legacy_opt_state_structure(setup):
    """ema_decay=0 (the default): no EMA chain slot, so existing
    checkpoints / resume paths see an unchanged opt_state pytree."""
    cfg, model, variables, *_ = setup
    s = _fresh(model, variables, TrainConfig(batch_size=8), cfg)
    assert ema_params(s) is None
    assert len(s.opt_state) == 2  # (masked(adam-chain), masked(zero))


def test_fit_returns_ema_weights(tmp_path):
    """fit() with ema_decay>0: val metrics are finite, and the returned
    (best-restored) params ARE the EMA tree — for a 1-epoch run with a
    val set, bitwise equal to the final opt_state EMA."""
    from tests.synth import make_synthetic_shards

    from irp_tpu.config import MeshConfig
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.parallel.mesh import make_mesh
    from irp_tpu.train import fit

    meta = make_synthetic_shards(str(tmp_path), num_classes=4, per_class=12,
                                 samples_per_shard=24, seed=4, size=48)
    info = analyze_webdataset(meta["shards"])
    data = build_cache(meta["shards"], info.class_names,
                       cache_dir=str(tmp_path / "cache"), size=48)
    mcfg = ModelConfig(depth=18, num_classes=4, image_size=40,
                       dropout_rate=0.0, compute_dtype="float32")
    tcfg = TrainConfig(batch_size=16, max_epochs=1, learning_rate=1e-3,
                       train_samples_per_epoch=32, eval_samples=32,
                       ema_decay=0.99)
    mesh = make_mesh(MeshConfig(data=4, model=1))
    res = fit(data, data, info, mcfg, tcfg, mesh=mesh, mode="hbm")
    assert np.isfinite(res.history["val_acc"][0])
    ema = ema_params(res.state)
    np.testing.assert_array_equal(
        np.asarray(res.state.params["head_dense2"]["kernel"]),
        np.asarray(ema["head_dense2"]["kernel"]))


def test_ema_batch_stats_track_running_stats(setup):
    """ADVICE r3: BN families track an EMA of batch_stats alongside the
    param EMA — exact recursion over the live running-stat trajectory,
    which the tracking must not perturb."""
    cfg, model, variables, images, labels = setup
    step = make_train_step(None, "low", out_size=32,
                           compute_dtype=jnp.float32)
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-2, ema_decay=DECAY)
    s = _fresh(model, variables, tcfg, cfg)
    s_plain = _fresh(model, variables, TrainConfig(batch_size=8,
                                                   learning_rate=1e-2), cfg)
    assert s.ema_batch_stats is not None
    assert s_plain.ema_batch_stats is None

    leaf = lambda tree: np.asarray(
        tree["backbone"]["layer4_block0"]["bn1"]["mean"])
    expect = leaf(variables["batch_stats"])  # init: ema = stats_0
    for i in range(3):
        key = jax.random.PRNGKey(100 + i)
        s, _ = step(s, images, labels, key)
        s_plain, _ = step(s_plain, images, labels, key)
        np.testing.assert_allclose(leaf(s.batch_stats),
                                   leaf(s_plain.batch_stats), atol=1e-6)
        expect = DECAY * expect + (1.0 - DECAY) * leaf(s.batch_stats)
    np.testing.assert_allclose(leaf(s.ema_batch_stats), expect, atol=1e-6)
    # the stats EMA genuinely lags the live running stats
    assert not np.allclose(leaf(s.ema_batch_stats), leaf(s.batch_stats),
                           atol=1e-9)


def test_vit_family_has_no_batch_stats_ema():
    """No-BN families (ViT) keep ema_batch_stats=None — nothing to track."""
    from irp_tpu.models.vit import vit_model_config

    cfg = vit_model_config("b_16", num_classes=4, image_size=32,
                           compute_dtype="float32")
    import dataclasses

    cfg = dataclasses.replace(cfg, dropout_rate=0.0)
    from irp_tpu.models import init_classifier as init_c

    model, variables = init_c(cfg, jax.random.PRNGKey(0), 32)
    s = create_train_state(model, variables,
                           TrainConfig(batch_size=8, ema_decay=0.9), cfg, 1)
    assert s.ema_batch_stats is None
    assert ema_params(s) is not None  # param EMA still rides in opt_state


def test_fit_eval_view_pairs_ema_params_with_ema_stats(tmp_path):
    """fit() with ema_decay>0 on a BN family returns batch_stats that ARE
    the EMA stats tree, not the live running stats."""
    from tests.synth import make_synthetic_shards

    from irp_tpu.config import MeshConfig
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.parallel.mesh import make_mesh
    from irp_tpu.train import fit

    meta = make_synthetic_shards(str(tmp_path), num_classes=4, per_class=12,
                                 samples_per_shard=24, seed=4, size=48)
    info = analyze_webdataset(meta["shards"])
    data = build_cache(meta["shards"], info.class_names,
                       cache_dir=str(tmp_path / "cache"), size=48)
    mcfg = ModelConfig(depth=18, num_classes=4, image_size=40,
                       dropout_rate=0.0, compute_dtype="float32")
    tcfg = TrainConfig(batch_size=16, max_epochs=1, learning_rate=1e-3,
                       train_samples_per_epoch=32, eval_samples=32,
                       ema_decay=0.5)
    mesh = make_mesh(MeshConfig(data=4, model=1))
    res = fit(data, data, info, mcfg, tcfg, mesh=mesh, mode="hbm")
    leaf = lambda tree: np.asarray(
        tree["backbone"]["layer4_block0"]["bn1"]["mean"])
    np.testing.assert_array_equal(leaf(res.state.batch_stats),
                                  leaf(res.state.ema_batch_stats))


def test_ema_batch_stats_checkpoint_roundtrip(setup, tmp_path):
    """ema_batch_stats rides through Orbax save/restore; a decay=0 save
    keeps the legacy payload (no ema_batch_stats key on disk)."""
    import os

    from irp_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    cfg, model, variables, images, labels = setup
    step = make_train_step(None, "low", out_size=32,
                           compute_dtype=jnp.float32)
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-2, ema_decay=0.9)
    s = _fresh(model, variables, tcfg, cfg)
    s, _ = step(s, images, labels, jax.random.PRNGKey(0))
    path = save_checkpoint(str(tmp_path / "ck"), s)
    template = _fresh(model, variables, tcfg, cfg)
    restored = restore_checkpoint(path, template)
    leaf = lambda tree: np.asarray(
        tree["backbone"]["layer4_block0"]["bn1"]["mean"])
    np.testing.assert_array_equal(leaf(s.ema_batch_stats),
                                  leaf(restored.ema_batch_stats))

    s0 = _fresh(model, variables, TrainConfig(batch_size=8), cfg)
    path0 = save_checkpoint(str(tmp_path / "ck0"), s0, step=7)
    entries = {e.split(".")[0] for e in os.listdir(path0)}
    assert "ema_batch_stats" not in entries


def test_ema_checkpoint_roundtrip(setup, tmp_path):
    """The EMA tree rides in opt_state through Orbax save/restore."""
    from irp_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    cfg, model, variables, images, labels = setup
    step = make_train_step(None, "low", out_size=32,
                           compute_dtype=jnp.float32)
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-2, ema_decay=0.9)
    s = _fresh(model, variables, tcfg, cfg)
    s, _ = step(s, images, labels, jax.random.PRNGKey(0))
    path = save_checkpoint(str(tmp_path / "ck"), s)
    template = _fresh(model, variables, tcfg, cfg)
    restored = restore_checkpoint(path, template)
    np.testing.assert_array_equal(
        np.asarray(ema_params(s)["head_dense2"]["kernel"]),
        np.asarray(ema_params(restored)["head_dense2"]["kernel"]))


def test_recipe_cli_exposes_ema_decay():
    import argparse

    from irp_tpu.cli.model_args import add_train_recipe_args, \
        build_train_base

    p = argparse.ArgumentParser()
    add_train_recipe_args(p)
    base = build_train_base(p.parse_args([]))
    assert base.ema_decay == 0.0  # reference-parity default
    base = build_train_base(p.parse_args(["--ema-decay", "0.999"]))
    assert base.ema_decay == 0.999
