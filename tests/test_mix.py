"""mixup / CutMix: ops/mix.py math, loss composition, step integration.

Beyond-reference recipe support (the reference has no batch mixing);
everything checked on the virtual CPU mesh with tiny shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irp_tpu.models.classifier import (mixed_weighted_cross_entropy,
                                       weighted_cross_entropy)
from irp_tpu.ops.mix import mix_batch


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, size=8), jnp.int32)
    return x, y


def test_disabled_is_identity(batch):
    x, y = batch
    xm, ya, yb, lam = mix_batch(x, y, jax.random.PRNGKey(0), 0.0, 0.0)
    assert xm is x and ya is y
    assert float(lam) == 1.0
    np.testing.assert_array_equal(np.asarray(yb), np.asarray(y)[::-1])


def test_mixup_is_exact_lerp_with_reversed_batch(batch):
    x, y = batch
    xm, ya, yb, lam = mix_batch(x, y, jax.random.PRNGKey(1),
                                mixup_alpha=0.4)
    lam = float(lam)
    assert 0.0 <= lam <= 1.0
    expect = lam * np.asarray(x) + (1 - lam) * np.asarray(x)[::-1]
    np.testing.assert_allclose(np.asarray(xm), expect, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(y))
    np.testing.assert_array_equal(np.asarray(yb), np.asarray(y)[::-1])


def test_mixup_lam_distribution_varies_per_key(batch):
    x, y = batch
    lams = {float(mix_batch(x, y, jax.random.PRNGKey(k),
                            mixup_alpha=0.2)[3]) for k in range(8)}
    assert len(lams) > 4  # Beta draws, not a constant


def test_cutmix_patch_is_rectangular_and_lam_matches_area(batch):
    x, y = batch
    for k in range(6):
        xm, ya, yb, lam = mix_batch(x, y, jax.random.PRNGKey(k),
                                    cutmix_alpha=1.0)
        xm, xs = np.asarray(xm), np.asarray(x)
        xr = xs[::-1]
        # provenance: every pixel comes from x or reversed-x, nothing else
        from_other = np.isclose(xm, xr, atol=1e-6).all(axis=(0, 3))
        from_self = np.isclose(xm, xs, atol=1e-6).all(axis=(0, 3))
        assert (from_other | from_self).all()
        # the patch is one axis-aligned rectangle: its row/col supports
        # are contiguous and the patch is their outer product
        rows = from_other.any(axis=1)
        cols = from_other.any(axis=0)
        if rows.any():
            r = np.flatnonzero(rows)
            c = np.flatnonzero(cols)
            assert (np.diff(r) == 1).all() and (np.diff(c) == 1).all()
            np.testing.assert_array_equal(from_other,
                                          np.outer(rows, cols))
        # lam re-derived from the realized patch area
        area_frac = from_other.mean()
        np.testing.assert_allclose(float(lam), 1.0 - area_frac, atol=1e-6)


def test_both_alphas_picks_one_transform_per_step(batch):
    x, y = batch
    saw_cut = saw_mix = False
    for k in range(12):
        xm, _, _, _ = mix_batch(x, y, jax.random.PRNGKey(k),
                                mixup_alpha=0.8, cutmix_alpha=1.0)
        xm, xs = np.asarray(xm), np.asarray(x)
        pure = (np.isclose(xm, xs, atol=1e-6) |
                np.isclose(xm, xs[::-1], atol=1e-6)).all()
        saw_cut |= pure
        saw_mix |= not pure
    assert saw_cut and saw_mix


def test_partner_reverses_within_each_shard():
    from irp_tpu.ops.mix import _partner

    arr = jnp.arange(8, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(_partner(arr, 1)),
                                  np.arange(8)[::-1])
    np.testing.assert_array_equal(np.asarray(_partner(arr, 4)),
                                  [1, 0, 3, 2, 5, 4, 7, 6])
    x = jnp.arange(24, dtype=jnp.float32).reshape(8, 3)
    want = np.asarray(x).reshape(2, 4, 3)[:, ::-1].reshape(8, 3)
    np.testing.assert_array_equal(np.asarray(_partner(x, 2)), want)
    with pytest.raises(ValueError):
        _partner(arr, 3)  # 8 % 3 != 0


def test_mixup_pairs_within_local_shard(batch):
    x, y = batch  # B = 8
    xm, ya, yb, lam = mix_batch(x, y, jax.random.PRNGKey(1),
                                mixup_alpha=0.4, num_shards=4)
    lam = float(lam)
    xs = np.asarray(x)
    part = xs.reshape(4, 2, *xs.shape[1:])[:, ::-1].reshape(xs.shape)
    np.testing.assert_allclose(np.asarray(xm),
                               lam * xs + (1 - lam) * part, atol=1e-6)
    yp = np.asarray(y).reshape(4, 2)[:, ::-1].reshape(-1)
    np.testing.assert_array_equal(np.asarray(yb), yp)


def test_mix_pairing_emits_no_collectives_on_dp_mesh():
    """ADVICE r3 (medium): the pairing must be genuinely shard-local.
    Compile the mixing path with the batch sharded over a dp-8 mesh and
    assert the optimized HLO has no cross-chip traffic; the counterfactual
    GLOBAL reverse on the same sharded batch DOES emit a collective
    (anchors the HLO-text probe against op renames)."""
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from irp_tpu.config import MeshConfig
    from irp_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data=8, model=1))
    sh = NamedSharding(mesh, P("data"))
    x = jax.device_put(jnp.ones((16, 8, 8, 3), jnp.float32), sh)
    y = jax.device_put(jnp.zeros((16,), jnp.int32), sh)

    @functools.partial(jax.jit, out_shardings=(sh, sh))
    def mixed(x, y, key):
        out, _, yb, _ = mix_batch(x, y, key, 0.4, 1.0, num_shards=8)
        return out, yb

    txt = mixed.lower(x, y, jax.random.PRNGKey(0)).compile().as_text()
    for op in ("collective-permute", "all-to-all", "all-gather"):
        assert op not in txt, f"shard-local mixing emitted {op}"

    @functools.partial(jax.jit, out_shardings=sh)
    def global_flip(x):
        return jnp.flip(x, axis=0)

    bad = global_flip.lower(x).compile().as_text()
    assert any(op in bad for op in
               ("collective-permute", "all-to-all", "all-gather")), \
        "HLO probe lost its anchor: a global reverse showed no collective"


def test_both_alphas_single_blend_matches_branches(batch):
    """The fused blend (one full-batch intermediate) must reproduce the
    two-branch semantics exactly: each key yields either the mixup lerp
    or the CutMix paste of the same partner."""
    x, y = batch
    xs = np.asarray(x)
    xr = xs[::-1]
    for k in range(8):
        xm, _, _, lam = mix_batch(x, y, jax.random.PRNGKey(k),
                                  mixup_alpha=0.8, cutmix_alpha=1.0)
        xm, lam = np.asarray(xm), float(lam)
        as_lerp = np.allclose(xm, lam * xs + (1 - lam) * xr, atol=1e-6)
        provenance = (np.isclose(xm, xs, atol=1e-6) |
                      np.isclose(xm, xr, atol=1e-6)).all()
        assert as_lerp or provenance


def test_mixed_loss_reduces_to_plain_ce_at_lam_1():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(16, 5)), jnp.float32)
    ya = jnp.asarray(rng.integers(0, 5, 16), jnp.int32)
    yb = jnp.asarray(rng.integers(0, 5, 16), jnp.int32)
    w = jnp.asarray([0.5, 1.5, 1.0, 2.0, 0.8], jnp.float32)
    plain = weighted_cross_entropy(logits, ya, w, 0.1)
    mixed = mixed_weighted_cross_entropy(logits, ya, yb, jnp.float32(1.0),
                                         w, 0.1)
    np.testing.assert_allclose(float(mixed), float(plain), rtol=1e-6)


def test_mixed_loss_is_convex_combination():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(16, 5)), jnp.float32)
    ya = jnp.asarray(rng.integers(0, 5, 16), jnp.int32)
    yb = jnp.asarray(rng.integers(0, 5, 16), jnp.int32)
    lam = jnp.float32(0.3)
    got = mixed_weighted_cross_entropy(logits, ya, yb, lam)
    want = 0.3 * float(weighted_cross_entropy(logits, ya)) + \
        0.7 * float(weighted_cross_entropy(logits, yb))
    np.testing.assert_allclose(float(got), want, rtol=1e-6)


def test_train_step_with_mixing_runs_and_updates(batch):
    """A streaming train step with mixup+cutmix produces finite loss and
    changes trainable params; alphas=0 stays bit-identical to the
    historical two-way key split (the RNG-stream compatibility
    contract in step._augment_mix)."""
    from irp_tpu.config import ModelConfig, TrainConfig
    from irp_tpu.models import init_classifier
    from irp_tpu.train.state import create_train_state
    from irp_tpu.train.step import (_augment_normalize, _loss_and_updates,
                                    make_train_step)

    cfg = ModelConfig(depth=18, num_classes=4, image_size=32,
                      dropout_rate=0.0, compute_dtype="float32")
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0), 32)
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-2)
    images = jnp.asarray(
        np.random.default_rng(3).integers(0, 255, (8, 40, 40, 3)), jnp.uint8)
    labels = jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3], jnp.int32)
    key = jax.random.PRNGKey(5)

    def fresh_state():
        # the jitted steps donate their TrainState; give each one its own
        # buffer tree so `variables` stays readable
        return create_train_state(
            model, jax.tree_util.tree_map(jnp.copy, variables), tcfg, cfg, 1)

    before = np.asarray(variables["params"]["head_dense2"]["kernel"])
    step_mix = make_train_step(None, "low", out_size=32,
                               compute_dtype=jnp.float32,
                               mixup_alpha=0.4, cutmix_alpha=1.0)
    new_state, metrics = step_mix(fresh_state(), images, labels, key)
    assert np.isfinite(float(metrics["loss"]))
    after = new_state.params["head_dense2"]["kernel"]
    assert not np.allclose(before, np.asarray(after))

    # disabled path: identical to the pre-mixing computation (2-way split)
    step_off = make_train_step(None, "low", out_size=32,
                               compute_dtype=jnp.float32)
    got_state, got_metrics = step_off(fresh_state(), images, labels, key)
    aug_key, dropout_key = jax.random.split(key)
    x = _augment_normalize(images, aug_key, "low", 32, jnp.float32)
    want_state, want_metrics = _loss_and_updates(
        fresh_state(), x, labels, dropout_key, None)
    # jit vs eager fusion order differs at float ulp scale; a changed key
    # split would shift the augmentation stream and diverge by O(1)
    np.testing.assert_allclose(np.asarray(got_metrics["loss"]),
                               np.asarray(want_metrics["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_state.params["head_dense2"]["kernel"]),
        np.asarray(want_state.params["head_dense2"]["kernel"]),
        atol=1e-5)


def test_fit_with_mixing_hbm_path(tmp_path):
    """fit() threads mixup/cutmix into the scanned-epoch program."""
    from tests.synth import make_synthetic_shards

    from irp_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    from irp_tpu.parallel.mesh import make_mesh
    from irp_tpu.train import fit

    meta = make_synthetic_shards(str(tmp_path), num_classes=4, per_class=12,
                                 samples_per_shard=24, seed=2, size=48)
    info = analyze_webdataset(meta["shards"])
    data = build_cache(meta["shards"], info.class_names,
                       cache_dir=str(tmp_path / "cache"), size=48)
    mcfg = ModelConfig(depth=18, num_classes=4, image_size=40,
                       dropout_rate=0.0, compute_dtype="float32")
    tcfg = TrainConfig(batch_size=16, max_epochs=2, learning_rate=1e-3,
                       train_samples_per_epoch=32, eval_samples=32,
                       mixup_alpha=0.2, cutmix_alpha=1.0)
    mesh = make_mesh(MeshConfig(data=4, model=1))
    res = fit(data, data, info, mcfg, tcfg, mesh=mesh, mode="hbm")
    assert len(res.history["train_loss"]) == 2
    assert all(np.isfinite(v) for v in res.history["train_loss"])


def test_recipe_cli_args_build_train_base():
    """--mixup-alpha/--cutmix-alpha/--label-smoothing land in the
    TrainConfig recipe base; defaults stay reference-parity off."""
    import argparse

    from irp_tpu.cli.model_args import (add_train_recipe_args,
                                        build_train_base)

    p = argparse.ArgumentParser()
    add_train_recipe_args(p)
    base = build_train_base(p.parse_args(
        ["--mixup-alpha", "0.2", "--cutmix-alpha", "1.0",
         "--label-smoothing", "0.1"]))
    assert base.mixup_alpha == 0.2
    assert base.cutmix_alpha == 1.0
    assert base.label_smoothing == 0.1
    off = build_train_base(p.parse_args([]))
    assert (off.mixup_alpha, off.cutmix_alpha, off.label_smoothing) == \
        (0.0, 0.0, 0.0)


def test_train_base_threads_through_sweep(monkeypatch, tmp_path):
    """HyperoptContext.train_base recipe fields (mixing, smoothing) reach
    every per-trial TrainConfig via dataclasses.replace, and nonzero
    knobs are logged on the trial's tracking run."""
    from tests.synth import make_synthetic_shards

    from irp_tpu import tracking
    from irp_tpu.config import (HyperoptConfig, ModelConfig, TrainConfig)
    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.pipeline import build_cache
    import irp_tpu.hyperopt.objective as objective_mod
    from irp_tpu.hyperopt import HyperoptContext, run_kfold_optimization

    meta = make_synthetic_shards(str(tmp_path), num_classes=3, per_class=8,
                                 samples_per_shard=12, seed=0, size=32)
    info = analyze_webdataset(meta["shards"])
    cached = build_cache(meta["shards"], info.class_names,
                         cache_dir=str(tmp_path / "cache"), size=32)
    tracking.set_tracking_uri(str(tmp_path / "mlruns"))
    tracking.set_experiment("mix_recipe_sweep")

    captured = []

    class _FakeResult:
        best_val_acc = 50.0

    def fake_fit(train_cached, val_cached, info_, model_cfg, train_cfg,
                 **kw):
        captured.append(train_cfg)
        if kw.get("on_epoch_end") is not None:
            kw["on_epoch_end"](0, 50.0)
        return _FakeResult()

    monkeypatch.setattr(objective_mod, "fit", fake_fit)
    base = TrainConfig(mixup_alpha=0.2, cutmix_alpha=1.0,
                       label_smoothing=0.05)
    hcfg = HyperoptConfig(n_trials=1, k_folds=2, first_fold_min_acc=0.0,
                          storage=str(tmp_path / "s.db"),
                          study_name="mix", seed=0)
    ctx = HyperoptContext(
        cached=cached, info=info, hcfg=hcfg,
        model_base=ModelConfig(depth=18, num_classes=3, image_size=32,
                               compute_dtype="float32"),
        train_base=base, mode="stream", reuse_hbm_pool=False)
    study = run_kfold_optimization(ctx, n_trials=1, verbose=False)
    assert len(captured) == 2  # one fake fit per fold
    for cfg in captured:
        assert cfg.mixup_alpha == 0.2
        assert cfg.cutmix_alpha == 1.0
        assert cfg.label_smoothing == 0.05
        # searched fields still come from the trial, not the base
        assert cfg.batch_size in (8, 16, 32)

    run_id = study.best_trial.user_attrs["tracking_run_id"]
    params = tracking.TrackingClient().get_run(run_id)["params"]
    assert float(params["mixup_alpha"]) == 0.2
    assert float(params["cutmix_alpha"]) == 1.0


def test_train_base_threads_through_final(monkeypatch, tmp_path):
    """train_final_model(train_base=...) seeds the final TrainConfig's
    recipe fields while the best trial's searched values win."""
    import irp_tpu.train.final as final_mod
    from irp_tpu import tracking
    from irp_tpu.config import TrainConfig

    tracking.set_tracking_uri(str(tmp_path / "mlruns"))

    class _FakeTrial:
        params = {"max_epochs": 4, "learning_rate": 1e-3,
                  "weight_decay": 1e-4, "batch_size": 8,
                  "dropout_rate": 0.1, "augmentation_intensity": "low",
                  "patience": 3}
        user_attrs = {}

    class _FakeStudy:
        best_trial = _FakeTrial()

        def get_trials(self):
            return [self.best_trial]

    class _Stop(RuntimeError):
        pass

    captured = []

    def fake_fit(train_cached, val_cached, info_, model_cfg, train_cfg,
                 **kw):
        captured.append(train_cfg)
        raise _Stop()

    monkeypatch.setattr(final_mod, "fit", fake_fit)
    base = TrainConfig(mixup_alpha=0.4, label_smoothing=0.1)
    import types

    info = types.SimpleNamespace(num_classes=3)
    with pytest.raises(_Stop):
        final_mod.train_final_model(
            _FakeStudy(), None, None, info, train_base=base,
            experiment="mix_recipe_final", verbose=False)
    (cfg,) = captured
    assert cfg.mixup_alpha == 0.4
    assert cfg.cutmix_alpha == 0.0
    assert cfg.label_smoothing == 0.1
    assert cfg.learning_rate == 1e-3  # searched value wins over the base
    assert cfg.scheduler_step == "epoch"  # final-stage quirk preserved
