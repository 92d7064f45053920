"""Gradient accumulation (TrainConfig.grad_accum_steps,
train/step._accum_loss_and_updates).

Beyond-reference capability: each optimizer step's forward/backward runs
as k sequential micro-batches inside the jitted step, so activation
memory scales with batch/k while the summed micro-gradients equal the
full-batch gradient (micro-losses are normalized by the full batch's
denominator, known upfront).

Exactness caveat (standard across frameworks): when BatchNorm layers
normalize by BATCH statistics in the forward (trainable-stage BN under
bn_stats_mode='trainable_only', or all BN under 'all'), each micro-batch
is normalized by its own moments, so accum != full-batch bitwise.  With
a per-sample-independent forward (frozen BN in inference form, or
BN-free families like ViT/ConvNeXt) the update is exact to fp
reassociation — both cases are pinned below.  Everything here runs tiny
on the virtual CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irp_tpu.config import ModelConfig, TrainConfig
from irp_tpu.models import init_classifier
from irp_tpu.train.state import create_train_state, ema_params
from irp_tpu.train.step import make_train_step

# head_only: every backbone BN runs in inference form (running stats), so
# the forward is per-sample independent and accumulation must be EXACT.
HEAD_ONLY = dict(depth=18, num_classes=4, image_size=32, head_only=True,
                 dropout_rate=0.0, compute_dtype="float32")


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(**HEAD_ONLY)
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0), 32)
    rng = np.random.default_rng(13)
    images = jnp.asarray(rng.integers(0, 255, (8, 40, 40, 3)), jnp.uint8)
    labels = jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3], jnp.int32)
    return cfg, model, variables, images, labels


def _fresh(model, variables, tcfg, cfg):
    # steps donate their TrainState; give each run its own buffer tree
    return create_train_state(
        model, jax.tree_util.tree_map(jnp.copy, variables), tcfg, cfg, 1)


def _run(model, variables, cfg, images, labels, accum, steps=2, **step_kw):
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-2)
    step = make_train_step(compute_dtype=jnp.float32, out_size=32,
                           grad_accum=accum, **step_kw)
    s = _fresh(model, variables, tcfg, cfg)
    metrics = None
    for i in range(steps):
        s, metrics = step(s, images, labels, jax.random.PRNGKey(50 + i))
    return s, metrics


def test_accum_matches_full_batch_update(setup):
    """With a per-sample-independent forward, accum=2 and accum=4 produce
    the same params, loss, and accuracy as the plain full-batch step (up
    to fp reassociation)."""
    cfg, model, variables, images, labels = setup
    s1, m1 = _run(model, variables, cfg, images, labels, accum=1)
    leaf = lambda s: np.asarray(s.params["head_dense2"]["kernel"])
    for k in (2, 4):
        sk, mk = _run(model, variables, cfg, images, labels, accum=k)
        # Adam's rsqrt amplifies fp reassociation slightly over 2 steps
        np.testing.assert_allclose(leaf(sk), leaf(s1), rtol=2e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(float(mk["loss"]), float(m1["loss"]),
                                   rtol=1e-6)
        assert float(mk["accuracy"]) == pytest.approx(
            float(m1["accuracy"]), abs=1e-6)


def test_accum_matches_with_class_weights_and_smoothing(setup):
    """The full-batch-denominator trick stays exact under torch-semantics
    class weighting (weighted-mean denominator) + label smoothing."""
    cfg, model, variables, images, labels = setup
    cw = np.asarray([0.5, 2.0, 1.0, 3.5], np.float32)
    kw = dict(class_weights=cw, label_smoothing=0.1)
    s1, m1 = _run(model, variables, cfg, images, labels, accum=1, **kw)
    s2, m2 = _run(model, variables, cfg, images, labels, accum=2, **kw)
    np.testing.assert_allclose(
        np.asarray(s2.params["head_dense2"]["kernel"]),
        np.asarray(s1.params["head_dense2"]["kernel"]),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-6)


def test_accum_matches_with_mixing(setup):
    """mixup/CutMix runs on the WHOLE batch before the split, so the
    mixed sample stream is identical and the update still matches."""
    cfg, model, variables, images, labels = setup
    kw = dict(mixup_alpha=0.4, cutmix_alpha=1.0)
    s1, m1 = _run(model, variables, cfg, images, labels, accum=1, **kw)
    s2, m2 = _run(model, variables, cfg, images, labels, accum=2, **kw)
    np.testing.assert_allclose(
        np.asarray(s2.params["head_dense2"]["kernel"]),
        np.asarray(s1.params["head_dense2"]["kernel"]),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-6)


def test_accum_bn_batch_stats_caveat():
    """Trainable-stage BN normalizes each micro-batch by its own moments
    (the standard accumulation caveat): the trajectory stays close to the
    full-batch one but is NOT bitwise, and accum runs are deterministic."""
    cfg = ModelConfig(depth=18, num_classes=4, image_size=32,
                      dropout_rate=0.0, compute_dtype="float32")
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0), 32)
    rng = np.random.default_rng(13)
    images = jnp.asarray(rng.integers(0, 255, (8, 40, 40, 3)), jnp.uint8)
    labels = jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3], jnp.int32)
    s1, m1 = _run(model, variables, cfg, images, labels, accum=1, steps=1)
    s2, m2 = _run(model, variables, cfg, images, labels, accum=2, steps=1)
    s2b, m2b = _run(model, variables, cfg, images, labels, accum=2, steps=1)
    leaf = lambda s: np.asarray(s.params["head_dense2"]["kernel"])
    # deterministic: identical accum runs agree bitwise
    np.testing.assert_array_equal(leaf(s2), leaf(s2b))
    assert float(m2["loss"]) == float(m2b["loss"])
    # close to the full-batch trajectory, but not exact (micro-batch BN
    # moments over 4 samples shift a random-init net's loss by ~15%)
    np.testing.assert_allclose(leaf(s2), leaf(s1), rtol=0.5, atol=0.02)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=0.3)


def test_accum_shard_local_on_mesh():
    """On a dp=4 mesh, the (D, k, blk) chunking keeps the micro-batches
    shard-local and the epoch-scan result matches accum=1 exactly (the
    head_only forward is per-sample independent)."""
    from irp_tpu.config import MeshConfig
    from irp_tpu.data.pipeline import CachedDataset, EpochSampler, HBMDataset
    from irp_tpu.parallel.mesh import make_mesh, shard_variables
    from irp_tpu.train.step import make_hbm_epoch_step

    cfg = ModelConfig(**HEAD_ONLY)
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0), 32)
    mesh = make_mesh(MeshConfig(data=4, model=1))
    variables = shard_variables(mesh, variables)
    tcfg = TrainConfig(batch_size=16, learning_rate=1e-2)

    rng = np.random.default_rng(7)
    n, px = 32, 40
    data = CachedDataset(
        images=rng.integers(0, 255, (n, px, px, 3)).astype(np.uint8),
        labels=(np.arange(n) % 4).astype(np.int32),
        keys=[str(i) for i in range(n)],
        class_names=("a", "b", "c", "d"))
    results = {}
    for accum in (1, 2):
        hbm = HBMDataset(data, mesh, shuffle_seed=3)
        sampler = EpochSampler(hbm, tcfg.batch_size, seed=3)
        offsets = jnp.asarray(sampler.epoch_offsets(2))
        step = make_hbm_epoch_step(mesh, sampler.per_device,
                                   compute_dtype=jnp.float32, out_size=32,
                                   grad_accum=accum)
        s = _fresh(model, variables, tcfg, cfg)
        s, metrics = step(s, hbm.images, hbm.labels, offsets,
                          jax.random.PRNGKey(1), jnp.float32(0.0))
        results[accum] = (np.asarray(s.params["head_dense2"]["kernel"]),
                          np.asarray(metrics["loss"]))
    np.testing.assert_allclose(results[2][0], results[1][0], rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(results[2][1], results[1][1], rtol=1e-6)


def test_accum_divisibility_errors(setup):
    cfg, model, variables, images, labels = setup
    step = make_train_step(compute_dtype=jnp.float32, out_size=32,
                           grad_accum=3)  # 8 % 3 != 0
    s = _fresh(model, variables, TrainConfig(batch_size=8), cfg)
    with pytest.raises(ValueError, match="divisible"):
        step(s, images, labels, jax.random.PRNGKey(0))

    from irp_tpu.train.fit import fit

    with pytest.raises(ValueError, match="grad_accum"):
        fit(None, None, None, cfg,
            TrainConfig(batch_size=8, grad_accum_steps=3))


def test_accum_composes_with_ema(setup):
    """EMA advances once per OPTIMIZER step (not per micro-batch): after
    one accum=2 step, ema = decay*init + (1-decay)*params_1."""
    cfg, model, variables, images, labels = setup
    decay = 0.5
    tcfg = TrainConfig(batch_size=8, learning_rate=1e-2, ema_decay=decay)
    step = make_train_step(compute_dtype=jnp.float32, out_size=32,
                           grad_accum=2)
    s = _fresh(model, variables, tcfg, cfg)
    s, _ = step(s, images, labels, jax.random.PRNGKey(0))
    leaf = lambda t: np.asarray(t["head_dense2"]["kernel"])
    expect = decay * leaf(variables["params"]) + \
        (1.0 - decay) * leaf(s.params)
    np.testing.assert_allclose(leaf(ema_params(s)), expect, atol=1e-6)


def test_fit_with_grad_accum(tmp_path):
    """fit() end-to-end with grad_accum_steps=2 on the 4-device mesh:
    trains, evaluates, and the history is finite."""
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
    tcfg = TrainConfig(batch_size=16, max_epochs=2, learning_rate=1e-3,
                       train_samples_per_epoch=32, eval_samples=32,
                       grad_accum_steps=2)
    mesh = make_mesh(MeshConfig(data=4, model=1))
    res = fit(data, data, info, mcfg, tcfg, mesh=mesh, mode="hbm")
    assert all(np.isfinite(v) for v in res.history["train_loss"])
    assert np.isfinite(res.best_val_acc)


def test_recipe_cli_exposes_grad_accum():
    import argparse

    from irp_tpu.cli.model_args import add_train_recipe_args, \
        build_train_base

    p = argparse.ArgumentParser()
    add_train_recipe_args(p)
    base = build_train_base(p.parse_args([]))
    assert base.grad_accum_steps == 1  # reference-parity default
    base = build_train_base(p.parse_args(["--grad-accum", "4"]))
    assert base.grad_accum_steps == 4
