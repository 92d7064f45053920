"""HBMFoldPool: one device-resident copy of the train cache serves every
fold of every trial via on-device regrouping (no per-fit re-uploads).

Correctness bar: after select_fold, the per-device train prefixes must
contain EXACTLY the fold-train samples (no val leakage, no pad
duplicates, each retained sample once), verified by reading the device
arrays back — bookkeeping alone could lie.
"""

import numpy as np
import pytest

import jax

from irp_tpu.config import MeshConfig
from irp_tpu.data.analyze import analyze_webdataset
from irp_tpu.data.pipeline import (HBMFoldPool, build_cache)
from irp_tpu.parallel.mesh import make_mesh
from tests.synth import make_synthetic_shards


@pytest.fixture(scope="module")
def pool_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("pool_shards")
    meta = make_synthetic_shards(str(root), num_classes=3, per_class=40,
                                 samples_per_shard=15, seed=3, size=48)
    info = analyze_webdataset(meta["shards"])
    cached = build_cache(meta["shards"], info.class_names, size=48)
    mesh = make_mesh(MeshConfig(data=4, model=1),
                     devices=jax.devices()[:4])
    return cached, info, mesh, meta["shards"]


def _folds(shards, k):
    return [shards[i::k] for i in range(k)]


def _prefix_samples(pool, view):
    """Read back the device train prefixes; return their (image-bytes ->
    count) identity via matching against the source cache."""
    imgs = np.asarray(pool.images)[:, :view.local_count]
    labs = np.asarray(pool.labels)[:, :view.local_count]
    return imgs.reshape(-1, *imgs.shape[2:]), labs.reshape(-1)


def test_fold_prefix_matches_subset_exactly(pool_setup):
    cached, info, mesh, shards = pool_setup
    pool = HBMFoldPool(cached, mesh, seed=0)
    folds = _folds(shards, 3)
    for f in range(3):
        train_shards = [s for i in range(3) if i != f for s in folds[i]]
        view = pool.select_fold(train_shards)
        subset = cached.subset_by_shards(train_shards)

        # bookkeeping: prefix slots hold exactly the subset's sample ids
        d, lt = pool.data_axis_size, view.local_count
        prefix_ids = pool._slot_sample[:, :lt].reshape(-1)
        assert not pool._slot_pad[:, :lt].any(), "pad slot in train prefix"
        assert len(set(prefix_ids)) == len(prefix_ids), "duplicate sample"
        wanted = set(np.nonzero(np.isin(
            cached.shard_ids,
            [i for i, p in enumerate(cached.shard_paths)
             if p in set(train_shards)]))[0])
        got = set(int(i) for i in prefix_ids)
        assert got <= wanted, "val-fold sample leaked into train prefix"
        dropped = len(wanted) - len(got)
        assert dropped == pool.last_dropped
        # imbalance bound: < one sample per shard per device
        assert dropped <= len(train_shards) * d

        # ground truth: device arrays really hold those samples' pixels
        imgs, labs = _prefix_samples(pool, view)
        src = np.asarray(cached.images)
        for j in range(0, len(prefix_ids), 17):  # spot-check every 17th
            gid = int(prefix_ids[j])
            np.testing.assert_array_equal(imgs[j], src[gid])
            assert labs[j] == cached.labels[gid]
        assert len(imgs) == len(subset) - dropped


def test_reselect_and_reshuffle_keep_integrity(pool_setup):
    cached, info, mesh, shards = pool_setup
    pool = HBMFoldPool(cached, mesh, seed=1)
    folds = _folds(shards, 3)
    t0 = [s for i in (1, 2) for s in folds[i]]
    view = pool.select_fold(t0)
    ids_before = set(pool._slot_sample[:, :view.local_count].reshape(-1))

    # prefix-only reshuffle keeps the same sample set
    view.local_reshuffle(7)
    ids_after = set(pool._slot_sample[:, :view.local_count].reshape(-1))
    assert ids_before == ids_after
    imgs, labs = _prefix_samples(pool, view)
    pid = pool._slot_sample[:, :view.local_count].reshape(-1)
    src = np.asarray(cached.images)
    for j in range(0, len(pid), 29):
        np.testing.assert_array_equal(imgs[j], src[int(pid[j])])

    # switching folds invalidates the old view...
    t1 = [s for i in (0, 2) for s in folds[i]]
    view2 = pool.select_fold(t1)
    with pytest.raises(RuntimeError, match="stale"):
        _ = view.images
    # ...and coming BACK to the first fold still yields fold-only samples
    # (the retained subset may differ: overflow drops depend on shuffle)
    view3 = pool.select_fold(t0)
    ids_back = set(int(i) for i in
                   pool._slot_sample[:, :view3.local_count].reshape(-1))
    wanted = set(np.nonzero(np.isin(
        cached.shard_ids,
        [i for i, p in enumerate(cached.shard_paths)
         if p in set(t0)]))[0].tolist())
    assert ids_back <= wanted
    assert len(ids_back) == len(wanted) - pool.last_dropped
    del view2


def test_sweep_uploads_dataset_once(tmp_path, monkeypatch):
    """A 3-trial x 2-fold sweep with the pool on must upload the full
    image cache exactly once (the pool), vs 6 fold-subset uploads off."""
    from irp_tpu.config import HyperoptConfig, ModelConfig
    from irp_tpu.hyperopt.objective import HyperoptContext, quick_space
    from irp_tpu.hyperopt.runner import run_kfold_optimization
    from irp_tpu import tracking

    tracking.set_tracking_uri(str(tmp_path / "mlruns"))
    meta = make_synthetic_shards(str(tmp_path / "s"), num_classes=2,
                                 per_class=48, samples_per_shard=16,
                                 seed=5, size=48)
    info = analyze_webdataset(meta["shards"])
    cached = build_cache(meta["shards"], info.class_names, size=48)
    mesh = make_mesh(MeshConfig(data=2, model=1),
                     devices=jax.devices()[:2])

    big_uploads = []
    real_put = jax.device_put

    def counting_put(x, *a, **kw):
        nbytes = getattr(x, "nbytes", 0)
        if getattr(x, "dtype", None) == np.uint8 and nbytes > 100_000:
            big_uploads.append(nbytes)
        return real_put(x, *a, **kw)

    monkeypatch.setattr(jax, "device_put", counting_put)

    def run_sweep(reuse, tag):
        big_uploads.clear()
        ctx = HyperoptContext(
            cached=cached, info=info,
            hcfg=HyperoptConfig(n_trials=3, k_folds=2,
                                first_fold_min_acc=0.0,
                                storage=str(tmp_path / f"{tag}.db")),
            model_base=ModelConfig(depth=18, num_classes=2, image_size=40,
                                   compute_dtype="float32"),
            mesh=mesh, space_fn=quick_space,
            train_samples_per_epoch=32, eval_samples=16,
            reuse_hbm_pool=reuse)
        study = run_kfold_optimization(ctx, n_trials=3, verbose=False)
        assert study.best_value is not None
        return list(big_uploads), ctx

    pooled, pooled_ctx = run_sweep(True, "pooled")
    unpooled, _ = run_sweep(False, "unpooled")
    # Train-side uploads (eval sets are 16 imgs = 110,592 B; fold-train is
    # 48 imgs = 331,776 B; the pool is 96 imgs = 663,552 B): the pool path
    # must upload train pixels exactly ONCE, at full-dataset size.
    dataset_bytes = 96 * 48 * 48 * 3
    train_thresh = 150_000
    assert [b for b in pooled if b > train_thresh] == [dataset_bytes]
    # the runner must release the device-resident pool after the sweep
    # (the final stage builds its own HBMDataset; a surviving pool would
    # double pixel HBM), keeping lightweight stats for reporting
    assert pooled_ctx._hbm_pool is None
    # upload_bytes = image pixels + int32 labels (96 * 4 B)
    assert pooled_ctx.hbm_pool_stats["upload_bytes"] == dataset_bytes + 96 * 4
    # legacy path: one fold-train upload per fold per trial (3 trials x 2)
    unpooled_train = [b for b in unpooled if b > train_thresh]
    assert len(unpooled_train) >= 6
    assert sum(unpooled_train) >= 2 * dataset_bytes


def test_pool_oom_falls_back_to_per_fit_uploads(tmp_path, monkeypatch):
    """A full-cache pool upload that OOMs must not fail the sweep: the
    objective disables the pool for the rest of the sweep and every trial
    completes on the legacy per-fit upload path (the legacy path uploads
    only the (k-1)/k fold subset, which may still fit)."""
    from irp_tpu.config import HyperoptConfig, ModelConfig
    from irp_tpu.data import pipeline
    from irp_tpu.hyperopt.objective import HyperoptContext, quick_space
    from irp_tpu.hyperopt.runner import run_kfold_optimization
    from irp_tpu import tracking

    tracking.set_tracking_uri(str(tmp_path / "mlruns"))
    meta = make_synthetic_shards(str(tmp_path / "s"), num_classes=2,
                                 per_class=24, samples_per_shard=12,
                                 seed=7, size=48)
    info = analyze_webdataset(meta["shards"])
    cached = build_cache(meta["shards"], info.class_names, size=48)
    mesh = make_mesh(MeshConfig(data=2, model=1),
                     devices=jax.devices()[:2])

    calls = []

    def oom_select_fold(self, shards):
        calls.append(len(shards))
        raise RuntimeError(
            "RESOURCE_EXHAUSTED: Out of memory allocating 999 bytes")

    monkeypatch.setattr(pipeline.HBMFoldPool, "select_fold",
                        oom_select_fold)
    ctx = HyperoptContext(
        cached=cached, info=info,
        hcfg=HyperoptConfig(n_trials=2, k_folds=2, first_fold_min_acc=0.0,
                            storage=str(tmp_path / "oom.db")),
        model_base=ModelConfig(depth=18, num_classes=2, image_size=40,
                               compute_dtype="float32"),
        mesh=mesh, space_fn=quick_space,
        train_samples_per_epoch=32, eval_samples=16)
    study = run_kfold_optimization(ctx, n_trials=2, verbose=False)

    assert len(calls) == 1, "pool must be disabled after the first OOM"
    assert ctx.reuse_hbm_pool is False
    assert ctx._hbm_pool is None, "OOM fallback must release the pool"
    trials = study.get_trials()
    assert len(trials) == 2
    assert study.best_value is not None and study.best_value > -float("inf")


def test_pool_empty_device_fold_falls_back_per_fold(tmp_path, monkeypatch):
    """select_fold raising ValueError (some device holds zero samples of a
    fold — tiny/imbalanced shard layouts) must fall back to the per-fit
    upload for THAT fold only: the trial completes and the pool stays
    enabled for subsequent folds/trials (unlike the OOM path, which
    disables it for the sweep)."""
    from irp_tpu.config import HyperoptConfig, ModelConfig
    from irp_tpu.data import pipeline
    from irp_tpu.hyperopt.objective import HyperoptContext, quick_space
    from irp_tpu.hyperopt.runner import run_kfold_optimization
    from irp_tpu import tracking

    tracking.set_tracking_uri(str(tmp_path / "mlruns"))
    meta = make_synthetic_shards(str(tmp_path / "s"), num_classes=2,
                                 per_class=24, samples_per_shard=12,
                                 seed=11, size=48)
    info = analyze_webdataset(meta["shards"])
    cached = build_cache(meta["shards"], info.class_names, size=48)
    mesh = make_mesh(MeshConfig(data=2, model=1),
                     devices=jax.devices()[:2])

    calls = []
    real_select = pipeline.HBMFoldPool.select_fold

    def flaky_select_fold(self, shards):
        calls.append(len(shards))
        if len(calls) == 1:  # first fold of the first trial only
            raise ValueError("a device holds no samples of this fold")
        return real_select(self, shards)

    monkeypatch.setattr(pipeline.HBMFoldPool, "select_fold",
                        flaky_select_fold)
    ctx = HyperoptContext(
        cached=cached, info=info,
        hcfg=HyperoptConfig(n_trials=2, k_folds=2, first_fold_min_acc=0.0,
                            storage=str(tmp_path / "edge.db")),
        model_base=ModelConfig(depth=18, num_classes=2, image_size=40,
                               compute_dtype="float32"),
        mesh=mesh, space_fn=quick_space,
        train_samples_per_epoch=32, eval_samples=16)
    study = run_kfold_optimization(ctx, n_trials=2, verbose=False)

    assert len(calls) == 4, "pool must stay enabled after the edge fold"
    assert ctx.reuse_hbm_pool is True
    trials = study.get_trials()
    assert len(trials) == 2
    assert study.best_value is not None and study.best_value > -float("inf")


def test_fit_oom_with_pool_releases_and_retries(tmp_path, monkeypatch):
    """An OOM raised INSIDE fit() while the pool is resident must not score
    the trial -inf outright: pool + eval set + params/activations is the
    sweep's memory high-water mark, so the objective releases the pool
    sweep-wide and retries the fold on the legacy per-fit upload (which
    holds only (k-1)/k of the dataset).  Only a second, pool-free OOM means
    the trial itself cannot fit -> -inf (reference hyperopt.py:313-319)."""
    from irp_tpu.config import HyperoptConfig, ModelConfig
    from irp_tpu.hyperopt import objective as objective_mod
    from irp_tpu.hyperopt.objective import HyperoptContext, quick_space
    from irp_tpu.hyperopt.runner import run_kfold_optimization
    from irp_tpu import tracking

    tracking.set_tracking_uri(str(tmp_path / "mlruns"))
    meta = make_synthetic_shards(str(tmp_path / "s"), num_classes=2,
                                 per_class=24, samples_per_shard=12,
                                 seed=13, size=48)
    info = analyze_webdataset(meta["shards"])
    cached = build_cache(meta["shards"], info.class_names, size=48)
    mesh = make_mesh(MeshConfig(data=2, model=1),
                     devices=jax.devices()[:2])

    real_fit = objective_mod.fit
    calls = []

    def oom_first_pooled_fit(*args, **kwargs):
        calls.append(kwargs.get("hbm_train") is not None)
        if len(calls) == 1:
            assert kwargs.get("hbm_train") is not None, \
                "first fold-fit of the sweep should ride the pool"
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory allocating 999 bytes")
        return real_fit(*args, **kwargs)

    monkeypatch.setattr(objective_mod, "fit", oom_first_pooled_fit)
    ctx = HyperoptContext(
        cached=cached, info=info,
        hcfg=HyperoptConfig(n_trials=2, k_folds=2, first_fold_min_acc=0.0,
                            storage=str(tmp_path / "fitoom.db")),
        model_base=ModelConfig(depth=18, num_classes=2, image_size=40,
                               compute_dtype="float32"),
        mesh=mesh, space_fn=quick_space,
        train_samples_per_epoch=32, eval_samples=16)
    with pytest.warns(UserWarning, match="releasing the pool"):
        study = run_kfold_optimization(ctx, n_trials=2, verbose=False)

    assert ctx.reuse_hbm_pool is False
    assert ctx._hbm_pool is None, "fit-OOM fallback must release the pool"
    # retry + remaining folds/trials all ran WITHOUT the pool
    assert calls[0] is True and all(c is False for c in calls[1:])
    trials = study.get_trials()
    assert len(trials) == 2
    assert study.best_value is not None and study.best_value > -float("inf")
    for t in trials:
        assert t.value > -float("inf"), \
            "trials must complete on the legacy path after the pool OOM"
