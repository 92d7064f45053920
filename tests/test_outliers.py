"""Outlier suite tests: PCA vs sklearn, kNN vs sklearn, LOF vs sklearn,
UMAP cluster preservation, end-to-end detect pipeline."""

import numpy as np
import pytest

from irp_tpu.data.outliers import (create_embeddings, create_results_dataframe,
                                   detect_outliers, fuzzy_simplicial_set,
                                   knn, local_outlier_factor, pca,
                                   umap_2d)


def _blobs(rng, n_per=50, centers=((0, 0), (8, 8), (-8, 8)), dim=8):
    xs, ys = [], []
    for i, c in enumerate(centers):
        mu = np.zeros(dim)
        mu[0], mu[1] = c
        xs.append(rng.normal(0, 0.6, (n_per, dim)) + mu)
        ys.append(np.full(n_per, i))
    return np.concatenate(xs).astype(np.float32), np.concatenate(ys)


def test_pca_matches_sklearn():
    sk = pytest.importorskip("sklearn.decomposition")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(120, 30)).astype(np.float32)
    ours, comps, mu = pca(x, 5)
    theirs = sk.PCA(n_components=5).fit_transform(x)
    # same subspace up to per-component sign
    for i in range(5):
        dot = np.abs(np.dot(ours[:, i], theirs[:, i]) /
                     (np.linalg.norm(ours[:, i]) *
                      np.linalg.norm(theirs[:, i])))
        assert dot > 0.99, f"component {i} mismatch ({dot})"


def test_knn_matches_sklearn():
    sk = pytest.importorskip("sklearn.neighbors")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(300, 6)).astype(np.float32)
    idx, dist = knn(x, 5, block=128)
    nn = sk.NearestNeighbors(n_neighbors=6).fit(x)
    d_ref, i_ref = nn.kneighbors(x)
    # drop self (first column)
    np.testing.assert_array_equal(idx, i_ref[:, 1:])
    np.testing.assert_allclose(dist, d_ref[:, 1:], atol=1e-3)


def test_lof_matches_sklearn():
    sk = pytest.importorskip("sklearn.neighbors")
    rng = np.random.default_rng(2)
    x = np.concatenate([rng.normal(0, 1, (100, 2)),
                        [[8.0, 8.0]]]).astype(np.float32)  # one outlier
    ours = local_outlier_factor(x, 20)
    ref = sk.LocalOutlierFactor(n_neighbors=20)
    ref.fit(x)
    theirs = -ref.negative_outlier_factor_
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)
    assert np.argmax(ours) == 100  # the planted outlier


def test_umap_preserves_clusters():
    rng = np.random.default_rng(3)
    x, y = _blobs(rng, n_per=40)
    emb = umap_2d(x, y, n_neighbors=10, n_epochs=80, seed=0)
    assert emb.shape == (120, 2)
    assert np.isfinite(emb).all()
    # cluster separation: mean within-class distance << between-class
    within, between = [], []
    for i in range(3):
        pts = emb[y == i]
        within.append(np.linalg.norm(pts - pts.mean(0), axis=1).mean())
    centers = np.stack([emb[y == i].mean(0) for i in range(3)])
    for i in range(3):
        for j in range(i + 1, 3):
            between.append(np.linalg.norm(centers[i] - centers[j]))
    assert min(between) > 2.0 * max(within)


def test_fuzzy_graph_properties():
    rng = np.random.default_rng(4)
    x, _ = _blobs(rng, n_per=30)
    idx, dist = knn(x, 8)
    rows, cols, vals = fuzzy_simplicial_set(idx, dist)
    assert (vals > 0).all() and (vals <= 1.0 + 1e-6).all()
    # symmetry: edge set contains both directions
    pairs = set(zip(rows.tolist(), cols.tolist()))
    sample = list(pairs)[:50]
    assert all((c, r) in pairs for r, c in sample)


def test_umap_supervision_tightens_overlapping_classes():
    """With target_weight supervision, two heavily-overlapping classes
    separate more than without (reference uses supervised UMAP precisely
    for this, data_curation.py:700-706)."""
    rng = np.random.default_rng(7)
    n = 80
    x = rng.normal(0, 1.0, (2 * n, 6)).astype(np.float32)
    x[n:, 0] += 1.0  # heavy overlap
    y = np.array([0] * n + [1] * n)

    def separation(emb):
        c0, c1 = emb[:n].mean(0), emb[n:].mean(0)
        within = (np.linalg.norm(emb[:n] - c0, axis=1).mean()
                  + np.linalg.norm(emb[n:] - c1, axis=1).mean()) / 2
        return np.linalg.norm(c0 - c1) / max(within, 1e-9)

    sup = separation(umap_2d(x, y, n_neighbors=10, n_epochs=60, seed=0))
    unsup = separation(umap_2d(x, None, n_neighbors=10, n_epochs=60,
                               seed=0))
    assert sup > unsup * 1.5, (sup, unsup)


def test_knn_block_boundary():
    """Results identical across block sizes (incl. non-divisible)."""
    rng = np.random.default_rng(8)
    x = rng.normal(size=(130, 5)).astype(np.float32)
    i1, d1 = knn(x, 4, block=130)
    i2, d2 = knn(x, 4, block=64)  # 130 = 64+64+2 (ragged tail)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, atol=1e-5)


def test_detect_outliers_end_to_end():
    rng = np.random.default_rng(5)
    x, y = _blobs(rng, n_per=60)
    # plant an outlier far away, labeled class 0
    x = np.concatenate([x, [[25.0] + [0.0] * 7]]).astype(np.float32)
    y = np.concatenate([y, [0]])
    class_mask, global_mask, scores = detect_outliers(
        x[:, :2], y, per_class_neighbors=20, per_class_contamination=0.05,
        global_neighbors=40, global_contamination=0.03)
    assert class_mask[-1] or global_mask[-1]  # planted outlier flagged
    assert class_mask.sum() <= 0.06 * len(x) + 3
    df = create_results_dataframe(x[:, :2], y, ["a", "b", "c"],
                                  [str(i) for i in range(len(y))],
                                  class_mask, global_mask)
    assert set(df.columns) >= {"x", "y", "class_name", "is_outlier"}
    assert bool(df.is_outlier.iloc[-1])


def test_extract_features_hbm_matches_streamed():
    """The HBM-scanned extraction path (one upload, one compiled sweep)
    must produce the same features in the same order as the per-batch
    streaming path, including a non-divisible tail batch."""
    import jax

    from irp_tpu.config import MeshConfig, ModelConfig
    from irp_tpu.data.outliers import extract_features
    from irp_tpu.data.pipeline import CachedDataset
    from irp_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(11)
    n = 21  # deliberately not a multiple of batch or mesh size
    cached = CachedDataset(
        images=rng.integers(0, 255, (n, 64, 64, 3), dtype=np.uint8),
        labels=rng.integers(0, 3, n).astype(np.int32),
        keys=[str(i) for i in range(n)],
        class_names=("a", "b", "c"))
    cfg = ModelConfig(depth=18, num_classes=3, image_size=56,
                      compute_dtype="float32")
    mesh = make_mesh(MeshConfig(data=4, model=1),
                     devices=jax.devices()[:4])
    f_stream, l1, k1 = extract_features(cached, cfg, batch_size=8)
    f_hbm, l2, k2 = extract_features(cached, cfg, batch_size=8, mesh=mesh)
    assert f_hbm.shape == f_stream.shape == (n, 512)
    assert k1 == k2 and (l1 == l2).all()
    # deterministic eval forward, f32: identical math up to reduction
    # order differences across the two batch groupings
    np.testing.assert_allclose(f_hbm, f_stream, rtol=1e-4, atol=1e-4)


def test_spectral_init_device_matches_scipy():
    """The LOBPCG device path must find the same bottom-of-spectrum
    subspace as scipy's shift-invert eigsh (compared via eigenvalues and
    principal angles, which are rotation/sign-invariant)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    from irp_tpu.data import outliers
    from irp_tpu.data.outliers import spectral_init

    rng = np.random.default_rng(7)
    n, k = 300, 8
    rows = np.repeat(np.arange(n), k)
    cols = rng.integers(0, n, n * k)
    vals = rng.uniform(0.1, 1.0, n * k).astype(np.float32)
    g = sp.coo_matrix((vals, (rows, cols)), shape=(n, n))
    g = (g + g.T).tocoo()
    r, c, v = (g.row.astype(np.int32), g.col.astype(np.int32),
               g.data.astype(np.float32))

    emb_dev = spectral_init(r, c, v, n, dim=2, use_device=True)
    # guard against a vacuous host-vs-host comparison: the device call
    # must actually have used LOBPCG, not silently fallen back
    assert outliers.last_spectral_path == "lobpcg"
    emb_host = spectral_init(r, c, v, n, dim=2, use_device=False)
    assert outliers.last_spectral_path == "eigsh"
    assert emb_dev.shape == emb_host.shape == (n, 2)
    # principal angles between the two 2-D subspaces ~ 0
    qd, _ = np.linalg.qr(emb_dev)
    qh, _ = np.linalg.qr(emb_host)
    sv = np.linalg.svd(qd.T @ qh, compute_uv=False)
    assert sv.min() > 0.99, f"subspaces diverge: cosines {sv}"
