#!/usr/bin/env python
"""Curation-stage benchmarks (VERDICT r2 next-round #4).

Quantifies the TPU rebuild of the reference's curation hot spots:

1. feature extraction imgs/sec/chip — batched jitted ResNet50 features
   (irp_tpu/data/outliers.py:extract_features) vs the reference's
   one-image-at-a-time loop (reference functions/data_curation.py:674-679);
2. UMAP pipeline wall-clock at Animals-10 scale (default 26,000 x 2048
   features): PCA(50) -> TPU kNN -> fuzzy graph -> spectral init ->
   jitted SGD layout; plus per-class+global LOF;
3. native-C++ vs PIL decode-cache build throughput
   (irp_tpu/data/pipeline.py:build_cache, native/decode.cpp thread pool).

Prints a JSON line per measurement and a markdown table at the end
(paste target: BENCH.md curation section).  Run on the real chip for
headline numbers; --cpu gives a small-scale correctness pass.

Usage:
  python tools/bench_curation.py                 # full scale, real chip
  python tools/bench_curation.py --cpu --tiny    # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

RESULTS = []


def emit(name, **kv):
    row = {"bench": name, **kv}
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def bench_feature_extraction(n_imgs, batch_size, depth, image_size, reps):
    import numpy as np

    from irp_tpu.config import ModelConfig
    from irp_tpu.data.pipeline import CachedDataset
    from irp_tpu.data.outliers import extract_features

    rng = np.random.default_rng(0)
    # production geometry: the decode cache is 256px for a 224px model
    # input (8/7), so extraction does a real center-crop, not an identity
    px = max(image_size * 8 // 7, image_size)
    cached = CachedDataset(
        images=rng.integers(0, 255, (n_imgs, px, px, 3), dtype=np.uint8),
        labels=rng.integers(0, 10, n_imgs).astype(np.int32),
        keys=[str(i) for i in range(n_imgs)],
        class_names=tuple(str(i) for i in range(10)))
    cfg = ModelConfig(depth=depth, num_classes=10, image_size=image_size,
                      compute_dtype="bfloat16")
    from irp_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    # init weights ONCE outside the timed region: with `variables` passed
    # in, extract_features skips the per-call device random-init of the
    # full backbone, and its memoized jit programs make every rep after
    # the warmup a pure execution — the timed number is extraction, not
    # setup (review finding on an earlier version of this harness)
    import jax

    from irp_tpu.models import init_classifier

    _, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                   image_size=image_size)
    feats = None
    for label, kw in (("streamed", {}), ("hbm_scanned", {"mesh": mesh})):
        # warmup (compile + first execution)
        extract_features(cached, cfg, batch_size=batch_size,
                         variables=variables, **kw)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            feats, _, _ = extract_features(cached, cfg,
                                           batch_size=batch_size,
                                           variables=variables, **kw)
            best = min(best, time.perf_counter() - t0)
        emit("feature_extraction", mode=label,
             imgs_per_sec=round(n_imgs / best, 1),
             n_imgs=n_imgs, batch_size=batch_size, depth=depth,
             image_size=image_size, secs=round(best, 2),
             feat_dim=int(feats.shape[1]))

    # Device-resident compute rate: both modes above include the
    # host->device corpus transfer in every rep, which through the axon
    # tunnel (~5 MB/s observed) dwarfs the chip work by 10-100x.  Time
    # the compiled scan alone — dataset pre-uploaded, completion forced
    # by a scalar readback that data-depends on every step (bench.py's
    # tunnel-safe methodology) — to report what extraction costs once
    # pixels are resident (the sweep/curation steady state: the cache is
    # uploaded once and reused).
    import jax.numpy as jnp

    from irp_tpu.data.outliers import _feature_epoch_program
    from irp_tpu.data.pipeline import HBMEvalSet

    ev = HBMEvalSet(cached, mesh, batch_size)
    program = _feature_epoch_program(cfg, ev.per_device, image_size)
    offsets = jnp.asarray(ev.offsets)
    def run_once():
        out = program(variables, ev.images, offsets)
        # slice on-device, read back ONE scalar (a whole-array readback
        # would re-measure the tunnel download, not the chip)
        return float(out[-1].ravel()[-1])

    run_once()  # warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run_once()
        best = min(best, time.perf_counter() - t0)
    emit("feature_extraction", mode="hbm_resident_compute",
         imgs_per_sec=round(n_imgs / best, 1), n_imgs=n_imgs,
         batch_size=batch_size, depth=depth, image_size=image_size,
         secs=round(best, 2), feat_dim=int(feats.shape[1]))
    return feats


def bench_umap_lof(n, dim, reps):
    import numpy as np

    from irp_tpu.data.outliers import (fuzzy_simplicial_set, knn,
                                       local_outlier_factor, optimize_layout,
                                       pca, spectral_init,
                                       categorical_intersection)

    rng = np.random.default_rng(1)
    # blobby features (UMAP on pure noise converges pathologically slowly)
    centers = rng.normal(0, 4.0, (10, dim)).astype(np.float32)
    labels = rng.integers(0, 10, n).astype(np.int32)
    feats = centers[labels] + rng.normal(0, 1.0, (n, dim)).astype(np.float32)

    best = {}
    lof = None
    for _ in range(max(reps, 1)):  # best-of-reps per stage

        def timed(key, fn):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best[key] = min(best.get(key, float("inf")), dt)
            return out

        proj = np.asarray(timed("pca", lambda: pca(feats, 50)[0]))
        idx, dist = timed("knn", lambda: knn(proj, k=15))
        rows, cols, vals = timed(
            "graph", lambda: fuzzy_simplicial_set(np.asarray(idx),
                                                  np.asarray(dist)))
        vals = categorical_intersection(rows, cols, vals, labels)
        emb = timed("spectral",
                    lambda: spectral_init(rows, cols, vals, n))
        emb = timed("layout",
                    lambda: optimize_layout(np.asarray(emb, np.float32),
                                            rows, cols, vals, n_epochs=200))
        lof = timed("lof",
                    lambda: local_outlier_factor(np.asarray(emb, np.float32),
                                                 n_neighbors=75))

    emit("umap_lof", n=n, dim=dim, reps=max(reps, 1),
         pca_s=round(best["pca"], 2),
         knn_s=round(best["knn"], 2), graph_s=round(best["graph"], 2),
         spectral_s=round(best["spectral"], 2),
         layout_s=round(best["layout"], 2),
         lof_s=round(best["lof"], 2),
         total_s=round(sum(best.values()), 2),
         lof_flagged=int((np.asarray(lof) > 1.5).sum()))


def bench_cache_build(n_imgs, size, tmp_root, src_size=None):
    """``src_size``: source JPEG resolution.  Default 1.25x the cache size
    so both decoders do a REAL resize (Kaggle images are mixed-size; an
    exactly-target-size synthetic corpus would measure the identity
    shortcut instead)."""
    import shutil

    from synth import make_synthetic_shards

    from irp_tpu.data.analyze import analyze_webdataset
    from irp_tpu.data.jpeg import native_decoder_available
    from irp_tpu.data.pipeline import build_cache

    # key the corpus by its parameters — a stale dir from another scale
    # must never be silently reused
    if src_size is None:
        src_size = max(int(size * 1.25), size + 16)
    shard_dir = os.path.join(tmp_root,
                             f"bench_shards_{n_imgs}_{src_size}")
    if not os.path.isdir(shard_dir):
        per_class = max(n_imgs // 10, 1)
        make_synthetic_shards(shard_dir, num_classes=10, per_class=per_class,
                              samples_per_shard=1000, seed=7, size=src_size)
    import glob as _glob
    shards = sorted(_glob.glob(os.path.join(shard_dir, "train-*.tar")))
    info = analyze_webdataset(shards)
    n = info.total_samples

    out = {}
    for label, use_native in (("pil", False), ("native", True)):
        if use_native and not native_decoder_available():
            emit("cache_build", decoder="native", skipped="no libirpdecode")
            continue
        cache_dir = os.path.join(tmp_root, f"bench_cache_{label}")
        shutil.rmtree(cache_dir, ignore_errors=True)
        t0 = time.perf_counter()
        build_cache(shards, info.class_names, cache_dir=cache_dir,
                    size=size, use_native=use_native)
        dt = time.perf_counter() - t0
        out[label] = dt
        emit("cache_build", decoder=label, imgs_per_sec=round(n / dt, 1),
             n_imgs=n, size=size, secs=round(dt, 1))
    if "pil" in out and "native" in out:
        emit("cache_build_speedup",
             native_vs_pil=round(out["pil"] / out["native"], 2))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--n-imgs", type=int, default=4096,
                   help="feature-extraction corpus (HBM-bounded; rate is "
                        "steady-state so 4k suffices)")
    p.add_argument("--umap-n", type=int, default=26000)
    p.add_argument("--umap-dim", type=int, default=2048)
    p.add_argument("--cache-imgs", type=int, default=4000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--tmp", default="/tmp/irp_curation_bench")
    p.add_argument("--skip", default="",
                   help="comma list: features,umap,cache")
    args = p.parse_args(argv)
    if args.tiny:
        args.n_imgs, args.umap_n, args.umap_dim = 128, 1500, 256
        args.cache_imgs, args.batch_size = 300, 32
        args.depth, args.image_size, args.reps = 18, 64, 1
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from irp_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    os.makedirs(args.tmp, exist_ok=True)
    skip = set(args.skip.split(",")) if args.skip else set()

    if "features" not in skip:
        bench_feature_extraction(args.n_imgs, args.batch_size, args.depth,
                                 args.image_size, args.reps)
    if "umap" not in skip:
        bench_umap_lof(args.umap_n, args.umap_dim, args.reps)
    if "cache" not in skip:
        bench_cache_build(args.cache_imgs, 256 if not args.tiny else 96,
                          args.tmp)

    # dump BEFORE the table loop (which strips the 'bench' key for
    # display) so the JSON artifact keeps each row's identity
    with open(os.path.join(args.tmp, "curation_bench.json"), "w") as f:
        json.dump(RESULTS, f, indent=1)
    print("\n| measurement | value |")
    print("|---|---|")
    for r in RESULTS:
        rest = {k: v for k, v in r.items() if k != "bench"}
        print(f"| {r['bench']} | "
              + ", ".join(f"{k}={v}" for k, v in rest.items()) + " |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
