#!/usr/bin/env python
"""Batch prediction / serving CLI: score images with a trained model.

The reference has no deployment entry point — its trained model is only
run inside the final-eval notebook cell (reference functions/final.py:27-63).
This CLI is the missing production path: load a final-weights artifact
(.npz or torch .pth), compile one padded-batch TPU forward, and score
image files or WebDataset shards at full chip throughput.

  # score a directory of images, top-3 per image, CSV out
  python run_predict.py --weights final_weights.npz \
      --images './photos/**/*.jpg' --classes classes.json \
      --topk 3 --out preds.csv

  # bulk re-score a shard set (prints accuracy when shards carry labels)
  python run_predict.py --weights final_weights.npz \
      --shards './data/webdataset/test-*.tar'
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import sys
import time


def _collect_image_paths(pattern: str):
    if os.path.isdir(pattern):
        exts = (".jpg", ".jpeg", ".png", ".bmp", ".gif", ".webp")
        return sorted(
            os.path.join(root, f)
            for root, _, files in os.walk(pattern)
            for f in files if f.lower().endswith(exts))
    return sorted(glob.glob(pattern, recursive=True))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", required=True,
                   help="final-weights artifact (.npz or torch .pth)")
    src = p.add_mutually_exclusive_group()
    src.add_argument("--images", help="image file glob or directory")
    src.add_argument("--shards", help="WebDataset shard glob")
    p.add_argument("--export", default=None, metavar="PATH.irpx",
                   help="instead of scoring: AOT-export the compiled "
                        "inference program (StableHLO, irp_tpu/export.py) "
                        "+ weights + metadata to one .irpx artifact that "
                        "serves with no model code (run_serve/run_predict "
                        "accept it as --weights); lowered for CPU and TPU")
    p.add_argument("--export-source-size", type=int, default=None,
                   help="input geometry the exported program accepts "
                        "(default: the 256px cache contract, or the eval "
                        "crop if larger)")
    p.add_argument("--export-batch-buckets", default=None,
                   metavar="SPEC",
                   help="bake a padded-shape ladder into the artifact "
                        "('auto' = 1,2,4,...,batch-size, or a comma "
                        "list ending at batch-size): one program per "
                        "bucket, so run_serve.py serves the .irpx with "
                        "live-weights online efficiency (a lone request "
                        "costs a batch-1 program).  Size --batch-size "
                        "for online traffic when using this")
    p.add_argument("--export-no-gradcam", action="store_true",
                   help="omit the Grad-CAM explain program from the "
                        "artifact (smaller file; /explain and --gradcam "
                        "then need the .npz/.pth weights)")
    p.add_argument("--classes", default=None,
                   help="class names: JSON file or comma-separated list")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--image-size", type=int, default=None,
                   help="eval crop size; default = the npz artifact's "
                        "embedded training-time value, else 224 (models "
                        "trained at a non-default size need this for "
                        ".pth / pre-metadata artifacts)")
    p.add_argument("--topk", type=int, default=1)
    p.add_argument("--out", default=None, help="CSV output path")
    p.add_argument("--gradcam", default=None, metavar="DIR",
                   help="write Grad-CAM overlay PNGs (which regions drove "
                        "each prediction, irp_tpu/explain.py) to DIR; "
                        "--images mode only")
    p.add_argument("--decoder", choices=["auto", "pil"], default="auto")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all visible devices")
    p.add_argument("--tta", action="store_true",
                   help="test-time augmentation: average the softmax over "
                   "the identity and the horizontal flip inside the one "
                   "compiled forward (~2x device time per image; with "
                   "--export the TTA forward is baked into the artifact). "
                   "Not applicable when serving an existing .irpx")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    # pure arg validation — before the expensive weight load
    if not args.export and not (args.images or args.shards):
        print("error: one of --images / --shards is required "
              "(or --export)", file=sys.stderr)
        return 2
    if args.export and (args.images or args.shards or args.gradcam):
        print("error: --export is a standalone mode", file=sys.stderr)
        return 2
    if args.export and args.data_parallel:
        print("error: --export bakes a single-device program; "
              "drop --data-parallel", file=sys.stderr)
        return 2
    if args.gradcam and not args.images:
        print("error: --gradcam requires --images mode", file=sys.stderr)
        return 2

    from irp_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from irp_tpu.infer import load_class_names, load_predictor

    class_names = load_class_names(args.classes) if args.classes else None

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from irp_tpu.config import MeshConfig
        from irp_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(MeshConfig())

    export_buckets = None
    if args.export_batch_buckets:
        if not args.export:
            print("error: --export-batch-buckets needs --export",
                  file=sys.stderr)
            return 2
        if args.weights.lower().endswith(".irpx"):
            print("error: re-exporting an .irpx is not supported; "
                  "export the bucket ladder from the .npz/.pth weights",
                  file=sys.stderr)
            return 2
        from irp_tpu.infer import serving_buckets
        try:
            export_buckets = serving_buckets(args.export_batch_buckets,
                                             args.batch_size)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2

    if args.tta and args.weights.lower().endswith(".irpx"):
        # bake-time property: fine when the artifact already flip-
        # averages (a no-op), a clean error when it does not
        from irp_tpu.export import tta_preflight_error
        err = tta_preflight_error(args.weights, "--tta --export")
        if err:
            print(f"error: {err}", file=sys.stderr)
            return 2
    try:
        predictor = load_predictor(args.weights, class_names=class_names,
                                   batch_size=args.batch_size, mesh=mesh,
                                   image_size=args.image_size,
                                   pad_buckets=export_buckets,
                                   tta=args.tta)
    except ValueError as e:  # wrong-length --classes, bad format, ...
        print(f"error: {e}", file=sys.stderr)
        return 2
    if predictor.source_size is not None:  # an .irpx: shapes are baked
        if args.batch_size != predictor.batch_size:
            print(f"note: the artifact fixes batch_size="
                  f"{predictor.batch_size}; --batch-size "
                  f"{args.batch_size} is ignored", file=sys.stderr)
        if args.image_size is not None:
            print("note: the artifact's compiled crop is "
                  f"{predictor.model.config.image_size}; --image-size "
                  "is ignored", file=sys.stderr)
        if predictor.source_size != 256 and not args.export:
            print(f"error: this artifact accepts only "
                  f"{predictor.source_size}x{predictor.source_size} "
                  "sources, but --images/--shards decode to 256x256; "
                  "use the Python API or re-export with the default "
                  "source size", file=sys.stderr)
            return 2
        if args.gradcam and getattr(predictor, "_cam_call", None) is None:
            print("error: this artifact carries no Grad-CAM program; "
                  "re-export with gradcam=True (the default), or point "
                  "--weights at the .npz/.pth artifact", file=sys.stderr)
            return 2
    # (a wrong-length --classes list is rejected at Predictor
    # construction — the except ValueError above reports it)

    if args.export:
        if getattr(predictor.model, "apply", None) is None:
            print("error: --weights is already an exported artifact",
                  file=sys.stderr)
            return 2
        from irp_tpu.export import export_predictor

        out = export_predictor(predictor, args.export,
                               source_size=args.export_source_size,
                               gradcam=not args.export_no_gradcam)
        from irp_tpu.export import read_export_meta

        exp_meta = read_export_meta(out)
        source = exp_meta["source_size"]
        if source != 256:
            print(f"note: this artifact accepts only {source}x{source} "
                  "sources; run_serve/run_predict decode to the 256px "
                  "cache contract, so it is usable only through the "
                  "Python API (Predictor.predict_probs)", file=sys.stderr)
        print(json.dumps({
            "exported": out, "bytes": os.path.getsize(out),
            "batch_size": predictor.batch_size, "source_size": source,
            "gradcam_batch_size": exp_meta.get("gradcam_batch_size"),
            "num_classes": predictor.num_classes}))
        return 0

    truth = None
    t0 = time.perf_counter()
    if args.images:
        paths = _collect_image_paths(args.images)
        if not paths:
            print(f"error: no images match {args.images}", file=sys.stderr)
            return 2
        if args.gradcam:
            # ONE pass: explain() already computes the logits, and using
            # them for the CSV guarantees the overlay explains exactly
            # the reported class (a second predict() forward could
            # argmax differently on near-ties).  Chunked like
            # predict_paths — host memory stays O(chunk), overlays
            # stream out as each chunk finishes.
            # TTA predictors: the explain program is single-view, so the
            # CSV scores come from the predictor's own (flip-averaged)
            # forward and the overlay is pinned to that reported class
            # via class_idx — the scores honor the TTA contract and the
            # map explains exactly the reported class, at the cost of one
            # extra forward per chunk.
            from PIL import Image

            from irp_tpu.explain import (GradCAM, center_crop_u8,
                                         overlay_cam)
            from irp_tpu.infer import PredictionResult, softmax_np

            os.makedirs(args.gradcam, exist_ok=True)
            gradcam = GradCAM(predictor)
            crop = predictor.model.config.image_size
            chunk = max(predictor.batch_size, 1024)
            probs_parts = []
            for start in range(0, len(paths), chunk):
                part = paths[start:start + chunk]
                decoded = predictor.decode_paths(part, decoder=args.decoder)
                if predictor.tta:
                    part_probs = predictor.predict_probs(decoded)
                    cams, _ = gradcam.explain(
                        decoded,
                        class_idx=np.argmax(part_probs, axis=1).astype(
                            np.int32))
                    probs_parts.append(part_probs)
                else:
                    cams, logits = gradcam.explain(decoded)
                    probs_parts.append(softmax_np(logits))
                cropped = center_crop_u8(decoded, crop)
                for j, key in enumerate(part):
                    # index prefix: distinct source dirs may share
                    # basenames
                    name = os.path.splitext(os.path.basename(key))[0]
                    Image.fromarray(
                        overlay_cam(cropped[j], cams[j])).save(
                        os.path.join(args.gradcam,
                                     f"{start + j:04d}_{name}_gradcam.png"))
            probs = np.concatenate(probs_parts, axis=0)
            # predictor.class_names, not the CLI arg: the artifact's
            # embedded names must survive when --classes is absent
            result = PredictionResult(
                labels=np.argmax(probs, axis=1).astype(np.int32),
                probs=probs, class_names=predictor.class_names, keys=paths)
            print(f"wrote {len(result)} Grad-CAM overlays to "
                  f"{args.gradcam}")
        else:
            result = predictor.predict_paths(paths, decoder=args.decoder)
    else:
        result, truth = predictor.predict_shards(args.shards,
                                                 decoder=args.decoder)
        if len(result) == 0:
            print(f"error: no samples in {args.shards}", file=sys.stderr)
            return 2
    elapsed = time.perf_counter() - t0

    k = min(max(1, args.topk), predictor.num_classes)
    top_idx, top_prob = result.topk(k)
    names = (result.class_names if result.class_names is not None
             else [str(i) for i in range(predictor.num_classes)])

    rows = []
    for i, key in enumerate(result.keys or range(len(result))):
        row = {"key": key, "label": int(result.labels[i]),
               "label_name": names[result.labels[i]],
               "prob": f"{result.probs[i, result.labels[i]]:.6f}"}
        for j in range(k):
            row[f"top{j + 1}"] = names[top_idx[i, j]]
            row[f"top{j + 1}_prob"] = f"{top_prob[i, j]:.6f}"
        rows.append(row)

    if args.out:
        with open(args.out, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
        print(f"wrote {len(rows)} predictions to {args.out}")
    else:
        for row in rows[:20]:
            print(f"{row['key']}: {row['label_name']} ({row['prob']})")
        if len(rows) > 20:
            print(f"... {len(rows) - 20} more (use --out for the full set)")

    summary = {"n": len(rows), "elapsed_s": round(elapsed, 3),
               "imgs_per_sec": round(len(rows) / max(elapsed, 1e-9), 1)}
    if truth is not None:
        summary["accuracy"] = round(
            float(np.mean(result.labels == truth)), 4)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
