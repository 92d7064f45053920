#!/usr/bin/env python
"""Regenerate examples/workflow.ipynb from the cell sources below.

The notebook mirrors the reference's main.ipynb (the primary interactive
entry point, reconstructed in SURVEY.md from reference README.md:44-62 and
the config-mutation contract): every pipeline stage as a cell, decisions
visible between stages.  Kept as a generator script (a) so the committed
.ipynb never drifts from a reviewed source and (b) because jupyter isn't
installed here — the JSON is assembled by hand.

Run: python tools/make_workflow_notebook.py
Test: tests/test_workflow_notebook.py executes the code cells end-to-end
at tiny scale via the IRP_NB_* env overrides.
"""

import json
import os

MD = "markdown"
CODE = "code"

CELLS = [
    (MD, """\
# Animals-10 TPU workflow

The full pipeline, stage by stage — the irp_tpu equivalent of the
reference's `main.ipynb` (reference README.md:44-52: "run the entire
pipeline step-by-step ... visualize results at each stage and make
decisions on parameters").  Each stage is also available as a CLI
(`run_curation.py`, `run_hyperopt.py`, `run_final.py`, `run_dashboard.py`
— see docs/MIGRATION.md); this notebook is for interactive runs.

Stages: ingest → analyze → clean → outlier removal (TPU) → WebDataset
shards → k-fold hyperopt sweep → study analysis → final training → full
evaluation → artifact browsing.
"""),
    (CODE, """\
import os

# Every knob reads an IRP_NB_* env override so the committed test can run
# this notebook end-to-end at tiny scale; the defaults are the real
# Animals-10 workflow.
KAGGLE_PATH = os.path.expanduser(os.environ.get("IRP_NB_KAGGLE",
                                                "~/animals10"))
WORK_DIR = os.environ.get("IRP_NB_WORKDIR", "./data")
N_TRIALS = int(os.environ.get("IRP_NB_TRIALS", "200"))
K_FOLDS = int(os.environ.get("IRP_NB_FOLDS", "3"))
DEPTH = int(os.environ.get("IRP_NB_DEPTH", "50"))
IMAGE_SIZE = int(os.environ.get("IRP_NB_IMAGE_SIZE", "224"))
TARGET_SIZE = int(os.environ.get("IRP_NB_TARGET_SIZE", "224"))
QUICK = os.environ.get("IRP_NB_QUICK", "0") == "1"
RUN_OUTLIERS = os.environ.get("IRP_NB_OUTLIERS", "1") == "1"
USE_CPU = os.environ.get("IRP_NB_CPU", "0") == "1"
PRETRAINED = os.environ.get("IRP_NB_PRETRAINED") or None  # resnet .pth
SAMPLES_PER_SHARD = int(os.environ.get("IRP_NB_SHARD_SIZE", "1000"))
MIN_RESOLUTION = int(os.environ.get("IRP_NB_MIN_RES", "128"))

RAW_DIR = os.path.join(WORK_DIR, "raw")
CLEAN_DIR = os.path.join(WORK_DIR, "cleaned")
WDS_DIR = os.path.join(WORK_DIR, "webdataset")
CACHE_DIR = os.path.join(WORK_DIR, "cache")
STORAGE = os.path.join(WORK_DIR, "optuna_animals10_kfold.db")
"""),
    (CODE, """\
if USE_CPU:
    import jax
    jax.config.update("jax_platforms", "cpu")

from irp_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

from irp_tpu import tracking
tracking.set_experiment("animals10")

import jax
print("devices:", jax.devices())
"""),
    (MD, """\
## 1. Ingest

Copy the downloaded Kaggle Animals-10 dataset into `raw/`, translating
the Italian class directory names to English (reference
data_curation.py:1132-1243).
"""),
    (CODE, """\
from irp_tpu.data.curation import prepare_animal_dataset

if os.path.isdir(RAW_DIR) and os.listdir(RAW_DIR):
    print(f"{RAW_DIR} already populated; skipping ingest")
else:
    summary = prepare_animal_dataset(KAGGLE_PATH, RAW_DIR)
    assert "error" not in summary, summary
"""),
    (MD, """\
## 2. Analyze

Full statistical pass: class distribution, size/aspect/channel stats,
duplicate hashes, corrupt detection.  Renders the pandas tables and
mirrors the plain-text report + sample-image grid the reference commits
(reference data_curation.py:89-281).
"""),
    (CODE, """\
from irp_tpu.data.curation import analyze_dataset, display_dataset_report

analysis = analyze_dataset(RAW_DIR)
tables = display_dataset_report(
    analysis,
    report_path=os.path.join(WORK_DIR, "dataset_analysis_report.txt"),
    sample_grid_path=os.path.join(WORK_DIR, "sample_images.png"))
"""),
    (MD, """\
## 3. Clean

Rule-based copy-filter: drop grayscale / RGBA / below-min-resolution /
duplicate images; write the cleaning report (reference
data_curation.py:488-635).
"""),
    (CODE, """\
from irp_tpu.data.curation import clean_image_dataset

clean_stats = clean_image_dataset(
    RAW_DIR, CLEAN_DIR, analysis=analysis, min_resolution=MIN_RESOLUTION,
    report_path=os.path.join(WORK_DIR, "dataset_cleaning_report.txt"))
FINAL_SRC = CLEAN_DIR
"""),
    (MD, """\
## 4. Outlier removal (TPU)

Frozen-backbone features for every image in ONE compiled HBM-resident
scan (the reference extracts one image at a time, reference
data_curation.py:674-679), then PCA(50) → supervised UMAP(2) → per-class
+ global LOF, all on-device.  Inspect the plots before accepting the
removal.
"""),
    (CODE, """\
if RUN_OUTLIERS:
    from irp_tpu.cli.curation_cli import load_image_dir_cache
    from irp_tpu.config import ModelConfig
    from irp_tpu.data.curation import get_dataset_info
    from irp_tpu.data.outliers import (create_clean_dataset,
                                       create_embeddings,
                                       create_results_dataframe,
                                       detect_outliers, extract_features,
                                       plot_outliers, plot_umap,
                                       print_summary)
    from irp_tpu.parallel.mesh import make_mesh

    cached = load_image_dir_cache(get_dataset_info(FINAL_SRC))
    mcfg = ModelConfig(depth=DEPTH, image_size=IMAGE_SIZE,
                       pretrained_path=PRETRAINED)
    variables = None
    if PRETRAINED:
        from irp_tpu.models import (init_classifier, load_torch_checkpoint,
                                    merge_pretrained)
        _, variables = init_classifier(mcfg, jax.random.PRNGKey(0),
                                       mcfg.image_size)
        variables = merge_pretrained(variables,
                                     load_torch_checkpoint(PRETRAINED))
    feats, labels_arr, keys = extract_features(cached, mcfg,
                                               variables=variables,
                                               verbose=True,
                                               mesh=make_mesh())
    emb, _ = create_embeddings(feats, labels_arr, verbose=True)
    cmask, gmask, _ = detect_outliers(emb, labels_arr)
    df = create_results_dataframe(emb, labels_arr,
                                  list(cached.class_names), keys,
                                  cmask, gmask)
    df["path"] = keys
    plot_umap(df, os.path.join(WORK_DIR, "umap.png"))
    plot_outliers(df, os.path.join(WORK_DIR, "outliers.png"))
    print_summary(df)
    FINAL_SRC = os.path.join(WORK_DIR, "clean")
    create_clean_dataset(df, CLEAN_DIR, FINAL_SRC)
"""),
    (MD, """\
## 5. WebDataset shards

Resize/center-crop to the target size, balanced per-class test split,
`train-%06d.tar` / `test-%06d.tar` shards, then a decode-and-check pass
(reference data_curation.py:886-1122).
"""),
    (CODE, """\
from irp_tpu.data.curation import process_dataset, verify_webdataset

shard_result = process_dataset(FINAL_SRC, WDS_DIR, test_size=0.2,
                               samples_per_shard=SAMPLES_PER_SHARD,
                               target_size=TARGET_SIZE, seed=42)
verify_webdataset(os.path.join(WDS_DIR, "train-*.tar"),
                  target_size=TARGET_SIZE)
verify_webdataset(os.path.join(WDS_DIR, "test-*.tar"),
                  target_size=TARGET_SIZE)
print(shard_result)
"""),
    (MD, """\
## 6. Shard analysis + decode cache

Label mapping (class order = frequency-descending, exactly the
reference's utility.py:96-116 contract) and inverse-frequency class
weights; then decode every shard ONCE into the uint8 cache the sweep and
final stages reuse.
"""),
    (CODE, """\
import glob

from irp_tpu.data.analyze import analyze_webdataset
from irp_tpu.data.pipeline import build_cache

train_shards = sorted(glob.glob(os.path.join(WDS_DIR, "train-*.tar")))
test_shards = sorted(glob.glob(os.path.join(WDS_DIR, "test-*.tar")))
info = analyze_webdataset(train_shards, verbose=True)
train_cached = build_cache(train_shards, info.class_names,
                           cache_dir=CACHE_DIR)
test_cached = build_cache(test_shards, info.class_names,
                          cache_dir=CACHE_DIR)
print(f"cache ready: {len(train_cached)} train / {len(test_cached)} test")
"""),
    (MD, """\
## 7. Hyperopt sweep

TPE + median pruning + the 3-tier pruning ladder, k-fold CV, SQLite
resume (re-running this cell tops an interrupted study up to N_TRIALS).
The train cache stays HBM-resident for the whole sweep (folds regroup
on-device).
"""),
    (CODE, """\
from irp_tpu.config import HyperoptConfig, ModelConfig
from irp_tpu.hyperopt.objective import HyperoptContext, quick_space
from irp_tpu.hyperopt.runner import run_kfold_optimization

hcfg = HyperoptConfig(n_trials=N_TRIALS, k_folds=K_FOLDS,
                      first_fold_min_acc=0.0 if QUICK else 95.0,
                      storage=STORAGE, study_name="animals10_kfold",
                      seed=42)
model_base = ModelConfig(depth=DEPTH, num_classes=info.num_classes,
                         image_size=IMAGE_SIZE,
                         pretrained_path=PRETRAINED)
ctx = HyperoptContext(cached=train_cached, info=info, hcfg=hcfg,
                      model_base=model_base,
                      space_fn=quick_space if QUICK else None)
study = run_kfold_optimization(ctx, n_trials=N_TRIALS, verbose=True)
"""),
    (MD, """\
## 8. Study analysis

Stats, parameter importances, optimization-history /
parallel-coordinate plots, and the best trial's epoch curves read back
from tracking (reference hyperopt.py:498-752).  `python
run_dashboard.py study --storage <db>` gives the live terminal view.
"""),
    (CODE, """\
from irp_tpu.hyperopt.analysis import (enhanced_optuna_analysis,
                                       visualize_best_trial_metrics)

analysis_dir = os.path.join(WORK_DIR, "study_analysis")
enhanced_optuna_analysis(study, analysis_dir)
visualize_best_trial_metrics(study, analysis_dir)
print("plots in", analysis_dir)
"""),
    (MD, """\
## 9. Final training + full evaluation

Retrain with the best hyperparameters on ALL train shards for the
study's recommended epoch count; uncapped test eval; per-class P/R/F1 +
confusion matrix + prediction galleries into the tracking store
(reference final.py:158-412).  Interrupted runs resume from the Orbax
checkpoints bit-exactly (`resume=True`).
"""),
    (CODE, """\
from irp_tpu.train.final import train_final_model

final_result = train_final_model(
    study, train_cached, test_cached, info, model_base=model_base,
    checkpoint_dir=os.path.join(WORK_DIR, "checkpoints"),
    experiment="animals10")
assert final_result is not None
print(f"Final test accuracy: {final_result.test_acc:.2f}%")
"""),
    (MD, """\
## 10. Browse artifacts

Pull the final run's PNGs (confusion matrix, correct/incorrect
galleries) out of the tracking store (reference final.py:415-537).
"""),
    (CODE, """\
from irp_tpu.train.final import display_model_visualizations

artifact_paths = display_model_visualizations(
    out_dir=os.path.join(WORK_DIR, "final_artifacts"))
for p in artifact_paths:
    print(p)
"""),
    (MD, """\
## Next steps

- **Dashboards**: `python run_dashboard.py study --storage
  <db>` / `... runs --experiment animals10`; the `mlruns/` layout is
  MLflow-FileStore-compatible, so a stock `mlflow ui` renders it too.
- **Batch prediction**: `irp-predict --weights <final .npz/.pth>
  --images <dir>` (add `--gradcam <dir>` for localization overlays).
- **Online serving**: `irp-serve --weights <artifact>` — micro-batched
  HTTP daemon with `/predict`, `/explain`, `/metrics`.
- **AOT export**: `irp-predict --weights w.npz --export m.irpx` — a
  one-file compiled artifact that serves with no model code.
"""),
]


def build():
    cells = []
    for kind, src in CELLS:
        lines = src.splitlines(keepends=True)
        cell = {"cell_type": kind, "metadata": {}, "source": lines}
        if kind == CODE:
            cell["outputs"] = []
            cell["execution_count"] = None
        cells.append(cell)
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "workflow.ipynb")
    with open(out, "w") as f:
        json.dump(build(), f, indent=1)
        f.write("\n")
    print(f"wrote {out}")
