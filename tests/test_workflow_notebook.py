"""Execute examples/workflow.ipynb end-to-end at tiny scale.

The notebook is the irp_tpu equivalent of the reference's main.ipynb (its
primary interactive entry point, reference README.md:44-52).  jupyter is
not installed here, so the test parses the .ipynb JSON directly and execs
the code cells in order in one shared namespace — which is exactly what a
kernel does — with IRP_NB_* overrides shrinking every stage (2 classes,
64 images, 2 quick trials, ResNet18 at 32px on CPU).
"""

import json
import os
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NB = os.path.join(REPO, "examples", "workflow.ipynb")


def _fake_kaggle(root):
    # 32 images/class: after cleaning + ~8% outlier removal + the 20%
    # test split, each k=2 fold must still give all 8 virtual devices
    # >= 2 samples (quick_space pins global batch 16 -> per-device 2).
    rng = np.random.default_rng(0)
    for ital in ("cane", "gatto"):
        d = os.path.join(root, "raw-img", ital)
        os.makedirs(d)
        for i in range(32):
            arr = rng.integers(0, 255, (160, 160, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"i{i}.jpg"))


def test_notebook_matches_generator():
    """The committed .ipynb is exactly what the generator emits (no
    hand-edit drift; regenerate with tools/make_workflow_notebook.py)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import make_workflow_notebook as gen
    finally:
        sys.path.pop(0)
    assert json.load(open(NB)) == gen.build()


def test_notebook_executes_end_to_end(tmp_path, monkeypatch):
    _fake_kaggle(str(tmp_path / "kaggle"))
    monkeypatch.chdir(tmp_path)
    env = {
        "IRP_NB_KAGGLE": str(tmp_path / "kaggle"),
        "IRP_NB_WORKDIR": str(tmp_path / "data"),
        "IRP_NB_TRIALS": "2",
        "IRP_NB_FOLDS": "2",
        "IRP_NB_DEPTH": "18",
        "IRP_NB_IMAGE_SIZE": "32",
        "IRP_NB_TARGET_SIZE": "64",
        "IRP_NB_QUICK": "1",
        "IRP_NB_OUTLIERS": "1",
        "IRP_NB_CPU": "1",
        "IRP_NB_SHARD_SIZE": "10",
        "IRP_NB_MIN_RES": "32",
    }
    for k, v in env.items():
        monkeypatch.setenv(k, v)

    cells = [c for c in json.load(open(NB))["cells"]
             if c["cell_type"] == "code"]
    ns = {}
    for i, cell in enumerate(cells):
        src = "".join(cell["source"])
        code = compile(src, f"<workflow.ipynb cell {i}>", "exec")
        exec(code, ns)  # noqa: S102 — executing our own notebook IS the test

    work = str(tmp_path / "data")
    # Curation artifacts from stages 2-5.
    assert os.path.exists(os.path.join(work,
                                       "dataset_analysis_report.txt"))
    assert os.path.exists(os.path.join(work, "dataset_cleaning_report.txt"))
    assert os.path.exists(os.path.join(work, "umap.png"))
    assert ns["shard_result"]["n_train"] > 0
    # Sweep + final from stages 7-9.
    assert len(ns["study"].get_trials()) == 2
    assert ns["final_result"].test_acc >= 0.0
    # Stage 10 found the confusion matrix / gallery PNGs in tracking.
    assert ns["artifact_paths"], "no final-run artifacts found"
    assert all(os.path.exists(p) for p in ns["artifact_paths"])
