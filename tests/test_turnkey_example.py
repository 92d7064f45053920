"""Turnkey Animals-10 example: asset detection + full-pipeline smoke.

examples/train_animals10.py must (a) refuse cleanly when assets are
missing, pointing at exactly what to provide, and (b) run the ENTIRE
reference workflow (ingest -> analyze -> clean -> shards -> cache ->
sweep -> final -> full-test accuracy) the moment a dataset exists.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

import train_animals10  # noqa: E402


def test_missing_assets_exit_code(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("IRP_ANIMALS10_DIR", raising=False)
    rc = train_animals10.main(["--work-dir", str(tmp_path / "w")])
    assert rc == 2
    err = capsys.readouterr().err
    assert "IRP_ANIMALS10_DIR" in err and "--kaggle-path" in err


def test_weights_required_unless_from_scratch(tmp_path, monkeypatch, capsys):
    raw = tmp_path / "kaggle" / "raw-img" / "cane"
    raw.mkdir(parents=True)
    monkeypatch.delenv("IRP_RESNET50_WEIGHTS", raising=False)
    monkeypatch.chdir(tmp_path)
    rc = train_animals10.main(["--kaggle-path", str(tmp_path / "kaggle"),
                               "--work-dir", str(tmp_path / "w")])
    assert rc == 2
    assert "pretrained" in capsys.readouterr().err.lower()


@pytest.mark.slow
def test_turnkey_pipeline_end_to_end(tmp_path, monkeypatch):
    """Fake Kaggle tree -> the whole pipeline completes and reports
    accuracy (tiny from-scratch config; the bar is not expected)."""
    from tests.synth import make_image

    classes = ["cane", "cavallo", "elefante", "farfalla", "gallina",
               "gatto", "mucca", "pecora", "ragno", "scoiattolo"]
    rng = np.random.default_rng(0)
    root = tmp_path / "kaggle" / "raw-img"
    for ci, c in enumerate(classes):
        d = root / c
        d.mkdir(parents=True)
        for i in range(12):
            make_image(rng, ci, 10, size=160).save(d / f"{i}.jpg",
                                                   quality=95)
    monkeypatch.chdir(tmp_path)
    rc = train_animals10.main([
        "--kaggle-path", str(tmp_path / "kaggle"),
        "--work-dir", str(tmp_path / "work"),
        "--from-scratch", "--depth", "18", "--image-size", "56",
        "--n-trials", "1", "--k-folds", "2", "--quick",
        "--samples-per-shard", "10"])
    assert rc == 0
    # artifacts of every stage exist
    work = tmp_path / "work"
    assert (work / "dataset_analysis_report.txt").exists()
    assert (work / "dataset_cleaning_report.txt").exists()
    assert list((work / "webdataset").glob("train-*.tar"))
    assert list((work / "webdataset").glob("test-*.tar"))
    assert (work / "optuna_animals10_kfold.db").exists()
    assert list((work / "checkpoints").glob("*"))
