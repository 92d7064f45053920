"""CLI glue tests (in-process main() calls, no subprocess)."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture
def fake_kaggle(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "kaggle" / "raw-img"
    for ci, ital in enumerate(["cane", "gatto"]):
        (root / ital).mkdir(parents=True)
        for i in range(12):
            arr = rng.integers(0, 255, (240, 240, 3), dtype=np.uint8)
            Image.fromarray(arr).save(root / ital / f"i{i}.jpg")
    return str(tmp_path / "kaggle")


def test_run_curation_cli(fake_kaggle, tmp_path, capsys):
    import run_curation

    work = str(tmp_path / "work")
    rc = run_curation.main([
        "--kaggle-path", fake_kaggle, "--work-dir", work,
        "--samples-per-shard", "10", "--test-size", "0.25",
        "--target-size", "64"])
    assert rc == 0
    assert os.path.exists(os.path.join(work,
                                       "dataset_analysis_report.txt"))
    assert os.path.exists(os.path.join(work, "dataset_cleaning_report.txt"))
    import glob

    assert glob.glob(os.path.join(work, "webdataset", "train-*.tar"))
    assert glob.glob(os.path.join(work, "webdataset", "test-*.tar"))


def test_run_hyperopt_cli_no_shards(tmp_path, capsys):
    import run_hyperopt

    rc = run_hyperopt.main(["--data-dir", str(tmp_path / "none"), "--cpu"])
    assert rc == 1
    assert "No train shards" in capsys.readouterr().err


def test_display_dataset_report(fake_kaggle, tmp_path, capsys):
    from irp_tpu.data.curation import analyze_dataset, display_dataset_report
    from irp_tpu.data.curation import prepare_animal_dataset

    prepare_animal_dataset(fake_kaggle, str(tmp_path / "raw"), verbose=False)
    analysis = analyze_dataset(str(tmp_path / "raw"))
    out = display_dataset_report(
        analysis, report_path=str(tmp_path / "r.txt"),
        sample_grid_path=str(tmp_path / "samples.png"))
    text = capsys.readouterr().out
    assert "dog" in text and "images" in text
    assert out["class_table"]["images"].sum() == 24
    assert os.path.getsize(out["sample_grid_path"]) > 0
    assert os.path.exists(out["report_path"])


def test_run_fidelity_cli(tmp_path):
    pytest.importorskip("torch")
    import run_fidelity
    from tests.synth import make_synthetic_shards

    meta = make_synthetic_shards(str(tmp_path), num_classes=2, per_class=6,
                                 samples_per_shard=12, seed=0, size=224,
                                 prefix="test")
    rc = run_fidelity.main([
        "--shards", os.path.join(str(tmp_path), "test-*.tar"),
        "--samples", "4", "--depth", "18", "--num-classes", "2", "--cpu"])
    assert rc == 0


@pytest.mark.slow
@pytest.mark.parametrize("family", ["vit", "efficientnet", "convnext"])
def test_run_fidelity_cli_families(tmp_path, family):
    """--family dispatch: the beyond-reference families pass the same
    1e-3 torch-parity bar through the CLI (224px eval geometry)."""
    pytest.importorskip("torch")
    import run_fidelity
    from tests.synth import make_synthetic_shards

    make_synthetic_shards(str(tmp_path), num_classes=2, per_class=4,
                          samples_per_shard=8, seed=0, size=224,
                          prefix="test")
    rc = run_fidelity.main([
        "--shards", os.path.join(str(tmp_path), "test-*.tar"),
        "--samples", "4", "--family", family, "--num-classes", "2",
        "--cpu"])
    assert rc == 0


def test_run_final_cli_error_paths(tmp_path, capsys):
    import run_final

    # empty data dir: shards checked first
    rc = run_final.main(["--data-dir", str(tmp_path), "--storage",
                         str(tmp_path / "none.db"), "--cpu"])
    assert rc == 2
    assert "No train shards" in capsys.readouterr().err

    # shards present but storage missing: the storage branch must fire
    from tests.synth import make_synthetic_shards

    make_synthetic_shards(str(tmp_path), num_classes=2, per_class=4,
                          samples_per_shard=8, seed=0, size=64)
    rc = run_final.main(["--data-dir", str(tmp_path), "--storage",
                         str(tmp_path / "none.db"), "--cpu"])
    assert rc == 2
    assert "No study storage" in capsys.readouterr().err


@pytest.mark.slow
def test_run_hyperopt_then_final_cli(tmp_path):
    """The reference's full two-stage workflow as CLIs: sweep via
    run_hyperopt.py (reference run_hyperopt.py:12-53), then final training
    via run_final.py (reference final.py:158 notebook stage)."""
    import run_final
    import run_hyperopt
    from tests.synth import make_synthetic_shards

    data = tmp_path / "wds"
    data.mkdir()
    make_synthetic_shards(str(data), num_classes=2, per_class=10,
                          samples_per_shard=10, seed=0, size=224,
                          prefix="train")
    make_synthetic_shards(str(data), num_classes=2, per_class=4,
                          samples_per_shard=8, seed=1, size=224,
                          prefix="test")
    storage = str(tmp_path / "study.db")
    cache = str(tmp_path / "cache")
    common = ["--data-dir", str(data), "--storage", storage,
              "--cache-dir", cache, "--depth", "18",
              "--image-size", "64", "--cpu"]
    # no explicit --first-fold-min-acc: --quick must default the tier-2
    # floor to 0 (the reference's 95% floor would prune every 2-epoch
    # smoke trial and the sweep would end with no completed trial)
    rc = run_hyperopt.main(common + ["--n-trials", "2", "--k-folds", "2",
                                     "--quick"])
    assert rc == 0
    assert os.path.exists(storage)

    # --fit-mode auto: CPU reports no memory budget, so this resolves to
    # the hbm fast path — exercising the auto plumbing end-to-end
    rc = run_final.main(common + ["--checkpoint-dir",
                                  str(tmp_path / "ckpt"),
                                  "--fit-mode", "auto"])
    assert rc == 0


@pytest.mark.slow
def test_run_hyperopt_search_optimizer_cli(tmp_path):
    """--search-optimizer adds the optimizer family as an 8th searched
    dimension: every trial stores an 'optimizer' param from the
    adam/adamw/sgd set (and the extra-key overlay threads it into the
    trial's TrainConfig — a bad value would crash the trial)."""
    import run_hyperopt
    from irp_tpu.hyperopt.storage import SQLiteStorage
    from tests.synth import make_synthetic_shards

    data = tmp_path / "wds"
    data.mkdir()
    make_synthetic_shards(str(data), num_classes=2, per_class=10,
                          samples_per_shard=10, seed=0, size=224,
                          prefix="train")
    storage = str(tmp_path / "study.db")
    rc = run_hyperopt.main(
        ["--data-dir", str(data), "--storage", storage,
         "--cache-dir", str(tmp_path / "cache"), "--depth", "18",
         "--image-size", "64", "--cpu", "--quick",
         "--n-trials", "2", "--k-folds", "2", "--search-optimizer"])
    assert rc == 0
    st = SQLiteStorage(storage)
    study_id = st.find_study("animals10_kfold")  # the CLI default name
    assert study_id is not None
    trials = st.get_trials(study_id)
    done = [t for t in trials if t.state == "COMPLETE"]
    assert done, [t.state for t in trials]
    for t in done:
        assert t.params.get("optimizer") in ("adam", "adamw", "sgd"), \
            t.params
    st.close()


@pytest.mark.slow
def test_run_curation_cli_outliers(fake_kaggle, tmp_path):
    """The --outliers stage end-to-end through the CLI: HBM-scanned
    feature extraction (with streaming fallback), UMAP embedding, LOF
    flags, clean-set rewrite, then shard creation from the cleaned set."""
    import glob

    import run_curation

    work = str(tmp_path / "work")
    rc = run_curation.main([
        "--kaggle-path", fake_kaggle, "--work-dir", work,
        "--samples-per-shard", "10", "--test-size", "0.25",
        "--target-size", "64", "--outliers"])
    assert rc == 0
    assert os.path.exists(os.path.join(work, "umap.png"))
    assert os.path.exists(os.path.join(work, "outliers.png"))
    # the clean set feeds sharding: both classes survive curation
    clean = os.path.join(work, "clean")
    classes = sorted(os.listdir(clean))
    assert len(classes) == 2
    assert glob.glob(os.path.join(work, "webdataset", "train-*.tar"))


def test_load_image_dir_cache(fake_kaggle, tmp_path):
    """The outlier stage's directory decoder: preallocated uint8 cache,
    native batch path with PIL fallback, class-sorted labels."""
    import numpy as np

    import run_curation
    from irp_tpu.data.curation import get_dataset_info, prepare_animal_dataset

    prepare_animal_dataset(fake_kaggle, str(tmp_path / "raw"), verbose=False)
    info = get_dataset_info(str(tmp_path / "raw"))
    cached = run_curation.load_image_dir_cache(info)
    assert cached.images.shape == (24, 256, 256, 3)
    assert cached.images.dtype == np.uint8
    assert list(cached.class_names) == sorted(info)
    counts = np.bincount(cached.labels)
    assert list(counts) == [12, 12]
    assert cached.images.std() > 0  # actually decoded, not zeros
