"""Curation suite tests: ingest, analysis rules, cleaning, split, shards."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from irp_tpu.data.curation import (analyze_dataset, clean_image_dataset,
                                   create_balanced_test_set,
                                   compute_image_hash, get_dataset_info,
                                   prepare_animal_dataset, process_dataset,
                                   resize_and_crop_image, verify_webdataset,
                                   write_analysis_report,
                                   write_cleaning_report)
from irp_tpu.data.analyze import analyze_webdataset


def _img(rng, w, h, mode="RGB"):
    if mode == "RGB":
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    elif mode == "RGBA":
        arr = rng.integers(0, 255, (h, w, 4), dtype=np.uint8)
    else:  # L
        arr = rng.integers(0, 255, (h, w), dtype=np.uint8)
    return Image.fromarray(arr, mode=mode)


@pytest.fixture
def raw_dataset(tmp_path):
    """2 classes with deliberate defects: grayscale, RGBA, small, dup,
    corrupt."""
    rng = np.random.default_rng(0)
    root = tmp_path / "raw"
    for cls in ("dog", "cat"):
        (root / cls).mkdir(parents=True)
    base = _img(rng, 300, 260)
    base.save(root / "dog" / "d0.jpg")
    base.save(root / "dog" / "d0_dup.jpg")  # duplicate content
    _img(rng, 300, 300).save(root / "dog" / "d1.jpg")
    _img(rng, 100, 90).save(root / "dog" / "d_small.jpg")  # below 128
    _img(rng, 280, 300, "L").save(root / "cat" / "c_gray.png")
    _img(rng, 260, 300, "RGBA").save(root / "cat" / "c_rgba.png")
    _img(rng, 400, 200).save(root / "cat" / "c0.jpg")
    (root / "cat" / "c_corrupt.jpg").write_bytes(b"not a jpeg")
    return str(root)


def test_prepare_animal_dataset(tmp_path):
    rng = np.random.default_rng(1)
    kaggle = tmp_path / "kaggle" / "raw-img"
    for ital in ("cane", "gatto", "sconosciuto"):
        (kaggle / ital).mkdir(parents=True)
        _img(rng, 64, 64).save(kaggle / ital / "a.jpg")
    out = prepare_animal_dataset(str(tmp_path / "kaggle"),
                                 str(tmp_path / "dest"), verbose=False)
    assert out["class_stats"] == {"dog": 1, "cat": 1}
    assert out["untranslated"] == ["sconosciuto"]
    assert os.path.exists(tmp_path / "dest" / "dog" / "a.jpg")


def test_analyze_dataset_rules(raw_dataset):
    a = analyze_dataset(raw_dataset)
    assert a.class_names == ["cat", "dog"]
    assert a.total_images == 7  # corrupt excluded
    assert len(a.corrupted_files) == 1
    assert len(a.duplicate_pairs) == 1
    assert [os.path.basename(p) for p in a.grayscale_images] == ["c_gray.png"]
    assert [os.path.basename(p) for p in a.rgba_images] == ["c_rgba.png"]
    assert a.small_image_counts["below_128"] == 1
    # d_small (100x90) and c0 (400x200, height<224) both count below_224
    assert a.small_image_counts["below_224"] == 2
    assert a.small_image_counts["below_32"] == 0
    assert a.aspect_ratio_categories["landscape"] >= 1
    assert a.channel_distribution[3] >= 4
    report = a.to_report_dict()
    assert report["total_images"] == 7
    assert set(report) >= {"class_names", "class_counts", "small_images",
                           "duplicate_images", "folder_structure"}


def test_clean_dataset_and_report(raw_dataset, tmp_path):
    a = analyze_dataset(raw_dataset)
    dest = str(tmp_path / "cleaned")
    report = str(tmp_path / "cleaning_report.txt")
    stats = clean_image_dataset(raw_dataset, dest, analysis=a,
                                min_resolution=128, report_path=report,
                                verbose=False)
    assert stats.total_processed == 7
    assert stats.excluded == {"grayscale": 1, "rgba": 1, "small": 1,
                              "duplicate": 1}
    assert stats.total_copied == 3
    # excluded files not copied
    assert not os.path.exists(os.path.join(dest, "cat", "c_gray.png"))
    assert os.path.exists(os.path.join(dest, "dog", "d1.jpg"))
    text = open(report).read()
    assert "Total files excluded: 4" in text
    assert "Grayscale images excluded: 1" in text


def test_analysis_report_file(raw_dataset, tmp_path):
    a = analyze_dataset(raw_dataset)
    path = write_analysis_report(a, str(tmp_path / "analysis.txt"))
    text = open(path).read()
    # golden layout (reference dataset_analysis_report.txt): summary table
    # with the run's totals, and the small-image distribution rows
    assert "KEY STATISTICS:" in text
    assert " 7 " in text.split("KEY STATISTICS:")[1].splitlines()[2]
    assert "< 128px" in text


def test_resize_and_crop_geometry():
    rng = np.random.default_rng(2)
    # landscape: short side = height
    img = _img(rng, 400, 200)
    out = resize_and_crop_image(img, 224)
    assert out.size == (224, 224) and out.mode == "RGB"
    # RGBA white composite
    rgba = Image.new("RGBA", (300, 300), (255, 0, 0, 0))  # transparent
    out = resize_and_crop_image(rgba, 64)
    assert out.mode == "RGB"
    assert np.asarray(out).min() >= 250  # alpha-0 -> white background


def test_balanced_split():
    rng = np.random.default_rng(3)
    info = {"a": [f"a{i}" for i in range(20)],
            "b": [f"b{i}" for i in range(50)],
            "c": [f"c{i}" for i in range(30)]}
    train, test = create_balanced_test_set(info, test_size=0.2, seed=0)
    # min class 20 -> 4 test per class
    from collections import Counter

    test_counts = Counter(c for _, c in test)
    assert test_counts == {"a": 4, "b": 4, "c": 4}
    assert len(train) == 100 - 12
    assert set(p for p, _ in train).isdisjoint(p for p, _ in test)


def test_process_and_verify_dataset(raw_dataset, tmp_path):
    out_dir = str(tmp_path / "wds")
    result = process_dataset(raw_dataset, out_dir, test_size=0.5,
                             samples_per_shard=3, target_size=64,
                             verbose=False)
    assert result["n_train"] + result["n_test"] == 8  # corrupt skipped late
    v = verify_webdataset(os.path.join(out_dir, "train-*.tar"),
                          num_samples=3, target_size=64, verbose=False)
    assert v["ok"] and v["checked"] > 0
    # analyzer reads these shards fine
    info = analyze_webdataset(result["train_shards"])
    assert info.num_classes == 2


def test_hash_detects_resized_duplicates():
    rng = np.random.default_rng(4)
    img = _img(rng, 256, 256)
    # same content at different JPEG encodes hashes equal after 64x64 resize
    h1 = compute_image_hash(img)
    h2 = compute_image_hash(img.copy())
    assert h1 == h2
    other = _img(rng, 256, 256)
    assert compute_image_hash(other) != h1


def test_prepare_accepts_extracted_layout(tmp_path):
    """Pre-extracted datasets (class dirs at top level, no raw-img/,
    italian or english names) must ingest rather than silently erroring
    downstream (round-2 review finding)."""
    import numpy as np
    from PIL import Image

    from irp_tpu.data.curation import prepare_animal_dataset

    rng = np.random.default_rng(0)
    src = tmp_path / "extracted"
    for d in ("cane", "cat"):  # one italian, one already-english
        (src / d).mkdir(parents=True)
        for i in range(2):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(src / d / f"{i}.jpg")
    out = prepare_animal_dataset(str(src), str(tmp_path / "raw"),
                                 verbose=False)
    assert "error" not in out
    assert out["class_stats"] == {"dog": 2, "cat": 2}
    assert (tmp_path / "raw" / "dog" / "0.jpg").exists()
    assert (tmp_path / "raw" / "cat" / "0.jpg").exists()


def test_prepare_missing_source_errors(tmp_path):
    from irp_tpu.data.curation import prepare_animal_dataset

    out = prepare_animal_dataset(str(tmp_path / "nope"),
                                 str(tmp_path / "raw"), verbose=False)
    assert out == {"error": "Source directory not found"}
