"""Inference/serving path (irp_tpu/infer.py, run_predict.py).

The reference has no deployment story (predictions only inside final-eval,
reference functions/final.py:27-63) — these tests lock the net-new serving
contract: artifact loading with architecture inference, padded fixed-shape
batching, eval-parity preprocessing, data-parallel equivalence, CLI e2e.
"""

import csv
import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from irp_tpu.config import ModelConfig
from irp_tpu.models.classifier import init_classifier

TINY = ModelConfig(depth=18, num_classes=3, image_size=32, hidden_dim=16,
                   compute_dtype="float32")


@pytest.fixture(scope="module")
def tiny_model():
    model, variables = init_classifier(TINY, jax.random.PRNGKey(0),
                                       image_size=32)
    return model, variables


@pytest.fixture(scope="module")
def images48():
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, (5, 48, 48, 3), dtype=np.uint8)


def _direct_probs(model, variables, images_u8):
    import jax.numpy as jnp

    from irp_tpu.ops.preprocess import eval_preprocess_batch

    x = eval_preprocess_batch(images_u8, 32, jnp.float32)
    logits = model.apply(variables, x, train=False)
    return np.asarray(jax.nn.softmax(logits.astype(jnp.float32), axis=-1))


def test_predict_matches_direct_forward(tiny_model, images48):
    from irp_tpu.infer import make_predictor

    model, variables = tiny_model
    pred = make_predictor(variables, cfg=TINY, batch_size=8)
    probs = pred.predict_probs(images48)
    assert probs.shape == (5, 3)
    np.testing.assert_allclose(probs, _direct_probs(model, variables,
                                                    images48),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)


def test_padding_and_batch_size_invariance(tiny_model, images48):
    from irp_tpu.infer import make_predictor

    _, variables = tiny_model
    ref = make_predictor(variables, cfg=TINY,
                         batch_size=5).predict_probs(images48)
    for bsz in (2, 4, 8):
        got = make_predictor(variables, cfg=TINY,
                             batch_size=bsz).predict_probs(images48)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # empty request
    empty = make_predictor(variables, cfg=TINY, batch_size=4).predict_probs(
        np.zeros((0, 48, 48, 3), np.uint8))
    assert empty.shape == (0, 3)


def test_infer_model_config_from_tree(tiny_model):
    from irp_tpu.infer import infer_model_config

    _, variables = tiny_model
    cfg = infer_model_config(variables["params"], image_size=32,
                             compute_dtype="float32")
    assert (cfg.depth, cfg.num_classes, cfg.hidden_dim) == (18, 3, 16)


@pytest.mark.parametrize("groups,wpg", [(32, 4), (1, 128), (1, 64)])
def test_infer_model_config_recovers_variants(groups, wpg):
    """Serving a ResNeXt / Wide-ResNet artifact must rebuild the right
    architecture from the weight tree alone (groups from the grouped
    conv2 fan-in, width_per_group from the conv1 fan-out)."""
    import jax.numpy as jnp

    from irp_tpu.infer import infer_model_config
    from irp_tpu.models.classifier import Classifier

    cfg = ModelConfig(depth=50, num_classes=3, hidden_dim=16,
                      groups=groups, width_per_group=wpg,
                      compute_dtype="float32")
    shapes = jax.eval_shape(
        lambda: Classifier(config=cfg).init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 32, 32, 3), jnp.float32), train=False))
    got = infer_model_config(shapes["params"], image_size=32)
    assert (got.depth, got.groups, got.width_per_group) == (50, groups, wpg)
    assert (got.num_classes, got.hidden_dim) == (3, 16)


def test_pad_buckets_identical_results(tiny_model, images48):
    """Bucketed padding (TF-Serving allowed_batch_sizes) is a pure
    perf knob: scores must be identical to always-pad-to-batch_size for
    every request size, including multi-chunk ones."""
    from irp_tpu.infer import make_predictor, power_of_two_buckets

    model, variables = tiny_model
    plain = make_predictor(variables, cfg=TINY, batch_size=8)
    bucketed = make_predictor(variables, cfg=TINY, batch_size=8,
                              pad_buckets=power_of_two_buckets(8))
    assert bucketed.pad_buckets == (1, 2, 4, 8)
    big = np.concatenate([images48, images48, images48])  # 15 images
    for n in (1, 2, 3, 5, 8, 9, 15):
        # a different compiled batch shape tiles reductions differently,
        # so agreement is to float round-off, not bit-exact
        np.testing.assert_allclose(
            bucketed.predict_probs(big[:n]), plain.predict_probs(big[:n]),
            rtol=1e-5, atol=1e-6)
    # pad targets: smallest bucket >= n, full batch beyond the ladder
    assert [bucketed._pad_target(n) for n in (1, 2, 3, 8)] == [1, 2, 4, 8]
    assert plain._pad_target(3) == 8


def test_pad_buckets_validation(tiny_model, tmp_path):
    from irp_tpu.infer import load_predictor, make_predictor
    from irp_tpu.infer import power_of_two_buckets

    assert power_of_two_buckets(24) == (1, 2, 4, 8, 16, 24)
    _, variables = tiny_model
    with pytest.raises(ValueError, match="ending at batch_size"):
        make_predictor(variables, cfg=TINY, batch_size=8,
                       pad_buckets=(1, 2, 4))  # must end at batch_size
    with pytest.raises(ValueError, match="ending at batch_size"):
        make_predictor(variables, cfg=TINY, batch_size=8,
                       pad_buckets=(0, 8))
    # .irpx artifacts bake one shape — buckets are a live-weights knob
    from irp_tpu.export import export_predictor
    pred = make_predictor(variables, cfg=TINY, batch_size=4)
    art = export_predictor(pred, str(tmp_path / "m.irpx"), source_size=48,
                           gradcam=False)
    with pytest.raises(ValueError, match="pad_buckets"):
        load_predictor(art, pad_buckets=(1, 4))


def test_serving_buckets_split_over_data_axis():
    """The --batch-buckets resolver must only emit ladders every rung of
    which splits over the data-parallel axis: 'auto' builds n_data
    multiples (a 1-image bucket can never shard 4 ways), and explicit
    rungs that cannot split are a clean ValueError, not a crash later
    in Predictor validation."""
    from irp_tpu.infer import power_of_two_buckets, serving_buckets

    assert serving_buckets("auto", 64) == power_of_two_buckets(64)
    assert serving_buckets("auto", 64, n_data=4) == (4, 8, 16, 32, 64)
    assert serving_buckets("auto", 24, n_data=4) == (4, 8, 16, 24)
    assert serving_buckets("8,32,64", 64, n_data=8) == (8, 32, 64)
    with pytest.raises(ValueError, match="does not split"):
        serving_buckets("auto", 30, n_data=4)
    with pytest.raises(ValueError, match="do not split"):
        serving_buckets("1,2,64", 64, n_data=4)


def test_pth_roundtrip_resnext(images48, tmp_path):
    """A converted ResNeXt .pth serves end-to-end: architecture (incl.
    groups/width) inferred from the weight tree, scores matching the
    source model."""
    torch = pytest.importorskip("torch")
    from irp_tpu.infer import load_predictor
    from irp_tpu.models.convert import flax_variables_to_torch_state_dict

    cfg = ModelConfig(depth=50, num_classes=3, hidden_dim=16, groups=32,
                      width_per_group=4, image_size=32,
                      compute_dtype="float32")
    model, variables = init_classifier(cfg, jax.random.PRNGKey(2),
                                       image_size=32)
    sd = flax_variables_to_torch_state_dict(variables, depth=50)
    path = str(tmp_path / "resnext.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)

    pred = load_predictor(path, batch_size=4, image_size=32)
    assert (pred.model.config.groups,
            pred.model.config.width_per_group) == (32, 4)
    np.testing.assert_allclose(
        pred.predict_probs(images48),
        _direct_probs(model, variables, images48),
        rtol=3e-2, atol=5e-3)  # inferred cfg serves bf16; source is f32


def test_npz_roundtrip(tiny_model, images48, tmp_path):
    from irp_tpu.infer import load_predictor, make_predictor
    from irp_tpu.train.checkpoint import save_weights_npz

    model, variables = tiny_model
    path = save_weights_npz(str(tmp_path / "w.npz"), variables["params"],
                            variables["batch_stats"])
    # architecture inferred from the tree; image_size comes from cfg
    pred = load_predictor(path, cfg=TINY, class_names=["a", "b", "c"],
                          batch_size=4)
    result = pred.predict(images48)
    np.testing.assert_allclose(result.probs,
                               _direct_probs(model, variables, images48),
                               rtol=1e-5, atol=1e-6)
    assert result.label_names() == [["a", "b", "c"][i]
                                    for i in result.labels]
    idx, prob = result.topk(2)
    assert idx.shape == (5, 2)
    assert (prob[:, 0] >= prob[:, 1]).all()


def test_pth_roundtrip(tiny_model, images48, tmp_path):
    from irp_tpu.infer import load_predictor
    from irp_tpu.train.checkpoint import export_torch_pth

    model, variables = tiny_model
    path = export_torch_pth(str(tmp_path / "w.pth"), variables["params"],
                            variables["batch_stats"], depth=18)
    pred = load_predictor(path, cfg=TINY, batch_size=8)
    np.testing.assert_allclose(pred.predict_probs(images48),
                               _direct_probs(model, variables, images48),
                               rtol=1e-4, atol=1e-5)


def test_backbone_only_checkpoint_rejected(tiny_model, tmp_path):
    import torch

    from irp_tpu.infer import load_predictor
    from irp_tpu.train.checkpoint import export_torch_pth

    _, variables = tiny_model
    path = export_torch_pth(str(tmp_path / "bb.pth"), variables["params"],
                            variables["batch_stats"], depth=18)
    sd = torch.load(path, map_location="cpu", weights_only=True)
    backbone_only = {k: v for k, v in sd.items()
                     if not k.startswith("classifier.")}
    torch.save(backbone_only, tmp_path / "bb_only.pth")
    with pytest.raises(ValueError, match="backbone-only"):
        load_predictor(str(tmp_path / "bb_only.pth"), cfg=TINY)


def test_data_parallel_matches_single_device(tiny_model, images48):
    from irp_tpu.config import MeshConfig
    from irp_tpu.infer import make_predictor
    from irp_tpu.parallel.mesh import make_mesh

    model, variables = tiny_model
    mesh = make_mesh(MeshConfig())
    pred = make_predictor(variables, cfg=TINY, batch_size=8, mesh=mesh)
    assert pred.batch_size % mesh.shape["data"] == 0
    np.testing.assert_allclose(pred.predict_probs(images48),
                               _direct_probs(model, variables, images48),
                               rtol=1e-5, atol=1e-6)


def test_predict_shards(tiny_model, tmp_path):
    from irp_tpu.data.tar import TarWriter
    from irp_tpu.infer import make_predictor

    rng = np.random.default_rng(7)
    shard = str(tmp_path / "train-000000.tar")
    with TarWriter(shard) as w:
        for i in range(6):
            arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            import io

            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            w.write({"__key__": f"s{i:03d}", "jpg": buf.getvalue(),
                     "cls": i % 3})

    _, variables = tiny_model
    pred = make_predictor(variables, cfg=TINY, batch_size=4)
    result, truth = pred.predict_shards(str(tmp_path / "train-*.tar"))
    assert len(result) == 6
    assert result.keys == [f"s{i:03d}" for i in range(6)]
    assert truth is not None and truth.tolist() == [0, 1, 2, 0, 1, 2]
    assert result.probs.shape == (6, 3)


def test_npz_meta_image_size_roundtrip(tiny_model, images48, tmp_path):
    """The final trainer embeds image_size in the npz artifact; the serving
    path must recover it so a model trained at a non-default crop is served
    with the right preprocessing WITHOUT the caller re-stating it."""
    from irp_tpu.infer import load_predictor
    from irp_tpu.train.checkpoint import (load_weights_meta,
                                          save_weights_npz)

    model, variables = tiny_model
    path = save_weights_npz(str(tmp_path / "w.npz"), variables["params"],
                            variables["batch_stats"],
                            meta={"image_size": 32})
    assert load_weights_meta(path) == {"image_size": 32}
    # no cfg, no image_size arg: the artifact is self-describing
    pred = load_predictor(path, batch_size=4)
    assert pred.model.config.image_size == 32
    # loose tolerance: the inferred config computes in bfloat16 while the
    # direct forward is float32 — geometry (the 32-crop), not dtype
    # parity, is what this asserts
    np.testing.assert_allclose(pred.predict_probs(images48),
                               _direct_probs(model, variables, images48),
                               rtol=3e-2, atol=5e-3)
    # explicit argument outranks the embedded metadata
    pred48 = load_predictor(path, batch_size=4, image_size=48)
    assert pred48.model.config.image_size == 48
    # pre-metadata artifacts still load (meta absent -> empty dict)
    legacy = save_weights_npz(str(tmp_path / "legacy.npz"),
                              variables["params"],
                              variables["batch_stats"])
    assert load_weights_meta(legacy) == {}
    assert load_predictor(legacy).model.config.image_size == 224


def test_predict_rejects_undersized_images(tiny_model):
    """Sources smaller than the eval crop must error loudly — the center
    crop would otherwise slice with negative indices and feed the
    global-pool ResNet a silently-wrong tiny crop."""
    from irp_tpu.infer import make_predictor

    _, variables = tiny_model
    pred = make_predictor(variables, cfg=TINY, batch_size=4)
    small = np.zeros((2, 16, 48, 3), np.uint8)
    with pytest.raises(ValueError, match="eval crop"):
        pred.predict_probs(small)
    with pytest.raises(ValueError, match=r"\(N,H,W,3\)"):
        pred.predict_probs(np.zeros((2, 48, 48, 4), np.uint8))


def test_predict_shards_literal_path_with_glob_chars(tiny_model, tmp_path):
    """'[' is a legal filename char: an existing literal path must win over
    glob interpretation (run[3]/test-000.tar must not be character-class
    -globbed into an empty result)."""
    import io

    from irp_tpu.data.tar import TarWriter
    from irp_tpu.infer import make_predictor

    d = tmp_path / "run[3]"
    d.mkdir()
    shard = str(d / "test-000000.tar")
    rng = np.random.default_rng(11)
    with TarWriter(shard) as w:
        for i in range(3):
            arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            w.write({"__key__": f"k{i}", "jpg": buf.getvalue(), "cls": i})

    _, variables = tiny_model
    pred = make_predictor(variables, cfg=TINY, batch_size=4)
    result, truth = pred.predict_shards(shard)
    assert len(result) == 3 and truth.tolist() == [0, 1, 2]
    # a plain non-existent non-glob path is still a loud error, not empty
    with pytest.raises(FileNotFoundError):
        pred.predict_shards(str(tmp_path / "missing.tar"))


def test_run_predict_cli(tiny_model, tmp_path, capsys):
    import run_predict
    from irp_tpu.train.checkpoint import save_weights_npz

    _, variables = tiny_model
    weights = save_weights_npz(str(tmp_path / "w.npz"),
                               variables["params"],
                               variables["batch_stats"])
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        arr = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"x{i}.jpg")
    classes = tmp_path / "classes.json"
    classes.write_text(json.dumps(["cat", "dog", "fox"]))
    out = str(tmp_path / "preds.csv")

    # NOTE: the CLI infers architecture from the tree; tiny model's
    # image_size=32 is not recoverable from weights, but a 224 crop of a
    # 256 decode still runs the same tree — only geometry differs, which
    # is fine for this glue test.
    rc = run_predict.main(["--weights", weights, "--images", str(img_dir),
                           "--classes", str(classes), "--topk", "2",
                           "--out", out, "--cpu", "--batch-size", "4"])
    assert rc == 0
    with open(out) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert {r["label_name"] for r in rows} <= {"cat", "dog", "fox"}
    assert all(float(r["top1_prob"]) >= float(r["top2_prob"]) for r in rows)
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n"] == 3 and summary["imgs_per_sec"] > 0


def test_run_predict_cli_class_count_mismatch(tiny_model, tmp_path, capsys):
    import run_predict
    from irp_tpu.train.checkpoint import save_weights_npz

    _, variables = tiny_model
    weights = save_weights_npz(str(tmp_path / "w.npz"),
                               variables["params"],
                               variables["batch_stats"])
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(img_dir / "a.jpg")
    rc = run_predict.main(["--weights", weights, "--images", str(img_dir),
                           "--classes", "a,b", "--cpu"])
    assert rc == 2
    assert "class names" in capsys.readouterr().err


# ---- test-time augmentation (Predictor(tta=True)) ----


def _direct_probs_flipped(model, variables, images_u8):
    """The TTA contract by hand: flip the PREPROCESSED crop's W axis."""
    import jax.numpy as jnp

    from irp_tpu.ops.preprocess import eval_preprocess_batch

    x = eval_preprocess_batch(images_u8, 32, jnp.float32)
    logits = model.apply(variables, jnp.flip(x, axis=2), train=False)
    return np.asarray(jax.nn.softmax(logits.astype(jnp.float32), axis=-1))


def test_tta_is_flip_average(tiny_model, images48):
    from irp_tpu.infer import make_predictor

    model, variables = tiny_model
    plain = _direct_probs(model, variables, images48)
    flipped = _direct_probs_flipped(model, variables, images48)
    got = make_predictor(variables, cfg=TINY, batch_size=8,
                         tta=True).predict_probs(images48)
    np.testing.assert_allclose(got, 0.5 * (plain + flipped),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-5)
    # and TTA genuinely changes the scores on an asymmetric input
    assert np.abs(got - plain).max() > 1e-7


def test_tta_noop_on_symmetric_images(tiny_model, images48):
    from irp_tpu.infer import make_predictor

    _, variables = tiny_model
    sym = np.concatenate([images48[:, :, :24], images48[:, :, :24][:, :, ::-1]],
                         axis=2)
    plain = make_predictor(variables, cfg=TINY,
                           batch_size=8).predict_probs(sym)
    tta = make_predictor(variables, cfg=TINY, batch_size=8,
                         tta=True).predict_probs(sym)
    np.testing.assert_allclose(tta, plain, rtol=1e-5, atol=1e-6)


def test_tta_informational_on_prebuilt_forward(tiny_model):
    """On a prebuilt forward (an .irpx program), tta records what the
    baked program does (the loader sets it from artifact metadata) —
    construction must accept it without trying to rebuild anything."""
    from irp_tpu.infer import Predictor

    model, variables = tiny_model
    sentinel = lambda *a: None  # noqa: E731
    p = Predictor(model=model, params=variables["params"],
                  batch_stats=variables["batch_stats"], tta=True,
                  _forward=sentinel)
    assert p.tta
    assert p._forward is sentinel  # the prebuilt program was kept as-is


def test_tta_survives_replication(tiny_model, images48):
    from irp_tpu.infer import make_predictor, replicate_predictor

    _, variables = tiny_model
    base = make_predictor(variables, cfg=TINY, batch_size=8, tta=True)
    want = base.predict_probs(images48)
    for rep in replicate_predictor(base, n=1):
        assert rep.tta
        np.testing.assert_allclose(rep.predict_probs(images48), want,
                                   rtol=1e-5, atol=1e-6)


def test_run_predict_cli_tta(tiny_model, tmp_path, capsys):
    import run_predict
    from irp_tpu.train.checkpoint import save_weights_npz

    _, variables = tiny_model
    weights = save_weights_npz(str(tmp_path / "w.npz"),
                               variables["params"],
                               variables["batch_stats"],
                               meta={"image_size": 32})
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    Image.fromarray(rng.integers(0, 256, (80, 80, 3), np.uint8)).save(
        img_dir / "x.jpg")
    out = str(tmp_path / "preds.csv")
    rc = run_predict.main(["--weights", weights, "--images", str(img_dir),
                           "--out", out, "--cpu", "--batch-size", "2",
                           "--tta"])
    assert rc == 0
    assert len(list(csv.DictReader(open(out)))) == 1
    capsys.readouterr()
    # --tta + an unreadable .irpx: clean rc=2, not a crash (the CLI
    # consults the artifact's metadata to see whether TTA is baked)
    fake = tmp_path / "m.irpx"
    fake.write_bytes(b"zip-not-really")
    rc = run_predict.main(["--weights", str(fake), "--images", str(img_dir),
                           "--cpu", "--tta"])
    assert rc == 2
    assert "irpx" in capsys.readouterr().err
