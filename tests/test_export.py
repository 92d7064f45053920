"""AOT export artifacts (irp_tpu/export.py, .irpx).

The reference's deployment artifact is a torch state_dict needing the
model class + torchvision to load (reference functions/final.py:339-354).
These tests lock the net-new contract: the full compiled inference
program (preprocess + forward + softmax) serializes to one portable
file, reloads without running any model code, and scores identically.
"""

import json
import zipfile

import jax
import numpy as np
import pytest

from irp_tpu.config import ModelConfig
from irp_tpu.models.classifier import init_classifier

TINY = ModelConfig(depth=18, num_classes=3, image_size=32, hidden_dim=16,
                   compute_dtype="float32")


@pytest.fixture(scope="module")
def tiny_predictor():
    from irp_tpu.infer import make_predictor

    _, variables = init_classifier(TINY, jax.random.PRNGKey(0),
                                   image_size=32)
    return make_predictor(variables, cfg=TINY, batch_size=4,
                          class_names=["a", "b", "c"])


@pytest.fixture(scope="module")
def images48():
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, (5, 48, 48, 3), dtype=np.uint8)


def test_export_roundtrip_scores_identically(tiny_predictor, images48,
                                             tmp_path):
    from irp_tpu.export import export_predictor, load_exported_predictor

    path = export_predictor(tiny_predictor, str(tmp_path / "m.irpx"),
                            source_size=48)
    loaded = load_exported_predictor(path)
    # same platform, same program: bit-exact, including the padded tail
    # batch (5 images through a fixed batch-4 program)
    np.testing.assert_array_equal(loaded.predict_probs(images48),
                                  tiny_predictor.predict_probs(images48))
    assert loaded.batch_size == 4
    assert loaded.class_names == ["a", "b", "c"]
    result = loaded.predict(images48)
    assert result.label_names() == [["a", "b", "c"][i]
                                    for i in result.labels]


def test_export_is_cross_platform_by_default(tiny_predictor, tmp_path):
    """The default export lowers for cpu AND tpu from this CPU host
    (jax.export cross-lowering) — export once, serve on the chip — plus
    'axon' so the call-time platform check passes on hosts that reach
    the TPU through the axon PJRT tunnel."""
    from irp_tpu.export import export_predictor, read_export_meta

    path = export_predictor(tiny_predictor, str(tmp_path / "m.irpx"),
                            source_size=48)
    meta = read_export_meta(path)
    assert set(meta["platforms"]) == {"cpu", "tpu", "axon"}
    assert meta["batch_size"] == 4 and meta["source_size"] == 48
    assert meta["image_size"] == 32 and meta["num_classes"] == 3
    # the artifact is a plain zip with weights independently inspectable
    with zipfile.ZipFile(path) as zf:
        assert {"program.shlo", "weights.npz", "meta.json"} <= \
            set(zf.namelist())


def test_load_predictor_dispatches_irpx(tiny_predictor, images48, tmp_path):
    from irp_tpu.export import export_predictor
    from irp_tpu.infer import load_predictor

    path = export_predictor(tiny_predictor, str(tmp_path / "m.irpx"),
                            source_size=48)
    loaded = load_predictor(path)
    np.testing.assert_array_equal(loaded.predict_probs(images48),
                                  tiny_predictor.predict_probs(images48))
    # explicit class names outrank the artifact's embedded ones
    assert load_predictor(path,
                          class_names=["x", "y", "z"]).class_names == \
        ["x", "y", "z"]
    # mesh serving needs the live weights artifact, not a baked program
    from irp_tpu.config import MeshConfig
    from irp_tpu.parallel.mesh import make_mesh
    with pytest.raises(ValueError, match="single-device"):
        load_predictor(path, mesh=make_mesh(MeshConfig()))


def test_export_bakes_bucket_ladder(tiny_predictor, images48, tmp_path):
    """A bucketed predictor exports its whole padded-shape ladder: one
    program per rung in the zip, the loader rebuilds the bucket
    dispatch, and every rung scores bit-identically to the live
    bucketed model — online-efficient serving with no model code."""
    from irp_tpu.export import export_predictor, load_exported_predictor
    from irp_tpu.infer import load_predictor, make_predictor

    bucketed = make_predictor(
        {"params": tiny_predictor.params,
         "batch_stats": tiny_predictor.batch_stats},
        cfg=TINY, batch_size=4, class_names=["a", "b", "c"],
        pad_buckets=(1, 2, 4))
    path = export_predictor(bucketed, str(tmp_path / "b.irpx"),
                            source_size=48, gradcam=False)
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
    assert {"program.shlo", "program.b1.shlo", "program.b2.shlo"} <= names
    assert "program.b4.shlo" not in names  # full batch IS program.shlo

    loaded = load_predictor(path)  # the CLI loading path
    assert loaded.pad_buckets == (1, 2, 4)
    for n in (1, 2, 3, 4, 5):  # every rung + a multi-chunk size
        np.testing.assert_array_equal(
            loaded.predict_probs(images48[:n]),
            bucketed.predict_probs(images48[:n]))
    assert [loaded._pad_target(n) for n in (1, 2, 3)] == [1, 2, 4]
    # load-time buckets are still rejected: the ladder is an export-time
    # decision (there is one program per baked rung, no more)
    with pytest.raises(ValueError, match="baked at export"):
        load_predictor(path, pad_buckets=(1, 4))


def test_exported_source_size_enforced(tiny_predictor, tmp_path):
    from irp_tpu.export import export_predictor, load_exported_predictor

    path = export_predictor(tiny_predictor, str(tmp_path / "m.irpx"),
                            source_size=48)
    loaded = load_exported_predictor(path)
    with pytest.raises(ValueError, match="exactly 48x48"):
        loaded.predict_probs(np.zeros((2, 64, 64, 3), np.uint8))


def test_export_rejects_bad_requests(tiny_predictor, tmp_path):
    from irp_tpu.config import MeshConfig
    from irp_tpu.export import export_predictor
    from irp_tpu.infer import make_predictor
    from irp_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="smaller than the model's eval"):
        export_predictor(tiny_predictor, str(tmp_path / "m.irpx"),
                         source_size=16)

    _, variables = init_classifier(TINY, jax.random.PRNGKey(0),
                                   image_size=32)
    mesh_pred = make_predictor(variables, cfg=TINY, batch_size=8,
                               mesh=make_mesh(MeshConfig()))
    with pytest.raises(ValueError, match="mesh"):
        export_predictor(mesh_pred, str(tmp_path / "m.irpx"),
                         source_size=48)

    # re-exporting a loaded artifact would nest programs — refuse
    from irp_tpu.export import load_exported_predictor
    path = export_predictor(tiny_predictor, str(tmp_path / "m1.irpx"),
                            source_size=48)
    with pytest.raises(ValueError, match="re-export"):
        export_predictor(load_exported_predictor(path),
                         str(tmp_path / "m2.irpx"), source_size=48)


def test_exported_weights_member_is_standalone(tiny_predictor, images48,
                                               tmp_path):
    """weights.npz inside the zip is a complete artifact of its own:
    extracting it and serving via load_predictor must recover the eval
    crop from embedded metadata (not fall back to 224)."""
    from irp_tpu.export import export_predictor
    from irp_tpu.infer import load_predictor

    path = export_predictor(tiny_predictor, str(tmp_path / "m.irpx"),
                            source_size=48)
    with zipfile.ZipFile(path) as zf:
        extracted = zf.extract("weights.npz", str(tmp_path))
    pred = load_predictor(extracted, batch_size=4)
    assert pred.model.config.image_size == TINY.image_size
    np.testing.assert_allclose(pred.predict_probs(images48),
                               tiny_predictor.predict_probs(images48),
                               rtol=3e-2, atol=5e-3)  # bf16 default cfg


def test_exported_gradcam_matches_live(tiny_predictor, images48, tmp_path):
    """The default export bakes the Grad-CAM program: explaining through
    the artifact is bit-identical to the live model (same platform, same
    program), with no model code on the load path."""
    from irp_tpu.explain import GradCAM
    from irp_tpu.export import (export_predictor, load_exported_predictor,
                                read_export_meta)

    path = export_predictor(tiny_predictor, str(tmp_path / "m.irpx"),
                            source_size=48)
    meta = read_export_meta(path)
    assert meta["gradcam_batch_size"] == 4  # min(8, batch_size=4)
    with zipfile.ZipFile(path) as zf:
        assert "explain.shlo" in zf.namelist()
    loaded = load_exported_predictor(path)
    live_cams, live_logits = GradCAM(tiny_predictor).explain(images48)
    got_cams, got_logits = GradCAM(loaded).explain(images48)
    np.testing.assert_array_equal(got_cams, live_cams)
    np.testing.assert_array_equal(got_logits, live_logits)
    # per-class override flows through the baked program too
    cls = np.array([2, 0, 1, 2, 0], np.int32)
    live_c, _ = GradCAM(tiny_predictor).explain(images48, class_idx=cls)
    got_c, _ = GradCAM(loaded).explain(images48, class_idx=cls)
    np.testing.assert_array_equal(got_c, live_c)

    # the baked program's batch shape is fixed: a different request is a
    # loud error, and so is a mismatched source geometry
    with pytest.raises(ValueError, match="fixes"):
        GradCAM(loaded, batch_size=3)
    with pytest.raises(ValueError, match="exactly 48x48"):
        GradCAM(loaded).explain(np.zeros((2, 64, 64, 3), np.uint8))


def test_export_without_gradcam_refuses_explain(tiny_predictor, tmp_path):
    from irp_tpu.explain import GradCAM
    from irp_tpu.export import (export_predictor, load_exported_predictor,
                                read_export_meta)

    path = export_predictor(tiny_predictor, str(tmp_path / "m.irpx"),
                            source_size=48, gradcam=False)
    assert read_export_meta(path)["gradcam_batch_size"] is None
    with zipfile.ZipFile(path) as zf:
        assert "explain.shlo" not in zf.namelist()
    with pytest.raises(ValueError, match="re-export"):
        GradCAM(load_exported_predictor(path))


def test_format_guards(tiny_predictor, tmp_path):
    from irp_tpu.export import (export_predictor, load_exported_predictor,
                                read_export_meta)

    # not an irpx zip
    bogus = tmp_path / "bogus.irpx"
    with zipfile.ZipFile(bogus, "w") as zf:
        zf.writestr("meta.json", json.dumps({"format": "other"}))
    with pytest.raises(ValueError, match="not an irpx"):
        read_export_meta(str(bogus))

    # truncated/corrupt file and missing members: one clean ValueError,
    # not a zipfile traceback
    trunc = tmp_path / "trunc.irpx"
    trunc.write_bytes(b"PK\x03\x04 not really a zip")
    with pytest.raises(ValueError, match="not a readable irpx"):
        read_export_meta(str(trunc))
    missing = tmp_path / "missing.irpx"
    with zipfile.ZipFile(missing, "w") as zf:
        zf.writestr("meta.json", json.dumps({"format": "irpx",
                                             "format_version": 1}))
    with pytest.raises(ValueError, match="not a readable irpx"):
        load_exported_predictor(str(missing))

    # a future format version must refuse loudly, not misparse
    path = export_predictor(tiny_predictor, str(tmp_path / "m.irpx"),
                            source_size=48)
    with zipfile.ZipFile(path) as zf:
        members = {n: zf.read(n) for n in zf.namelist()}
    meta = json.loads(members["meta.json"])
    meta["format_version"] = 999
    members["meta.json"] = json.dumps(meta)
    future = tmp_path / "future.irpx"
    with zipfile.ZipFile(future, "w") as zf:
        for name, blob in members.items():
            zf.writestr(name, blob)
    with pytest.raises(ValueError, match="newer"):
        load_exported_predictor(str(future))


def test_serving_daemon_from_exported_artifact(tiny_predictor, tmp_path):
    """The online daemon serves a .irpx with no model code: requests
    decode to the 256px cache contract, which is the export default, so
    the two compose; /explain runs the artifact's baked Grad-CAM
    program, and refuses cleanly when exported without one."""
    import base64
    import io
    import json as jsonmod
    import urllib.error
    import urllib.request

    from PIL import Image

    from irp_tpu.export import export_predictor, load_exported_predictor
    from irp_tpu.serve import make_server

    path = export_predictor(tiny_predictor, str(tmp_path / "m.irpx"))
    srv = make_server(load_exported_predictor(path), port=0,
                      window_ms=5.0)
    srv.start()
    try:
        buf = io.BytesIO()
        rng = np.random.default_rng(9)
        Image.fromarray(rng.integers(0, 256, (64, 64, 3),
                                     dtype=np.uint8)).save(buf, "JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/predict", data=buf.getvalue(),
            headers={"Content-Type": "image/jpeg"}, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            payload = jsonmod.loads(r.read())
        assert r.status == 200
        (pred,) = payload["predictions"]
        assert pred["label_name"] in ("a", "b", "c")
        assert 0.0 < pred["topk"][0]["prob"] <= 1.0

        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/explain", data=buf.getvalue(),
            headers={"Content-Type": "image/jpeg"}, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = jsonmod.loads(r.read())
        assert r.status == 200
        (ex,) = payload["explanations"]
        assert ex["label_name"] in ("a", "b", "c")
        png = base64.b64decode(ex["cam_png_b64"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        srv.stop()

    # exported WITHOUT the explain program: /explain refuses cleanly
    bare = export_predictor(tiny_predictor, str(tmp_path / "bare.irpx"),
                            gradcam=False)
    srv = make_server(load_exported_predictor(bare), port=0,
                      window_ms=5.0)
    srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/explain", data=buf.getvalue(),
            headers={"Content-Type": "image/jpeg"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=60)
        assert err.value.code == 500
        assert "re-export" in jsonmod.loads(err.value.read())["error"]
    finally:
        srv.stop()


def test_run_predict_export_cli_e2e(tmp_path, capsys):
    """Export via the CLI, then score images through the .irpx — the
    default source geometry (256, the cache contract) must line up with
    predict_paths' decode so the two CLIs compose."""
    from PIL import Image

    import run_predict
    from irp_tpu.train.checkpoint import save_weights_npz

    _, variables = init_classifier(TINY, jax.random.PRNGKey(1),
                                   image_size=32)
    weights = save_weights_npz(str(tmp_path / "w.npz"),
                               variables["params"],
                               variables["batch_stats"],
                               meta={"image_size": 32})
    art = str(tmp_path / "model.irpx")
    rc = run_predict.main(["--weights", weights, "--export", art,
                           "--classes", "cat,dog,fox",
                           "--cpu", "--batch-size", "2"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["exported"] == art and summary["bytes"] > 0

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (80, 80, 3),
                                     dtype=np.uint8)).save(
            img_dir / f"x{i}.jpg")
    out = str(tmp_path / "preds.csv")
    rc = run_predict.main(["--weights", art, "--images", str(img_dir),
                           "--classes", "cat,dog,fox", "--out", out,
                           "--cpu"])
    assert rc == 0
    with open(out) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 4  # header + 3 rows

    # --gradcam works straight off the artifact (baked explain program),
    # and with no --classes the CSV names must come from the artifact's
    # embedded class_names, not fall back to str indices (regression:
    # the gradcam branch once used the absent CLI arg)
    import csv as csvmod
    import glob as globmod
    cam_dir = str(tmp_path / "cams")
    cam_csv = str(tmp_path / "cam_preds.csv")
    rc = run_predict.main(["--weights", art, "--images", str(img_dir),
                           "--gradcam", cam_dir, "--out", cam_csv,
                           "--cpu"])
    assert rc == 0
    assert len(globmod.glob(cam_dir + "/*_gradcam.png")) == 3
    with open(cam_csv) as f:
        for row in csvmod.DictReader(f):
            assert row["label_name"] in {"cat", "dog", "fox"}
    capsys.readouterr()

    # one exported WITHOUT it refuses --gradcam cleanly (exit 2, no
    # traceback), while still scoring fine
    bare = str(tmp_path / "bare.irpx")
    rc = run_predict.main(["--weights", weights, "--export", bare,
                           "--export-no-gradcam", "--cpu",
                           "--batch-size", "2"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])[
        "gradcam_batch_size"] is None
    rc = run_predict.main(["--weights", bare, "--images", str(img_dir),
                           "--gradcam", cam_dir, "--cpu"])
    assert rc == 2
    assert "no Grad-CAM" in capsys.readouterr().err

    # arg validation: export is standalone, and no sources without it
    assert run_predict.main(["--weights", weights]) == 2
    assert run_predict.main(["--weights", weights, "--export", art,
                             "--images", str(img_dir)]) == 2
    assert run_predict.main(["--weights", art, "--export",
                             str(tmp_path / "again.irpx"), "--cpu"]) == 2
    # an empty --export must not silently fall through to scoring mode
    assert run_predict.main(["--weights", weights, "--export", ""]) == 2
    capsys.readouterr()

    # a non-256-source artifact cannot be fed by the CLI decode path:
    # loud exit, not an opaque XLA shape error
    art48 = str(tmp_path / "m48.irpx")
    rc = run_predict.main(["--weights", weights, "--export", art48,
                           "--export-source-size", "48", "--cpu",
                           "--batch-size", "2"])
    assert rc == 0
    assert "Python API" in capsys.readouterr().err  # the export-time note
    rc = run_predict.main(["--weights", art48, "--images", str(img_dir),
                           "--cpu"])
    assert rc == 2
    assert "256x256" in capsys.readouterr().err

    # run_serve must refuse it at startup (its decode contract is 256),
    # before binding a socket or compiling anything
    import run_serve
    rc = run_serve.main(["--weights", art48, "--cpu", "--port", "0"])
    assert rc == 2
    assert "256x256" in capsys.readouterr().err


def test_export_bakes_tta(images48, tmp_path):
    """A tta=True predictor's flip-averaged forward rides into the
    artifact (it IS the serialized program) and the meta records it;
    the loaded predictor reports tta=True (informational), load-time
    tta=True is accepted as a no-op on a TTA-baked artifact, and is
    rejected on one exported without TTA (bake-time only)."""
    from irp_tpu.export import (export_predictor, load_exported_predictor,
                                read_export_meta)
    from irp_tpu.infer import load_predictor, make_predictor

    _, variables = init_classifier(TINY, jax.random.PRNGKey(0),
                                   image_size=32)
    tta_pred = make_predictor(variables, cfg=TINY, batch_size=4, tta=True)
    path = export_predictor(tta_pred, str(tmp_path / "t.irpx"),
                            source_size=48, gradcam=False)
    assert read_export_meta(path)["tta"] is True
    loaded = load_exported_predictor(path)
    assert loaded.tta  # the artifact's metadata surfaces on the predictor
    np.testing.assert_array_equal(loaded.predict_probs(images48),
                                  tta_pred.predict_probs(images48))
    # and the TTA program differs from the plain one on asymmetric input
    plain = make_predictor(variables, cfg=TINY, batch_size=4)
    assert np.abs(loaded.predict_probs(images48)
                  - plain.predict_probs(images48)).max() > 1e-7
    # load-time tta=True on a TTA-baked artifact: accepted (a no-op)
    again = load_predictor(path, tta=True)
    assert again.tta
    np.testing.assert_array_equal(again.predict_probs(images48),
                                  tta_pred.predict_probs(images48))
    # ... but rejected on an artifact exported WITHOUT TTA
    plain_path = export_predictor(plain, str(tmp_path / "p.irpx"),
                                  source_size=48, gradcam=False)
    assert not load_predictor(plain_path).tta
    with pytest.raises(ValueError, match="tta|TTA"):
        load_predictor(plain_path, tta=True)
