"""ServingClient (irp_tpu/client.py) against a real daemon socket.

Locks the client half of the serving protocol: input-form handling
(bytes / path / uint8 array), single-vs-batch wire encoding, explain
overlay decoding, readiness polling, and error mapping.
"""

import io
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
def predictor():
    from irp_tpu.infer import make_predictor

    _, variables = init_classifier(TINY, jax.random.PRNGKey(0),
                                   image_size=32)
    return make_predictor(variables, cfg=TINY, batch_size=8,
                          class_names=["cat", "dog", "fox"])


@pytest.fixture(scope="module")
def client(predictor):
    from irp_tpu.client import ServingClient
    from irp_tpu.serve import make_server

    srv = make_server(predictor, port=0, window_ms=10.0)
    srv.start()
    yield ServingClient(f"http://127.0.0.1:{srv.port}")
    srv.stop()


@pytest.fixture(scope="module")
def images64():
    rng = np.random.default_rng(11)
    return rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8)


def test_healthz_and_wait_until_ready(client):
    health = client.wait_until_ready(timeout_s=30)
    assert health["status"] == "ok"
    assert health["model"]["num_classes"] == 3
    assert client.healthz()["model"]["class_names"] == ["cat", "dog", "fox"]


def test_predict_array_matches_local_forward(client, predictor, images64):
    """An array input rides as lossless PNG: the served probabilities
    must match the local predictor on the same pixels after the daemon's
    256px decode contract (data/pipeline.py::decode_to_rgb256)."""
    import io as iomod

    from irp_tpu.data.pipeline import decode_blobs

    [pred] = client.predict(images64[0], topk=3)
    buf = iomod.BytesIO()
    Image.fromarray(images64[0]).save(buf, "PNG")
    local = predictor.predict_probs(
        decode_blobs([buf.getvalue()], decoder="pil"))[0]
    order = np.argsort(-local)
    assert pred["label"] == int(order[0])
    assert pred["label_name"] == ["cat", "dog", "fox"][pred["label"]]
    for entry, j in zip(pred["topk"], order):
        assert entry["label"] == int(j)
        np.testing.assert_allclose(entry["prob"], float(local[j]),
                                   atol=1e-6)  # wire rounds to 6 places


def test_predict_batch_and_input_forms(client, images64, tmp_path):
    """bytes / path / array inputs, batched via the JSON-base64 body,
    come back in input order."""
    buf = io.BytesIO()
    Image.fromarray(images64[0]).save(buf, "PNG")
    path = tmp_path / "img.png"
    path.write_bytes(buf.getvalue())

    preds = client.predict([buf.getvalue(), str(path), images64[0]])
    assert len(preds) == 3
    # three encodings of the SAME pixels -> identical predictions
    assert len({p["label"] for p in preds}) == 1
    assert preds[0]["topk"][0]["prob"] == preds[2]["topk"][0]["prob"]
    assert client.predict([]) == []


def test_explain_overlay(client, images64, tmp_path):
    out = str(tmp_path / "cam.png")
    ex = client.explain(images64[0], topk=2, overlay_path=out)
    assert ex["overlay_png"][:8] == b"\x89PNG\r\n\x1a\n"
    assert os.path.getsize(out) == len(ex["overlay_png"])
    assert "cam_png_b64" not in ex
    assert len(ex["topk"]) == 2
    # class override is echoed back
    assert client.explain(images64[0], class_idx=2)["explained_class"] == 2


def test_metrics_endpoint(client, images64):
    """/metrics speaks Prometheus text format and agrees with /stats."""
    client.predict(images64[0])  # ensure at least one scored request
    text = client.metrics_text()
    stats = client.stats()
    assert "# TYPE irp_requests_total counter" in text
    assert f"irp_requests_total {stats['requests']}" in text
    assert f"irp_images_total {stats['images']}" in text
    assert "irp_latency_ms_p50 " in text
    assert ('irp_model_info{family="resnet",depth="18",num_classes="3"'
            ',image_size="32"} 1') in text
    # every exposed series carries HELP + TYPE (scrapers warn otherwise)
    names = {line.split("{")[0].split()[0] for line in text.splitlines()
             if line and not line.startswith("#")}
    for name in names:
        assert f"# TYPE {name} " in text and f"# HELP {name} " in text


def test_error_mapping(client, images64):
    from irp_tpu.client import ServingError

    with pytest.raises(ServingError) as err:
        client._request("/nope")
    assert err.value.status == 404 and "unknown path" in err.value.message
    with pytest.raises(ServingError) as err:
        client.predict(b"not an image")
    assert err.value.status == 400
    # an empty body must still be a POST: the server's 400, not a
    # misleading GET-route 404
    with pytest.raises(ServingError) as err:
        client.predict(b"")
    assert err.value.status == 400 and "empty" in err.value.message
    with pytest.raises(ValueError, match="uint8 array"):
        client.predict(np.zeros((4, 64, 64, 3), np.uint8)[..., :2])
    with pytest.raises(TypeError, match="unsupported image"):
        client.predict(12345)


def _save_tiny_weights(tmp_path, name, seed, num_classes=3):
    from irp_tpu.train.checkpoint import save_weights_npz

    cfg = ModelConfig(depth=18, num_classes=num_classes, image_size=32,
                      hidden_dim=16, compute_dtype="float32")
    _, variables = init_classifier(cfg, jax.random.PRNGKey(seed),
                                   image_size=32)
    return save_weights_npz(str(tmp_path / name), variables["params"],
                            variables["batch_stats"],
                            meta={"image_size": 32})


def test_hot_reload(tmp_path, images64):
    """POST /reload swaps the served weights with zero downtime: the
    daemon then scores exactly like a fresh predictor on the new
    artifact, Grad-CAM follows, and a bad reload leaves the old model
    serving."""
    from irp_tpu.client import ServingClient, ServingError
    from irp_tpu.data.pipeline import decode_blobs
    from irp_tpu.infer import load_predictor
    from irp_tpu.serve import make_server

    w1 = _save_tiny_weights(tmp_path, "w1.npz", seed=0)
    w2 = _save_tiny_weights(tmp_path, "w2.npz", seed=7)

    def loader(path):
        return load_predictor(path, batch_size=8)

    srv = make_server(loader(w1), port=0, window_ms=10.0, loader=loader,
                      weights_path=w1)
    srv.start()
    try:
        client = ServingClient(f"http://127.0.0.1:{srv.port}")
        health = client.wait_until_ready(timeout_s=60)
        assert health["generation"] == 0 and health["weights"] == w1

        result = client.reload(w2, timeout_s=120)
        assert result["generation"] == 1
        assert client.healthz()["weights"] == w2

        # served predictions now match a fresh local predictor on w2,
        # through the daemon's own 256px decode contract
        import io as iomod
        buf = iomod.BytesIO()
        Image.fromarray(images64[0]).save(buf, "PNG")
        [pred] = client.predict(images64[0], topk=3)
        local = load_predictor(w2, batch_size=8).predict_probs(
            decode_blobs([buf.getvalue()], decoder="pil"))[0]
        assert pred["label"] == int(np.argmax(local))
        np.testing.assert_allclose(pred["topk"][0]["prob"],
                                   float(local.max()), atol=1e-6)
        # the shared Grad-CAM was invalidated: /explain runs on w2
        assert client.explain(images64[0])["label"] == pred["label"]

        # a bad reload is a clean 400 and the old model keeps serving
        with pytest.raises(ServingError) as err:
            client.reload(str(tmp_path / "missing.npz"), timeout_s=30)
        assert err.value.status == 400
        assert client.healthz()["generation"] == 1
        assert client.predict(images64[0])[0]["label"] == pred["label"]
        assert "irp_reloads_total 1" in client.metrics_text()
    finally:
        srv.stop()


def test_reload_guards(tmp_path, client, images64):
    """Reload is 403 when disabled, and refuses a class-count mismatch
    against explicitly served class names."""
    from irp_tpu.client import ServingClient, ServingError
    from irp_tpu.infer import load_predictor
    from irp_tpu.serve import make_server

    # the module-scope daemon has no loader
    with pytest.raises(ServingError) as err:
        client.reload(str(tmp_path / "whatever.npz"), timeout_s=30)
    assert err.value.status == 403 and "--allow-reload" in err.value.message

    w3 = _save_tiny_weights(tmp_path, "w4c.npz", seed=1, num_classes=4)
    w1 = _save_tiny_weights(tmp_path, "w1.npz", seed=0)

    def loader(path):
        return load_predictor(path, batch_size=8)

    srv = make_server(loader(w1), port=0, class_names=["a", "b", "c"],
                      loader=loader, weights_path=w1)
    srv.start()
    try:
        c2 = ServingClient(f"http://127.0.0.1:{srv.port}")
        c2.wait_until_ready(timeout_s=60)
        with pytest.raises(ServingError) as err:
            c2.reload(w3, timeout_s=60)
        assert err.value.status == 400
        assert "class names" in err.value.message
        # a corrupt artifact (np.load raises zipfile.BadZipFile, which
        # is neither ValueError nor OSError) is still a clean 400
        corrupt = tmp_path / "corrupt.npz"
        corrupt.write_bytes(b"PK\x03\x04 definitely not weights")
        with pytest.raises(ServingError) as err:
            c2.reload(str(corrupt), timeout_s=30)
        assert err.value.status == 400
        # old model untouched by either failure
        assert c2.healthz()["generation"] == 0
        assert c2.predict(images64[0])[0]["label_name"] in ("a", "b", "c")
    finally:
        srv.stop()


def test_reload_failure_statuses(tmp_path, images64):
    """Only 'reload disabled' maps to 403: a loader that blows up with a
    plain RuntimeError (e.g. jax's XlaRuntimeError subclass during the
    warm compile) must be a 400 'reload failed', and the micro-batch cap
    tracks a reloaded predictor's compiled batch shape."""
    from irp_tpu.client import ServingClient, ServingError
    from irp_tpu.infer import load_predictor
    from irp_tpu.serve import make_server

    w1 = _save_tiny_weights(tmp_path, "w1.npz", seed=0)

    calls = {"n": 0}

    def loader(path):
        calls["n"] += 1
        if path == "boom":
            raise RuntimeError("device exploded")
        return load_predictor(path, batch_size=4)

    srv = make_server(load_predictor(w1, batch_size=8), port=0,
                      loader=loader, weights_path=w1)
    srv.start()
    try:
        c = ServingClient(f"http://127.0.0.1:{srv.port}")
        c.wait_until_ready(timeout_s=60)
        with pytest.raises(ServingError) as err:
            c.reload("boom", timeout_s=30)
        assert err.value.status == 400  # NOT the 403 'disabled' status
        assert "device exploded" in err.value.message
        assert calls["n"] == 1

        # derived max_batch follows the new compiled batch shape
        assert srv.batcher.max_batch == 8
        c.reload(w1, timeout_s=120)
        assert srv.batcher.predictor.batch_size == 4
        assert srv.batcher.max_batch == 4
    finally:
        srv.stop()


def test_reload_under_concurrent_traffic(tmp_path, images64):
    """Predictions during a hot reload must pair each model's
    probabilities with ITS OWN class names (the batcher stamps the
    dispatching predictor on every request) — never w1 names with w2
    probs, and never a 5xx."""
    import threading

    from irp_tpu.client import ServingClient
    from irp_tpu.infer import load_predictor
    from irp_tpu.serve import make_server

    w1 = _save_tiny_weights(tmp_path, "w1.npz", seed=0)
    w2 = _save_tiny_weights(tmp_path, "w2.npz", seed=7)
    names_for = {w1: [f"w1-{i}" for i in range(3)],
                 w2: [f"w2-{i}" for i in range(3)]}

    def loader(path):
        return load_predictor(path, class_names=names_for[path],
                              batch_size=8)

    srv = make_server(loader(w1), port=0, window_ms=2.0, loader=loader,
                      weights_path=w1)
    srv.start()
    try:
        client = ServingClient(f"http://127.0.0.1:{srv.port}")
        client.wait_until_ready(timeout_s=60)
        # each model's expected (top name, top prob) for the FIXED image
        expected = {}
        for w in (w1, w2):
            client.reload(w, timeout_s=120)
            [pred] = client.predict(images64[0], topk=1)
            expected[names_for[w][0][:2]] = pred["topk"][0]["prob"]
        assert len(set(expected.values())) == 2  # models disagree

        failures = []

        def hammer():
            for _ in range(12):
                try:
                    [pred] = client.predict(images64[0], topk=1)
                except Exception as e:  # noqa: BLE001 — collected
                    failures.append(repr(e))
                    continue
                prefix = pred["label_name"][:2]
                prob = pred["topk"][0]["prob"]
                if expected.get(prefix) != prob:
                    failures.append(
                        f"mixed pairing: name {pred['label_name']} "
                        f"with prob {prob}")

        threads = [threading.Thread(target=hammer) for _ in range(3)]
        for t in threads:
            t.start()
        for w in (w1, w2, w1, w2):  # reload repeatedly under load
            client.reload(w, timeout_s=120)
        for t in threads:
            t.join(120)
        assert not failures, failures[:5]
    finally:
        srv.stop()


def test_wait_until_ready_times_out_fast():
    from irp_tpu.client import ServingClient

    dead = ServingClient("http://127.0.0.1:9")  # discard port: refused
    with pytest.raises(TimeoutError, match="not ready"):
        dead.wait_until_ready(timeout_s=0.5, poll_s=0.1)
