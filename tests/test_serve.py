"""Online serving daemon (irp_tpu/serve.py, run_serve.py).

The reference has no serving at all (model runs only inside final-eval,
reference functions/final.py:27-63).  These tests lock the net-new online
contract: micro-batch grouping semantics, blocking submit correctness vs
the direct forward, and the HTTP surface (healthz / predict raw + JSON
base64 / topk / stats / error paths) end-to-end over a real socket.
"""

import base64
import io
import json
import os
import threading
import urllib.error
import urllib.request

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
def server(predictor):
    from irp_tpu.serve import make_server

    srv = make_server(predictor, port=0, window_ms=20.0)
    srv.start()
    yield srv
    srv.stop()


def _url(server, path):
    return f"http://127.0.0.1:{server.port}{path}"


def _get_json(server, path):
    with urllib.request.urlopen(_url(server, path), timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(server, path, body, ctype):
    req = urllib.request.Request(_url(server, path), data=body,
                                 headers={"Content-Type": ctype},
                                 method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def _jpeg_bytes(rng, size=64):
    arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=90)
    return buf.getvalue()


# -- MicroBatcher semantics (no HTTP) -------------------------------------

def test_microbatcher_groups_queued_requests(predictor):
    """Requests enqueued before the dispatch thread starts form ONE batch."""
    from irp_tpu.serve import MicroBatcher

    b = MicroBatcher(predictor, max_batch=8, window_ms=50.0,
                     autostart=False)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (5, 1, 48, 48, 3), dtype=np.uint8)
    pendings = [b.submit_async(img) for img in imgs]
    b.start()
    results = [p.wait(60.0) for p in pendings]
    b.stop()
    stats = b.stats()
    assert stats["requests"] == 5 and stats["images"] == 5
    assert stats["batches"] == 1          # grouped, not 5 dispatches
    assert stats["mean_batch_fill"] == 5.0
    # grouped results == the same rows scored alone
    direct = predictor.predict_probs(imgs.reshape(5, 48, 48, 3))
    np.testing.assert_allclose(np.concatenate(results), direct,
                               rtol=1e-5, atol=1e-6)


def test_microbatcher_caps_batch_at_max(predictor):
    from irp_tpu.serve import MicroBatcher

    b = MicroBatcher(predictor, max_batch=4, window_ms=50.0,
                     autostart=False)
    rng = np.random.default_rng(1)
    pendings = [b.submit_async(
        rng.integers(0, 256, (1, 48, 48, 3), dtype=np.uint8))
        for _ in range(10)]
    b.start()
    for p in pendings:
        p.wait(60.0)
    b.stop()
    stats = b.stats()
    assert stats["images"] == 10
    assert stats["batches"] >= 3          # 10 images / cap 4
    assert stats["mean_batch_fill"] <= 4.0


def test_latency_percentiles_nearest_rank():
    """Nearest-rank semantics: ceil(q*n) as a 1-based rank — integral
    q*n must NOT shift one rank high (the p50 of 1..10 is 5, not 6)."""
    from irp_tpu.serve import latency_percentiles

    assert latency_percentiles(list(range(1, 11)))["p50"] == 5
    assert latency_percentiles([1.0, 1000.0])["p50"] == 1.0
    got = latency_percentiles([7.0])
    assert got["p50"] == got["p99"] == 7.0
    assert latency_percentiles([]) is None


def test_microbatcher_restart_after_stop(predictor):
    """start() after stop() must genuinely serve again (the stopped
    flag is re-armed), not spawn threads that immediately exit and
    leave every submit rejected."""
    from irp_tpu.serve import MicroBatcher

    b = MicroBatcher(predictor, max_batch=4, window_ms=1.0)
    img = np.random.default_rng(2).integers(0, 256, (1, 48, 48, 3),
                                            dtype=np.uint8)
    b.submit_async(img).wait(60.0)
    b.stop()
    with pytest.raises(RuntimeError, match="stopped"):
        b.submit_async(img).wait(5.0)  # drained-rejected, surfaces here
    b.start()
    probs = b.submit_async(img).wait(60.0)
    np.testing.assert_allclose(probs, predictor.predict_probs(img),
                               rtol=1e-5, atol=1e-6)
    b.stop()


def test_microbatcher_surfaces_errors(predictor):
    """A failing forward rejects the waiters instead of hanging them."""
    from irp_tpu.serve import MicroBatcher

    class Broken:
        batch_size = 8
        model = predictor.model

        def predict_probs(self, images):
            raise RuntimeError("device fell over")

    b = MicroBatcher(Broken(), max_batch=4, window_ms=1.0)
    p = b.submit_async(np.zeros((1, 48, 48, 3), np.uint8))
    with pytest.raises(RuntimeError, match="device fell over"):
        p.wait(60.0)
    assert b.stats()["errors"] == 1
    b.stop()


def test_microbatcher_validates_input(predictor):
    """Bad requests are rejected AT SUBMIT, never poisoning a shared
    dispatch group."""
    from irp_tpu.serve import MicroBatcher

    b = MicroBatcher(predictor, autostart=False)
    with pytest.raises(ValueError):
        b.submit_async(np.zeros((2, 2), np.uint8))
    with pytest.raises(ValueError):
        b.submit_async(np.zeros((0, 48, 48, 3), np.uint8))
    # 16x16 < the 32px eval crop: caught before it can co-batch
    with pytest.raises(ValueError, match="eval crop"):
        b.submit_async(np.zeros((1, 16, 16, 3), np.uint8))
    with pytest.raises(ValueError, match="max_batch"):
        MicroBatcher(predictor, max_batch=0, autostart=False)
    assert b.stats()["requests"] == 0


def test_microbatcher_mixed_sizes_bucket_correctly(predictor):
    """Different (H,W) requests in one window dispatch per-shape, each
    getting its own correct result."""
    from irp_tpu.serve import MicroBatcher

    rng = np.random.default_rng(7)
    small = rng.integers(0, 256, (1, 48, 48, 3), dtype=np.uint8)
    large = rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)
    b = MicroBatcher(predictor, max_batch=8, window_ms=50.0,
                     autostart=False)
    ps = b.submit_async(small)
    pl = b.submit_async(large)
    b.start()
    rs, rl = ps.wait(60.0), pl.wait(60.0)
    b.stop()
    np.testing.assert_allclose(rs, predictor.predict_probs(small),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rl, predictor.predict_probs(large),
                               rtol=1e-5, atol=1e-6)
    assert b.stats()["batches"] == 2  # one per shape bucket


def test_microbatcher_sheds_load_when_queue_full(predictor):
    from irp_tpu.serve import MicroBatcher, ServerOverloadedError

    b = MicroBatcher(predictor, max_batch=4, autostart=False,
                     max_pending=2)
    img = np.zeros((1, 48, 48, 3), np.uint8)
    b.submit_async(img)
    b.submit_async(img)
    with pytest.raises(ServerOverloadedError, match="queue full"):
        b.submit_async(img)
    stats = b.stats()
    assert stats["rejected"] == 1 and stats["requests"] == 2
    b.stop()


def test_microbatcher_stop_rejects_queued_waiters(predictor):
    """stop() must not leave queued waiters blocked to their timeout."""
    from irp_tpu.serve import MicroBatcher

    b = MicroBatcher(predictor, autostart=False)
    img = np.zeros((1, 48, 48, 3), np.uint8)
    pendings = [b.submit_async(img), b.submit_async(img)]
    b.stop()
    for p in pendings:
        with pytest.raises(RuntimeError, match="batcher stopped"):
            p.wait(5.0)


# -- HTTP surface ---------------------------------------------------------

def test_healthz_reports_model_card(server):
    status, body = _get_json(server, "/healthz")
    assert status == 200 and body["status"] == "ok"
    assert body["model"] == {"family": "resnet", "depth": 18,
                             "num_classes": 3, "image_size": 32,
                             "class_names": ["cat", "dog", "fox"]}


def test_predict_raw_jpeg(server):
    rng = np.random.default_rng(2)
    status, body = _post(server, "/predict?topk=3", _jpeg_bytes(rng),
                         "image/jpeg")
    assert status == 200 and body["n"] == 1
    (pred,) = body["predictions"]
    assert pred["label_name"] in ("cat", "dog", "fox")
    assert len(pred["topk"]) == 3
    probs = [t["prob"] for t in pred["topk"]]
    assert probs == sorted(probs, reverse=True)
    assert abs(sum(probs) - 1.0) < 1e-3    # topk=3 == all classes
    assert body["latency_ms"] > 0


def test_daemon_with_pad_buckets(predictor):
    """The micro-batcher composes with bucketed padding: a lone request
    dispatches through the batch-1 program and scores like the
    full-batch daemon (to float round-off — different compiled shapes
    tile reductions differently)."""
    from irp_tpu.infer import make_predictor, power_of_two_buckets
    from irp_tpu.serve import make_server

    bucketed = make_predictor(
        {"params": predictor.params, "batch_stats": predictor.batch_stats},
        cfg=predictor.model.config, batch_size=8,
        class_names=predictor.class_names,
        pad_buckets=power_of_two_buckets(8))
    # pil decode on both sides: the comparison must only see the
    # batch-shape difference, not native-vs-PIL JPEG (+-1/255) noise
    srv = make_server(bucketed, port=0, window_ms=5.0, decoder="pil")
    srv.start()
    try:
        rng = np.random.default_rng(21)
        blob = _jpeg_bytes(rng)
        status, body = _post(srv, "/predict?topk=3", blob, "image/jpeg")
        assert status == 200
        (pred,) = body["predictions"]
        from irp_tpu.data.pipeline import decode_blobs
        want = predictor.predict_probs(decode_blobs([blob],
                                                    decoder="pil"))[0]
        np.testing.assert_allclose(
            [t["prob"] for t in pred["topk"]],
            sorted(want, reverse=True), rtol=1e-4, atol=1e-5)
    finally:
        srv.stop()


def test_reload_warms_every_bucket(predictor):
    """Hot reload must compile EVERY served bucket shape before the
    atomic swap: a post-swap cold jit (minutes-scale on TPU) inside the
    single dispatch thread would time out all queued requests —
    breaking the documented zero-downtime contract."""
    from irp_tpu.infer import make_predictor, power_of_two_buckets
    from irp_tpu.serve import make_server

    warmed = []

    def loader(path):
        p = make_predictor(
            {"params": predictor.params,
             "batch_stats": predictor.batch_stats},
            cfg=predictor.model.config, batch_size=8,
            class_names=predictor.class_names,
            pad_buckets=power_of_two_buckets(8))
        orig = p.predict_probs
        p.predict_probs = lambda x: (warmed.append(int(x.shape[0])),
                                     orig(x))[1]
        return p

    srv = make_server(predictor, port=0, loader=loader, weights_path="w0")
    try:
        srv.reload_weights("w1")
        assert warmed == [1, 2, 4, 8]  # all rungs, pre-swap
    finally:
        srv.server_close()
        srv.batcher.stop()


def test_replica_dispatch_routing_and_scores(predictor):
    """Per-device replicas (replicate_predictor): each dispatch thread
    serves its own full model copy on its own device — thread i routes
    to replica i, every replica scores identically to the base, and the
    batcher refuses a mixed-geometry replica set."""
    from irp_tpu.infer import (make_predictor, predictor_device,
                               replicate_predictor)
    from irp_tpu.serve import MicroBatcher

    reps = replicate_predictor(predictor, n=4)
    assert len({predictor_device(p) for p in reps}) == 4  # distinct chips
    rng = np.random.default_rng(31)
    imgs = rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8)
    want = predictor.predict_probs(imgs)
    for r in (reps[0], reps[3]):
        np.testing.assert_allclose(r.predict_probs(imgs), want,
                                   rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="replicas"):
        replicate_predictor(predictor, n=0)
    with pytest.raises(ValueError, match="not both"):
        replicate_predictor(predictor, devices=[None], n=2)

    mb = MicroBatcher(reps, window_ms=2.0, autostart=False)
    try:
        assert mb.predictor is reps[0]
        # load-shedding bound scales with the dispatch parallelism
        assert mb.max_pending == max(64, 8 * mb.max_batch) * 4
        for idx in (0, 2, 3):  # deterministic routing, no thread races
            pending = mb.submit_async(imgs[:1])
            mb._dispatch([pending], idx)
            assert pending.predictor is reps[idx]
            np.testing.assert_allclose(pending.wait(5.0)[0], want[0],
                                       rtol=1e-5, atol=1e-6)
        with pytest.raises(ValueError, match="replicas"):
            mb.predictor = predictor  # must not collapse the set
        # concurrent path: threads come up (one per replica) and serve;
        # a second start() is idempotent (no duplicate slots)
        mb.start()
        mb.start()
        assert sorted(t.name for t in mb._threads) == [
            f"irp-microbatch-{i}" for i in range(4)]
        pendings = [mb.submit_async(imgs[i % 3][None]) for i in range(8)]
        for i, p in enumerate(pendings):
            np.testing.assert_allclose(p.wait(30.0)[0], want[i % 3],
                                       rtol=1e-5, atol=1e-6)
        assert len(mb._threads) == 4
    finally:
        mb.stop()

    bad = make_predictor(
        {"params": predictor.params, "batch_stats": predictor.batch_stats},
        cfg=predictor.model.config, batch_size=16)  # != reps' 8
    with pytest.raises(ValueError, match="share"):
        MicroBatcher([reps[0], bad], autostart=False)


def test_reload_replicated_daemon(predictor):
    """Hot reload on a replica daemon rebuilds the FULL replica set on
    the same devices (every copy warmed pre-swap) — not a silent
    collapse to one device."""
    from irp_tpu.infer import predictor_device, replicate_predictor
    from irp_tpu.serve import make_server

    reps = replicate_predictor(predictor, n=3)
    old_devices = [predictor_device(p) for p in reps]

    def loader(path):
        from irp_tpu.infer import make_predictor
        return make_predictor(
            {"params": predictor.params,
             "batch_stats": predictor.batch_stats},
            cfg=predictor.model.config, batch_size=8,
            class_names=predictor.class_names)

    srv = make_server(reps, port=0, loader=loader, weights_path="w0")
    try:
        out = srv.reload_weights("w1")
        assert out["replicas"] == 3
        news = srv.batcher.predictors
        old_ids = {id(r) for r in reps}
        assert len(news) == 3 and not old_ids & {id(n) for n in news}
        assert [predictor_device(p) for p in news] == old_devices
        rng = np.random.default_rng(32)
        img = rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)
        np.testing.assert_allclose(
            news[2].predict_probs(img), predictor.predict_probs(img),
            rtol=1e-5, atol=1e-6)
    finally:
        srv.server_close()
        srv.batcher.stop()


def test_predict_json_batch(server):
    rng = np.random.default_rng(3)
    instances = [base64.b64encode(_jpeg_bytes(rng)).decode()
                 for _ in range(4)]
    status, body = _post(server, "/predict",
                         json.dumps({"instances": instances}).encode(),
                         "application/json")
    assert status == 200 and body["n"] == 4
    assert all(len(p["topk"]) == 1 for p in body["predictions"])


def test_predict_concurrent_clients(server, predictor):
    """Parallel clients all get their own (correct) answers back."""
    rng = np.random.default_rng(4)
    blobs = [_jpeg_bytes(rng) for _ in range(6)]
    results: dict = {}

    def hit(i):
        try:
            results[i] = _post(server, "/predict", blobs[i], "image/jpeg")
        except Exception as e:  # noqa: BLE001 — assert below
            results[i] = e

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert len(results) == 6
    from irp_tpu.data.pipeline import decode_blobs
    expect = np.argmax(
        predictor.predict_probs(decode_blobs(blobs)), axis=1)
    for i, res in results.items():
        assert not isinstance(res, Exception), res
        status, body = res
        assert status == 200
        assert body["predictions"][0]["label"] == int(expect[i])


def test_stats_counts_requests(server):
    rng = np.random.default_rng(6)
    _post(server, "/predict", _jpeg_bytes(rng), "image/jpeg")
    status, body = _get_json(server, "/stats")
    assert status == 200
    assert body["requests"] >= 1 and body["images"] >= body["batches"] >= 1
    assert "latency_ms" in body and body["latency_ms"]["p50"] > 0


@pytest.mark.parametrize("body,ctype,detail", [
    (b"", "image/jpeg", "empty"),
    (b"not an image", "image/jpeg", "bad request"),
    (json.dumps({"instances": []}).encode(), "application/json",
     "bad request"),
    (json.dumps({"instances": ["!!!not-base64!!!"]}).encode(),
     "application/json", "bad request"),
    (json.dumps([1, 2, 3]).encode(), "application/json", "bad request"),
    (json.dumps({"instances": [3]}).encode(), "application/json",
     "bad request"),
    (b"{truncated", "application/json", "bad request"),
])
def test_predict_rejects_bad_input(server, body, ctype, detail):
    req = urllib.request.Request(_url(server, "/predict"), data=body,
                                 headers={"Content-Type": ctype},
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400
    assert detail in json.loads(exc.value.read())["error"]


def test_explain_endpoint(server):
    """Grad-CAM over HTTP: prediction + decodable overlay PNG."""
    import io as iomod

    from PIL import Image

    rng = np.random.default_rng(8)
    status, body = _post(server, "/explain?topk=2", _jpeg_bytes(rng),
                         "image/jpeg")
    assert status == 200 and body["n"] == 1
    (exp,) = body["explanations"]
    assert exp["label_name"] in ("cat", "dog", "fox")
    assert exp["explained_class"] == exp["label"]
    assert len(exp["topk"]) == 2
    png = base64.b64decode(exp["cam_png_b64"])
    assert png[:4] == b"\x89PNG"
    arr = np.asarray(Image.open(iomod.BytesIO(png)))
    assert arr.shape == (32, 32, 3)  # overlay on the eval crop


def test_explain_specific_class_and_validation(server):
    rng = np.random.default_rng(9)
    status, body = _post(server, "/explain?class=1", _jpeg_bytes(rng),
                         "image/jpeg")
    assert status == 200
    assert body["explanations"][0]["explained_class"] == 1
    # /explain traffic shows up in /stats under its own counters
    _, stats = _get_json(server, "/stats")
    assert stats["explain"]["requests"] >= 1
    assert stats["explain"]["latency_ms"]["p50"] > 0
    # /predict ignores the 'class' param (even non-integer) rather
    # than 400ing over a value it never reads
    status, body = _post(server, "/predict?class=cat", _jpeg_bytes(rng),
                         "image/jpeg")
    assert status == 200 and body["n"] == 1
    req = urllib.request.Request(
        _url(server, "/explain?class=7"), data=_jpeg_bytes(rng),
        headers={"Content-Type": "image/jpeg"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400


def test_explain_matches_predict_under_tta(predictor):
    """A TTA daemon's /explain must report the flip-averaged scores
    /predict serves, not the explain program's single-view logits."""
    from irp_tpu.infer import make_predictor
    from irp_tpu.serve import make_server

    tta_pred = make_predictor(
        {"params": predictor.params, "batch_stats": predictor.batch_stats},
        cfg=TINY, batch_size=8, class_names=["cat", "dog", "fox"],
        tta=True)
    srv = make_server(tta_pred, port=0, window_ms=5.0)
    srv.start()
    try:
        body = _jpeg_bytes(np.random.default_rng(21))
        _, pred = _post(srv, "/predict?topk=3", body, "image/jpeg")
        _, exp = _post(srv, "/explain?topk=3", body, "image/jpeg")
        p, e = pred["predictions"][0], exp["explanations"][0]
        assert e["label"] == p["label"]
        assert e["explained_class"] == p["label"]
        assert e["topk"] == p["topk"]  # same probs to 6 decimals
    finally:
        srv.stop()


def test_unknown_paths_404(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(_url(server, "/nope"), timeout=30)
    assert exc.value.code == 404


def test_serve_with_data_parallel_mesh(predictor):
    """The daemon composes with a mesh predictor: batches shard over the
    8 virtual devices and answers match the single-device forward."""
    from irp_tpu.config import MeshConfig
    from irp_tpu.infer import make_predictor
    from irp_tpu.parallel.mesh import make_mesh
    from irp_tpu.serve import make_server

    mesh = make_mesh(MeshConfig())
    dp = make_predictor(
        {"params": predictor.params, "batch_stats": predictor.batch_stats},
        cfg=TINY, batch_size=8, mesh=mesh,
        class_names=["cat", "dog", "fox"])
    srv = make_server(dp, port=0, window_ms=5.0)
    srv.start()
    try:
        rng = np.random.default_rng(10)
        blob = _jpeg_bytes(rng)
        status, body = _post(srv, "/predict", blob, "image/jpeg")
        assert status == 200
        from irp_tpu.data.pipeline import decode_blobs
        expect = int(np.argmax(
            predictor.predict_probs(decode_blobs([blob])), axis=1)[0])
        assert body["predictions"][0]["label"] == expect
    finally:
        srv.stop()


def test_class_name_count_mismatch_rejected(predictor):
    from irp_tpu.serve import make_server

    with pytest.raises(ValueError, match="class names"):
        make_server(predictor, port=0, class_names=["just-one"])


# -- CLI ------------------------------------------------------------------

def test_run_serve_cli_replicas_e2e(tmp_path, predictor):
    """--replicas 2 boots a per-device replica set: healthz reports it,
    requests score through the shared queue, and combining --replicas
    with --data-parallel is a clean CLI error (they are alternative
    multi-device strategies)."""
    import subprocess
    import sys
    import time

    from irp_tpu.train.checkpoint import save_weights_npz
    from irp_tpu.utils.subproc import cpu_child_env

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    weights = tmp_path / "w.npz"
    save_weights_npz(str(weights), predictor.params, predictor.batch_stats,
                     meta={"image_size": 32})
    env = cpu_child_env(n_devices=2)

    bad = subprocess.run(
        [sys.executable, os.path.join(repo, "run_serve.py"), "--weights",
         str(weights), "--cpu", "--replicas", "auto", "--data-parallel"],
        capture_output=True, text=True, env=env, timeout=120)
    assert bad.returncode == 2 and "alternative strategies" in bad.stderr

    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "run_serve.py"), "--weights",
         str(weights), "--port", "0", "--cpu", "--batch-size", "4",
         "--replicas", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)
    try:
        port = None
        deadline = time.monotonic() + 180
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if not line and proc.poll() is not None:
                raise AssertionError("run_serve exited before serving")
            if line.startswith("serving on http://"):
                port = int(line.split(":")[2].split()[0])
                break
        assert port, "no serving line within 180s"
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["replicas"] == 2
        rng = np.random.default_rng(6)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=_jpeg_bytes(rng),
            headers={"Content-Type": "image/jpeg"}, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            body = json.loads(r.read())
        assert body["n"] == 1
        proc.terminate()
        out, _ = proc.communicate(timeout=30)
        assert proc.returncode == 0, out
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(10)


def test_run_serve_cli_e2e(tmp_path, predictor):
    """run_serve.py end-to-end: artifact -> daemon -> scored request."""
    import subprocess
    import sys
    import time

    from irp_tpu.train.checkpoint import save_weights_npz
    from irp_tpu.utils.subproc import cpu_child_env

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    weights = tmp_path / "w.npz"
    save_weights_npz(str(weights), predictor.params, predictor.batch_stats,
                     meta={"image_size": 32})
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "run_serve.py"), "--weights",
         str(weights), "--classes", "cat,dog,fox", "--port", "0",
         "--cpu", "--batch-size", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=cpu_child_env())
    try:
        port = None
        deadline = time.monotonic() + 180
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if not line and proc.poll() is not None:
                raise AssertionError("run_serve exited before serving")
            if line.startswith("serving on http://"):
                port = int(line.split(":")[2].split()[0])
                break
        assert port, "no serving line within 180s"
        rng = np.random.default_rng(5)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=_jpeg_bytes(rng),
            headers={"Content-Type": "image/jpeg"}, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            body = json.loads(r.read())
        assert body["n"] == 1
        assert body["predictions"][0]["label_name"] in ("cat", "dog", "fox")
        # SIGTERM (docker/k8s/systemd stop) drains gracefully: the
        # daemon prints its shutdown line and exits 0, not a kill
        proc.terminate()
        out, _ = proc.communicate(timeout=30)
        assert proc.returncode == 0, out
        assert "shutting down" in out
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(10)
