"""Online inference serving: a micro-batched HTTP daemon.

The reference has no serving story at all — its trained model only ever
runs inside the final-eval loop (reference functions/final.py:27-63) and
the repository ships no way to score new data after training.  The batch
path here is ``irp_tpu.infer`` / ``run_predict.py``; this module is the
*online* half: a long-lived daemon that answers scoring requests over
HTTP while keeping the TPU fed with full batches.

TPU-first design: the chip wants large fixed-shape batches (one compiled
program, MXU-sized dispatches), while online clients send one image at a
time.  The bridge is a micro-batcher (the same idea as TF Serving's
request batching): requests enqueue, a single dispatch thread drains the
queue up to ``max_batch`` images or ``window_ms``, whichever comes first,
and runs ONE padded forward (``Predictor.predict_probs`` — already a
single fixed-shape compiled program, infer.py:141-149) for the whole
group.  Decode (JPEG -> 256x256 uint8, the cache contract) happens in
the HTTP handler threads, so the dispatch thread's critical path is pure
device work.

Everything is stdlib: ``http.server.ThreadingHTTPServer`` + ``queue`` +
``threading``.  No new dependencies.

Endpoints
---------
- ``GET /healthz``  — liveness + model card (depth/classes/crop size).
- ``GET /stats``    — request/batch counters, mean batch fill, latency
  percentiles (p50/p90/p99 over the last 1024 requests).
- ``GET /metrics``  — the same counters in Prometheus text exposition
  format, for a production scrape loop.
- ``POST /predict`` — score images.  Either a raw image body
  (``Content-Type: image/jpeg`` etc.) or JSON
  ``{"instances": ["<base64 image>", ...]}``.  ``?topk=k`` selects how
  many (name, prob) pairs each prediction carries.
- ``POST /explain`` — same inputs; returns each image's prediction PLUS
  a Grad-CAM overlay PNG (base64) showing which regions drove it
  (irp_tpu.explain).  ``?class=i`` explains a specific class instead of
  the predicted one.
- ``POST /reload`` — ``{"weights": "<path>"}``: hot-swap the served
  model with zero downtime (new weights are loaded and warm-compiled
  BEFORE the atomic swap).  Only when launched with a loader
  (``run_serve.py --allow-reload``); 403 otherwise.
"""

from __future__ import annotations

import base64
import json
import math
import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from irp_tpu.infer import Predictor

_STOP = object()


def latency_percentiles(latencies_ms, qs=(0.50, 0.90, 0.99),
                        digits: int = 3) -> Optional[dict]:
    """{"p50": ..., ...} nearest-rank percentiles, or None if empty.

    The one shared implementation for /stats, explain stats, and the
    serving loadgen (tools/bench_serve.py)."""
    lat = sorted(latencies_ms)
    if not lat:
        return None
    # nearest-rank: ceil(q*n) as a 1-based rank -> index ceil(q*n)-1
    # (int(q*n) would sit one rank HIGH whenever q*n is integral — e.g.
    # the p50 of [1..10] is 5, not 6)
    n = len(lat)
    return {f"p{int(q * 100)}": round(
        lat[min(max(math.ceil(q * n) - 1, 0), n - 1)], digits)
        for q in qs}


class ServerOverloadedError(RuntimeError):
    """The request queue is full — shed load instead of growing it."""


class ReloadDisabledError(RuntimeError):
    """POST /reload on a daemon launched without a loader (-> HTTP 403).

    A dedicated type so the handler's 403 mapping can never swallow a
    real runtime failure (e.g. jaxlib's XlaRuntimeError is a
    RuntimeError subclass)."""


@dataclass
class _Pending:
    """One enqueued request: n images awaiting a shared dispatch."""

    images: np.ndarray                  # (n, H, W, 3) uint8
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None  # (n, num_classes) float32
    error: Optional[BaseException] = None
    t_enqueue: float = field(default_factory=time.monotonic)
    cancelled: bool = False             # waiter gave up; skip the forward
    # the predictor that actually served this request — stamped at
    # dispatch so a concurrent hot reload can never pair one model's
    # probabilities with another model's class names
    predictor: Optional[Predictor] = None

    def wait(self, timeout: Optional[float] = None) -> np.ndarray:
        if not self.event.wait(timeout):
            # best-effort: if the dispatch thread hasn't picked this up
            # yet it will drop it instead of burning a forward on a
            # request nobody is waiting for
            self.cancelled = True
            raise TimeoutError("inference request timed out")
        if self.error is not None:
            raise self.error
        return self.result


class MicroBatcher:
    """Groups concurrent requests into single padded-batch dispatches.

    One dispatch thread owns the device: it blocks for the first pending
    request, keeps draining the queue until ``max_batch`` images are in
    hand or ``window_ms`` has elapsed since the first, then runs ONE
    ``Predictor.predict_probs`` for the group.  Under load the window
    never waits (the queue is already full); at low load a lone request
    pays at most ``window_ms`` extra latency.
    """

    def __init__(self, predictor, max_batch: Optional[int] = None,
                 window_ms: float = 5.0, autostart: bool = True,
                 max_pending: Optional[int] = None):
        # ``predictor`` is one Predictor or a sequence of per-device
        # replicas (irp_tpu.infer.replicate_predictor): one dispatch
        # thread per replica, all draining the shared queue, so
        # concurrent micro-batches run on different chips in parallel
        preds = (list(predictor) if isinstance(predictor, (list, tuple))
                 else [predictor])
        if not preds:
            raise ValueError("need at least one predictor")
        if len(preds) > 1 and len({
                (p.batch_size, p.pad_buckets,
                 p.model.config.image_size, p.num_classes)
                for p in preds}) != 1:
            raise ValueError(
                "replicas must share batch_size/pad_buckets/crop/classes "
                "— build them with replicate_predictor from ONE base")
        self.predictors: List[Predictor] = preds
        self.max_batch = (preds[0].batch_size if max_batch is None
                          else int(max_batch))
        if self.max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {self.max_batch}")
        self.window_s = max(float(window_ms), 0.0) / 1e3
        # Bounded queue = load shedding: beyond ~8 batches of backlog
        # PER DISPATCH THREAD a request would time out waiting anyway,
        # so reject at the door (ServerOverloadedError -> HTTP 503)
        # instead of queueing work nobody will collect.
        self.max_pending = (max(64, 8 * self.max_batch) * len(preds)
                            if max_pending is None else int(max_pending))
        self._queue: queue.Queue = queue.Queue(maxsize=self.max_pending)
        self._threads: List[threading.Thread] = []
        self._stopped = False
        self._lock = threading.Lock()
        self._stats = {"requests": 0, "images": 0, "batches": 0,
                       "batch_images_sum": 0, "errors": 0, "rejected": 0,
                       "cancelled": 0}
        self._latencies_ms: deque = deque(maxlen=1024)
        if autostart:
            self.start()

    @property
    def predictor(self) -> Predictor:
        """The served model (first replica when there are several)."""
        return self.predictors[0]

    @predictor.setter
    def predictor(self, value: Predictor) -> None:
        if len(self.predictors) > 1:
            # a single assignment would silently collapse the replica
            # set to one device — reload paths must swap .predictors
            raise ValueError(
                "this batcher serves replicas; assign a full list to "
                ".predictors instead")
        self.predictors = [value]

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> None:
        # A stopped batcher must not silently "restart" into a dead one:
        # stop() leaves _stopped set (submit rejects, _run loops exit
        # immediately), so a stop->start cycle would spawn threads that
        # drain and die while start() reports success.  Re-arm the flag
        # here so start() genuinely means "serving again".
        self._stopped = False
        # one dispatch thread per replica index: slot i always routes to
        # predictors[i], so a respawn after a dead/lost thread restores
        # THAT replica's service instead of doubling up another's
        if len(self._threads) != len(self.predictors):
            alive = {t.name: t for t in self._threads if t.is_alive()}
            self._threads = [alive.get(f"irp-microbatch-{i}")
                             for i in range(len(self.predictors))]
        for idx, t in enumerate(self._threads):
            if t is None or not t.is_alive():
                t = threading.Thread(target=self._run, args=(idx,),
                                     daemon=True,
                                     name=f"irp-microbatch-{idx}")
                t.start()
                self._threads[idx] = t

    def stop(self, timeout: float = 10.0) -> None:
        # flag first: new submits reject immediately, and _run's polling
        # get() notices even when the sentinel can't be enqueued
        self._stopped = True
        for _ in self._threads:
            try:
                # fast-path wake; NEVER a blocking put — a full queue
                # with a dispatch thread stuck on a hung device (the
                # documented wedged-tunnel mode) would hang stop()
                # forever before its join timeout even started
                self._queue.put_nowait(_STOP)
            except queue.Full:
                break
        # ONE shared deadline: N wedged threads must not stretch stop()
        # to N x timeout (a k8s stop grace period would SIGKILL mid-drain)
        deadline = time.monotonic() + timeout
        for t in self._threads:
            if t is not None:
                t.join(max(0.0, deadline - time.monotonic()))
        self._threads = []
        # anything still queued (incl. a never-started batcher) must not
        # leave its waiter blocked until the full request timeout
        self._drain_reject(RuntimeError("batcher stopped"))

    def _drain_reject(self, exc: BaseException) -> None:
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is _STOP:
                continue
            item.error = exc
            item.event.set()

    # -- client side -------------------------------------------------------
    def submit_async(self, images_u8: np.ndarray) -> _Pending:
        """Enqueue (n,H,W,3) uint8; returns a handle to ``wait()`` on.

        Raises ``ValueError`` for malformed/undersized input (validated
        HERE so a bad request can never poison the co-batched neighbors
        it would have shared a dispatch with) and
        :class:`ServerOverloadedError` when the bounded queue is full.
        """
        images_u8 = np.ascontiguousarray(images_u8, np.uint8)
        if images_u8.ndim == 3:
            images_u8 = images_u8[None]
        if images_u8.ndim != 4 or images_u8.shape[-1] != 3:
            raise ValueError(
                f"expected (n,H,W,3) uint8, got {images_u8.shape}")
        if images_u8.shape[0] == 0:
            raise ValueError("empty request")
        crop = self.predictor.model.config.image_size
        h, w = images_u8.shape[1:3]
        if h < crop or w < crop:
            raise ValueError(
                f"images are {h}x{w} but the model's eval crop is "
                f"{crop}x{crop}")
        if self._stopped:
            raise RuntimeError("batcher stopped")
        pending = _Pending(images=images_u8)
        try:
            self._queue.put_nowait(pending)
        except queue.Full:
            with self._lock:
                self._stats["rejected"] += 1
            raise ServerOverloadedError(
                f"request queue full ({self.max_pending} pending)") from None
        if self._stopped:
            # raced stop(): its drain may already have run, so nothing
            # would ever service this pending — reject everything queued
            self._drain_reject(RuntimeError("batcher stopped"))
        with self._lock:
            self._stats["requests"] += 1
            self._stats["images"] += int(images_u8.shape[0])
        return pending

    def submit(self, images_u8: np.ndarray,
               timeout: Optional[float] = 60.0) -> np.ndarray:
        """Blocking score: (n,H,W,3) uint8 -> (n,num_classes) float32."""
        return self.submit_async(images_u8).wait(timeout)

    # -- dispatch thread ---------------------------------------------------
    def _run(self, idx: int = 0) -> None:
        while True:
            try:
                # polling get: stop() may be unable to enqueue its
                # sentinel (full queue), so the flag must be observable
                # without one
                item = self._queue.get(timeout=0.25)
            except queue.Empty:
                if self._stopped:
                    self._drain_reject(RuntimeError("batcher stopped"))
                    return
                continue
            if item is _STOP:
                self._drain_reject(RuntimeError("batcher stopped"))
                return
            group: List[_Pending] = [item]
            total = int(item.images.shape[0])
            deadline = time.monotonic() + self.window_s
            stopping = False
            while total < self.max_batch:
                remaining = deadline - time.monotonic()
                try:
                    nxt = (self._queue.get_nowait() if remaining <= 0
                           else self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
                if nxt is _STOP:
                    stopping = True
                    break
                group.append(nxt)
                total += int(nxt.images.shape[0])
            self._dispatch(group, idx)
            if stopping:
                self._drain_reject(RuntimeError("batcher stopped"))
                return

    def _dispatch(self, group: List[_Pending], idx: int = 0) -> None:
        live = [p for p in group if not p.cancelled]
        if len(live) < len(group):
            with self._lock:
                self._stats["cancelled"] += len(group) - len(live)
            for p in group:
                if p.cancelled:
                    p.event.set()
        # mixed spatial sizes can't share one np.concatenate/forward;
        # bucket by (H, W) so shapes never cross-contaminate a dispatch
        buckets: dict = {}
        for p in live:
            buckets.setdefault(p.images.shape[1:3], []).append(p)
        for bucket in buckets.values():
            self._dispatch_same_shape(bucket, idx)

    def _dispatch_same_shape(self, group: List[_Pending],
                             idx: int = 0) -> None:
        # ONE list read: hot reload swaps .predictors atomically, so a
        # dispatch serves a consistent replica from either generation
        preds = self.predictors
        predictor = preds[idx % len(preds)]
        for p in group:
            p.predictor = predictor
        try:
            images = (group[0].images if len(group) == 1 else
                      np.concatenate([p.images for p in group], axis=0))
            probs = predictor.predict_probs(images)
        except BaseException as e:  # noqa: BLE001 — delivered to waiters
            with self._lock:
                self._stats["errors"] += len(group)
            for p in group:
                p.error = e
                p.event.set()
            return
        done = time.monotonic()
        off = 0
        for p in group:
            n = int(p.images.shape[0])
            p.result = probs[off:off + n]
            off += n
            p.event.set()
        with self._lock:
            self._stats["batches"] += 1
            self._stats["batch_images_sum"] += off
            for p in group:
                self._latencies_ms.append((done - p.t_enqueue) * 1e3)

    # -- observability -----------------------------------------------------
    def stats(self) -> dict:
        with self._lock:
            s = dict(self._stats)
            lat = sorted(self._latencies_ms)
        s["mean_batch_fill"] = (s["batch_images_sum"] / s["batches"]
                                if s["batches"] else 0.0)
        pcts = latency_percentiles(lat)
        if pcts is not None:
            s["latency_ms"] = pcts
        return s


def _decode_request_blobs(blobs: List[bytes], decoder: str) -> np.ndarray:
    from irp_tpu.data.pipeline import decode_blobs

    return decode_blobs(blobs, decoder=decoder)


def _topk_rows(probs: np.ndarray, names, topk: int) -> List[dict]:
    """Per-image {label, label_name, topk: [...]} dicts from (N, K)
    softmax — the one formatting implementation shared by /predict and
    /explain (identical clamping/name-fallback/rounding on both paths)."""
    k = max(1, min(topk, probs.shape[1]))
    idx = np.argsort(-probs, axis=1)[:, :k]
    rows = []
    for i in range(probs.shape[0]):
        label = int(idx[i, 0])
        rows.append({
            "label": label,
            "label_name": (names[label] if names else str(label)),
            "topk": [{"label": int(j),
                      "name": (names[int(j)] if names else str(int(j))),
                      "prob": round(float(probs[i, j]), 6)}
                     for j in idx[i]]})
    return rows


class _Handler(BaseHTTPRequestHandler):
    """Routes /healthz, /stats, /predict onto the owning server's batcher."""

    server: "InferenceServer"
    # Batched HTTP/1.1 clients reuse connections; keep default protocol
    protocol_version = "HTTP/1.1"
    # Socket read/write timeout (BaseHTTPRequestHandler applies it via
    # connection.settimeout).  Without it a client that sends a short
    # body under a large Content-Length — or parks an idle keep-alive
    # connection — pins a handler thread FOREVER, and none of the other
    # overload bounds (queue depth, explain slots, request size) cover
    # it.  Server-side compute (e.g. a minutes-scale /reload compile)
    # is unaffected: the timeout only arms blocking socket ops.
    timeout = 120.0

    def log_message(self, fmt, *args):  # quiet by default
        if self.server.verbose:
            super().log_message(fmt, *args)

    def _send_json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler contract
        path = urlparse(self.path).path
        if path == "/healthz":
            cfg = self.server.batcher.predictor.model.config
            self._send_json(200, {
                "status": "ok",
                "uptime_s": round(time.monotonic() - self.server.t_start, 1),
                "generation": self.server._generation,
                "weights": self.server._weights_path,
                "replicas": len(self.server.batcher.predictors),
                # depth only means anything for the resnet family
                # (ModelConfig.depth is a resnet-only field; reporting
                # its dataclass default for vit/efficientnet/convnext
                # would mis-identify the served model)
                "model": {"family": cfg.family,
                          **({"depth": cfg.depth}
                             if cfg.family == "resnet" else {}),
                          "num_classes": cfg.num_classes,
                          "image_size": cfg.image_size,
                          "class_names": list(self.server.class_names or [])
                          or None}})
        elif path == "/stats":
            stats = self.server.batcher.stats()
            stats["explain"] = self.server.explain_stats()
            self._send_json(200, stats)
        elif path == "/metrics":
            body = self.server.metrics_text().encode()
            self.send_response(200)
            self.send_header("Content-Type",
                             "text/plain; version=0.0.4; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self._send_json(404, {"error": f"unknown path {path}"})

    def _do_reload(self, body: bytes) -> None:
        try:
            payload = json.loads(body)
            weights = payload.get("weights") if isinstance(payload, dict) \
                else None
            if not isinstance(weights, str) or not weights:
                raise ValueError('body must be {"weights": "<path>"}')
        except ValueError as e:
            self._send_json(400, {"error": f"bad request: {e}"})
            return
        try:
            result = self.server.reload_weights(weights)
        except ReloadDisabledError as e:
            self._send_json(403, {"error": str(e)})
            return
        except Exception as e:  # noqa: BLE001 — bad artifact / failed
            # load / failed warm compile: the OLD model keeps serving,
            # and a dropped connection must never be the answer (a
            # corrupt .npz raises zipfile.BadZipFile, jax raises
            # XlaRuntimeError — no clean exception whitelist exists)
            self._send_json(400, {"error": f"reload failed: {e}",
                                  "generation": self.server._generation})
            return
        self._send_json(200, result)

    def do_POST(self):  # noqa: N802
        parsed = urlparse(self.path)
        if parsed.path not in ("/predict", "/explain", "/reload"):
            # body unread: keep-alive would misparse its bytes as the
            # next request line, so drop the connection on early returns
            self.close_connection = True
            self._send_json(404, {"error": f"unknown path {parsed.path}"})
            return
        try:
            query = parse_qs(parsed.query)
            topk = int(query.get("topk", ["1"])[0])
            explain_cls = None
            if parsed.path == "/explain":
                # /predict ignores unknown params (incl. 'class') —
                # don't 400 a request over a param it never reads
                cls_q = query.get("class", [None])[0]
                explain_cls = None if cls_q is None else int(cls_q)
            length = int(self.headers.get("Content-Length") or 0)
        except ValueError:
            self.close_connection = True
            self._send_json(400, {"error": "topk, class and Content-Length "
                                           "must be integers"})
            return
        if length <= 0:
            self._send_json(400, {"error": "empty request body"})
            return
        if length > self.server.max_request_bytes:
            self.close_connection = True
            self._send_json(413, {"error": "request body too large"})
            return
        body = self.rfile.read(length)
        if parsed.path == "/reload":
            self._do_reload(body)
            return
        ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
        try:
            if ctype == "application/json":
                payload = json.loads(body)
                b64s = (payload.get("instances")
                        if isinstance(payload, dict) else None)
                if (not isinstance(b64s, list) or not b64s
                        or not all(isinstance(s, (str, bytes))
                                   for s in b64s)):
                    raise ValueError(
                        "JSON body must be {\"instances\": [<base64>, ...]}")
                blobs = [base64.b64decode(s, validate=True) for s in b64s]
            else:
                blobs = [body]
            images = _decode_request_blobs(blobs, self.server.decoder)
        except Exception as e:  # noqa: BLE001 — any unparseable body is
            # the client's fault; a dropped connection with no response
            # (and a handler-thread traceback) must never be the answer
            self._send_json(400, {"error": f"bad request: {e}"})
            return
        if parsed.path == "/explain":
            self._do_explain(images, topk, explain_cls)
            return
        t0 = time.monotonic()
        try:
            pending = self.server.batcher.submit_async(images)
            probs = pending.wait(timeout=self.server.request_timeout_s)
        except TimeoutError:
            self._send_json(503, {"error": "inference timed out"})
            return
        except ServerOverloadedError as e:
            self._send_json(503, {"error": str(e)})
            return
        except Exception as e:  # noqa: BLE001 — surfaced to the client
            self._send_json(500, {"error": f"inference failed: {e}"})
            return
        # names from the predictor that SERVED this dispatch (stamped by
        # the batcher): a concurrent hot reload cannot pair these probs
        # with another model's labels
        names = (pending.predictor.class_names
                 if pending.predictor is not None
                 else self.server.class_names)
        preds = _topk_rows(probs, names, topk)
        self._send_json(200, {
            "predictions": preds, "n": len(preds),
            "latency_ms": round((time.monotonic() - t0) * 1e3, 3)})

    def _do_explain(self, images, topk: int, explain_cls) -> None:
        """Grad-CAM for each image: prediction + overlay PNG (base64).

        An interactive diagnostic path — runs in the handler thread
        (JAX dispatch is thread-safe), not through the micro-batcher;
        throughput belongs to /predict.
        """
        import io as iomod

        from PIL import Image

        from irp_tpu.explain import center_crop_u8, overlay_cam

        if not self.server._explain_slots.acquire(blocking=False):
            self._send_json(503, {"error": "explain capacity saturated; "
                                           "retry shortly"})
            return
        t0 = time.monotonic()
        try:
            # ONE GradCAM snapshot: validation, compute, and label
            # formatting all use ITS predictor, so a concurrent hot
            # reload can never mix two models' class counts or names
            gc = self.server.gradcam()
            predictor = gc.predictor
            num_classes = predictor.num_classes
            if explain_cls is not None and not (0 <= explain_cls
                                                < num_classes):
                self._send_json(400, {"error": f"class must be in "
                                               f"[0, {num_classes})"})
                return
            if predictor.tta:
                # the explain program is single-view; a TTA predictor's
                # reported scores must come from the flip-averaged
                # forward (small-batch scorer riding on the GradCAM
                # snapshot), with the overlay pinned to the reported
                # class
                probs = gc.tta_scorer.predict_probs(images)
                cls = (np.argmax(probs, axis=1).astype(np.int32)
                       if explain_cls is None
                       else np.full((images.shape[0],), explain_cls,
                                    np.int32))
                cams, _ = gc.explain(images, class_idx=cls)
            else:
                cams, logits = gc.explain(
                    images, class_idx=(None if explain_cls is None
                                       else np.full((images.shape[0],),
                                                    explain_cls,
                                                    np.int32)))
        except Exception as e:  # noqa: BLE001 — surfaced to the client
            self._send_json(500, {"error": f"explain failed: {e}"})
            return
        finally:
            self.server._explain_slots.release()
        self.server.record_explain(int(images.shape[0]),
                                   (time.monotonic() - t0) * 1e3)
        from irp_tpu.infer import softmax_np

        if not predictor.tta:
            probs = softmax_np(logits)
        crop = predictor.model.config.image_size
        cropped = center_crop_u8(images, crop)
        out = _topk_rows(probs, predictor.class_names, topk)
        for i, row in enumerate(out):
            buf = iomod.BytesIO()
            Image.fromarray(overlay_cam(cropped[i], cams[i])).save(
                buf, "PNG")
            row["explained_class"] = (explain_cls
                                      if explain_cls is not None
                                      else row["label"])
            row["cam_png_b64"] = base64.b64encode(buf.getvalue()).decode()
        self._send_json(200, {
            "explanations": out, "n": len(out),
            "latency_ms": round((time.monotonic() - t0) * 1e3, 3)})


class InferenceServer(ThreadingHTTPServer):
    """HTTP front-end over a :class:`MicroBatcher`.

    Build via :func:`make_server`; ``.start()`` serves on a daemon
    thread (tests / embedding), ``.serve_forever()`` blocks (CLI).
    """

    daemon_threads = True
    # socketserver's default listen backlog is 5; handler threads hold
    # the GIL for seconds per micro-batch on a slow backend, starving the
    # accept loop — bursts of fresh connections (clients without
    # keep-alive open one per request) then overflow the backlog and
    # surface as ECONNRESET at the client (observed at 0.25% under a
    # 16-way loadgen against the tunnel, artifacts/chip/bench_serve.log)
    request_queue_size = 128

    def __init__(self, address, batcher: MicroBatcher,
                 class_names=None, decoder: str = "auto",
                 request_timeout_s: float = 60.0,
                 max_request_bytes: int = 64 * 1024 * 1024,
                 max_concurrent_explains: int = 2,
                 verbose: bool = False,
                 loader=None, weights_path: Optional[str] = None):
        self.batcher = batcher
        self.class_names = list(class_names) if class_names else None
        if (self.class_names is not None and len(self.class_names)
                != batcher.predictor.num_classes):
            raise ValueError(
                f"{len(self.class_names)} class names for a "
                f"{batcher.predictor.num_classes}-class model")
        if self.class_names is not None:
            # the predictor is the per-dispatch source of truth for
            # names (see _Pending.predictor) — sync an explicit override
            # onto every replica so all views always agree
            for p in batcher.predictors:
                p.class_names = self.class_names
        self.decoder = decoder
        self.request_timeout_s = request_timeout_s
        self.max_request_bytes = max_request_bytes
        self.verbose = verbose
        self.t_start = time.monotonic()
        self._thread: Optional[threading.Thread] = None
        self._gradcam = None
        self._gradcam_lock = threading.Lock()
        self._explain_stats = {"requests": 0, "images": 0}
        self._explain_latencies_ms: deque = deque(maxlen=1024)
        # /explain bypasses the micro-batcher (handler-thread dispatch),
        # so IT needs its own overload bound: without one, a burst of
        # explain traffic piles unbounded concurrent forwards + decoded
        # arrays while /predict sheds load properly
        self._explain_slots = threading.BoundedSemaphore(
            max(1, int(max_concurrent_explains)))
        # hot reload (POST /reload): enabled iff a loader was provided
        self._loader = loader
        self._weights_path = weights_path
        self._generation = 0
        self._reload_lock = threading.Lock()
        super().__init__(address, _Handler)

    def gradcam(self):
        """Lazily-built shared GradCAM (compiles on first /explain).

        Built over a SMALL batch shape: /explain is interactive
        single-image traffic, and padding each request to the bulk
        /predict batch (64-256) would burn that many images' device
        work per map."""
        with self._gradcam_lock:
            if self._gradcam is None:
                from irp_tpu.explain import GradCAM
                p = self.batcher.predictor
                if getattr(p, "_cam_call", None) is not None:
                    # an exported .irpx with a baked explain program:
                    # its batch shape is fixed at export time (default
                    # min(8, batch) — the same interactive-size choice)
                    self._gradcam = GradCAM(p)
                else:
                    self._gradcam = GradCAM(p,
                                            batch_size=min(8, p.batch_size))
                # TTA scores for /explain come from the flip-averaged
                # forward; a live model gets a SMALL-batch clone sharing
                # the served weights so an interactive request doesn't
                # pad to the bulk /predict batch (~batch x the device
                # work).  An exported artifact keeps its baked forward
                # (batch shape fixed at export).  Attached to the
                # GradCAM snapshot so a concurrent reload can never
                # pair two different models' programs.
                scorer = p
                if p.tta and getattr(p.model, "apply", None) is not None:
                    from irp_tpu.infer import make_predictor
                    scorer = make_predictor(
                        {"params": p.params, "batch_stats": p.batch_stats},
                        cfg=p.model.config, class_names=p.class_names,
                        batch_size=min(8, p.batch_size), tta=True)
                self._gradcam.tta_scorer = scorer
            return self._gradcam

    def reload_weights(self, weights_path: str) -> dict:
        """Swap the served model for ``weights_path`` with zero downtime.

        The new predictor is loaded and warm-compiled BEFORE the swap,
        so traffic never waits on a cold jit; the swap itself is one
        atomic attribute write (an in-flight dispatch completes on the
        old weights, the next dispatch reads the new ones).  The shared
        Grad-CAM is dropped and lazily rebuilt over the new weights.

        Raises ``RuntimeError`` when reload is disabled (no loader was
        provided at construction) and ``ValueError`` for artifacts the
        daemon cannot serve — both left to the caller to map to HTTP.
        """
        if self._loader is None:
            raise ReloadDisabledError(
                "hot reload is disabled; launch run_serve.py with "
                "--allow-reload (or pass make_server(loader=...))")
        with self._reload_lock:  # one reload at a time
            new = self._loader(weights_path)
            if getattr(new, "source_size", None) not in (None, 256):
                raise ValueError(
                    f"this artifact accepts only {new.source_size}x"
                    f"{new.source_size} sources, but the daemon decodes "
                    "requests to the 256x256 cache contract")
            if new.class_names is not None:
                names = list(new.class_names)
            elif (self.class_names is not None
                    and len(self.class_names) == new.num_classes):
                names = self.class_names  # still valid, keep
            elif self.class_names is not None:
                raise ValueError(
                    f"served class names ({len(self.class_names)}) do "
                    f"not fit the new {new.num_classes}-class model, "
                    "and the artifact carries none; reload with an "
                    "artifact that embeds class names")
            else:
                names = None
            # Build the full replacement set, then compile + execute
            # EVERY served shape on EVERY replica BEFORE the swap
            # (minutes-scale per TPU program — old weights keep serving
            # meanwhile); with pad buckets each bucket is its own
            # program, and a post-swap cold jit would stall a dispatch
            # thread past every queued request's timeout
            old = self.batcher.predictor
            olds = self.batcher.predictors
            if len(olds) > 1:
                from irp_tpu.infer import (predictor_device,
                                           replicate_predictor)
                devices = [predictor_device(p) for p in olds]
                if any(d is None for d in devices):
                    raise ValueError(
                        "cannot recover the replica devices of the "
                        "serving set; restart the daemon to reload")
                news = replicate_predictor(new, devices=devices)
            else:
                news = [new]
            for pred in news:
                for shape in (pred.pad_buckets or (1,)):
                    pred.predict_probs(
                        np.zeros((shape, 256, 256, 3), np.uint8))
                pred.class_names = names  # per-dispatch source of truth
            self.batcher.predictors = news  # atomic: dispatches read once
            if self.batcher.max_batch == old.batch_size:
                # the micro-batch cap was derived from the old compiled
                # batch shape — track the new one, or every dispatch
                # would be permanently padded/split against it
                self.batcher.max_batch = new.batch_size
            self.class_names = names  # healthz/stats display
            with self._gradcam_lock:
                self._gradcam = None  # rebuilt lazily over new weights
            self._generation += 1
            self._weights_path = weights_path
            return {"reloaded": weights_path,
                    "generation": self._generation,
                    "num_classes": int(new.num_classes),
                    "previous_num_classes": int(old.num_classes),
                    "replicas": len(news),
                    "class_names": names}

    def record_explain(self, n_images: int, latency_ms: float) -> None:
        with self._gradcam_lock:
            self._explain_stats["requests"] += 1
            self._explain_stats["images"] += n_images
            self._explain_latencies_ms.append(latency_ms)

    def explain_stats(self) -> dict:
        with self._gradcam_lock:
            s = dict(self._explain_stats)
            lat = list(self._explain_latencies_ms)
        pcts = latency_percentiles(lat)
        if pcts is not None:
            s["latency_ms"] = pcts
        return s

    def metrics_text(self) -> str:
        """Prometheus text exposition (0.0.4) of the daemon's counters.

        The same numbers as /stats, in the format a production scrape
        loop expects — counters under ``irp_*_total``, the windowed
        latency percentiles as gauges (they come from a bounded deque,
        not a true summary, so no ``_sum``/``_count`` pair is claimed),
        and a conventional ``irp_model_info`` identity gauge.
        """
        stats = self.batcher.stats()
        explain = self.explain_stats()
        cfg = self.batcher.predictor.model.config
        lines = []

        def metric(name, mtype, value, help_text, labels=""):
            lines.append(f"# HELP {name} {help_text}")
            lines.append(f"# TYPE {name} {mtype}")
            lines.append(f"{name}{labels} {value}")

        for key, help_text in (
                ("requests", "predict requests accepted"),
                ("images", "images scored by /predict"),
                ("batches", "device dispatches"),
                ("batch_images_sum", "images summed over dispatches"),
                ("rejected", "requests shed at the queue-depth bound"),
                ("cancelled", "requests abandoned before dispatch"),
                ("errors", "requests failed inside dispatch")):
            metric(f"irp_{key}_total", "counter", int(stats[key]),
                   help_text)
        for key, help_text in (
                ("requests", "explain requests served"),
                ("images", "images explained")):
            metric(f"irp_explain_{key}_total", "counter",
                   int(explain[key]), help_text)
        metric("irp_batch_fill_mean", "gauge",
               round(float(stats["mean_batch_fill"]), 4),
               "mean images per device dispatch (windowed)")
        for scope, payload in (("", stats), ("explain_", explain)):
            for pct, value in (payload.get("latency_ms") or {}).items():
                metric(f"irp_{scope}latency_ms_{pct}", "gauge",
                       round(float(value), 3),
                       f"{pct} request latency over the last "
                       "1024 requests (ms)")
        metric("irp_uptime_seconds", "gauge",
               round(time.monotonic() - self.t_start, 1),
               "seconds since daemon start")
        metric("irp_reloads_total", "counter", self._generation,
               "successful hot weight reloads")
        # depth is resnet-only (ModelConfig.depth); other families would
        # otherwise scrape the meaningless dataclass default
        depth_label = (f'depth="{cfg.depth}",' if cfg.family == "resnet"
                       else "")
        metric("irp_model_info", "gauge", 1,
               "model identity (labels carry the values)",
               labels=(f'{{family="{cfg.family}",{depth_label}'
                       f'num_classes="{cfg.num_classes}"'
                       f',image_size="{cfg.image_size}"}}'))
        return "\n".join(lines) + "\n"

    @property
    def port(self) -> int:
        return self.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(target=self.serve_forever,
                                        daemon=True, name="irp-http")
        self._thread.start()

    def stop(self) -> None:
        self.shutdown()
        if self._thread is not None:
            self._thread.join(5.0)
            self._thread = None
        self.server_close()
        self.batcher.stop()


def make_server(predictor, host: str = "127.0.0.1",
                port: int = 0, class_names=None,
                max_batch: Optional[int] = None, window_ms: float = 5.0,
                decoder: str = "auto", verbose: bool = False,
                request_timeout_s: float = 60.0,
                loader=None, weights_path: Optional[str] = None
                ) -> InferenceServer:
    """An :class:`InferenceServer` (not yet serving) for ``predictor``.

    ``predictor`` is one Predictor or a list of per-device replicas
    (``irp_tpu.infer.replicate_predictor``) — with replicas, concurrent
    micro-batches dispatch to different chips in parallel.
    ``port=0`` binds an ephemeral port (read ``server.port`` after).
    ``class_names`` defaults to the predictor's own.  ``loader`` (a
    ``path -> Predictor`` callable) enables hot reload via
    ``POST /reload`` — omit it to keep the served weights immutable.
    """
    batcher = MicroBatcher(predictor, max_batch=max_batch,
                           window_ms=window_ms)
    names = (class_names if class_names is not None
             else batcher.predictor.class_names)
    return InferenceServer((host, port), batcher, class_names=names,
                           decoder=decoder, verbose=verbose,
                           request_timeout_s=request_timeout_s,
                           loader=loader, weights_path=weights_path)
