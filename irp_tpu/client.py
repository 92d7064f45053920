"""Python client for the online inference daemon (irp_tpu/serve.py).

The daemon's HTTP surface is stdlib-parseable on purpose; this module is
the matching stdlib-only client so scripts and services talk to a served
model without hand-rolling the wire format (raw-image vs JSON-base64
bodies, topk/class query params, error-payload shapes).  The reference
has no serving at all (its model only runs inside final-eval, reference
functions/final.py:27-63), so there is nothing to mirror — the protocol
is this framework's own (serve.py module docstring).

    client = ServingClient("http://127.0.0.1:8000")
    client.wait_until_ready(timeout_s=300)     # daemon compiles at boot
    [pred] = client.predict(open("cat.jpg", "rb").read(), topk=3)
    result = client.explain("cat.jpg", overlay_path="cam.png")

Inputs anywhere an image is accepted: encoded bytes (JPEG/PNG/...), a
filesystem path, or an (H, W, 3) uint8 array (sent as lossless PNG so
the daemon's decode sees the exact pixels).
"""

from __future__ import annotations

import base64
import io
import json
import os
import time
import urllib.error
import urllib.request
from typing import List, Optional, Sequence, Union

ImageLike = Union[bytes, str, "os.PathLike", "numpy.ndarray"]  # noqa: F821


class ServingError(RuntimeError):
    """A non-2xx daemon response, with the server's own error message."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message


def _encode_image(image: ImageLike) -> bytes:
    """Any accepted image form -> encoded bytes for the wire.

    numpy/PIL are imported only inside the ndarray branch — the module's
    stdlib-only promise must hold for bytes/path inputs on hosts without
    either installed.
    """
    if isinstance(image, bytes):
        return image
    if type(image).__module__.partition(".")[0] == "numpy":
        import numpy as np

        if image.ndim != 3 or image.shape[-1] != 3:
            raise ValueError(f"expected an (H,W,3) uint8 array, "
                             f"got shape {image.shape}")
        from PIL import Image

        buf = io.BytesIO()
        # PNG: lossless, so served predictions on arrays bit-match the
        # local Predictor on the same pixels (JPEG would not)
        Image.fromarray(np.asarray(image, np.uint8)).save(buf, "PNG")
        return buf.getvalue()
    if isinstance(image, (str, os.PathLike)):
        with open(image, "rb") as f:
            return f.read()
    raise TypeError(f"unsupported image type {type(image).__name__} "
                    "(expected bytes, path, or (H,W,3) uint8 array)")


class ServingClient:
    """Client for one daemon.  Thread-safe: no mutable request state."""

    def __init__(self, base_url: str, timeout_s: float = 60.0):
        self.base_url = base_url.rstrip("/")
        self.timeout_s = float(timeout_s)

    # -- plumbing ----------------------------------------------------

    def _request(self, path: str, body: Optional[bytes] = None,
                 ctype: Optional[str] = None,
                 timeout_s: Optional[float] = None) -> dict:
        headers = {"Content-Type": ctype} if ctype else {}
        req = urllib.request.Request(
            self.base_url + path, data=body, headers=headers,
            # `is not None`: an empty b"" body is still a POST (the
            # server answers 400 empty-body, not a misleading GET 404)
            method="POST" if body is not None else "GET")
        try:
            with urllib.request.urlopen(
                    req, timeout=timeout_s or self.timeout_s) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            try:
                message = json.loads(e.read()).get("error", str(e))
            except Exception:  # noqa: BLE001 — non-JSON error body
                message = str(e)
            raise ServingError(e.code, message) from e

    # -- surface -----------------------------------------------------

    def healthz(self) -> dict:
        """Daemon liveness + model identity (GET /healthz)."""
        return self._request("/healthz")

    def stats(self) -> dict:
        """Batch-fill / latency-percentile counters (GET /stats)."""
        return self._request("/stats")

    def metrics_text(self) -> str:
        """The Prometheus text exposition (GET /metrics), verbatim."""
        req = urllib.request.Request(self.base_url + "/metrics")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                return r.read().decode()
        except urllib.error.HTTPError as e:
            raise ServingError(e.code, str(e)) from e

    def wait_until_ready(self, timeout_s: float = 300.0,
                         poll_s: float = 0.5) -> dict:
        """Poll /healthz until the daemon answers (it binds its socket
        before the minutes-scale first TPU compile, so early requests
        queue — but a just-launching daemon refuses connections).
        Returns the first healthz payload; raises TimeoutError."""
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                return self.healthz()
            except (urllib.error.URLError, ConnectionError, OSError,
                    ServingError):
                if time.monotonic() >= deadline:
                    raise TimeoutError(
                        f"daemon at {self.base_url} not ready after "
                        f"{timeout_s:.0f}s")
                time.sleep(poll_s)

    def reload(self, weights_path: str,
               timeout_s: Optional[float] = None) -> dict:
        """Hot-swap the daemon's served weights (POST /reload).

        The daemon warm-compiles the new model before answering —
        minutes-scale on a cold TPU program, so pass a generous
        ``timeout_s``.  Requires the daemon to have been launched with
        reload enabled (``run_serve.py --allow-reload``)."""
        body = json.dumps({"weights": str(weights_path)}).encode()
        return self._request("/reload", body=body,
                             ctype="application/json",
                             timeout_s=timeout_s or max(self.timeout_s,
                                                        600.0))

    def predict(self, images: Union[ImageLike, Sequence[ImageLike]],
                topk: int = 1) -> List[dict]:
        """Score one image or a batch (POST /predict).

        Returns the per-image prediction dicts
        (``label`` / ``label_name`` / ``topk`` entries), one per input,
        in input order.  A single image still returns a 1-list.
        """
        # duck-typed ndarray check — numpy must stay optional for
        # bytes/path callers (the stdlib-only promise)
        single = isinstance(images, (bytes, str, os.PathLike)) or (
            type(images).__module__.partition(".")[0] == "numpy"
            and getattr(images, "ndim", None) == 3)
        try:
            batch = [images] if single else list(images)
        except TypeError:
            raise TypeError(
                f"unsupported image type {type(images).__name__} "
                "(expected bytes, path, (H,W,3) uint8 array, or a "
                "sequence of those)") from None
        if not batch:
            return []
        blobs = [_encode_image(im) for im in batch]
        if len(blobs) == 1:
            payload = self._request(f"/predict?topk={int(topk)}",
                                    body=blobs[0],
                                    ctype="application/octet-stream")
        else:
            body = json.dumps({"instances": [
                base64.b64encode(b).decode() for b in blobs]}).encode()
            payload = self._request(f"/predict?topk={int(topk)}",
                                    body=body, ctype="application/json")
        return payload["predictions"]

    def explain(self, image: ImageLike, class_idx: Optional[int] = None,
                topk: int = 1, overlay_path: Optional[str] = None) -> dict:
        """Grad-CAM explanation for one image (POST /explain).

        Returns the explanation dict with ``overlay_png`` (decoded bytes)
        replacing the wire's base64; ``overlay_path`` additionally writes
        the PNG there.  ``class_idx`` explains that class instead of the
        predicted one.
        """
        query = f"/explain?topk={int(topk)}"
        if class_idx is not None:
            query += f"&class={int(class_idx)}"
        payload = self._request(query, body=_encode_image(image),
                                ctype="application/octet-stream")
        (ex,) = payload["explanations"]
        ex = dict(ex)
        ex["overlay_png"] = base64.b64decode(ex.pop("cam_png_b64"))
        if overlay_path:
            with open(overlay_path, "wb") as f:
                f.write(ex["overlay_png"])
        return ex
