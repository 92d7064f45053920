#!/usr/bin/env python
"""Online-serving throughput/latency bench: loadgen vs a real daemon.

Spawns ``run_serve.py`` as a subprocess (the production entry point, so
the measurement includes HTTP parse, JPEG decode, micro-batch grouping,
and the padded TPU dispatch), fires ``--concurrency`` client threads at
it until ``--requests`` single-image POSTs complete, and prints ONE
JSON line: served imgs/sec plus client-observed latency percentiles.

The reference has nothing to compare against here (no serving path at
all, reference functions/final.py:27-63) — this number documents the
net-new online capability on real hardware.

  # real chip (run inside a healthy-tunnel window)
  python tools/bench_serve.py --synthetic --requests 2000 --concurrency 16

  # CPU smoke
  python tools/bench_serve.py --synthetic --cpu --requests 60 \
      --concurrency 4 --depth 18 --image-size 64
"""

from __future__ import annotations

import argparse
import io
import json
import os
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_synthetic_weights(path: str, depth: int, image_size: int) -> None:
    import jax

    from irp_tpu.config import ModelConfig
    from irp_tpu.models.classifier import init_classifier
    from irp_tpu.train.checkpoint import save_weights_npz

    cfg = ModelConfig(depth=depth, num_classes=10, image_size=image_size)
    _, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                   image_size=image_size)
    save_weights_npz(path, variables["params"],
                     variables.get("batch_stats", {}),
                     meta={"image_size": image_size})


def _jpeg_blobs(n: int, size: int = 256):
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    blobs = []
    for _ in range(n):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=90)
        blobs.append(buf.getvalue())
    return blobs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", default=None,
                   help="serve this artifact (default: --synthetic)")
    p.add_argument("--synthetic", action="store_true",
                   help="serve a randomly-initialized model (throughput "
                        "does not depend on weight values)")
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--requests", type=int, default=1000)
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--window-ms", type=float, default=5.0)
    p.add_argument("--distinct-images", type=int, default=32)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--batch-buckets", default=None,
                   help="pass through to run_serve.py (e.g. 'auto'): "
                        "bucketed padding — a lone request costs a "
                        "batch-1 program, not batch-size images")
    p.add_argument("--replicas", default=None,
                   help="pass through to run_serve.py ('auto' or N): "
                        "one full model copy per device, parallel "
                        "dispatch threads")
    p.add_argument("--startup-timeout", type=float, default=None,
                   help="max seconds to wait for the daemon's serving "
                        "line (TPU compile is minutes-scale; default "
                        "600, scaled by the bucket count under "
                        "--batch-buckets since boot compiles one "
                        "program per bucket)")
    args = p.parse_args(argv)
    if args.startup_timeout is None:
        n_programs = 1
        if args.batch_buckets:
            from irp_tpu.infer import power_of_two_buckets
            n_programs = len(
                power_of_two_buckets(args.batch_size)
                if args.batch_buckets == "auto"
                else args.batch_buckets.split(","))
        args.startup_timeout = 600.0 * n_programs

    # Capture the daemon's environment BEFORE sanitizing our own: only
    # the daemon needs the chip; the loadgen parent is pure HTTP client
    # plus a host-side weight init, so it always runs on CPU (and must
    # not block on the tunnel handshake / a JAX_PLATFORMS=axon pin).
    from irp_tpu.utils.subproc import cpu_child_env
    child_env = cpu_child_env() if args.cpu else dict(os.environ)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    tmpdir = tempfile.mkdtemp(prefix="irp_bench_serve_")
    weights = args.weights
    if weights is None:
        if not args.synthetic:
            p.error("--weights or --synthetic required")
        weights = os.path.join(tmpdir, "synthetic.npz")
        print(f"initializing synthetic resnet{args.depth} "
              f"(crop {args.image_size}) ...", file=sys.stderr, flush=True)
        _make_synthetic_weights(weights, args.depth, args.image_size)

    cmd = [sys.executable,
           os.path.join(os.path.dirname(os.path.dirname(
               os.path.abspath(__file__))), "run_serve.py"),
           "--weights", weights, "--port", "0",
           "--batch-size", str(args.batch_size),
           "--window-ms", str(args.window_ms)]
    if args.cpu:
        cmd.append("--cpu")
    if args.batch_buckets:
        cmd += ["--batch-buckets", args.batch_buckets]
    if args.replicas:
        cmd += ["--replicas", str(args.replicas)]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True,
                            env=child_env)
    try:
        port = None
        deadline = time.monotonic() + args.startup_timeout
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if not line and proc.poll() is not None:
                raise SystemExit(f"daemon exited rc={proc.returncode} "
                                 "before serving")
            if line:
                print(f"[daemon] {line.rstrip()}", file=sys.stderr,
                      flush=True)
            if line.startswith("serving on http://"):
                port = int(line.split(":")[2].split()[0])
                break
        if port is None:
            raise SystemExit("daemon never reached the serving line")

        blobs = _jpeg_blobs(args.distinct_images)
        url = f"http://127.0.0.1:{port}/predict"

        # warm the full client->daemon path before timing
        req = urllib.request.Request(
            url, data=blobs[0], headers={"Content-Type": "image/jpeg"},
            method="POST")
        urllib.request.urlopen(req, timeout=300).read()

        latencies = []
        errors = []
        lock = threading.Lock()
        counter = iter(range(args.requests))

        def client():
            while True:
                with lock:
                    i = next(counter, None)
                if i is None:
                    return
                r = urllib.request.Request(
                    url, data=blobs[i % len(blobs)],
                    headers={"Content-Type": "image/jpeg"}, method="POST")
                t0 = time.monotonic()
                try:
                    with urllib.request.urlopen(r, timeout=300) as resp:
                        json.loads(resp.read())
                    with lock:
                        latencies.append((time.monotonic() - t0) * 1e3)
                except Exception as e:  # noqa: BLE001 — counted below
                    with lock:
                        errors.append(str(e))

        threads = [threading.Thread(target=client)
                   for _ in range(args.concurrency)]
        t_start = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        elapsed = time.monotonic() - t_start

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=60) as r:
            stats = json.loads(r.read())

        from irp_tpu.serve import latency_percentiles

        result = {
            "metric": "serve_imgs_per_sec",
            "value": round(len(latencies) / max(elapsed, 1e-9), 1),
            "unit": "imgs/sec",
            "n": len(latencies), "errors": len(errors),
            "concurrency": args.concurrency,
            "batch_size": args.batch_size,
            "window_ms": args.window_ms,
            "batch_buckets": args.batch_buckets,
            "replicas": args.replicas,
            "depth": args.depth, "image_size": args.image_size,
            "mean_batch_fill": round(stats.get("mean_batch_fill", 0), 2),
            "latency_ms": latency_percentiles(latencies, digits=2),
        }
        if errors:
            result["first_error"] = errors[0]
        print(json.dumps(result))
        return 0 if latencies and not errors else 1
    finally:
        proc.terminate()
        try:
            proc.wait(30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    sys.exit(main())
