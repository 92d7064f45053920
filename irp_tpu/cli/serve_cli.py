#!/usr/bin/env python
"""Online inference server CLI: serve a trained model over HTTP.

The reference stops at offline evaluation (reference functions/final.py:
27-63); `run_predict.py` is this framework's batch path, and this daemon
is the online one — a micro-batched HTTP endpoint that keeps the TPU fed
with full fixed-shape batches while clients send one image at a time
(irp_tpu/serve.py).

  # serve the final artifact on :8000
  python run_serve.py --weights final_model.npz --classes classes.json

  # score one JPEG
  curl -s -X POST --data-binary @cat.jpg -H 'Content-Type: image/jpeg' \
      'http://127.0.0.1:8000/predict?topk=3'

  # liveness + throughput stats
  curl -s http://127.0.0.1:8000/healthz
  curl -s http://127.0.0.1:8000/stats
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", required=True,
                   help="final-weights artifact (.npz or torch .pth)")
    p.add_argument("--classes", default=None,
                   help="class names: JSON file or comma-separated list")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch-size", type=int, default=64,
                   help="compiled batch shape = micro-batch cap (64 "
                        "balances tail-padding waste against per-dispatch "
                        "latency for online traffic; run_predict.py's bulk "
                        "default is 256)")
    p.add_argument("--window-ms", type=float, default=5.0,
                   help="max time the batcher waits to fill a batch")
    p.add_argument("--batch-buckets", default=None,
                   help="allowed padded batch shapes: 'auto' = the "
                        "1,2,4,...,batch-size ladder, or a comma list "
                        "ending at batch-size.  A lone request then "
                        "costs a batch-1 program instead of batch-size "
                        "images of padded device work (TF-Serving "
                        "allowed_batch_sizes).  Each bucket compiles its "
                        "own program at boot — minutes-scale per bucket "
                        "on a cold TPU; off by default")
    p.add_argument("--image-size", type=int, default=None,
                   help="eval crop; default = the npz artifact's embedded "
                        "training-time value, else 224")
    p.add_argument("--decoder", choices=["auto", "pil"], default="auto")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all visible devices")
    p.add_argument("--replicas", default=None,
                   help="'auto' or N: one FULL model copy per device "
                        "with its own dispatch thread — concurrent "
                        "micro-batches run on different chips in "
                        "parallel at single-chip latency (TF-Serving / "
                        "Triton instance groups).  The online-traffic "
                        "alternative to --data-parallel (which shards "
                        "each batch and is the bulk-scoring choice); "
                        "the two are mutually exclusive")
    p.add_argument("--tta", action="store_true",
                   help="test-time augmentation: average the softmax over "
                        "the identity and the horizontal flip inside the "
                        "compiled forward (~2x device time per dispatch). "
                        "Needs the live weights; an .irpx bakes TTA at "
                        "export time")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--allow-reload", action="store_true",
                   help="enable POST /reload {\"weights\": path}: hot-swap "
                        "the served model with zero downtime (the new "
                        "weights warm-compile before the atomic swap); "
                        "off by default — reload lets HTTP clients make "
                        "the daemon read files")
    p.add_argument("--verbose", action="store_true",
                   help="log each HTTP request")
    args = p.parse_args(argv)

    from irp_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from irp_tpu.infer import load_class_names, load_predictor
    from irp_tpu.serve import make_server

    class_names = load_class_names(args.classes) if args.classes else None

    n_replicas = None
    if args.replicas is not None:
        if args.data_parallel:
            print("error: --replicas (a full model copy per device) and "
                  "--data-parallel (one batch sharded over devices) are "
                  "alternative strategies; pick one", file=sys.stderr)
            return 2
        if args.weights.lower().endswith(".irpx"):
            print("error: --replicas needs the live weights; an .irpx "
                  "program's device assignment is baked", file=sys.stderr)
            return 2
        n_devices = len(jax.local_devices())
        if args.replicas == "auto":
            n_replicas = n_devices
        else:
            try:
                n_replicas = int(args.replicas)
            except ValueError:
                print(f"error: --replicas must be 'auto' or an integer, "
                      f"got {args.replicas!r}", file=sys.stderr)
                return 2
            if not 1 <= n_replicas <= n_devices:
                print(f"error: --replicas {n_replicas} needs that many "
                      f"local devices, have {n_devices}", file=sys.stderr)
                return 2

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from irp_tpu.config import MeshConfig
        from irp_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(MeshConfig())

    pad_buckets = None
    if args.batch_buckets:
        if args.weights.lower().endswith(".irpx"):
            print("error: an .irpx serves only the bucket ladder baked "
                  "at export (run_predict.py --export "
                  "--export-batch-buckets ...); a bucketed artifact's "
                  "ladder is used automatically without this flag",
                  file=sys.stderr)
            return 2
        from irp_tpu.infer import serving_buckets
        try:
            pad_buckets = serving_buckets(
                args.batch_buckets, args.batch_size,
                n_data=mesh.shape["data"] if mesh is not None else 1)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2

    if args.tta and args.weights.lower().endswith(".irpx"):
        # bake-time property: fine when the artifact already flip-
        # averages (a no-op), a clean error when it does not
        from irp_tpu.export import tta_preflight_error
        err = tta_preflight_error(args.weights,
                                  "run_predict.py --tta --export")
        if err:
            print(f"error: {err}", file=sys.stderr)
            return 2
    try:
        predictor = load_predictor(args.weights, class_names=class_names,
                                   batch_size=args.batch_size, mesh=mesh,
                                   image_size=args.image_size,
                                   pad_buckets=pad_buckets, tta=args.tta)
    except ValueError as e:  # wrong-length --classes, bad format, ...
        print(f"error: {e}", file=sys.stderr)
        return 2
    if predictor.source_size is not None:  # an .irpx: shapes are baked
        if predictor.source_size != 256:
            print(f"error: this artifact accepts only "
                  f"{predictor.source_size}x{predictor.source_size} "
                  "sources, but the daemon decodes requests to the "
                  "256x256 cache contract; re-export with the default "
                  "source size", file=sys.stderr)
            return 2
        if args.batch_size != predictor.batch_size:
            print(f"note: the artifact fixes batch_size="
                  f"{predictor.batch_size}; --batch-size "
                  f"{args.batch_size} is ignored (re-export with "
                  "--batch-size sized for online traffic — small "
                  "batches pad less)", file=sys.stderr)
        if args.image_size is not None:
            print("note: the artifact's compiled crop is "
                  f"{predictor.model.config.image_size}; --image-size "
                  "is ignored", file=sys.stderr)

    served = predictor
    if n_replicas is not None:
        # probe-bind the port BEFORE the per-device weight copies (the
        # "fail fast on a busy port" contract below: replication can be
        # minutes-scale through a remote device tunnel)
        if args.port:
            import socket
            probe = socket.socket()
            probe.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            try:
                probe.bind((args.host, args.port))
            except OSError as e:
                print(f"error: cannot bind {args.host}:{args.port}: {e}",
                      file=sys.stderr)
                return 2
            finally:
                probe.close()
        from irp_tpu.infer import replicate_predictor
        served = replicate_predictor(predictor, n=n_replicas)

    # Bind the socket FIRST (fails fast on a busy port — make_server
    # does not serve yet), then compile + warm the forward before
    # accepting traffic so the first client never eats the
    # (minutes-scale on TPU) jit wait.
    loader = None
    if args.allow_reload:
        def loader(path):
            # same knobs as the launch load, EXCEPT class names: the
            # launch-time --classes must not be stamped onto a reloaded
            # artifact (it may have a different class count/order) —
            # reload_weights adopts the artifact's own names or keeps
            # the served ones only when the count still fits
            is_irpx = path.lower().endswith(".irpx")
            # tta travels as-launched: live weights apply it, an .irpx
            # must bake it (load_predictor errors otherwise and the old
            # model keeps serving — the reload handler maps that to 400)
            return load_predictor(
                path, batch_size=args.batch_size, mesh=mesh,
                image_size=args.image_size,
                pad_buckets=None if is_irpx else pad_buckets,
                tta=args.tta)
    server = make_server(served, host=args.host, port=args.port,
                         window_ms=args.window_ms, decoder=args.decoder,
                         verbose=args.verbose, loader=loader,
                         weights_path=args.weights)
    cache = 256  # decode contract, data/pipeline.py::decode_to_rgb256
    # predictor.pad_buckets covers both --batch-buckets on live weights
    # and a ladder baked into an .irpx; no buckets: 1 image pads to the
    # full batch, compiling the single served program
    buckets = predictor.pad_buckets
    shapes = buckets or (1,)
    print(f"compiling {predictor.model.config.depth}-layer forward "
          f"(crop {predictor.model.config.image_size}, "
          f"{'buckets ' + str(list(buckets)) if buckets else 'batch ' + str(predictor.batch_size)}"
          f"{f', {n_replicas} replicas' if n_replicas else ''}) ...",
          flush=True)
    for pred in server.batcher.predictors:
        for shape in shapes:  # compile EVERY served shape before traffic
            pred.predict_probs(
                np.zeros((shape, cache, cache, 3), np.uint8))

    # SIGTERM (systemd/k8s/docker stop) must drain like Ctrl-C does:
    # stop accepting, finish in-flight dispatches, then exit 0 — not
    # die mid-request with dropped connections.  The handler must not
    # raise (a signal landing outside serve_forever, or a repeat during
    # the drain, would escape as a traceback): it asks the serve loop
    # to exit from a helper thread (shutdown() blocks until the loop —
    # running on THIS thread — exits) and the drain runs below, on the
    # main thread, for both the signal and Ctrl-C paths.
    import signal
    import threading

    draining = threading.Event()

    def _term(signum, frame):
        if draining.is_set():
            return  # second SIGTERM mid-drain: keep draining
        draining.set()
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)

    print(f"serving on http://{args.host}:{server.port}  "
          f"(POST /predict, POST /explain, GET /healthz, "
          f"GET /stats, GET /metrics)",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass  # Ctrl-C: same drain path as SIGTERM
    draining.set()  # a SIGTERM from here on must not re-enter shutdown
    print("shutting down", flush=True)
    server.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
