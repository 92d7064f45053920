"""Trace-derived attribution of the fused train step on the real TPU.

Captures a jax.profiler trace of bench.py's exact scanned program and
converts it with xprof into per-HLO-op time, printing the top ops and a
category rollup (convs / einsum-resample / BN+elementwise / optimizer /
copies+transposes / infeed).  This is the measured answer to "where do
the non-model milliseconds go" (BENCH.md step breakdown).

Usage: python tools/profile_step.py [--steps 20] [--batch 256]
Writes: /tmp/irp_profile/<ts>/...xplane.pb, prints the rollup table.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np


def capture(logdir, batch, steps):
    import jax
    import jax.numpy as jnp

    from irp_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from irp_tpu.data.pipeline import CachedDataset, EpochSampler, HBMDataset
    from irp_tpu.models import init_classifier
    from irp_tpu.parallel.mesh import make_mesh, shard_variables
    from irp_tpu.train.state import create_train_state
    from irp_tpu.train.step import make_hbm_epoch_step

    mesh = make_mesh(MeshConfig(data=-1, model=1))
    model_cfg = ModelConfig(depth=50, num_classes=10, image_size=224,
                            compute_dtype="bfloat16")
    train_cfg = TrainConfig(learning_rate=1e-3, weight_decay=1e-4,
                            batch_size=batch)
    rng = np.random.default_rng(0)
    n = 4096
    cached = CachedDataset(
        images=rng.integers(0, 255, (n, 256, 256, 3), dtype=np.uint8),
        labels=rng.integers(0, 10, n).astype(np.int32),
        keys=[str(i) for i in range(n)],
        class_names=tuple(str(i) for i in range(10)))
    model, variables = init_classifier(model_cfg, jax.random.PRNGKey(0), 224)
    variables = shard_variables(mesh, variables)
    state = create_train_state(model, variables, train_cfg, model_cfg,
                               steps_per_epoch=steps)
    hbm = HBMDataset(cached, mesh)
    sampler = EpochSampler(hbm, batch, seed=0)
    step = make_hbm_epoch_step(mesh, sampler.per_device, class_weights=None,
                               intensity="medium", out_size=224,
                               compute_dtype=jnp.bfloat16,
                               aug_work_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(1)
    offs = jnp.asarray(sampler.epoch_offsets(steps))
    # warmup: compile + first exec (first exec on this pool is up to 100x)
    state, metrics = step(state, hbm.images, hbm.labels, offs,
                          jax.random.fold_in(key, 0))
    float(np.asarray(metrics["loss"])[-1])
    state, metrics = step(state, hbm.images, hbm.labels, offs,
                          jax.random.fold_in(key, 1))
    float(np.asarray(metrics["loss"])[-1])

    with jax.profiler.trace(logdir):
        state, metrics = step(state, hbm.images, hbm.labels, offs,
                              jax.random.fold_in(key, 2))
        float(np.asarray(metrics["loss"])[-1])
    return steps * batch


def categorize(op_name, op_type):
    s = (op_name + " " + op_type).lower()
    if "infeed" in s or "outfeed" in s:
        return "infeed/outfeed"
    if "convolution" in s or "conv" in op_type.lower():
        return "conv fwd/bwd"
    if "dot" in s or "einsum" in s:
        return "dot (resample einsums / head)"
    if "dynamic-slice" in s or "dynamic_slice" in s:
        return "dynamic-slice (batch window)"
    if "dynamic-update-slice" in s:
        return "dynamic-update-slice"
    if "copy" in s or "transpose" in s or "bitcast" in s:
        return "copy/transpose (layout)"
    if "reduce-window" in s or "select-and-scatter" in s:
        return "pool fwd/bwd"
    if "all-reduce" in s or "psum" in s:
        return "collectives"
    if "rng" in s:
        return "rng"
    if "scatter" in s or "gather" in s:
        return "gather/scatter"
    if "reduce" in s or "fusion" in s or "fused" in s:
        return "fusion (BN/elementwise/adam)"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default="/tmp/irp_profile")
    ap.add_argument("--xspace", default=None,
                    help="convert an existing .xplane.pb instead of capturing")
    args = ap.parse_args()

    if args.xspace:
        xspace = args.xspace
        imgs = args.steps * args.batch
    else:
        os.makedirs(args.logdir, exist_ok=True)
        imgs = capture(args.logdir, args.batch, args.steps)
        paths = sorted(glob.glob(os.path.join(
            args.logdir, "**", "*.xplane.pb"), recursive=True),
            key=os.path.getmtime)
        if not paths:
            print("no xplane.pb captured", file=sys.stderr)
            sys.exit(1)
        xspace = paths[-1]
    print(f"xplane: {xspace}")

    from xprof.convert import raw_to_tool_data as rtd

    names = rtd.xspace_to_tool_names([xspace])
    print(f"tools: {names}")
    data, _ = rtd.xspace_to_tool_data([xspace], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    # hlo_op_stats arrives as gviz JSON or CSV depending on version
    rows = []
    try:
        obj = json.loads(data)
        cols = [c["label"] for c in obj["cols"]]
        for r in obj["rows"]:
            rows.append({cols[i]: (c["v"] if c else None)
                         for i, c in enumerate(r["c"])})
    except (json.JSONDecodeError, KeyError, TypeError):
        import csv as _csv
        import io
        for r in _csv.DictReader(io.StringIO(data)):
            rows.append(r)
    if not rows:
        print("conversion produced no rows; raw head:")
        print(data[:2000])
        sys.exit(1)

    def fget(r, *keys, default=0.0):
        for k in keys:
            for rk in r:
                if rk.lower().replace(" ", "_") == k:
                    try:
                        return float(r[rk])
                    except (TypeError, ValueError):
                        return default
        return default

    def sget(r, *keys):
        for k in keys:
            for rk in r:
                if rk.lower().replace(" ", "_") == k:
                    return str(r[rk])
        return ""

    total = sum(fget(r, "total_self_time_(us)", "self_time_(us)",
                     "self-time_(us)", "total_self-time_(us)") for r in rows)
    cats = {}
    print(f"\ntop {args.top} HLO ops by self time "
          f"(total device {total/1e3:.2f} ms / {args.steps} steps "
          f"= {total/1e3/args.steps:.2f} ms/step):")
    ranked = sorted(rows, key=lambda r: -fget(
        r, "total_self_time_(us)", "self_time_(us)", "self-time_(us)",
        "total_self-time_(us)"))
    for r in ranked[:args.top]:
        t = fget(r, "total_self_time_(us)", "self_time_(us)",
                 "self-time_(us)", "total_self-time_(us)")
        name = sget(r, "hlo_op_name", "op_name", "operation")
        typ = sget(r, "hlo_op_type", "op_type", "category", "type")
        print(f"  {t/1e3:8.3f} ms  {t/max(total,1e-9)*100:5.1f}%  "
              f"{typ:28s} {name[:70]}")
    for r in rows:
        t = fget(r, "total_self_time_(us)", "self_time_(us)",
                 "self-time_(us)", "total_self-time_(us)")
        name = sget(r, "hlo_op_name", "op_name", "operation")
        typ = sget(r, "hlo_op_type", "op_type", "category", "type")
        c = categorize(name, typ)
        cats[c] = cats.get(c, 0.0) + t

    print("\ncategory rollup (ms/step):")
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {t/1e3/args.steps:8.3f} ms  {t/max(total,1e-9)*100:5.1f}%  {c}")
    print(f"\nimgs in traced block: {imgs}")


if __name__ == "__main__":
    main()
