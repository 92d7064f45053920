"""Measure whether XLA compiles from worker threads hold or release the GIL.

The parallel trial runner (irp_tpu/hyperopt/parallel.py) schedules one
trial per device from THREADS of one controller process.  Execution
overlaps (each worker owns a device), but all workers share one XLA
compile client and the Python GIL — so per-trial compiles of DISTINCT
shapes (batch-size buckets) could plausibly serialize the sweep's warm-up
phase.  The question decomposes into two measurable parts:

1. **Does a compile hold the GIL?**  If yes, worker threads are frozen
   for the full compile duration — other trials' host-side work (shard
   sampling, SQLite ask/tell, device dispatch) stops.  Measured here by
   running a pure-Python counter thread while another thread compiles,
   and comparing its progress rate against an idle baseline.  This works
   on any core count: a held GIL pins the rate to ~0; a released GIL
   leaves the counter runnable (time-sliced on one core, full-rate on
   two).

2. **Do K concurrent compiles finish faster than K sequential ones?**
   Only answerable on a multi-core host (this repo's dev host has ONE
   core, where CPU saturation and GIL serialization are
   indistinguishable) — reported anyway, with n_cpus alongside, so the
   same tool gives the real answer on real hardware.

Run on the sanitized CPU platform (no TPU/tunnel needed):

    python tools/bench_compile_overlap.py [K]

Prints one JSON line with both measurements.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
# Fresh compiles every run: the persistent cache would turn every leg
# into disk hits and measure nothing.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from irp_tpu.config import ModelConfig  # noqa: E402
from irp_tpu.models import init_classifier  # noqa: E402


def build_programs(batch_sizes):
    """Train-step programs distinct in batch size (the real sweep's
    per-trial shape axis), each a Lowered ready to compile."""
    cfg = ModelConfig(depth=18, num_classes=4, image_size=32,
                      compute_dtype="float32")
    model, variables = init_classifier(cfg, jax.random.PRNGKey(0),
                                       image_size=32)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    def step(params, opt_state, images, labels):
        def loss_fn(p):
            logits = model.apply(
                {**variables, "params": p}, images, train=False)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    progs = []
    for bs in batch_sizes:
        images = jnp.zeros((bs, 32, 32, 3), jnp.float32)
        labels = jnp.zeros((bs,), jnp.int32)
        progs.append(jax.jit(step).lower(variables["params"], opt_state,
                                         images, labels))
    return progs


def counter_rate(stop_event, out):
    """Pure-Python busy counter; rate is the GIL-availability probe."""
    n = 0
    t0 = time.perf_counter()
    while not stop_event.is_set():
        n += 1
    out.append(n / (time.perf_counter() - t0))


def measure_gil_release(lowered):
    """Counter rate while a compile runs in another thread, vs idle."""
    # Idle baseline: counter alone for 2 s.
    stop, out = threading.Event(), []
    t = threading.Thread(target=counter_rate, args=(stop, out))
    t.start()
    time.sleep(2.0)
    stop.set()
    t.join()
    idle_rate = out[0]

    # Counter while compiling.
    stop2, out2 = threading.Event(), []
    t2 = threading.Thread(target=counter_rate, args=(stop2, out2))
    t2.start()
    t0 = time.perf_counter()
    lowered.compile()
    compile_s = time.perf_counter() - t0
    stop2.set()
    t2.join()
    during_rate = out2[0]
    return idle_rate, during_rate, compile_s


def time_compiles(lowereds, concurrent):
    t0 = time.perf_counter()
    if concurrent:
        threads = [threading.Thread(target=lo.compile) for lo in lowereds]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    else:
        for lo in lowereds:
            lo.compile()
    return time.perf_counter() - t0


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    # Warm the jax tracing/compile machinery (one-time infrastructure
    # cost would otherwise pollute the first measured leg).
    time_compiles(build_programs([64]), concurrent=False)

    idle_rate, during_rate, compile_s = measure_gil_release(
        build_programs([66])[0])

    ladder = [2 + 2 * i for i in range(k)]
    seq = time_compiles(build_programs(ladder), concurrent=False)
    ladder2 = [2 + 2 * i for i in range(k, 2 * k)]
    conc = time_compiles(build_programs(ladder2), concurrent=True)

    print(json.dumps({
        "k": k,
        "n_cpus": os.cpu_count(),
        "gil_probe": {
            "counter_rate_idle": round(idle_rate),
            "counter_rate_during_compile": round(during_rate),
            "retained_frac": round(during_rate / idle_rate, 3),
            "compile_s": round(compile_s, 2),
        },
        "sequential_s": round(seq, 2),
        "concurrent_s": round(conc, 2),
        "overlap_x": round(seq / conc, 2),
    }))


if __name__ == "__main__":
    main()
