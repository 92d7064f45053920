"""Parallel trial scheduling across TPU devices.

The reference runs Optuna trials strictly sequentially in-process
(reference functions/hyperopt.py:476; its SQLite storage would permit
multi-process workers but none are launched — SURVEY §2 parallelism table).
On a TPU slice, small-model trials don't need all chips: this runner
partitions the devices into single-device (or small) sub-meshes and runs
one trial per sub-mesh concurrently from worker threads.  The SQLite
storage is the coordination point (thread-safe ask/tell), exactly like
Optuna's distributed mode — so trial-level parallelism composes with
study resume.

Threads, not processes: each worker owns a distinct device, so the GIL
only serializes cheap host-side dispatch while device compute overlaps.

Single-controller compile caveat — MEASURED (tools/bench_compile_overlap.py,
BENCH.md "Sweep-scale compilation"): XLA compiles RELEASE the GIL (a
pure-Python probe thread retains ~80% of its idle rate while another
thread compiles), and K=4 concurrent compiles of distinct batch-size
train steps complete 3.4x faster than the same count sequentially even
on this 1-core host — per-trial compiles do not serialize behind the
shared compile client.  Mitigations that make compiles rare in the
first place: the persistent compile cache makes repeated configurations
disk hits, and the dropout/lr/wd runtime-injection keeps most trials on
one executable.  Re-run the tool on a real multi-core 8-chip host for
the scaling number; if serialization ever shows up there, move workers
to processes (the SQLite storage already coordinates cross-process —
tests/test_multiprocess_sweep.py proves that path).
"""

from __future__ import annotations

import threading
import traceback
from typing import Callable, Optional

import jax

from irp_tpu.config import MeshConfig
from irp_tpu.hyperopt.study import Study, TrialState, TrialPruned
from irp_tpu.parallel.mesh import make_mesh


def run_parallel_trials(study: Study, objective_for_mesh: Callable,
                        n_trials: int, devices_per_trial: int = 1,
                        max_workers: Optional[int] = None,
                        verbose: bool = False) -> None:
    """Run ``n_trials`` trials, scheduled across per-worker sub-meshes.

    ``objective_for_mesh(trial, mesh) -> float`` — the objective receives
    the sub-mesh its trial must run on (pass it as HyperoptContext.mesh).
    """
    devices = jax.devices()
    n_workers = len(devices) // devices_per_trial
    if max_workers is not None:
        n_workers = min(n_workers, max_workers)
    n_workers = max(min(n_workers, n_trials), 1)

    meshes = []
    for w in range(n_workers):
        devs = devices[w * devices_per_trial:(w + 1) * devices_per_trial]
        meshes.append(make_mesh(MeshConfig(data=len(devs), model=1),
                                devices=devs))

    remaining = threading.Semaphore(n_trials)
    lock = threading.Lock()
    counter = {"done": 0}

    def _tell_safe(study, trial, state, value=None):
        try:
            study.tell(trial, state, value)
        except Exception:  # noqa: BLE001 — storage hiccup; trial stays
            traceback.print_exc()  # RUNNING, recovered by orphan cleanup

    def worker(mesh, wid):
        while remaining.acquire(blocking=False):
            # ask/tell also hit the (possibly contended) SQLite storage;
            # an exception there must not silently kill the worker thread
            # and eat the remaining trial budget
            try:
                trial = study.ask()
            except Exception:  # noqa: BLE001
                if verbose:
                    print(f"[worker {wid}] study.ask() failed:")
                    traceback.print_exc()
                continue
            try:
                value = objective_for_mesh(trial, mesh)
            except TrialPruned:
                _tell_safe(study, trial, TrialState.PRUNED)
                state = "PRUNED"
            except Exception as e:  # noqa: BLE001
                _tell_safe(study, trial, TrialState.FAILED)
                state = f"FAILED ({e!r})"
                if verbose:
                    traceback.print_exc()
            else:
                import math

                v = float(value)
                if math.isnan(v):
                    _tell_safe(study, trial, TrialState.FAILED)
                    state = "FAILED (nan)"
                else:
                    _tell_safe(study, trial, TrialState.COMPLETE, v)
                    state = f"{v:.3f}"
            with lock:
                counter["done"] += 1
                if verbose:
                    print(f"[worker {wid}] trial {trial.number}: {state} "
                          f"({counter['done']}/{n_trials})")

    threads = [threading.Thread(target=worker, args=(m, i), daemon=True)
               for i, m in enumerate(meshes)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
