"""Cross-process sweep coordination: multiple OS processes drive ONE
SQLite-backed study concurrently (Optuna distributed mode, reference
functions/hyperopt.py:401-430 resume semantics).

Covers the unique-(study, number) trial allocation race
(storage.py create_trial retry), WAL concurrency, the fail_orphans=False
join path, and post-hoc resume consistency.
"""

import multiprocessing as mp
import os
import time

import pytest

from irp_tpu.hyperopt.pruners import MedianPruner
from irp_tpu.hyperopt.samplers import TPESampler
from irp_tpu.hyperopt.study import TrialState, create_study
from irp_tpu.hyperopt.storage import SQLiteStorage

N_TRIALS_PER_WORKER = 6


def _worker(db_path, worker_id, n_trials, start_at):
    """Run ``n_trials`` against the shared study from a separate process."""
    # Joining a live study: other workers' RUNNING trials are NOT orphans.
    study = create_study(
        study_name="mp-sweep",
        storage=db_path,
        sampler=TPESampler(seed=100 + worker_id),
        pruner=MedianPruner(n_startup_trials=2, n_warmup_steps=0),
        load_if_exists=True,
        fail_orphans=False,
    )
    # Align both workers' first ask() so trial-number allocation actually
    # races instead of one worker finishing before the other starts.
    while time.time() < start_at:
        time.sleep(0.001)

    def objective(trial):
        x = trial.suggest_float("x", -4.0, 4.0)
        lr = trial.suggest_float("lr", 1e-5, 1e-1, log=True)
        trial.set_user_attr("worker", worker_id)
        for step in range(3):
            trial.report(-(x ** 2) - step * 0.01, step)
            time.sleep(0.002)  # hold the trial open across peers' writes
            if trial.should_prune():
                from irp_tpu.hyperopt.study import TrialPruned
                raise TrialPruned()
        return -(x ** 2)

    study.optimize(objective, n_trials)


def test_two_process_sweep(tmp_path):
    """Two spawned processes share one study file; every trial number is
    allocated exactly once and both workers contribute."""
    db = str(tmp_path / "mp_study.db")
    ctx = mp.get_context("spawn")
    start_at = time.time() + 4.0  # after spawn+import warmup
    procs = [
        ctx.Process(target=_worker,
                    args=(db, w, N_TRIALS_PER_WORKER, start_at))
        for w in range(2)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0, f"worker exited with {p.exitcode}"

    # Post-hoc resume (the dead-process path): fail_orphans=True is safe
    # now that both workers have exited.
    study = create_study("mp-sweep", db, load_if_exists=True,
                         fail_orphans=True)
    trials = study.get_trials()
    total = 2 * N_TRIALS_PER_WORKER
    assert len(trials) == total
    # unique, gap-free trial numbers despite the cross-process MAX+INSERT race
    assert sorted(t.number for t in trials) == list(range(total))
    assert all(t.state in (TrialState.COMPLETE, TrialState.PRUNED)
               for t in trials)
    workers = {t.user_attrs.get("worker") for t in trials}
    assert workers == {0, 1}, f"one worker never ran a trial: {workers}"
    completed = [t for t in trials if t.state == TrialState.COMPLETE]
    assert completed, "no trial completed"
    # best trial is consistent with the raw table
    assert study.best_value == max(t.value for t in completed)
    # params persisted with their distributions for TPE resume
    assert set(study.best_params) == {"x", "lr"}


def test_join_live_study_keeps_running_trials(tmp_path):
    """fail_orphans=False must not fail a peer's in-flight RUNNING trial;
    fail_orphans=True (dead-process resume) must."""
    db = str(tmp_path / "join.db")
    owner = create_study("s", db, load_if_exists=True)
    inflight = owner.ask()  # RUNNING, never finished

    joiner = create_study("s", SQLiteStorage(db), load_if_exists=True,
                          fail_orphans=False)
    states = {t.trial_id: t.state for t in joiner.get_trials()}
    assert states[inflight.trial_id] == TrialState.RUNNING

    resumer = create_study("s", SQLiteStorage(db), load_if_exists=True,
                           fail_orphans=True)
    states = {t.trial_id: t.state for t in resumer.get_trials()}
    assert states[inflight.trial_id] == TrialState.FAILED


@pytest.mark.skipif(os.environ.get("IRP_SKIP_SLOW") == "1",
                    reason="slow-ish spawn test")
def test_crashed_worker_resume(tmp_path):
    """A worker killed mid-trial leaves a RUNNING row; the next
    fail_orphans=True resume marks it FAILED and the sweep continues."""
    db = str(tmp_path / "crash.db")
    study = create_study("c", db, load_if_exists=True)
    t = study.ask()
    t.suggest_float("x", 0.0, 1.0)
    # simulate the crash: drop the trial on the floor, reopen the study
    del study, t
    resumed = create_study("c", SQLiteStorage(db), load_if_exists=True,
                           fail_orphans=True)
    trials = resumed.get_trials()
    assert [t.state for t in trials] == [TrialState.FAILED]
    # new trials keep allocating past the failed one
    nxt = resumed.ask()
    assert nxt.number == 1
    resumed.tell(nxt, TrialState.COMPLETE, 1.0)
    assert resumed.best_value == 1.0


def test_create_study_insert_race(tmp_path):
    """Deterministic reproduction of the cross-process create_study race:
    both creators SELECT (miss) before either INSERTs.  The loser's
    IntegrityError must resolve to the winner's study id."""
    db = str(tmp_path / "race.db")
    a = SQLiteStorage(db)
    b = SQLiteStorage(db)
    state = {"injected": False}

    class RacingConn:
        """Delegates to a's connection, but lets 'the other process' (b)
        commit the same study INSERT first."""

        def __init__(self, conn):
            self._c = conn

        def execute(self, sql, *args):
            if sql.lstrip().startswith("INSERT INTO studies") \
                    and not state["injected"]:
                state["injected"] = True
                with b._lock, b._conn:
                    b._conn.execute(sql, *args)
            return self._c.execute(sql, *args)

        def __enter__(self):
            return self._c.__enter__()

        def __exit__(self, *exc):
            return self._c.__exit__(*exc)

        def __getattr__(self, name):
            return getattr(self._c, name)

    a._conn = RacingConn(a._conn)
    sid = a.get_or_create_study("raced", load_if_exists=True)
    with b._lock, b._conn:
        row = b._conn.execute(
            "SELECT study_id FROM studies WHERE study_name='raced'"
        ).fetchone()
    assert state["injected"]
    assert sid == row[0]
    # duplicate create with load_if_exists=False stays a ValueError
    with pytest.raises(ValueError, match="already exists"):
        a.get_or_create_study("raced", load_if_exists=False)
