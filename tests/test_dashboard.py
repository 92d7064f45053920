"""Terminal dashboard CLI (run_dashboard.py) — the first-party equivalent
of the reference's `mlflow ui` + `optuna-dashboard` pointers
(reference README.md:66-76)."""

import math

import pytest

import run_dashboard
from irp_tpu import tracking
from irp_tpu.hyperopt import create_study


@pytest.fixture
def study_db(tmp_path):
    storage = str(tmp_path / "study.db")
    study = create_study(study_name="dash_test", storage=storage)

    def objective(trial):
        lr = trial.suggest_float("learning_rate", 1e-4, 1e-1, log=True)
        bs = trial.suggest_categorical("batch_size", [8, 16, 32])
        trial.report(50.0, 0)
        return 90.0 - abs(math.log10(lr) + 2) * 10 + bs / 32

    study.optimize(objective, n_trials=8)
    return storage


@pytest.fixture
def tracked_run(tmp_path):
    tracking.set_tracking_uri(str(tmp_path / "mlruns"))
    with tracking.start_run("dash run", experiment="dash_exp") as run:
        run.log_params({"learning_rate": 0.001})
        for step, acc in enumerate([50.0, 70.0, 90.0]):
            run.log_metrics({"val_acc": acc, "train_loss": 1.0 / (step + 1)},
                            step=step)
        run.log_text("hello", "notes.txt")
    return run.info.run_id


def test_dashboard_study(study_db, capsys):
    rc = run_dashboard.main(["study", "--storage", study_db,
                             "--study-name", "dash_test", "--top", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "trials: 8" in out and "complete: 8" in out
    assert "best: trial" in out
    assert "learning_rate" in out
    assert "optimization history" in out
    # sparkline characters present
    assert any(ch in out for ch in run_dashboard.SPARK)
    assert "param importances" in out


def test_dashboard_study_missing_storage(tmp_path, capsys):
    rc = run_dashboard.main(["study", "--storage",
                             str(tmp_path / "none.db")])
    assert rc == 2


def test_dashboard_runs_and_run(tracked_run, capsys):
    rc = run_dashboard.main(["runs", "--experiment", "dash_exp"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "dash run" in out
    assert tracked_run[:12] in out
    assert "val_acc=90" in out

    rc = run_dashboard.main(["run", tracked_run])
    assert rc == 0
    out = capsys.readouterr().out
    assert "learning_rate: 0.001" in out
    assert "val_acc" in out and "90" in out
    assert "notes.txt" in out


def test_dashboard_runs_missing_experiment(tmp_path, capsys):
    tracking.set_tracking_uri(str(tmp_path / "empty_mlruns"))
    rc = run_dashboard.main(["runs", "--experiment", "nope"])
    assert rc == 2


def test_sparkline_shapes():
    assert run_dashboard.sparkline([]) == ""
    assert len(run_dashboard.sparkline([1.0])) == 1
    s = run_dashboard.sparkline(list(range(100)), width=40)
    assert len(s) == 40
    assert s[0] == run_dashboard.SPARK[0] and s[-1] == run_dashboard.SPARK[-1]


def test_dashboard_study_is_read_only(study_db, capsys):
    """A viewer must not create studies on typo'd names nor fail live
    workers' RUNNING trials (round-2 review finding)."""
    import sqlite3

    # typo'd name: error out, and no new study row appears
    rc = run_dashboard.main(["study", "--storage", study_db,
                             "--study-name", "dash_tset"])
    assert rc == 2
    with sqlite3.connect(study_db) as conn:
        names = [r[0] for r in conn.execute(
            "SELECT study_name FROM studies")]
        assert names == ["dash_test"]
        # plant an in-flight trial like a live worker's
        sid = conn.execute("SELECT study_id FROM studies").fetchone()[0]
        conn.execute(
            "INSERT INTO trials (study_id, number, state, datetime_start)"
            " VALUES (?, 99, 'RUNNING', 0)", (sid,))
    rc = run_dashboard.main(["study", "--storage", study_db,
                             "--study-name", "dash_test"])
    assert rc == 0
    with sqlite3.connect(study_db) as conn:
        state = conn.execute(
            "SELECT state FROM trials WHERE number=99").fetchone()[0]
    assert state == "RUNNING"  # untouched by the viewer
