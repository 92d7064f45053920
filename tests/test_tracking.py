"""Tracking store tests: layout, metric history, client read-back."""

import os

import pytest

from irp_tpu import tracking


@pytest.fixture(autouse=True)
def fresh_uri(tmp_path):
    tracking.set_tracking_uri(str(tmp_path / "mlruns"))
    yield
    tracking.end_run()


def test_experiment_create_and_reuse():
    a = tracking.set_experiment("animals10")
    b = tracking.set_experiment("animals10")
    assert a == b
    c = tracking.set_experiment("other")
    assert c != a


def test_run_lifecycle_and_layout():
    tracking.set_experiment("animals10")
    with tracking.start_run(run_name="optuna_trial_0_kfold") as run:
        run.log_params({"learning_rate": 1e-3, "batch_size": 32})
        run.log_metrics({"train_loss": 0.5, "val_acc": 91.0}, step=0)
        run.log_metrics({"train_loss": 0.4, "val_acc": 93.5}, step=1)
    root = tracking.get_tracking_uri()
    run_dir = os.path.join(root, run.info.experiment_id, run.info.run_id)
    assert os.path.exists(os.path.join(run_dir, "meta.yaml"))
    with open(os.path.join(run_dir, "params", "learning_rate")) as f:
        assert f.read() == "0.001"
    # MLflow metric line format: ts value step
    with open(os.path.join(run_dir, "metrics", "val_acc")) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 2
    ts, val, step = lines[1].split()
    assert float(val) == 93.5 and step == "1"


def test_client_metric_history_and_search():
    tracking.set_experiment("animals10")
    with tracking.start_run(run_name="final_model_full_training") as run:
        for epoch in range(3):
            run.log_metrics({"val_acc": 90.0 + epoch}, step=epoch)
        run.log_params({"recommended_epochs": 12})
    client = tracking.TrackingClient()
    hist = client.get_metric_history(run.info.run_id, "val_acc")
    assert [p.value for p in hist] == [90.0, 91.0, 92.0]
    assert [p.step for p in hist] == [0, 1, 2]
    found = client.search_runs("animals10",
                               run_name="final_model_full_training")
    assert len(found) == 1
    assert found[0]["params"]["recommended_epochs"] == "12"
    assert found[0]["metrics"]["val_acc"] == 92.0


def test_artifacts_roundtrip(tmp_path):
    tracking.set_experiment("animals10")
    src = tmp_path / "confusion_matrix.png"
    src.write_bytes(b"\x89PNGfake")
    with tracking.start_run() as run:
        run.log_artifact(str(src), "plots")
        run.log_text("report body", "reports/classification.txt")
    client = tracking.TrackingClient()
    arts = client.list_artifacts(run.info.run_id)
    assert "plots/confusion_matrix.png" in arts
    assert "reports/classification.txt" in arts
    p = client.artifact_path(run.info.run_id, "reports/classification.txt")
    assert open(p).read() == "report body"


def test_module_level_api_auto_run():
    tracking.set_experiment("animals10")
    tracking.log_metrics({"x": 1.0}, step=0)
    run = tracking.active_run()
    assert run is not None
    tracking.end_run()
    assert tracking.active_run() is None


def test_failed_run_status(tmp_path):
    tracking.set_experiment("animals10")
    with pytest.raises(RuntimeError):
        with tracking.start_run(run_name="boom") as run:
            raise RuntimeError("x")
    client = tracking.TrackingClient()
    info = client.get_run(run.info.run_id)["info"]
    assert info["status"] == "FAILED"


@pytest.mark.parametrize("name", [
    "a: b:c",                      # colons in the value (VERDICT r1 weak #7)
    "  padded  ",                  # read-side strip would eat these
    'quoted "x" name',             # quote char must survive
    "multi\nline",                 # newline would corrupt the line format
    "a\rb",                        # lone \r: universal newlines split it
])
def test_run_name_meta_roundtrip(name):
    tracking.set_experiment("meta_roundtrip")
    with tracking.start_run(run_name=name) as run:
        run.log_metrics({"m": 1.0}, step=0)
    client = tracking.TrackingClient()
    hits = client.search_runs("meta_roundtrip", run_name=name)
    assert len(hits) == 1
    assert hits[0]["info"]["run_name"] == name
    assert hits[0]["info"]["run_id"] == run.info.run_id


def test_slash_namespaced_keys_roundtrip(tmp_path):
    """MLflow allows 'val/acc'-style keys and nests them as directories;
    the store must write and read them back (round-2 review finding)."""
    tracking.set_tracking_uri(str(tmp_path / "mlruns"))
    with tracking.start_run("slashes", experiment="slash_exp") as run:
        run.log_params({"opt/lr": 0.01})
        run.log_metrics({"val/acc": 91.5}, step=0)
        run.log_metrics({"val/acc": 93.0}, step=1)
    client = tracking.TrackingClient()
    got = client.get_run(run.info.run_id)
    assert got["params"]["opt/lr"] == "0.01"
    assert got["metrics"]["val/acc"] == 93.0
    hist = client.get_metric_history(run.info.run_id, "val/acc")
    assert [p.value for p in hist] == [91.5, 93.0]


def test_explicit_end_survives_context_exit(tmp_path):
    tracking.set_tracking_uri(str(tmp_path / "mlruns"))
    with tracking.start_run("killed", experiment="end_exp") as run:
        run.end("KILLED")
    client = tracking.TrackingClient()
    assert client.get_run(run.info.run_id)["info"]["status"] == "KILLED"


def test_set_experiment_id_collision_retries(tmp_path):
    """If another process claims the computed id first, allocation moves
    on instead of clobbering the winner's meta.yaml."""
    import os

    root = str(tmp_path / "mlruns")
    tracking.set_tracking_uri(root)
    # simulate a racing creator that grabbed id 0 with a different name
    os.makedirs(os.path.join(root, "0"))
    from irp_tpu.tracking.store import _write_meta
    _write_meta(os.path.join(root, "0", "meta.yaml"),
                {"name": "other", "experiment_id": "0"})
    exp_id = tracking.set_experiment("mine")
    assert exp_id == "1"
    client = tracking.TrackingClient()
    assert client.get_experiment_by_name("other") == "0"
    assert client.get_experiment_by_name("mine") == "1"


def test_set_experiment_claim_is_atomic_with_meta(tmp_path):
    """The claim (dir appears) and its meta.yaml must be atomic: a loser
    that sees the dir must be able to read the winner's name immediately
    (the old mkdir-then-write had a window where the loser read {} and
    created a duplicate-named experiment)."""
    import threading

    root = str(tmp_path / "mlruns")
    tracking.set_tracking_uri(root)
    n_threads, ids = 8, []
    lock = threading.Lock()
    barrier = threading.Barrier(n_threads)

    def claim():
        barrier.wait()
        exp_id = tracking.set_experiment("shared")
        with lock:
            ids.append(exp_id)

    threads = [threading.Thread(target=claim) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # every racer resolved to the SAME experiment id
    assert len(set(ids)) == 1, f"duplicate-named experiments: {set(ids)}"
    # every dir on disk has a readable meta.yaml, and no stage dirs leaked
    entries = os.listdir(root)
    assert all(e.isdigit() for e in entries), entries
    from irp_tpu.tracking.store import _read_meta
    names = [_read_meta(os.path.join(root, e, "meta.yaml")).get("name")
             for e in entries]
    assert names.count("shared") == 1


def test_stage_dirs_invisible_to_scans(tmp_path):
    """A crashed creator's leftover staging dir must not surface as an
    experiment in name scans."""
    root = str(tmp_path / "mlruns")
    tracking.set_tracking_uri(root)
    tracking.set_experiment("real")
    from irp_tpu.tracking.store import _write_meta
    stale = os.path.join(root, ".exp_stage_dead")
    os.makedirs(stale)
    _write_meta(os.path.join(stale, "meta.yaml"),
                {"name": "ghost", "experiment_id": "99"})
    client = tracking.TrackingClient()
    assert client.get_experiment_by_name("ghost") is None
    assert client.get_experiment_by_name("real") is not None
    # set_experiment on the ghost name allocates a fresh digit id
    assert tracking.set_experiment("ghost").isdigit()
