"""Experiment tracking: MLflow-style file store (no mlflow dependency)."""

from irp_tpu.tracking.store import (  # noqa: F401
    TrackingClient,
    active_run,
    end_run,
    get_tracking_uri,
    log_artifact,
    log_metrics,
    log_params,
    log_text,
    set_experiment,
    set_tracking_uri,
    start_run,
)
