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

    Optuna semantics, exactly: the median is over peers' intermediate
    values AT the step, and the candidate quantity is the current trial's
    BEST intermediate value so far.  (An earlier version medianed peers\'
    best-so-far and compared the current at-step value — BOTH
    substitutions push toward over-pruning when curves dip, the opposite
    of what its doc note claimed; caught in the round-2 review.)
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
        peers = [t.intermediate_values[step] for t in completed
                 if step in t.intermediate_values]
        if not peers:
            return False
        median = float(np.median(peers))
        own = [v for s, v in trial.intermediate_values.items() if s <= step]
        best = max(own) if maximize else min(own)
        return best < median if maximize else best > median
