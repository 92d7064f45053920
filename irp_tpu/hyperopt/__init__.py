"""Hyperparameter optimization engine (Optuna-style, no optuna dependency).

The reference drives a 200-trial TPE study with median pruning and SQLite
resume through Optuna (reference functions/hyperopt.py:386-495).  optuna
isn't installed here; this package implements the same surface:

- Study / Trial ask-tell API with suggest_float/int/categorical
- TPESampler (Parzen-estimator based) + RandomSampler
- MedianPruner with startup/warmup semantics
- SQLite storage with load_if_exists resume
- TrialPruned control-flow exception
"""

from irp_tpu.hyperopt.distributions import (  # noqa: F401
    CategoricalDistribution,
    FloatDistribution,
    IntDistribution,
)
from irp_tpu.hyperopt.study import (  # noqa: F401
    Study,
    Trial,
    TrialPruned,
    TrialState,
    create_study,
)
from irp_tpu.hyperopt.samplers import RandomSampler, TPESampler  # noqa: F401
from irp_tpu.hyperopt.pruners import (  # noqa: F401
    MedianPruner, NopPruner, SuccessiveHalvingPruner)
from irp_tpu.hyperopt.objective import (  # noqa: F401
    HyperoptContext,
    objective_kfold,
    suggest_space,
)
from irp_tpu.hyperopt.runner import run_kfold_optimization  # noqa: F401
from irp_tpu.hyperopt.analysis import (  # noqa: F401
    enhanced_optuna_analysis,
    study_statistics,
    visualize_best_trial_metrics,
)
