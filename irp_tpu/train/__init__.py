"""Training runtime: state, jitted steps, epoch loops, checkpointing."""

from irp_tpu.train.state import (TrainState, create_train_state,  # noqa: F401
                                 ema_params, trainable_mask)
from irp_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
from irp_tpu.train.loop import train_model, evaluate, evaluate_full, train_epoch  # noqa: F401
from irp_tpu.train.fit import (fit, FitResult, compute_steps_per_epoch,  # noqa: F401
                               resolve_fit_mode)
