"""Device-side compute ops: preprocessing/augmentation, schedules, metrics."""

from irp_tpu.ops.preprocess import (  # noqa: F401
    augment_batch,
    eval_preprocess_batch,
    normalize,
)
from irp_tpu.ops.schedules import onecycle_cosine  # noqa: F401
