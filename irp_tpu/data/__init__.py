"""Data plane: tar shard IO, curation, analysis, folds, device pipeline."""

from irp_tpu.data.tar import ShardWriter, iter_samples, iter_shard  # noqa: F401
from irp_tpu.data.analyze import analyze_webdataset  # noqa: F401
from irp_tpu.data.kfold import create_stratified_kfolds  # noqa: F401
from irp_tpu.data.pipeline import (  # noqa: F401
    CachedDataset,
    EpochSampler,
    HBMDataset,
    build_cache,
    decode_to_rgb256,
    iter_host_batches,
    prefetch_to_device,
)
# curation + outliers are import-heavy (PIL/pandas/matplotlib paths) and
# stay as explicit submodule imports: irp_tpu.data.curation / .outliers
