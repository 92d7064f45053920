"""irp_tpu — a TPU-native image-recognition pipeline framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``Eaglewing89/image-recognition-pipeline`` (PyTorch, single GPU):

- dataset ingest / analysis / rule-based cleaning (``irp_tpu.data.curation``)
- embedding-based outlier detection: ResNet50 features -> PCA -> UMAP -> LOF,
  with the kNN / projection math on TPU (``irp_tpu.data.outliers``)
- WebDataset-compatible 224x224 tar shard creation (``irp_tpu.data.shards``)
- device-side input pipeline with HBM-resident datasets and on-chip
  augmentation (``irp_tpu.data.pipeline``, ``irp_tpu.ops``)
- Flax ResNet50 transfer learning with frozen-backbone semantics
  (``irp_tpu.models``)
- jit/shard_map data-parallel training runtime with OneCycle schedule,
  early stopping and Orbax checkpoints (``irp_tpu.train``)
- a built-in Optuna-style hyperopt engine (TPE sampler, median pruner,
  SQLite storage/resume) (``irp_tpu.hyperopt``)
- a built-in MLflow-style tracking file store (``irp_tpu.tracking``)
- a deployment story the reference lacks entirely: batch inference from
  weights artifacts (``irp_tpu.infer``), a micro-batched online HTTP
  serving daemon (``irp_tpu.serve``) with a matching stdlib client
  (``irp_tpu.client``), Grad-CAM explainability (``irp_tpu.explain``),
  and one-file AOT export of the compiled inference program — StableHLO
  via jax.export, serves with no model code (``irp_tpu.export``)

Unlike the reference (mutable ``config.py`` module globals, reference
config.py:8-20), configuration here is immutable dataclasses threaded
explicitly (``irp_tpu.config``).
"""

__version__ = "0.1.0"

# Convenience top-level API (heavy deps import lazily inside the modules).
from irp_tpu.config import (  # noqa: F401,E402
    DataConfig,
    DatasetInfo,
    HyperoptConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
