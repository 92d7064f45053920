"""Device mesh + sharding layout.

The reference is single-device (SURVEY §2: zero torch.distributed /
DataParallel anywhere); parallelism here is first-class and TPU-native:
a ('data', 'model') jax.sharding.Mesh over ICI, with

- **data parallelism**: batches sharded on 'data'; GSPMD inserts the psum
  gradient all-reduce during jit partitioning (no hand-written collectives);
- **tensor parallelism** (optional): Megatron-style — head_dense1 kernel
  column-sharded P(None,'model'), head_dense2 kernel row-sharded
  P('model',None); XLA inserts the psum on the second matmul.  The ResNet
  backbone stays replicated (25M params; DP is the right strategy,
  SURVEY §2 parallelism table).  ViT encoder blocks get the full Megatron
  recipe: q/k/v and mlp_dense1 kernels column-sharded (whole attention
  heads stay device-local — the reason q/k/v are separate Dense layers,
  models/vit.py), attn_out and mlp_dense2 row-sharded, one psum per
  residual branch.

Multi-host: call ``jax.distributed.initialize`` before ``make_mesh`` and the
same code runs over DCN+ICI; shardings are laid out so collectives ride ICI
within a slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from irp_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    data, model = cfg.axis_sizes(len(devices))
    if data * model > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs {data * model} devices, "
            f"have {len(devices)}")
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch tensors sharded on the leading (batch) dim."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ViT encoder-block / ConvNeXt CNBlock Megatron layout (module
# docstring): column-parallel layers shard the OUTPUT dim (their biases
# shard with it); row-parallel layers shard the INPUT dim (bias applies
# post-psum, replicated).  ConvNeXt names its block MLP pair
# mlp_dense1/mlp_dense2 precisely so these rules cover it by name.
_VIT_COL = ("attn_q", "attn_k", "attn_v", "mlp_dense1")
_VIT_ROW = ("attn_out", "mlp_dense2")


def _head_spec(path_keys) -> P:
    """Tensor-parallel spec for the head + ViT blocks; everything else
    replicated."""
    path = "/".join(path_keys)
    if path.endswith("head_dense1/kernel"):
        return P(None, MODEL_AXIS)
    if path.endswith("head_dense1/bias"):
        return P(MODEL_AXIS)
    if path.endswith("head_dense2/kernel"):
        return P(MODEL_AXIS, None)
    if len(path_keys) >= 2:
        layer, leaf = path_keys[-2], path_keys[-1]
        if layer in _VIT_COL:
            return P(None, MODEL_AXIS) if leaf == "kernel" else P(MODEL_AXIS)
        if layer in _VIT_ROW and leaf == "kernel":
            return P(MODEL_AXIS, None)
    return P()


def param_shardings(mesh: Mesh, variables):
    """NamedSharding tree for a Classifier variable tree.

    ResNet backbone replicated; MLP head + ViT encoder blocks
    Megatron-sharded over the 'model' axis (a no-op when the model axis
    has size 1).
    """

    def spec_for(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        return NamedSharding(mesh, _head_spec(keys))

    return jax.tree_util.tree_map_with_path(spec_for, variables)


def shard_variables(mesh: Mesh, variables):
    """device_put a variable tree with its param shardings."""
    shardings = param_shardings(mesh, variables)
    return jax.device_put(variables, shardings)
