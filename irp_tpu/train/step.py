"""Jitted train/eval steps with fused on-device preprocessing.

The reference's hot loop (reference functions/train.py:21-51) is a Python
batch loop doing H2D copy -> forward -> CE -> backward -> Adam -> OneCycleLR
step per batch, with augmentation done by PIL in DataLoader worker processes.

Here the ENTIRE step — batch gather from the HBM-resident dataset,
augmentation, normalize, forward, loss, backward (with GSPMD-inserted psum
over the 'data' mesh axis), Adam update, schedule — is one compiled XLA
program.  No per-step host<->device traffic beyond a (B,) int32 index array
and scalar metrics.

Two step flavors:
- ``make_train_step``: batch images stream in as (B,256,256,3) uint8
  (host pipeline / small datasets).
- ``make_hbm_train_step``: the whole dataset lives in device HBM sharded on
  'data'; a shard_map gather picks each device's local samples (equivalent
  to per-worker shard sampling in the reference's DataLoader, but on-chip).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from irp_tpu.models.classifier import weighted_cross_entropy
from irp_tpu.ops.preprocess import _augment_one, center_crop
from irp_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from irp_tpu.parallel.mesh import DATA_AXIS


def _augment_normalize(images_u8, key, intensity: str, out_size: int,
                       dtype, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    b = images_u8.shape[0]
    keys = jax.random.split(key, b)
    aug = jax.vmap(lambda im, k: _augment_one(im, k, intensity, out_size))(
        images_u8, keys)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((aug - mean) / std).astype(dtype)


def _eval_normalize(images_u8, out_size: int, dtype,
                    mean=IMAGENET_MEAN, std=IMAGENET_STD):
    x = center_crop(images_u8, out_size).astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def _loss_and_updates(state, x, labels, dropout_key, class_weights):
    def loss_fn(params):
        logits, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_key})
        loss = weighted_cross_entropy(logits, labels, class_weights)
        return loss, (logits, mutated)

    (loss, (logits, mutated)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads).replace(
        batch_stats=mutated["batch_stats"])
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return new_state, {"loss": loss, "accuracy": acc}


def make_train_step(class_weights=None, intensity: str = "medium",
                    out_size: int = 224, compute_dtype=jnp.bfloat16):
    """Streaming-batch train step: (state, images_u8, labels, key)."""
    cw = None if class_weights is None else jnp.asarray(class_weights,
                                                        jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, images_u8, labels, key):
        aug_key, dropout_key = jax.random.split(key)
        x = _augment_normalize(images_u8, aug_key, intensity, out_size,
                               compute_dtype)
        return _loss_and_updates(state, x, labels, dropout_key, cw)

    return train_step


def make_hbm_train_step(mesh, class_weights=None, intensity: str = "medium",
                        out_size: int = 224, compute_dtype=jnp.bfloat16):
    """HBM-resident-dataset train step.

    Args of the returned fn:
      state        — TrainState (params replicated / head TP per mesh)
      data_u8      — (N,256,256,3) uint8, sharded P('data') on samples
      labels       — (N,) int32, sharded P('data')
      local_idx    — (B,) int32, sharded P('data'); each device's slice
                     holds indices into ITS OWN local data shard
      key          — replicated PRNG key

    The gather runs per-device via shard_map (zero cross-chip traffic),
    then the global batch (sharded on 'data') flows into the jitted
    model step; GSPMD inserts the gradient psum.
    """
    cw = None if class_weights is None else jnp.asarray(class_weights,
                                                        jnp.float32)

    gather = jax.shard_map(
        lambda d, l, i: (d[i], l[i]),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, data_u8, labels_all, local_idx, key):
        images_u8, labels = gather(data_u8, labels_all, local_idx)
        aug_key, dropout_key = jax.random.split(key)
        x = _augment_normalize(images_u8, aug_key, intensity, out_size,
                               compute_dtype)
        return _loss_and_updates(state, x, labels, dropout_key, cw)

    return train_step


def make_hbm_epoch_step(mesh, class_weights=None, intensity: str = "medium",
                        out_size: int = 224, compute_dtype=jnp.bfloat16):
    """Scan a whole epoch of train steps inside ONE compiled program.

    The single-step path is dispatch-bound on this host (~ms of Python per
    step vs ~ms of TPU compute); lax.scan over the per-step index batches
    turns an epoch into one XLA invocation — one dispatch, zero per-step
    host work.  ``idx`` is (num_steps, B) int32, each row laid out like
    make_hbm_train_step's local_idx; num_steps is static per compilation
    (bucket epochs to a few sizes to avoid recompiles).

    Returns (state, metrics) where metrics are per-step (num_steps,) arrays.
    """
    cw = None if class_weights is None else jnp.asarray(class_weights,
                                                        jnp.float32)

    gather = jax.shard_map(
        lambda d, l, i: (d[i], l[i]),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_step(state, data_u8, labels_all, idx, key):
        def body(state, step_in):
            i, idx_row = step_in
            step_key = jax.random.fold_in(key, i)
            images_u8, labels = gather(data_u8, labels_all, idx_row)
            aug_key, dropout_key = jax.random.split(step_key)
            x = _augment_normalize(images_u8, aug_key, intensity, out_size,
                                   compute_dtype)
            new_state, metrics = _loss_and_updates(state, x, labels,
                                                   dropout_key, cw)
            return new_state, metrics

        num_steps = idx.shape[0]
        state, metrics = jax.lax.scan(
            body, state, (jnp.arange(num_steps), idx))
        return state, metrics

    return epoch_step


def make_eval_step(out_size: int = 224, compute_dtype=jnp.bfloat16):
    """Eval step: center-crop + normalize + forward with running stats
    (model.eval() semantics, reference train.py:64-108).  Returns f32
    logits; loss/accuracy are reduced host-side so padded tail batches can
    be masked exactly."""

    @jax.jit
    def eval_step(state, images_u8):
        x = _eval_normalize(images_u8, out_size, compute_dtype)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False)
        return logits

    return eval_step
