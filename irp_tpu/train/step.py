"""Jitted train/eval steps with fused on-device preprocessing.

The reference's hot loop (reference functions/train.py:21-51) is a Python
batch loop doing H2D copy -> forward -> CE -> backward -> Adam -> OneCycleLR
step per batch, with augmentation done by PIL in DataLoader worker processes.

Here the ENTIRE step — batch slicing from the HBM-resident dataset,
augmentation, normalize, forward, loss, backward (with GSPMD-inserted psum
over the 'data' mesh axis), Adam update, schedule — is one compiled XLA
program.  No per-step host<->device traffic beyond a (B,) int32 index array
and scalar metrics.

Two step flavors:
- ``make_train_step``: batch images stream in as (B,256,256,3) uint8
  (host pipeline / small datasets).
- ``make_hbm_train_step`` / ``make_hbm_epoch_step``: the whole dataset
  lives in device HBM sharded on 'data'; contiguous dynamic-slice windows
  pick each device's local samples (per-worker shard sampling like the
  reference's DataLoader, but on-chip and gather-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from irp_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from irp_tpu.models.classifier import weighted_cross_entropy


def _augment_normalize(images_u8, key, intensity: str, out_size: int,
                       dtype, mean=IMAGENET_MEAN, std=IMAGENET_STD,
                       work_dtype=None):
    """Batch augmentation on the MXU path (einsum crop-resize, vectorized
    flips/jitter) — see ops.preprocess.augment_batch_fused."""
    import jax.numpy as _jnp

    from irp_tpu.ops.preprocess import augment_batch_fused

    return augment_batch_fused(images_u8, key, intensity, out_size,
                               mean, std, dtype,
                               work_dtype=work_dtype or _jnp.float32)


def _eval_normalize(images_u8, out_size: int, dtype,
                    mean=IMAGENET_MEAN, std=IMAGENET_STD):
    # single source of truth for the eval preprocessing contract
    from irp_tpu.ops.preprocess import eval_preprocess_batch

    return eval_preprocess_batch(images_u8, out_size, dtype, mean, std)


def _loss_and_updates(state, x, labels, dropout_key, class_weights,
                      label_smoothing: float = 0.0, dropout_rate=None,
                      labels_b=None, lam=None, grad_accum: int = 1,
                      data_shards: int = 1):
    # dropout_rate None -> the module's configured rate; a traced scalar
    # injects the rate at runtime (sweep-scale compile reuse, see
    # Classifier._dropout).  labels_b/lam (both or neither): mixup/CutMix
    # two-term loss (ops/mix.py) — accuracy then reads against the
    # dominant label of the blend.  grad_accum > 1 splits the
    # forward/backward into sequential micro-batches (activation memory
    # scales with B/grad_accum) while producing the EXACT full-batch
    # update — see _accum_loss_and_updates.
    if int(grad_accum) > 1:
        return _accum_loss_and_updates(state, x, labels, dropout_key,
                                       class_weights, label_smoothing,
                                       dropout_rate, labels_b, lam,
                                       int(grad_accum), int(data_shards))

    def loss_fn(params):
        logits, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, dropout_rate=dropout_rate,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_key})
        if labels_b is None:
            loss = weighted_cross_entropy(logits, labels, class_weights,
                                          label_smoothing)
        else:
            from irp_tpu.models.classifier import \
                mixed_weighted_cross_entropy
            loss = mixed_weighted_cross_entropy(logits, labels, labels_b,
                                                lam, class_weights,
                                                label_smoothing)
        return loss, (logits, mutated)

    (loss, (logits, mutated)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads).with_batch_stats(
        mutated.get("batch_stats", {}))  # ViT: no BN stats; EMA advances
    ref_labels = labels if labels_b is None else \
        jnp.where(lam >= 0.5, labels, labels_b)
    acc = jnp.mean((jnp.argmax(logits, -1) == ref_labels)
                   .astype(jnp.float32))
    return new_state, {"loss": loss, "accuracy": acc}


def _accum_loss_and_updates(state, x, labels, dropout_key, class_weights,
                            label_smoothing, dropout_rate, labels_b, lam,
                            grad_accum: int, data_shards: int):
    """Gradient accumulation: ONE optimizer update from ``grad_accum``
    sequential micro-batch forward/backward passes inside the jitted step.

    The effective optimization batch stays ``B = x.shape[0]`` — this
    bounds ACTIVATION memory (one micro-batch of activations lives at a
    time, so B can exceed what a single backward fits in HBM), it does
    not change the update semantics.  Three properties make the update
    exact (to fp reassociation) whenever the forward is per-sample
    independent — BN-free families, or BN in inference form:

    - Micro-batch losses are normalized by the FULL batch's denominator
      (batch size, or the class-weight sum over all B samples — both
      known upfront since weights depend only on labels), so summed
      micro-gradients equal the full-batch gradient to fp associativity.
    - Chunking is shard-local: the batch is viewed as (D, k, B/(D*k))
      with D = the mesh's 'data'-axis size on the already-sharded dim,
      so micro-batch c is every device's c-th local slice — all devices
      stay busy every micro-step and no cross-chip traffic is added
      (same layout trick as ops/mix._partner).
    - Augmentation and mixup/CutMix ran on the whole batch BEFORE the
      split (callers), so the sample stream is bit-identical to
      grad_accum=1; only the dropout stream differs (per-chunk fold_in).

    BN batch statistics (where ``bn_stats_mode`` collects them) see
    micro-batch moments sequentially — the standard semantics of every
    framework's accumulation, documented in TrainConfig.
    """
    B = x.shape[0]
    k = int(grad_accum)
    D = max(int(data_shards), 1)
    if B % (D * k):
        raise ValueError(
            f"grad_accum_steps={k} needs the batch ({B}) divisible by "
            f"data_shards*grad_accum ({D}*{k})")
    blk = B // (D * k)
    x5 = x.reshape((D, k, blk) + x.shape[1:])
    la3 = labels.reshape(D, k, blk)
    lb3 = None if labels_b is None else labels_b.reshape(D, k, blk)

    if class_weights is None:
        denom_a = jnp.asarray(B, jnp.float32)
    else:
        wmap = jnp.asarray(class_weights, jnp.float32)
        denom_a = jnp.maximum(jnp.sum(wmap[labels]), 1e-8)
    # labels_b is always a shard-local PERMUTATION of labels (the
    # reversed-batch pairing, ops/mix._partner), so its weight sum equals
    # denom_a exactly — no second gather+reduce needed.  If a future
    # pairing ever samples partners instead of permuting, compute
    # denom_b from labels_b again.
    denom_b = denom_a

    def loss_fn(params, stats, xc, lac, lbc, chunk_key):
        logits, mutated = state.apply_fn(
            {"params": params, "batch_stats": stats},
            xc, train=True, dropout_rate=dropout_rate,
            mutable=["batch_stats"],
            rngs={"dropout": chunk_key})
        if lbc is None:
            loss = weighted_cross_entropy(logits, lac, class_weights,
                                          label_smoothing, denom=denom_a)
        else:
            from irp_tpu.models.classifier import \
                mixed_weighted_cross_entropy
            loss = mixed_weighted_cross_entropy(
                logits, lac, lbc, lam, class_weights, label_smoothing,
                denom_a=denom_a, denom_b=denom_b)
        return loss, (logits, mutated)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def body(carry, c):
        stats, gsum, loss_sum, correct = carry
        xc = jax.lax.dynamic_index_in_dim(x5, c, axis=1, keepdims=False)
        xc = xc.reshape((-1,) + xc.shape[2:])
        lac = jax.lax.dynamic_index_in_dim(la3, c, axis=1,
                                           keepdims=False).reshape(-1)
        lbc = None if lb3 is None else jax.lax.dynamic_index_in_dim(
            lb3, c, axis=1, keepdims=False).reshape(-1)
        (loss, (logits, mutated)), grads = grad_fn(
            state.params, stats, xc, lac, lbc,
            jax.random.fold_in(dropout_key, c))
        gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
        new_stats = mutated.get("batch_stats", stats)
        ref = lac if lbc is None else jnp.where(lam >= 0.5, lac, lbc)
        correct = correct + jnp.sum(
            (jnp.argmax(logits, -1) == ref).astype(jnp.float32))
        return (new_stats, gsum, loss_sum + loss.astype(jnp.float32),
                correct), None

    init = (state.batch_stats,
            jax.tree_util.tree_map(jnp.zeros_like, state.params),
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
    (final_stats, gsum, loss_sum, correct), _ = jax.lax.scan(
        body, init, jnp.arange(k))
    new_state = state.apply_gradients(gsum).with_batch_stats(final_stats)
    return new_state, {"loss": loss_sum, "accuracy": correct / B}


def _augment_mix(images_u8, labels, key, intensity, out_size, dtype,
                 mixup_alpha: float, cutmix_alpha: float,
                 work_dtype=None, data_shards: int = 1):
    """Shared augment -> (optional) mix -> loss-input path of every train
    step flavor.  Returns (x, labels_a, labels_b, lam, dropout_key);
    labels_b/lam are None when mixing is off — and the key-split arity
    then stays 2 so existing runs' RNG streams are bit-identical.
    ``data_shards`` (the mesh's 'data'-axis size) keeps the mixing
    pairing shard-local — see ops.mix._partner."""
    mixing = float(mixup_alpha) > 0.0 or float(cutmix_alpha) > 0.0
    if mixing:
        from irp_tpu.ops.mix import mix_batch

        aug_key, mix_key, dropout_key = jax.random.split(key, 3)
        x = _augment_normalize(images_u8, aug_key, intensity, out_size,
                               dtype, work_dtype=work_dtype)
        x, y_a, y_b, lam = mix_batch(x, labels, mix_key,
                                     mixup_alpha, cutmix_alpha,
                                     num_shards=data_shards)
        return x, y_a, y_b, lam, dropout_key
    aug_key, dropout_key = jax.random.split(key)
    x = _augment_normalize(images_u8, aug_key, intensity, out_size, dtype,
                           work_dtype=work_dtype)
    return x, labels, None, None, dropout_key


def make_train_step(class_weights=None, intensity: str = "medium",
                    out_size: int = 224, compute_dtype=jnp.bfloat16,
                    label_smoothing: float = 0.0,
                    mixup_alpha: float = 0.0, cutmix_alpha: float = 0.0,
                    data_shards: int = 1, grad_accum: int = 1,
                    aug_work_dtype=None):
    """Streaming-batch train step: (state, images_u8, labels, key).

    ``data_shards``: the mesh's 'data'-axis size when the incoming batch
    is sharded over it (fit's stream mode) — keeps mixup/CutMix pairing
    shard-local (no collective-permute).  ``grad_accum``: sequential
    micro-batch accumulation inside the step (_accum_loss_and_updates).
    ``aug_work_dtype``: augmentation arithmetic dtype (None -> f32);
    fit() passes the same choice it hands the hbm step so mode='auto'
    cannot silently change augmentation numerics between the two paths."""
    cw = None if class_weights is None else jnp.asarray(class_weights,
                                                        jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, images_u8, labels, key, dropout_rate=None):
        x, y_a, y_b, lam, dropout_key = _augment_mix(
            images_u8, labels, key, intensity, out_size, compute_dtype,
            mixup_alpha, cutmix_alpha, work_dtype=aug_work_dtype,
            data_shards=data_shards)
        return _loss_and_updates(state, x, y_a, dropout_key, cw,
                                 label_smoothing, dropout_rate,
                                 labels_b=y_b, lam=lam,
                                 grad_accum=grad_accum,
                                 data_shards=data_shards)

    return train_step


def _slice_batch(data_u8, labels_all, offset, per_device_batch):
    """Contiguous window (D, bl, ...) -> flat (B, ...) batch.

    dynamic_slice on the local axis of the (D, N/D, ...) sharded layout —
    no gathers (dataset-sized gathers inside lax.scan proved
    compile-pathological on TPU), no cross-chip traffic; the (D, bl) ->
    (D*bl,) reshape is shard-preserving under GSPMD.
    """
    im = jax.lax.dynamic_slice_in_dim(data_u8, offset, per_device_batch,
                                      axis=1)
    lb = jax.lax.dynamic_slice_in_dim(labels_all, offset, per_device_batch,
                                      axis=1)
    return im.reshape((-1,) + im.shape[2:]), lb.reshape(-1)


def make_hbm_train_step(mesh, per_device_batch: int, class_weights=None,
                        intensity: str = "medium", out_size: int = 224,
                        compute_dtype=jnp.bfloat16,
                        label_smoothing: float = 0.0,
                        mixup_alpha: float = 0.0,
                        cutmix_alpha: float = 0.0, grad_accum: int = 1):
    """Single HBM-resident train step.

    Args of the returned fn:
      state     — TrainState (params replicated / head TP per mesh)
      data_u8   — (D, N/D, 256,256,3) uint8, sharded P('data') on dim 0
      labels    — (D, N/D) int32, same sharding
      offset    — scalar int32: start of this step's window in every
                  device's local shard (HBMDataset is pre-shuffled)
      key       — replicated PRNG key

    The global batch comes out sharded on 'data'; GSPMD inserts the
    gradient psum during partitioning.
    """
    cw = None if class_weights is None else jnp.asarray(class_weights,
                                                        jnp.float32)
    data_shards = dict(mesh.shape).get("data", 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, data_u8, labels_all, offset, key,
                   dropout_rate=None):
        images_u8, labels = _slice_batch(data_u8, labels_all, offset,
                                         per_device_batch)
        x, y_a, y_b, lam, dropout_key = _augment_mix(
            images_u8, labels, key, intensity, out_size, compute_dtype,
            mixup_alpha, cutmix_alpha, data_shards=data_shards)
        return _loss_and_updates(state, x, y_a, dropout_key, cw,
                                 label_smoothing, dropout_rate,
                                 labels_b=y_b, lam=lam,
                                 grad_accum=grad_accum,
                                 data_shards=data_shards)

    return train_step


def make_hbm_epoch_step(mesh, per_device_batch: int, class_weights=None,
                        intensity: str = "medium", out_size: int = 224,
                        compute_dtype=jnp.bfloat16,
                        label_smoothing: float = 0.0, unroll: int = 1,
                        aug_work_dtype=None,
                        mixup_alpha: float = 0.0,
                        cutmix_alpha: float = 0.0, grad_accum: int = 1):
    """Scan a whole epoch of train steps inside ONE compiled program.

    The single-step path is dispatch-bound on this host (~ms of Python per
    step vs ~ms of TPU compute); lax.scan over per-step window offsets
    turns an epoch into one XLA invocation — one dispatch, zero per-step
    host work.  ``offsets`` is (num_steps,) int32 from
    EpochSampler.epoch_offsets; num_steps is static per compilation
    (bucket epoch lengths to avoid recompiles).

    Returns (state, metrics) with per-step (num_steps,) metric arrays.
    """
    cw = None if class_weights is None else jnp.asarray(class_weights,
                                                        jnp.float32)
    data_shards = dict(mesh.shape).get("data", 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_step(state, data_u8, labels_all, offsets, key,
                   dropout_rate=None):
        def body(state, step_in):
            i, off = step_in
            step_key = jax.random.fold_in(key, i)
            images_u8, labels = _slice_batch(data_u8, labels_all, off,
                                             per_device_batch)
            x, y_a, y_b, lam, dropout_key = _augment_mix(
                images_u8, labels, step_key, intensity, out_size,
                compute_dtype, mixup_alpha, cutmix_alpha,
                work_dtype=aug_work_dtype, data_shards=data_shards)
            new_state, metrics = _loss_and_updates(state, x, y_a,
                                                   dropout_key, cw,
                                                   label_smoothing,
                                                   dropout_rate,
                                                   labels_b=y_b, lam=lam,
                                                   grad_accum=grad_accum,
                                                   data_shards=data_shards)
            return new_state, metrics

        num_steps = offsets.shape[0]
        state, metrics = jax.lax.scan(
            body, state, (jnp.arange(num_steps), offsets), unroll=unroll)
        return state, metrics

    return epoch_step


def make_hbm_eval_epoch(per_device_batch: int, out_size: int = 224,
                        compute_dtype=jnp.bfloat16):
    """Scan eval over an HBM-resident eval set in ONE compiled program.

    Consumes ``HBMEvalSet.images`` ((D, steps*bl, 256,256,3) uint8 sharded
    on 'data') and its window ``offsets``; returns (steps, B, C) f32
    logits.  The eval set is uploaded once per fit instead of streaming
    padded host batches every epoch (reference train.py:64-108 semantics,
    TPU-native residency)."""

    @jax.jit
    def eval_epoch(state, data_u8, offsets):
        def body(carry, off):
            im = jax.lax.dynamic_slice_in_dim(data_u8, off,
                                              per_device_batch, axis=1)
            im = im.reshape((-1,) + im.shape[2:])
            x = _eval_normalize(im, out_size, compute_dtype)
            logits = state.apply_fn(
                {"params": state.params, "batch_stats": state.batch_stats},
                x, train=False)
            return carry, logits.astype(jnp.float32)

        _, logits = jax.lax.scan(body, None, offsets)
        return logits

    return eval_epoch


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
