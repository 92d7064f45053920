"""TrainState + optimizer wiring.

Replaces the reference's stateful nn.Module + torch Adam
(reference functions/model.py:45-60) with an immutable flax TrainState.

Optimizer semantics match torch ``optim.Adam(trainable, lr, weight_decay)``:
L2 decay is *added to the gradient before* the Adam moment update (torch
Adam's coupled weight decay — not AdamW), and only trainable parameters are
optimized (``filter(requires_grad)``, model.py:59).  Frozen params carry no
Adam moments at all (optax.masked), saving 2x their size in optimizer HBM.

Compile-cache design: ``TrainState.tx`` is static jit aux data, so a fresh
optimizer closure per trial would force XLA to recompile the fused train
step for every hyperparameter draw.  Instead the learning rate and weight
decay are **injected hyperparameters** (leaves of opt_state, traced at
runtime) and the GradientTransformation itself is memoized on its
structural key (schedule length/mode + trainable-stage config) — a
200-trial sweep compiles one program per (batch size, epoch length)
bucket, not per trial.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from irp_tpu.config import ModelConfig, TrainConfig


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    # EMA of the BN running statistics, tracked alongside the param EMA
    # (_params_ema) so the eval view pairs averaged params with averaged
    # buffers — timm-ModelEma semantics; None when EMA is off or the
    # family has no batch_stats (ViT).  ema_decay is static aux data
    # (a per-fit constant baked into the compiled step).
    ema_batch_stats: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)

    def with_batch_stats(self, new_stats):
        """Replace batch_stats, advancing their EMA when tracked (the
        batch_stats counterpart of the _params_ema chain slot)."""
        if self.ema_batch_stats is None:
            return self.replace(batch_stats=new_stats)
        d = float(self.ema_decay)
        ema = jax.tree_util.tree_map(
            lambda e, b: e + (1.0 - d) * (b - e),
            self.ema_batch_stats, new_stats)
        return self.replace(batch_stats=new_stats, ema_batch_stats=ema)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def trainable_mask(params, model_cfg: ModelConfig):
    """Bool pytree: True where the reference would set requires_grad.

    Head always trainable; backbone stages per ``trainable_stages``
    (reference model.py:17-23: freeze all, unfreeze layer4).  ViT stage
    names: 'block<i>', 'ln', and 'embed' (conv_proj/class_token/
    pos_embedding collectively — they sit before block 0).
    """
    if model_cfg.head_only:
        trainable_stages = ()
    else:
        from irp_tpu.models.classifier import resolve_trainable_stages
        trainable_stages = resolve_trainable_stages(model_cfg)
    _EMBED = {"conv_proj", "class_token", "pos_embedding"}

    def mask_for(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys[0] != "backbone":
            return True  # head
        if len(keys) < 2:
            return False
        if keys[1] in _EMBED:
            stage = "embed"
        elif keys[1].startswith("block") or keys[1] == "ln":
            stage = keys[1]  # ViT: block7 / ln
        else:
            stage = keys[1].split("_")[0]  # layer4_block2 -> layer4
        return stage in trainable_stages

    return jax.tree_util.tree_map_with_path(mask_for, params)


def _schedule_shape(schedule: str, total_steps: int, steps_per_epoch: int,
                    scheduler_step: str):
    """Normalized lr curve (peak 1.0) for TrainConfig.schedule; 'epoch'
    mode advances the shape once per epoch (reference final.py:330
    quirk)."""
    from irp_tpu.ops.schedules import (constant, cosine_anneal,
                                       onecycle_cosine)

    if schedule == "cosine":
        base = cosine_anneal(1.0, total_steps)
    elif schedule == "constant":
        base = constant(1.0)
    else:  # 'onecycle' — the reference's OneCycleLR(cos) curve
        base = onecycle_cosine(1.0, total_steps)
    if scheduler_step == "epoch":
        return lambda count: base(count // max(steps_per_epoch, 1))
    return base


class EmaState(NamedTuple):
    """Optimizer-chain slot holding the EMA weight tree (see _params_ema)."""

    ema: Any


def _params_ema(decay: float) -> optax.GradientTransformation:
    """Track an exponential moving average of the POST-update param tree.

    Appended after the masked update chain, so ``params + updates`` here is
    exactly the tree ``apply_gradients`` will produce.  The full tree is
    tracked (one extra params-sized HBM buffer): frozen leaves receive
    exact-zero updates from the ``set_to_zero`` stage, so their EMA stays
    bitwise equal to the weights at no arithmetic risk, and the tree keeps
    one uniform structure.  Updates pass through unchanged.
    """
    decay = float(decay)

    def init_fn(params):
        # jnp.copy, not asarray: the EMA tree must own its buffers — an
        # aliased init would be the params donated twice into the step
        return EmaState(ema=jax.tree_util.tree_map(jnp.copy, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("_params_ema requires params")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: e + (1.0 - decay) * (p - e), state.ema, new_params)
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init_fn, update_fn)


def ema_params(state) -> Any:
    """The EMA weight tree tracked in ``state.opt_state``, or None when
    EMA is off (TrainConfig.ema_decay == 0)."""
    for comp in state.opt_state:
        if isinstance(comp, EmaState):
            return comp.ema
    return None


# GradientTransformations memoized on their structural key so TrainState.tx
# (static jit aux) compares equal across fit() calls and the compiled step
# is reused; lr/wd vary per trial as injected runtime values.
_TX_MEMO: Dict[Tuple, optax.GradientTransformation] = {}


def make_optimizer(train_cfg: TrainConfig, model_cfg: ModelConfig,
                   steps_per_epoch: int) -> optax.GradientTransformation:
    """torch-equivalent optimizer chain (Adam by default, reference
    model.py:57-58; 'adamw'/'sgd' per TrainConfig.optimizer), masked to
    trainable params, with lr and weight decay as injected (runtime)
    hyperparameters."""
    if train_cfg.scheduler_step == "epoch":
        total = train_cfg.max_epochs
    else:
        total = steps_per_epoch * train_cfg.max_epochs
    opt_name = train_cfg.optimizer
    if opt_name not in ("adam", "adamw", "sgd"):
        raise ValueError(f"TrainConfig.optimizer must be one of "
                         f"'adam'/'adamw'/'sgd', got {opt_name!r}")
    sched_name = train_cfg.schedule
    if sched_name not in ("onecycle", "cosine", "constant"):
        raise ValueError(f"TrainConfig.schedule must be one of "
                         f"'onecycle'/'cosine'/'constant', "
                         f"got {sched_name!r}")
    # family/num_layers matter: the memoized mask closure resolves
    # trainable stages per family ('layer4' auto-maps for ViT).
    key = (total, steps_per_epoch, train_cfg.scheduler_step,
           model_cfg.trainable_stages, model_cfg.head_only,
           model_cfg.family, model_cfg.num_layers,
           float(train_cfg.ema_decay), opt_name, sched_name)
    tx = _TX_MEMO.get(key)
    if tx is None:
        shape = _schedule_shape(sched_name, total, steps_per_epoch,
                                train_cfg.scheduler_step)

        def factory(learning_rate, weight_decay):
            if opt_name == "adamw":
                # decoupled decay (torch AdamW: p -= lr*(adam_dir + wd*p))
                direction = [
                    optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                    optax.add_decayed_weights(weight_decay),
                ]
            elif opt_name == "sgd":
                # torch SGD(momentum=0.9, dampening=0) with coupled L2:
                # buf = 0.9*buf + (grad + wd*p); p -= lr*buf
                direction = [
                    optax.add_decayed_weights(weight_decay),
                    optax.trace(decay=0.9, nesterov=False),
                ]
            else:
                # torch Adam: coupled L2 enters the moments
                direction = [
                    optax.add_decayed_weights(weight_decay),
                    optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                ]
            return optax.chain(
                *direction,
                optax.scale_by_schedule(shape),           # peak-1 curve
                optax.scale(-1.0 * learning_rate),        # peak lr
            )

        inner = optax.inject_hyperparams(factory)(
            learning_rate=0.0, weight_decay=0.0)

        def mask_fn(params):
            return trainable_mask(params, model_cfg)

        def inverse_mask_fn(params):
            return jax.tree_util.tree_map(lambda m: not m, mask_fn(params))

        # masked() passes non-masked updates through UNCHANGED (raw
        # grads); frozen params get exact zeros via the second stage so
        # the freeze contract holds even if a caller feeds nonzero
        # gradients for frozen leaves.
        parts = [
            optax.masked(inner, mask_fn),
            optax.masked(optax.set_to_zero(), inverse_mask_fn),
        ]
        if float(train_cfg.ema_decay) > 0.0:
            parts.append(_params_ema(train_cfg.ema_decay))
        tx = optax.chain(*parts)
        _TX_MEMO[key] = tx
    return tx


def set_opt_hyperparams(opt_state, learning_rate: float,
                        weight_decay: float):
    """Write the per-run lr/wd into the injected-hyperparams opt_state
    (structure: (MaskedState(inner_state=InjectHyperparamsState),
    MaskedState(zero)))."""
    masked_state = opt_state[0]
    inner = masked_state.inner_state
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = jnp.asarray(learning_rate,
                                      hp["learning_rate"].dtype)
    hp["weight_decay"] = jnp.asarray(weight_decay,
                                     hp["weight_decay"].dtype)
    new_masked = masked_state._replace(
        inner_state=inner._replace(hyperparams=hp))
    return (new_masked,) + tuple(opt_state[1:])


def create_train_state(model, variables, train_cfg: TrainConfig,
                       model_cfg: ModelConfig,
                       steps_per_epoch: int = 1) -> TrainState:
    tx = make_optimizer(train_cfg, model_cfg, steps_per_epoch)
    opt_state = set_opt_hyperparams(tx.init(variables["params"]),
                                    train_cfg.learning_rate,
                                    train_cfg.weight_decay)
    batch_stats = variables.get("batch_stats", {})  # ViT: no BN stats
    decay = float(train_cfg.ema_decay)
    ema_batch_stats = None
    if decay > 0.0 and jax.tree_util.tree_leaves(batch_stats):
        # own buffers, like _params_ema's init (donation safety)
        ema_batch_stats = jax.tree_util.tree_map(jnp.copy, batch_stats)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=batch_stats,
        opt_state=opt_state,
        tx=tx,
        apply_fn=model.apply,
        ema_batch_stats=ema_batch_stats,
        ema_decay=decay if ema_batch_stats is not None else 0.0,
    )
