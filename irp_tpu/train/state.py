"""TrainState + optimizer wiring.

Replaces the reference's stateful nn.Module + torch Adam
(reference functions/model.py:45-60) with an immutable flax TrainState.

Optimizer semantics match torch ``optim.Adam(trainable, lr, weight_decay)``:
L2 decay is *added to the gradient before* the Adam moment update (torch
Adam's coupled weight decay — not AdamW), and only trainable parameters are
optimized (``filter(requires_grad)``, model.py:59).  Frozen params carry no
Adam moments at all (optax.masked), saving 2x their size in optimizer HBM.
"""

from __future__ import annotations

from typing import Any, Callable

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

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def trainable_mask(params, model_cfg: ModelConfig):
    """Bool pytree: True where the reference would set requires_grad.

    Head always trainable; backbone stages per ``trainable_stages``
    (reference model.py:17-23: freeze all, unfreeze layer4).
    """
    trainable_stages = () if model_cfg.head_only else model_cfg.trainable_stages

    def mask_for(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys[0] != "backbone":
            return True  # head
        if len(keys) < 2:
            return False
        stage = keys[1].split("_")[0]  # layer4_block2 -> layer4
        return stage in trainable_stages

    return jax.tree_util.tree_map_with_path(mask_for, params)


def make_optimizer(train_cfg: TrainConfig, model_cfg: ModelConfig,
                   schedule) -> optax.GradientTransformation:
    """torch-Adam-equivalent chain, masked to trainable params only."""
    inner = optax.chain(
        optax.add_decayed_weights(train_cfg.weight_decay),  # coupled L2
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),    # torch defaults
        optax.scale_by_learning_rate(schedule),
    )
    return optax.masked(inner, lambda params: trainable_mask(params, model_cfg))


def create_train_state(model, variables, train_cfg: TrainConfig,
                       model_cfg: ModelConfig, schedule) -> TrainState:
    tx = make_optimizer(train_cfg, model_cfg, schedule)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )
