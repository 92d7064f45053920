"""Learning-rate schedules.

The reference uses torch OneCycleLR with cosine annealing
(reference functions/train.py:115-121, final.py:267-276): warm up from
``max_lr/div_factor`` over ``pct_start`` of total steps, then cosine down to
``max_lr/(div_factor*final_div_factor)``.  ``optax.cosine_onecycle_schedule``
implements the same curve; this wrapper pins torch's default hyperparams so
the two match step-for-step.
"""

from __future__ import annotations

import optax


def onecycle_cosine(max_lr: float, total_steps: int,
                    pct_start: float = 0.3,
                    div_factor: float = 25.0,
                    final_div_factor: float = 1e4):
    """OneCycleLR(cos) with torch's defaults (torch.optim.lr_scheduler
    .OneCycleLR: pct_start=0.3, div_factor=25, final_div_factor=1e4)."""
    # transition_steps < 4 makes optax's interval math produce zero-width
    # segments (NaN lr); tiny cycles (e.g. a 2-epoch final run stepped per
    # epoch) are clamped to a 4-point cycle.
    return optax.cosine_onecycle_schedule(
        transition_steps=max(int(total_steps), 4),
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )


def cosine_anneal(max_lr: float, total_steps: int):
    """torch CosineAnnealingLR(eta_min=0) over ``total_steps``:
    lr_t = max_lr * (1 + cos(pi * t / T)) / 2 — the plain cosine decay
    without OneCycle's warmup leg."""
    return optax.cosine_decay_schedule(
        init_value=max_lr, decay_steps=max(int(total_steps), 1), alpha=0.0)


def constant(lr: float):
    return optax.constant_schedule(lr)
