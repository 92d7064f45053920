"""Checkpointing: Orbax for TrainState, npz weights, torch .pth export.

The reference checkpoints via per-epoch ``torch.save(state_dict)`` plus a
final save logged to MLflow (reference functions/final.py:339-354), and
restores best weights from an in-memory snapshot (train.py:172-187).
Here: Orbax (async-capable, sharding-aware) for full TrainState, a simple
npz format for weights-only, and a torch-state_dict exporter so reference
tooling can load our final model.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def save_weights_npz(path: str, params, batch_stats,
                     meta: Optional[dict] = None) -> str:
    """Flat npz of all weights (portable, no orbax needed).

    ``meta`` (scalars/small arrays, e.g. ``{"image_size": 224}``) rides
    along under reserved ``__meta__/`` keys so the artifact is
    self-describing: the serving path (infer.py::load_predictor) recovers
    the training-time eval geometry without the caller re-stating it.
    """
    flat = {}
    for coll, tree in (("params", params), ("batch_stats", batch_stats)):
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = coll + "/" + "/".join(getattr(p, "key", str(p))
                                        for p in kp)
            flat[key] = np.asarray(leaf)
    for k, v in (meta or {}).items():
        flat["__meta__/" + k] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)
    return path


def load_weights_npz(path: str, with_meta: bool = False):
    """Inverse of save_weights_npz -> (params, batch_stats) nested dicts.

    ``with_meta=True`` appends the artifact's meta dict to the tuple —
    one archive open instead of a separate :func:`load_weights_meta`
    pass (empty for pre-metadata artifacts).
    """
    data = np.load(path)
    out = {"params": {}, "batch_stats": {}}
    meta = {}
    for key in data.files:
        coll, rest = key.split("/", 1)
        if coll == "__meta__":
            v = data[key]
            meta[rest] = v.item() if v.ndim == 0 else v
            continue
        node = out[coll]
        parts = rest.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    if with_meta:
        return out["params"], out["batch_stats"], meta
    return out["params"], out["batch_stats"]


def load_weights_meta(path: str) -> dict:
    """The ``meta`` dict a save_weights_npz artifact was written with
    (empty for pre-metadata artifacts — every weight key still loads)."""
    return load_weights_npz(path, with_meta=True)[2]


def save_checkpoint(ckpt_dir: str, state, step: Optional[int] = None) -> str:
    """Orbax checkpoint of the TrainState (params/batch_stats/opt_state)."""
    import orbax.checkpoint as ocp

    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "opt_state": state.opt_state,
               "step": np.asarray(state.step)}
    if getattr(state, "ema_batch_stats", None) is not None:
        # key present only when tracked: decay=0 checkpoints keep the
        # legacy payload structure bit-for-bit
        payload["ema_batch_stats"] = state.ema_batch_stats
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str):
    """Newest Orbax checkpoint in a per-epoch directory.

    Returns ``(path, next_epoch)`` — the resume point for
    ``fit(restore_from=path, start_epoch=next_epoch)`` — or
    ``(None, 0)`` when the directory holds no checkpoints yet."""
    import re

    best = None
    if os.path.isdir(ckpt_dir):
        for entry in os.listdir(ckpt_dir):
            m = re.fullmatch(r"step_(\d{8})", entry)
            if m and (best is None or int(m.group(1)) > best[1]):
                best = (os.path.join(ckpt_dir, entry), int(m.group(1)))
    if best is None:
        return None, 0
    return best[0], best[1] + 1


def restore_checkpoint(path: str, state):
    """Restore into an existing TrainState (shapes from ``state``)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": np.asarray(state.step)}
    has_ema_stats = getattr(state, "ema_batch_stats", None) is not None
    if has_ema_stats:
        template["ema_batch_stats"] = state.ema_batch_stats
    try:
        restored = ckptr.restore(path, template)
    except Exception:
        if not has_ema_stats:
            raise
        # Pre-round-4 EMA checkpoint without the ema_batch_stats key:
        # restore the rest and seed the stats EMA from the live stats
        # (the resumed EMA re-converges at the decay's time constant).
        import warnings

        template.pop("ema_batch_stats")
        restored = ckptr.restore(path, template)
        warnings.warn(
            "checkpoint has no ema_batch_stats; seeding the BN-stats "
            "EMA from the restored running stats", stacklevel=2)
        restored["ema_batch_stats"] = jax.tree_util.tree_map(
            np.copy, restored["batch_stats"])
        # re-add for the placement pass below (leaves pair 1:1)
        template["ema_batch_stats"] = state.ema_batch_stats

    # Orbax restores leaves COMMITTED to device 0; the train step's other
    # inputs carry mesh (NamedSharding) placements and jit rejects the
    # mix.  Re-place mesh-sharded leaves explicitly; demote everything
    # else to host numpy (uncommitted — jit places it freely).
    from jax.sharding import NamedSharding

    def _place(r, t):
        sh = getattr(t, "sharding", None)
        if isinstance(sh, NamedSharding):
            return jax.device_put(jax.numpy.asarray(r, dtype=t.dtype), sh)
        return np.asarray(r)

    restored = jax.tree_util.tree_map(_place, restored, template)
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"],
                          step=restored["step"])
    if has_ema_stats:
        state = state.replace(ema_batch_stats=restored["ema_batch_stats"])
    return state


def export_torch_pth(path: str, params, batch_stats, depth: int = 50) -> str:
    """Write a torch state_dict .pth the reference stack could load."""
    import torch

    from irp_tpu.models.convert import flax_variables_to_torch_state_dict

    sd = flax_variables_to_torch_state_dict(
        {"params": params, "batch_stats": batch_stats}, depth=depth)
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
    return path
