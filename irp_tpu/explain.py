"""Grad-CAM explainability for served/evaluated classifiers.

The reference ships no explainability at all — its closest artifact is
the correct/incorrect prediction galleries (reference functions/
final.py:27-152), which show WHAT the model got wrong but never WHY.
This module answers the why: class-discriminative localization maps
(Grad-CAM, Selvaraju et al. 2017) telling a user which image regions
drove a prediction — the natural companion to the serving path
(``run_predict.py --gradcam``).

TPU-native formulation: the whole computation is ONE jitted program —
backbone forward to the pre-pool feature map A (B,h,w,C), head forward
for the logits, a VJP of the selected per-sample logits w.r.t. A
(cheap: the pooling+MLP head, not the backbone, is differentiated),
channel weights a_k = GAP(dy/dA_k), CAM = ReLU(sum_k a_k A_k),
per-sample min-max normalize, bilinear upsample to the crop size.
Fixed shapes in, fixed shapes out — compiles once per (batch, size).

Grad-CAM math note: with a global-average-pool architecture the VJP
w.r.t. A is spatially uniform per channel, so a_k A_k equals CAM at
full Grad-CAM generality for THIS model family while staying exact
(no gradient approximations).

ViT family: the head reads the CLS token, so gradients w.r.t. the
final patch tokens are identically zero — the useful surface is the
token sequence ENTERING the last encoder block (the standard ViT
Grad-CAM target).  The VJP differentiates (last block + final LN +
head) w.r.t. those tokens; CLS drops, patch tokens reshape to the
grid, and the same GAP-weight/ReLU/normalize math applies with the
embedding dim as channels.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _build_cam_fn(model, out_size: int):
    """Jitted (params, batch_stats, images_u8, class_idx) -> (cams, logits).

    cams: (B, out_size, out_size) float32 in [0, 1]; logits: (B, K) f32.
    ``class_idx`` (B,) int32 selects the logit each sample's map
    explains (-1 entries resolve to the argmax class).
    """
    import jax
    import jax.numpy as jnp

    from irp_tpu.config import IMAGENET_MEAN, IMAGENET_STD
    from irp_tpu.ops.preprocess import eval_preprocess_batch

    cfg = model.config
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def cam_fn(params, batch_stats, images_u8, class_idx):
        variables = {"params": params, "batch_stats": batch_stats}
        x = eval_preprocess_batch(images_u8, cfg.image_size, dtype,
                                  IMAGENET_MEAN, IMAGENET_STD)
        if cfg.family == "vit":
            # differentiate (last block + final LN + head) w.r.t. the
            # tokens entering the last block (see module docstring)
            acts = model.apply(variables, x,
                               method="vit_tokens")      # (B,S,E)
            acts = acts.astype(jnp.float32)

            def to_logits(a):
                return model.apply(variables, a,
                                   method="vit_logits_from_tokens")
        else:
            acts = model.apply(variables, x,
                               method="spatial_features")  # (B,h,w,C)
            acts = acts.astype(jnp.float32)

            def to_logits(a):
                # pool + family-exact post-pool transform + head (ConvNeXt
                # applies its final LayerNorm after the pool)
                return model.apply(variables, a,
                                   method="head_from_spatial")  # (B,K) f32

        logits, vjp = jax.vjp(to_logits, acts)
        target = jnp.where(class_idx < 0,
                           jnp.argmax(logits, axis=-1),
                           class_idx)
        onehot = jax.nn.one_hot(target, logits.shape[-1],
                                dtype=logits.dtype)
        # VJP of the selected per-sample logits: each row's cotangent
        # only touches its own sample, so one VJP gives all B gradients
        (d_acts,) = vjp(onehot)
        if cfg.family == "vit":
            grid = cfg.image_size // cfg.patch_size
            b = acts.shape[0]
            # drop CLS; patch tokens are the (grid x grid) spatial map
            spatial = acts[:, 1:].reshape(b, grid, grid, -1)
            d_spatial = d_acts[:, 1:].reshape(b, grid, grid, -1)
        else:
            spatial, d_spatial = acts, d_acts            # (B,h,w,C)
        alpha = d_spatial.mean(axis=(1, 2), keepdims=True)  # GAP weights
        cam = jax.nn.relu((alpha * spatial).sum(axis=-1))   # (B,h,w)
        lo = cam.min(axis=(1, 2), keepdims=True)
        hi = cam.max(axis=(1, 2), keepdims=True)
        cam = (cam - lo) / jnp.maximum(hi - lo, 1e-12)
        cam = jax.image.resize(cam, (cam.shape[0], out_size, out_size),
                               method="bilinear")
        # bilinear interp between [0,1] samples stays in [0,1]; clip
        # only guards float round-off
        return jnp.clip(cam, 0.0, 1.0), logits

    return cam_fn


class GradCAM:
    """Compiled Grad-CAM over a :class:`irp_tpu.infer.Predictor`.

    One fixed-shape program per (batch_size, input HxW): requests pad to
    ``batch_size`` exactly like ``predict_probs`` (defaults to the
    predictor's; pass a smaller one for interactive use — e.g. the
    serving daemon explains single images, and padding each to a bulk
    256-image program would waste ~256x the device work).

    Predictors loaded from a ``.irpx`` artifact (irp_tpu/export.py) are
    served from the artifact's baked explain program: batch size and
    source geometry are fixed at export time, and ``batch_size`` here
    must be omitted or match.
    """

    def __init__(self, predictor, batch_size: Optional[int] = None):
        import threading

        self._fns = {}  # out-size keyed (input HxW changes trace anyway)
        if getattr(predictor.model, "apply", None) is None:
            # an exported .irpx: Grad-CAM works iff the artifact bakes
            # the explain program (export_predictor(gradcam=True))
            cam_call = getattr(predictor, "_cam_call", None)
            if cam_call is None:
                raise ValueError(
                    "Grad-CAM needs the model's live forward to "
                    "differentiate through, and this exported .irpx "
                    "carries no explain program — re-export with "
                    "gradcam=True (the default), or serve Grad-CAM from "
                    "the .npz/.pth weights artifact")
            baked = int(predictor._cam_batch_size)
            if batch_size is not None and int(batch_size) != baked:
                raise ValueError(
                    f"this artifact's Grad-CAM program fixes "
                    f"batch_size={baked} (exported via "
                    f"gradcam_batch_size); got {batch_size}")
            self.predictor = predictor
            self.batch_size = baked
            self._fns[predictor.model.config.image_size] = cam_call
            self._build_lock = threading.Lock()
            return
        self.predictor = predictor
        self.batch_size = (predictor.batch_size if batch_size is None
                           else int(batch_size))
        if self.batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, "
                             f"got {self.batch_size}")
        self._build_lock = threading.Lock()  # one trace+compile per key

    def explain(self, images_u8: np.ndarray,
                class_idx: Optional[np.ndarray] = None):
        """(N,H,W,3) uint8 -> (cams (N,crop,crop) f32 in [0,1], logits).

        ``class_idx``: per-sample class to explain; None/-1 = predicted
        (argmax) class.  H,W must be >= the model's eval crop (same
        contract as ``Predictor.predict_probs``).
        """
        p = self.predictor
        images_u8 = np.asarray(images_u8, np.uint8)
        if images_u8.ndim != 4 or images_u8.shape[-1] != 3:
            raise ValueError(f"expected (N,H,W,3) uint8, "
                             f"got {images_u8.shape}")
        crop = p.model.config.image_size
        h, w = images_u8.shape[1:3]
        if h < crop or w < crop:
            raise ValueError(f"images are {h}x{w} but the model's eval "
                             f"crop is {crop}x{crop}")
        if (p.source_size is not None
                and (h, w) != (p.source_size, p.source_size)):
            # an exported explain program has a FIXED input shape, like
            # the exported forward (infer.Predictor.predict_probs)
            raise ValueError(
                f"this exported program requires sources of exactly "
                f"{p.source_size}x{p.source_size}, got {h}x{w}")
        n = images_u8.shape[0]
        num_classes = p.num_classes
        if class_idx is None:
            class_idx = np.full((n,), -1, np.int32)
        else:
            class_idx = np.asarray(class_idx, np.int32)
            if class_idx.shape == ():
                class_idx = np.full((n,), int(class_idx), np.int32)
            if class_idx.shape != (n,):
                raise ValueError(f"class_idx shape {class_idx.shape} != "
                                 f"({n},)")
            if (class_idx >= num_classes).any() or (class_idx < -1).any():
                raise ValueError("class_idx entries must be -1 (argmax) "
                                 f"or in [0, {num_classes})")
        if n == 0:
            return (np.zeros((0, crop, crop), np.float32),
                    np.zeros((0, num_classes), np.float32))
        with self._build_lock:
            fn = self._fns.get(crop)
            if fn is None:
                fn = self._fns[crop] = _build_cam_fn(p.model, crop)
        bsz = self.batch_size
        cams, logits = [], []
        for start in range(0, n, bsz):
            chunk = images_u8[start:start + bsz]
            cls = class_idx[start:start + bsz]
            if chunk.shape[0] < bsz:  # pad the tail to the compiled shape
                k = bsz - chunk.shape[0]
                chunk = np.concatenate(
                    [chunk, np.broadcast_to(chunk[-1:],
                                            (k,) + chunk.shape[1:])], 0)
                cls = np.concatenate([cls, np.full((k,), -1, np.int32)])
            c, lg = fn(p.params, p.batch_stats, chunk, cls)
            cams.append(np.asarray(c))
            logits.append(np.asarray(lg))
        return (np.concatenate(cams, 0)[:n],
                np.concatenate(logits, 0)[:n])


def center_crop_u8(image_u8: np.ndarray, size: int) -> np.ndarray:
    """Numpy mirror of the model's eval center crop
    (ops/preprocess.py::center_crop) — overlays must align with the
    pixels the CAM was computed on, not the uncropped source."""
    h, w = image_u8.shape[-3], image_u8.shape[-2]
    top, left = (h - size) // 2, (w - size) // 2
    return image_u8[..., top:top + size, left:left + size, :]


def overlay_cam(image_u8: np.ndarray, cam: np.ndarray,
                alpha: float = 0.45) -> np.ndarray:
    """Blend a [0,1] heatmap onto an RGB uint8 image (jet-style ramp).

    ``cam`` is resized (bilinear, PIL) to the image's HxW if needed;
    returns (H,W,3) uint8.
    """
    from PIL import Image

    image_u8 = np.asarray(image_u8, np.uint8)
    h, w = image_u8.shape[:2]
    cam = np.asarray(cam, np.float32)
    if cam.shape != (h, w):
        cam = np.asarray(
            Image.fromarray(cam, mode="F").resize((w, h), Image.BILINEAR),
            np.float32)
    cam = np.clip(cam, 0.0, 1.0)
    # compact jet-style ramp: blue -> cyan -> yellow -> red
    r = np.clip(1.5 - np.abs(4 * cam - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * cam - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * cam - 1), 0, 1)
    heat = (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)
    out = ((1 - alpha) * image_u8.astype(np.float32)
           + alpha * heat.astype(np.float32))
    return np.clip(out, 0, 255).astype(np.uint8)
