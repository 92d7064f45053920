"""On-device batched image preprocessing and augmentation.

TPU-native rebuild of the reference's torchvision transform pipelines
(reference functions/dataload.py:11-58).  The reference runs PIL/torchvision
transforms per-image in DataLoader worker processes; here the whole batch is
augmented on-chip in one jitted, vectorized program:

- host/cache side stores images already resized to 256x256 uint8 (every
  reference pipeline begins with ``Resize((256,256))``, dataload.py:20,28,37,52),
  so the device path starts from a static (B,256,256,3) uint8 tensor;
- eval path = CenterCrop(224) + ImageNet normalize (dataload.py:51-57);
- train paths match the reference intensities (dataload.py:18-46):
    low:    HFlip -> CenterCrop(224)
    medium: HFlip -> RandomResizedCrop(224, scale 0.8-1.0) -> ColorJitter(0.1)
    high:   HFlip -> VFlip(p=0.2) -> RRC(224, scale 0.7-1.0)
            -> ColorJitter(0.2, hue 0.1) -> RandomRotation(15)

Distributional-equivalence notes (SURVEY §7 hard part c): torchvision's
RandomResizedCrop retries up to 10x then falls back to center crop; here the
sampled crop is clamped into bounds instead (same marginal scale/ratio laws,
no data-dependent control flow under jit).  ColorJitter applies its four ops
in a random order; here the order is fixed brightness->contrast->saturation
->hue with identical factor distributions.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from irp_tpu.config import IMAGENET_MEAN, IMAGENET_STD

INTENSITIES = ("low", "medium", "high")


def normalize(x, mean: Sequence[float] = IMAGENET_MEAN,
              std: Sequence[float] = IMAGENET_STD,
              dtype=jnp.bfloat16):
    """uint8/float [0,255] or [0,1] image -> normalized `dtype` tensor.

    Matches ToTensor + Normalize (reference dataload.py:13-16,24-25).
    """
    x = x.astype(jnp.float32) / 255.0  # ToTensor: [0,255] -> [0,1]
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def center_crop(x, size: int):
    """Static center crop over the two spatial dims of (..., H, W, C)."""
    h, w = x.shape[-3], x.shape[-2]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top:top + size, left:left + size, :]


def _grayscale(x):
    """ITU-R 601 luma, same weights torchvision uses for rgb_to_grayscale."""
    w = jnp.array([0.299, 0.587, 0.114], x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def _blend(a, b, factor):
    return factor * a + (1.0 - factor) * b


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-12), 0.0)
    dc = jnp.maximum(deltac, 1e-12)
    rc = (maxc - r) / dc
    gc = (maxc - g) / dc
    bc = (maxc - b) / dc
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(deltac == 0, 0.0, h)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(x, shift):
    """Shift hue by ``shift`` turns (torchvision F.adjust_hue semantics),
    x in [0,1]."""
    h, s, v = _rgb_to_hsv(x)
    return _hsv_to_rgb((h + shift) % 1.0, s, v)


def color_jitter(x, key, brightness: float, contrast: float,
                 saturation: float, hue: float):
    """ColorJitter on a single [0,1] float image (H,W,C).

    Factor laws match torchvision: uniform[max(0,1-v), 1+v] for b/c/s,
    uniform[-hue, hue] turns for hue (reference dataload.py:31,41).
    """
    kb, kc, ks, kh = jax.random.split(key, 4)
    if brightness > 0:
        f = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness),
                               maxval=1 + brightness)
        x = jnp.clip(f * x, 0.0, 1.0)
    if contrast > 0:
        f = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast),
                               maxval=1 + contrast)
        mean_gray = jnp.mean(_grayscale(x))
        x = jnp.clip(_blend(x, mean_gray, f), 0.0, 1.0)
    if saturation > 0:
        f = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation),
                               maxval=1 + saturation)
        x = jnp.clip(_blend(x, _grayscale(x), f), 0.0, 1.0)
    if hue > 0:
        shift = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
        x = adjust_hue(x, shift)
    return x


def random_resized_crop(x, key, out_size: int,
                        scale: Tuple[float, float],
                        ratio: Tuple[float, float] = (3 / 4, 4 / 3),
                        antialias: bool = True):
    """RandomResizedCrop on one (H,W,C) float image, static output shape.

    Samples area fraction ~ U(scale) and log-aspect ~ U(log ratio) like
    torchvision, clamps the crop into bounds (vs torchvision's 10-try
    rejection loop — jit-unfriendly), then resamples the crop to
    ``out_size`` with a bilinear ``scale_and_translate`` (one fused XLA
    gather/matmul program instead of a PIL call).
    """
    h, w = x.shape[0], x.shape[1]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    cw = jnp.sqrt(area * aspect)
    ch = jnp.sqrt(area / aspect)
    cw = jnp.clip(cw, 1.0, float(w))
    ch = jnp.clip(ch, 1.0, float(h))
    top = jax.random.uniform(k3, (), minval=0.0, maxval=1.0) * (h - ch)
    left = jax.random.uniform(k4, (), minval=0.0, maxval=1.0) * (w - cw)

    scale_vec = jnp.array([out_size / ch, out_size / cw], jnp.float32)
    translation = -jnp.array([top, left], jnp.float32) * scale_vec
    return jax.image.scale_and_translate(
        x, (out_size, out_size, x.shape[2]), (0, 1),
        scale_vec, translation, method="bilinear", antialias=antialias)


def rotate(x, angle_deg, method: str = "nearest", fill: float = 0.0):
    """Rotate one (H,W,C) image about its center.

    torchvision RandomRotation defaults to NEAREST resampling, expand=False,
    fill=0 (reference dataload.py:43) — ``method='nearest'`` reproduces that;
    'bilinear' is available for smoother augmentation.
    """
    h, w = x.shape[0], x.shape[1]
    theta = -angle_deg * jnp.pi / 180.0  # image-space CCW like PIL
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ys = yy - cy
    xs = xx - cx
    src_y = jnp.cos(theta) * ys - jnp.sin(theta) * xs + cy
    src_x = jnp.sin(theta) * ys + jnp.cos(theta) * xs + cx
    order = 0 if method == "nearest" else 1
    coords = [src_y, src_x]

    def sample_channel(c):
        return jax.scipy.ndimage.map_coordinates(
            c, coords, order=order, mode="constant", cval=fill)

    return jnp.stack([sample_channel(x[..., c]) for c in range(x.shape[-1])],
                     axis=-1)


def interp_matrix(start, size, in_size: int, out_size: int, mirror=None):
    """Bilinear (triangle-filter, antialiased) interpolation matrix.

    Maps ``in_size`` source pixels to ``out_size`` output pixels resampling
    the window [start, start+size).  Same filter family as PIL BILINEAR /
    jax.image 'linear' antialias=True; expressed as a dense (out,in) matrix
    so a whole resize is two MXU matmuls instead of gathers —
    gather-based resampling inside scanned train steps measured ~60x
    slower on TPU.

    ``mirror`` (traced bool): sample the window from the FLIPPED source —
    exactly flip-then-crop for the same box, folded into the matrix so a
    random flip costs nothing instead of a full-image HBM pass.
    """
    scale = size / out_size
    support = jnp.maximum(scale, 1.0)
    o = jnp.arange(out_size, dtype=jnp.float32)
    centers = start + (o + 0.5) * scale - 0.5
    if mirror is not None:
        centers = jnp.where(mirror, (in_size - 1.0) - centers, centers)
    src = jnp.arange(in_size, dtype=jnp.float32)
    dist = jnp.abs(centers[:, None] - src[None, :]) / support
    w = jnp.clip(1.0 - dist, 0.0, 1.0)
    return w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-8)


def resample_crop_batch(x, tops, lefts, heights, widths, out_size: int,
                        hflip=None, vflip=None):
    """Batched crop+resize via separable matmuls (the MXU path).

    x: (B, H, W, C) float; per-image crop boxes; returns (B,out,out,C).
    Equivalent to vmapped resized-crop with bilinear+antialias.
    ``hflip``/``vflip``: optional (B,) bool masks folding per-image flips
    into the interpolation matrices (no flipped-image materialization).
    """
    h, w = x.shape[1], x.shape[2]
    vf = vflip if vflip is not None else jnp.zeros(x.shape[0], bool)
    hf = hflip if hflip is not None else jnp.zeros(x.shape[0], bool)
    ry = jax.vmap(lambda t, s, m: interp_matrix(t, s, h, out_size, m))(
        tops, heights, vf)   # (B, out, H)
    rx = jax.vmap(lambda l, s, m: interp_matrix(l, s, w, out_size, m))(
        lefts, widths, hf)   # (B, out, W)
    # keep the contraction in x's dtype (bf16 work_dtype stays bf16 on the
    # MXU with f32 accumulation, instead of promoting the whole image)
    ry = ry.astype(x.dtype)
    rx = rx.astype(x.dtype)
    tmp = jnp.einsum("boh,bhwc->bowc", ry, x,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.einsum("bpw,bowc->bopc", rx, tmp,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def _sample_rrc_boxes(key, batch: int, h: int, w: int,
                      scale: Tuple[float, float],
                      ratio: Tuple[float, float] = (3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop box law, vectorized over the batch."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k1, (batch,), minval=scale[0],
                                      maxval=scale[1])
    log_ratio = jax.random.uniform(k2, (batch,), minval=jnp.log(ratio[0]),
                                   maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    cw = jnp.clip(jnp.sqrt(area * aspect), 1.0, float(w))
    ch = jnp.clip(jnp.sqrt(area / aspect), 1.0, float(h))
    tops = jax.random.uniform(k3, (batch,)) * (h - ch)
    lefts = jax.random.uniform(k4, (batch,)) * (w - cw)
    return tops, lefts, ch, cw


def color_jitter_batch(x, key, brightness: float, contrast: float,
                       saturation: float, hue: float):
    """Batch-vectorized ColorJitter (same factor laws as color_jitter).

    Factors are cast to x.dtype so a bf16 work_dtype stays bf16 end to end
    (no silent f32 promotion of the whole image).
    """
    b = x.shape[0]
    dt = x.dtype
    one = jnp.asarray(1.0, dt)
    zero = jnp.asarray(0.0, dt)
    kb, kc, ks, kh = jax.random.split(key, 4)
    if brightness > 0:
        f = jax.random.uniform(kb, (b, 1, 1, 1),
                               minval=max(0.0, 1 - brightness),
                               maxval=1 + brightness).astype(dt)
        x = jnp.clip(f * x, zero, one)
    if contrast > 0:
        f = jax.random.uniform(kc, (b, 1, 1, 1),
                               minval=max(0.0, 1 - contrast),
                               maxval=1 + contrast).astype(dt)
        mean_gray = jnp.mean(_grayscale(x).astype(jnp.float32),
                             axis=(1, 2, 3), keepdims=True).astype(dt)
        x = jnp.clip(_blend(x, mean_gray, f), zero, one)
    if saturation > 0:
        f = jax.random.uniform(ks, (b, 1, 1, 1),
                               minval=max(0.0, 1 - saturation),
                               maxval=1 + saturation).astype(dt)
        x = jnp.clip(_blend(x, _grayscale(x), f), zero, one)
    if hue > 0:
        shift = jax.random.uniform(kh, (b, 1, 1),
                                   minval=-hue, maxval=hue).astype(dt)
        h_, s_, v_ = _rgb_to_hsv(x)
        x = _hsv_to_rgb((h_ + shift) % one, s_, v_)
    return x


def augment_batch_fused(images_u8, key, intensity: str, out_size: int,
                        mean=IMAGENET_MEAN, std=IMAGENET_STD,
                        dtype=jnp.bfloat16, work_dtype=jnp.float32):
    """Batch-level augmentation built from MXU-friendly primitives.

    This is the train-step hot path: flips as masked reverses, RRC as two
    einsum resamplings, jitter vectorized; only 'high' rotation falls back
    to per-image map_coordinates.  Matches _augment_one's per-sample
    semantics distributionally.
    """
    b, h, w = images_u8.shape[0], images_u8.shape[1], images_u8.shape[2]
    # work_dtype=bfloat16 halves the HBM traffic of the float image; its
    # ~2/255 rounding is below augmentation noise (training-path only —
    # the eval path stays f32).
    x = images_u8.astype(work_dtype) / jnp.asarray(255.0, work_dtype)
    k_h, k_v, k_crop, k_jit, k_rot = jax.random.split(key, 5)

    do_h = jax.random.bernoulli(k_h, shape=(b,))

    if intensity == "low":
        x = jnp.where(do_h[:, None, None, None], x[:, :, ::-1, :], x)
        x = center_crop(x, out_size)
    elif intensity == "medium":
        tops, lefts, ch, cw = _sample_rrc_boxes(k_crop, b, h, w, (0.8, 1.0))
        # flips fold into the resample matrices (flip-then-crop exactly,
        # zero extra HBM traffic)
        x = resample_crop_batch(x, tops, lefts, ch, cw, out_size,
                                hflip=do_h)
        x = color_jitter_batch(x, k_jit, 0.1, 0.1, 0.1, 0.0)
    elif intensity == "high":
        do_v = jax.random.bernoulli(k_v, p=0.2, shape=(b,))
        tops, lefts, ch, cw = _sample_rrc_boxes(k_crop, b, h, w, (0.7, 1.0))
        x = resample_crop_batch(x, tops, lefts, ch, cw, out_size,
                                hflip=do_h, vflip=do_v)
        x = color_jitter_batch(x, k_jit, 0.2, 0.2, 0.2, 0.1)
        angles = jax.random.uniform(k_rot, (b,), minval=-15.0, maxval=15.0)
        x = jax.vmap(lambda im, a: rotate(im, a, method="nearest"))(x, angles)
    else:
        raise ValueError(f"unknown intensity: {intensity}")

    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((x.astype(jnp.float32) - mean) / std).astype(dtype)


def _augment_one(img_u8, key, intensity: str, out_size: int):
    """Augment one (256,256,3) uint8 image -> (224,224,3) float [0,1]."""
    x = img_u8.astype(jnp.float32) / 255.0
    k_h, k_v, k_crop, k_jit, k_rot = jax.random.split(key, 5)

    # RandomHorizontalFlip(p=0.5) — all intensities (dataload.py:21,29,38)
    do_h = jax.random.bernoulli(k_h)
    x = jnp.where(do_h, x[:, ::-1, :], x)

    if intensity == "low":
        x = center_crop(x, out_size)
    elif intensity == "medium":
        x = random_resized_crop(x, k_crop, out_size, scale=(0.8, 1.0))
        x = color_jitter(x, k_jit, 0.1, 0.1, 0.1, 0.0)
    elif intensity == "high":
        do_v = jax.random.bernoulli(k_v, p=0.2)
        x = jnp.where(do_v, x[::-1, :, :], x)
        x = random_resized_crop(x, k_crop, out_size, scale=(0.7, 1.0))
        x = color_jitter(x, k_jit, 0.2, 0.2, 0.2, 0.1)
        angle = jax.random.uniform(k_rot, (), minval=-15.0, maxval=15.0)
        x = rotate(x, angle, method="nearest")
    else:
        raise ValueError(f"unknown intensity: {intensity}")
    return x


@functools.partial(jax.jit, static_argnames=("intensity", "out_size", "dtype"))
def augment_batch(images_u8, key, intensity: str = "medium",
                  out_size: int = 224, dtype=jnp.bfloat16,
                  mean: Tuple[float, ...] = IMAGENET_MEAN,
                  std: Tuple[float, ...] = IMAGENET_STD):
    """Augment + normalize a (B,256,256,3) uint8 batch on device.

    Per-sample RNG via fold_in(vmap) so augmentation is independent per
    image and reproducible given the step key.
    """
    b = images_u8.shape[0]
    keys = jax.random.split(key, b)
    aug = jax.vmap(lambda im, k: _augment_one(im, k, intensity, out_size))(
        images_u8, keys)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((aug - mean) / std).astype(dtype)


@functools.partial(jax.jit, static_argnames=("out_size", "dtype"))
def eval_preprocess_batch(images_u8, out_size: int = 224, dtype=jnp.bfloat16,
                          mean: Tuple[float, ...] = IMAGENET_MEAN,
                          std: Tuple[float, ...] = IMAGENET_STD):
    """Eval path: CenterCrop(224) + normalize (reference dataload.py:51-57).

    Input (B,256,256,3) uint8 (already Resize(256,256)'d at cache build).
    """
    x = center_crop(images_u8, out_size).astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((x - mean) / std).astype(dtype)
