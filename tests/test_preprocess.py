"""Preprocess/augmentation tests incl. parity vs PIL and torch formulas."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from irp_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from irp_tpu.ops.preprocess import (adjust_hue, augment_batch, center_crop,
                                    color_jitter, eval_preprocess_batch,
                                    random_resized_crop, rotate)
from irp_tpu.data.pipeline import decode_to_rgb256


def _rand_img(rng, h=256, w=256):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_eval_preprocess_matches_reference_formula():
    """CenterCrop(224)+ToTensor+Normalize, computed two ways."""
    rng = np.random.default_rng(0)
    batch = np.stack([_rand_img(rng) for _ in range(2)])
    out = np.asarray(eval_preprocess_batch(jnp.array(batch), out_size=224,
                                           dtype=jnp.float32))
    crop = batch[:, 16:240, 16:240, :].astype(np.float32) / 255.0
    want = (crop - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_center_crop_geometry_odd_even():
    x = jnp.arange(10.0 * 10 * 1).reshape(10, 10, 1)
    c = center_crop(x, 4)
    assert c.shape == (4, 4, 1)
    np.testing.assert_allclose(np.asarray(c)[0, 0, 0], x[3, 3, 0])


def test_rrc_identity_when_full_crop():
    """scale=(1,1), ratio=(1,1) -> crop is the whole image; bilinear resize
    to the same size must be (near) identity."""
    rng = np.random.default_rng(1)
    img = jnp.array(_rand_img(rng, 64, 64), jnp.float32) / 255.0
    out = random_resized_crop(img, jax.random.PRNGKey(0), 64,
                              scale=(1.0, 1.0), ratio=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_rrc_output_shape_and_range():
    rng = np.random.default_rng(2)
    img = jnp.array(_rand_img(rng, 256, 256), jnp.float32) / 255.0
    for i in range(3):
        out = random_resized_crop(img, jax.random.PRNGKey(i), 224,
                                  scale=(0.8, 1.0))
        assert out.shape == (224, 224, 3)
        assert float(out.min()) >= -1e-3 and float(out.max()) <= 1 + 1e-3


def test_hue_roundtrip_and_torch_parity():
    """adjust_hue vs torchvision's formula via torch (HSV shift)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    # roundtrip: +s then -s
    a = adjust_hue(jnp.array(img), 0.17)
    b = adjust_hue(a, -0.17)
    np.testing.assert_allclose(np.asarray(b), img, atol=1e-4)
    # zero shift = identity
    z = adjust_hue(jnp.array(img), 0.0)
    np.testing.assert_allclose(np.asarray(z), img, atol=1e-5)


def test_color_jitter_factor_laws():
    """brightness-only jitter with huge key sample: output = f*x with
    f in [0.9, 1.1]."""
    img = jnp.full((4, 4, 3), 0.5, jnp.float32)
    outs = []
    for i in range(50):
        out = color_jitter(img, jax.random.PRNGKey(i), 0.1, 0.0, 0.0, 0.0)
        outs.append(float(np.asarray(out)[0, 0, 0]) / 0.5)
    assert min(outs) >= 0.9 - 1e-6 and max(outs) <= 1.1 + 1e-6
    assert max(outs) - min(outs) > 0.05  # actually random


def test_rotate_nearest_zero_angle_identity():
    rng = np.random.default_rng(4)
    img = jnp.array(_rand_img(rng, 32, 32), jnp.float32)
    out = rotate(img, 0.0, method="nearest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_rotate_90_matches_numpy():
    rng = np.random.default_rng(5)
    img = jnp.array(_rand_img(rng, 33, 33), jnp.float32)  # odd => exact center
    out = rotate(img, 90.0, method="nearest")
    want = np.rot90(np.asarray(img), k=1, axes=(0, 1))  # CCW like PIL
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)


def test_augment_batch_shapes_and_determinism():
    rng = np.random.default_rng(6)
    batch = jnp.array(np.stack([_rand_img(rng, 64, 64) for _ in range(4)]))
    for intensity in ("low", "medium", "high"):
        out1 = augment_batch(batch, jax.random.PRNGKey(7),
                             intensity=intensity, out_size=56,
                             dtype=jnp.float32)
        out2 = augment_batch(batch, jax.random.PRNGKey(7),
                             intensity=intensity, out_size=56,
                             dtype=jnp.float32)
        assert out1.shape == (4, 56, 56, 3)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        out3 = augment_batch(batch, jax.random.PRNGKey(8),
                             intensity=intensity, out_size=56,
                             dtype=jnp.float32)
        assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 0


def test_augment_per_sample_independent():
    """Identical images in a batch must get different augmentations."""
    rng = np.random.default_rng(9)
    one = _rand_img(rng, 64, 64)
    batch = jnp.array(np.stack([one, one, one, one]))
    out = np.asarray(augment_batch(batch, jax.random.PRNGKey(0),
                                   intensity="medium", out_size=56,
                                   dtype=jnp.float32))
    assert np.abs(out[0] - out[1]).max() > 0


def test_decode_to_rgb256_matches_pil_reference():
    """Cache decoder == PIL decode + Resize((256,256)) BILINEAR ==
    torchvision Resize on PIL input (reference dataload.py:20)."""
    import io
    from PIL import Image

    rng = np.random.default_rng(10)
    img = Image.fromarray(_rand_img(rng, 224, 224))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    ours = decode_to_rgb256(buf.getvalue())
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB")
                     .resize((256, 256), Image.BILINEAR))
    np.testing.assert_array_equal(ours, ref)
    assert ours.shape == (256, 256, 3) and ours.dtype == np.uint8


def test_flip_fold_equals_explicit_flip_then_crop():
    """hflip/vflip folded into the resample matrices == materializing the
    flipped image and resampling with the same boxes."""
    import jax.numpy as jnp
    from irp_tpu.ops.preprocess import resample_crop_batch

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((4, 32, 40, 3)), jnp.float32)
    tops = jnp.asarray([0.0, 3.2, 5.5, 1.0])
    lefts = jnp.asarray([2.0, 0.0, 7.3, 4.4])
    hs = jnp.asarray([30.0, 28.0, 25.5, 32.0])
    ws = jnp.asarray([36.0, 40.0, 33.3, 38.0])
    hf = np.array([True, False, True, False])
    vf = np.array([False, True, True, False])

    folded = resample_crop_batch(x, tops, lefts, hs, ws, 16,
                                 hflip=jnp.asarray(hf), vflip=jnp.asarray(vf))
    xe = np.asarray(x)
    flipped = np.stack([
        img[::-1 if v else 1, ::-1 if h_ else 1, :]
        for img, h_, v in zip(xe, hf, vf)])
    explicit = resample_crop_batch(jnp.asarray(flipped), tops, lefts, hs,
                                   ws, 16)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(explicit),
                               atol=1e-5)
