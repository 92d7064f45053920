"""Native C++ batch JPEG decoder: parity with PIL and the shard-level
batched cache-build path (VERDICT r1 weak #6: the thread pool must see
whole shards, not one image per call)."""

import io

import numpy as np
import pytest
from PIL import Image

from irp_tpu.data.jpeg import decode_batch_native, native_decoder_available
from irp_tpu.data.pipeline import build_cache, decode_to_rgb256

pytestmark = pytest.mark.skipif(not native_decoder_available(),
                                reason="native decoder not built")


def _jpegs(rng, n, hw=(120, 90)):
    out = []
    for _ in range(n):
        arr = rng.integers(0, 255, (hw[0], hw[1], 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=92)
        out.append(buf.getvalue())
    return out


def test_batch_decode_matches_pil_within_1():
    rng = np.random.default_rng(0)
    jpgs = _jpegs(rng, 8)
    imgs, ok = decode_batch_native(jpgs, out_size=64)
    assert ok.all() and imgs.shape == (8, 64, 64, 3)
    for jpg, img in zip(jpgs, imgs):
        ref = decode_to_rgb256(jpg, 64)
        diff = np.abs(img.astype(int) - ref.astype(int))
        assert diff.max() <= 1, f"native vs PIL max diff {diff.max()}"


def test_batch_decode_flags_corrupt():
    rng = np.random.default_rng(1)
    jpgs = _jpegs(rng, 3)
    jpgs[1] = b"not a jpeg at all"
    imgs, ok = decode_batch_native(jpgs, out_size=32)
    assert list(ok) == [True, False, True]


def test_build_cache_native_matches_pil(tmp_path):
    from tests.synth import make_synthetic_shards

    meta = make_synthetic_shards(str(tmp_path), num_classes=3, per_class=10,
                                 samples_per_shard=12, seed=5, size=80)
    from irp_tpu.data.analyze import analyze_webdataset

    info = analyze_webdataset(meta["shards"])
    pil = build_cache(meta["shards"], info.class_names, size=64)
    nat = build_cache(meta["shards"], info.class_names, size=64,
                      use_native=True)
    assert nat.keys == pil.keys
    np.testing.assert_array_equal(nat.labels, pil.labels)
    diff = np.abs(nat.images.astype(int) - pil.images.astype(int))
    assert diff.max() <= 1
