"""Input pipeline: decode cache + HBM-resident device dataset + samplers.

The reference feeds training through DataLoader worker processes doing
PIL decode + torchvision transforms per image per epoch (reference
functions/hyperopt.py:119-146, final.py:224-243).  TPU-native redesign:

1. **Decode once, cache.** Every reference pipeline starts with
   ``Resize((256,256))`` (dataload.py:20,28,37,52), so shards are decoded
   and resized to 256x256 uint8 exactly once into a memory-mapped cache
   (tf.data-snapshot-style).  Steady-state epochs never touch a JPEG again.
2. **Dataset lives in HBM.** Animals-10 at 256x256 uint8 is ~5GB — it fits
   on-chip.  The cache is device_put sharded on the 'data' mesh axis once;
   every train step gathers its batch on-device (see
   irp_tpu.train.step.make_hbm_train_step).  Per-step host->device traffic
   is a (B,) int32 index array.
3. **Streaming fallback** for datasets that don't fit: a host iterator
   yielding uint8 batches for device_put (eval + big-data path).

Decode fidelity: PIL bilinear resize at cache build == torchvision
Resize((256,256)) on PIL input, byte-for-byte.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from irp_tpu.config import DatasetInfo
from irp_tpu.data.tar import iter_samples

CACHE_SIZE = 256  # everything downstream starts from Resize((256,256))


def decode_to_rgb256(jpg_bytes: bytes, size: int = CACHE_SIZE) -> np.ndarray:
    """JPEG bytes -> (size,size,3) uint8, PIL bilinear (reference parity)."""
    from PIL import Image

    img = Image.open(io.BytesIO(jpg_bytes))
    if img.mode != "RGB":
        img = img.convert("RGB")
    img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


def _fingerprint(shard_paths: Sequence[str]) -> str:
    h = hashlib.sha1()
    for p in sorted(shard_paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


@dataclass
class CachedDataset:
    """Decoded uint8 dataset (memmap-backed) + labels + metadata."""

    images: np.ndarray  # (N, 256, 256, 3) uint8
    labels: np.ndarray  # (N,) int32
    keys: List[str]
    class_names: Tuple[str, ...]

    def __len__(self):
        return len(self.labels)


def build_cache(shard_paths: Sequence[str], class_names: Sequence[str],
                cache_dir: Optional[str] = None,
                size: int = CACHE_SIZE,
                decoder=None) -> CachedDataset:
    """Decode all shards to a uint8 cache; reuse if fingerprint matches.

    ``class_names`` fixes the label mapping (must come from
    analyze_webdataset so the frequency ordering matches the reference,
    SURVEY §2 #13).  ``decoder`` overrides the per-sample JPEG decoder
    (the native C++ path plugs in here).
    """
    name_to_idx = {n: i for i, n in enumerate(class_names)}
    decoder = decoder or decode_to_rgb256

    meta_path = img_path = lab_path = None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        fp = _fingerprint(shard_paths)
        base = os.path.join(cache_dir, f"cache_{fp}_{size}")
        meta_path, img_path, lab_path = (base + ".json", base + ".img.npy",
                                         base + ".lab.npy")
        if all(os.path.exists(p) for p in (meta_path, img_path, lab_path)):
            with open(meta_path) as f:
                meta = json.load(f)
            if tuple(meta["class_names"]) == tuple(class_names):
                return CachedDataset(
                    images=np.load(img_path, mmap_mode="r"),
                    labels=np.load(lab_path),
                    keys=meta["keys"],
                    class_names=tuple(class_names))

    images, labels, keys = [], [], []
    for sample in iter_samples(list(shard_paths)):
        jpg = sample.get("jpg")
        cls = sample.get("cls")
        if jpg is None or cls is None:
            continue
        name = cls.decode("utf-8") if isinstance(cls, bytes) else cls
        images.append(decoder(jpg, size))
        labels.append(name_to_idx[name])
        keys.append(sample["__key__"])

    images_arr = np.stack(images) if images else np.zeros(
        (0, size, size, 3), np.uint8)
    labels_arr = np.asarray(labels, np.int32)

    if cache_dir:
        np.save(img_path, images_arr)
        np.save(lab_path, labels_arr)
        with open(meta_path, "w") as f:
            json.dump({"class_names": list(class_names), "keys": keys}, f)
        images_arr = np.load(img_path, mmap_mode="r")

    return CachedDataset(images=images_arr, labels=labels_arr, keys=keys,
                         class_names=tuple(class_names))


class HBMDataset:
    """The cached dataset, resident in device HBM, sharded on 'data'.

    Samples are padded (wrap-around) to a multiple of the data-axis size so
    every device holds an equal local shard; the sampler draws local indices
    per device, so batch gathers never cross chips.
    """

    def __init__(self, cached: CachedDataset, mesh):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from irp_tpu.parallel.mesh import DATA_AXIS

        self.mesh = mesh
        d = mesh.shape[DATA_AXIS]
        n = len(cached)
        n_pad = -(-n // d) * d if n else d
        idx = np.arange(n_pad) % max(n, 1)
        self.n_total = n
        self.n_padded = n_pad
        self.local_count = n_pad // d
        self.data_axis_size = d
        img_sh = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
        lab_sh = NamedSharding(mesh, P(DATA_AXIS))
        self.images = jax.device_put(np.ascontiguousarray(cached.images[idx]),
                                     img_sh)
        self.labels = jax.device_put(cached.labels[idx], lab_sh)


class EpochSampler:
    """Per-device local-index batches for the HBM gather step.

    Each device permutes its own local shard each epoch (shard-local
    shuffling — same statistical design as the reference's per-worker shard
    sampling + buffer shuffle, hyperopt.py:119-146).  Yields (B,) int32
    arrays laid out [device0's B/D indices | device1's ... ].
    """

    def __init__(self, hbm: HBMDataset, batch_size: int, seed: int = 0):
        d = hbm.data_axis_size
        if batch_size % d != 0:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"data axis size {d}")
        self.hbm = hbm
        self.batch_size = batch_size
        self.per_device = batch_size // d
        self.rng = np.random.default_rng(seed)

    def epoch(self, num_steps: Optional[int] = None) -> Iterator[np.ndarray]:
        d = self.hbm.data_axis_size
        n_local = self.hbm.local_count
        steps_per_epoch = max(n_local // self.per_device, 1)
        steps = steps_per_epoch if num_steps is None else num_steps
        # (D, n_local) independent permutations, re-drawn when exhausted
        perms = np.stack([self.rng.permutation(n_local) for _ in range(d)])
        pos = 0
        for _ in range(steps):
            if pos + self.per_device > n_local:
                perms = np.stack(
                    [self.rng.permutation(n_local) for _ in range(d)])
                pos = 0
            batch = perms[:, pos:pos + self.per_device]  # (D, B/D)
            pos += self.per_device
            yield np.ascontiguousarray(batch.reshape(-1).astype(np.int32))

    def epoch_matrix(self, num_steps: Optional[int] = None) -> np.ndarray:
        """(num_steps, B) int32 — one epoch of batches for the scan-based
        epoch step (irp_tpu.train.step.make_hbm_epoch_step)."""
        return np.stack(list(self.epoch(num_steps)))

    @property
    def steps_per_epoch(self) -> int:
        return max(self.hbm.local_count // self.per_device, 1)


def iter_host_batches(cached: CachedDataset, batch_size: int,
                      shuffle: bool = False, seed: int = 0,
                      drop_last: bool = False,
                      pad_final: bool = False):
    """Stream (images_u8, labels, n_valid) numpy batches from the cache.

    ``pad_final=True`` wraps the last partial batch to full size (static
    shapes for jit) and reports the real count in n_valid.
    """
    n = len(cached)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for start in range(0, n, batch_size):
        idx = order[start:start + batch_size]
        n_valid = len(idx)
        if n_valid < batch_size:
            if drop_last:
                return
            if pad_final:
                pad = np.resize(idx, batch_size)
                idx = pad
        yield (np.ascontiguousarray(cached.images[idx]),
               cached.labels[idx], n_valid)
