"""Batched inference / serving for trained classifiers.

The reference stops at evaluation: its trained model is only ever run
inside the final-eval loop (reference functions/final.py:27-63,
functions/train.py:192-238) — there is no load-weights-and-score-new-data
path anywhere.  This module is that missing deployment story, TPU-first:

- load a final-weights artifact: the ``.npz`` that ``train_final_model``
  saves (train/checkpoint.py::save_weights_npz), or a torch ``.pth`` —
  ours (checkpoint.py::export_torch_pth) or one the reference stack saved
  (models/convert maps the state_dict bidirectionally, head included);
- the model architecture (depth / block type / head widths / class count)
  is inferred from the weight tree itself, so serving needs only the
  artifact;
- ONE fixed-shape jitted forward per predictor: requests of any size are
  padded into full batches, so the program compiles once and every call
  afterwards is a single dispatch per batch — no retraces, no dynamic
  shapes (XLA/TPU contract);
- optional data parallelism: hand ``load_predictor`` a
  ``jax.sharding.Mesh`` and batches shard over the ``data`` axis with
  replicated params (GSPMD partitions the forward; no code change);
- scoring entry points for uint8 arrays, image files, and WebDataset
  shards (bulk re-scoring of a curated dataset).

Preprocessing is the exact eval contract used at training time
(ops/preprocess.py::eval_preprocess_batch — CenterCrop + ImageNet
normalize from the 256x256 cache geometry, reference dataload.py:51-57),
so served predictions are bit-identical to final-eval predictions.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from irp_tpu.config import IMAGENET_MEAN, IMAGENET_STD, ModelConfig

_BASIC_DEPTHS = {(2, 2, 2, 2): 18, (3, 4, 6, 3): 34}
_BOTTLENECK_DEPTHS = {(3, 4, 6, 3): 50, (3, 4, 23, 3): 101, (3, 8, 36, 3): 152}


def softmax_np(logits: np.ndarray) -> np.ndarray:
    """Stable host-side softmax over the last axis (float32).

    The one shared implementation for callers that already hold logits
    (the Grad-CAM paths) — keeps their probabilities numerically
    consistent with each other."""
    logits = np.asarray(logits, np.float32)
    exps = np.exp(logits - logits.max(axis=-1, keepdims=True))
    return (exps / exps.sum(axis=-1, keepdims=True)).astype(np.float32)


def infer_model_config(params: dict, image_size: int = 224,
                       compute_dtype: str = "bfloat16") -> ModelConfig:
    """Reconstruct the ModelConfig a weight tree was trained with.

    Depth comes from the per-stage block counts + block type (conv3 =>
    bottleneck), head widths and class count from the head kernels.  Only
    architecture-bearing fields are recovered; training-only fields
    (dropout, freezing) keep defaults — they don't affect ``train=False``
    forwards except dropout, which is off.

    ViT trees are recognized by their ``class_token``; patch size, embed
    dim, layer count, and mlp width come from leaf shapes, the input
    resolution from the pos_embedding length, and num_heads is
    embed_dim // 64 (head_dim 64 — true of every torchvision ViT; heads
    leave no trace in parameter shapes, see config.py).

    EfficientNet trees are recognized by their ``stem_conv`` and matched
    against the named B0-B7 ladder by structure (per-stage block counts +
    stem/top/per-stage channel widths) — the (width_mult, depth_mult)
    pair is what the BN constants key on, so a structural match recovers
    the exact eval-form numerics.

    ConvNeXt trees are recognized by their ``stem_ln`` (checked before
    the EfficientNet ``stem_conv`` probe — ConvNeXt has both); per-stage
    dims/depths come straight from the block tree, which fully determines
    the eval-form forward (no BN constants to recover).
    """
    backbone = params["backbone"]
    if "stem_ln" in backbone:
        return _infer_convnext_config(params, image_size, compute_dtype)
    if "stem_conv" in backbone:
        return _infer_efficientnet_config(params, image_size, compute_dtype)
    if "class_token" in backbone:
        embed = int(np.shape(backbone["class_token"])[-1])
        patch = int(np.shape(backbone["conv_proj"]["kernel"])[0])
        n_layers = sum(1 for k in backbone if k.startswith("block"))
        mlp_dim = int(np.shape(
            backbone["block0"]["mlp_dense1"]["kernel"])[1])
        seq = int(np.shape(backbone["pos_embedding"])[1])
        grid = int(round((seq - 1) ** 0.5))
        if grid * grid != seq - 1:
            raise ValueError(
                f"pos_embedding length {seq} is not a square grid + CLS")
        pos_size = grid * patch
        if image_size != pos_size:
            # the pos_embedding pins the geometry; trust the weights
            image_size = pos_size
        hidden_dim = int(np.shape(params["head_dense1"]["kernel"])[1])
        num_classes = int(np.shape(params["head_dense2"]["kernel"])[1])
        return ModelConfig(family="vit", patch_size=patch, embed_dim=embed,
                           num_layers=n_layers, mlp_dim=mlp_dim,
                           num_classes=num_classes, hidden_dim=hidden_dim,
                           image_size=image_size,
                           compute_dtype=compute_dtype)
    counts = [0, 0, 0, 0]
    bottleneck = False
    for key in backbone:
        if key.startswith("layer") and "_block" in key:
            stage, block = key.split("_block")
            counts[int(stage[len("layer"):]) - 1] += 1
            bottleneck = bottleneck or "conv3" in backbone[key]
    table = _BOTTLENECK_DEPTHS if bottleneck else _BASIC_DEPTHS
    depth = table.get(tuple(counts))
    if depth is None:
        raise ValueError(f"unrecognized ResNet stage sizes {counts} "
                         f"(bottleneck={bottleneck})")
    groups, width_per_group = 1, 64
    if bottleneck:
        # ResNeXt/Wide variants are visible in the first block's conv
        # shapes: width = conv1 fan-out; groups = width / conv2 fan-in
        # (grouped convs store kernels at in/groups); torchvision's
        # width formula at planes=64 gives width = width_per_group*groups
        block0 = backbone["layer1_block0"]
        width = int(np.shape(block0["conv1"]["kernel"])[-1])
        in_per_group = int(np.shape(block0["conv2"]["kernel"])[2])
        groups = width // in_per_group
        width_per_group = width // groups
    hidden_dim, num_classes = (int(np.shape(params["head_dense1"]["kernel"])[1]),
                               int(np.shape(params["head_dense2"]["kernel"])[1]))
    return ModelConfig(depth=depth, num_classes=num_classes,
                       image_size=image_size, hidden_dim=hidden_dim,
                       groups=groups, width_per_group=width_per_group,
                       compute_dtype=compute_dtype)


def _infer_convnext_config(params: dict, image_size: int,
                           compute_dtype: str) -> ModelConfig:
    """Recover a ConvNeXt ModelConfig from its weight tree: per-stage
    channel dims from each stage's depthwise kernels, depths from block
    counts.  stochastic_depth is train-only (invisible at eval) and keeps
    its default."""
    import re

    backbone = params["backbone"]
    depths = [0, 0, 0, 0]
    dims = [0, 0, 0, 0]
    for key in backbone:
        m = re.fullmatch(r"stage(\d)_block(\d+)", key)
        if m:
            s = int(m.group(1))
            if not 1 <= s <= 4:
                raise ValueError(f"unrecognized ConvNeXt stage in {key!r}")
            depths[s - 1] += 1
            dims[s - 1] = int(
                np.shape(backbone[key]["dw_conv"]["kernel"])[-1])
    if not all(depths):
        raise ValueError(f"incomplete ConvNeXt stage tree "
                         f"(block counts {depths})")
    hidden_dim = int(np.shape(params["head_dense1"]["kernel"])[1])
    num_classes = int(np.shape(params["head_dense2"]["kernel"])[1])
    return ModelConfig(family="convnext", convnext_dims=tuple(dims),
                       convnext_depths=tuple(depths),
                       num_classes=num_classes, hidden_dim=hidden_dim,
                       image_size=image_size, compute_dtype=compute_dtype)


def _infer_efficientnet_config(params: dict, image_size: int,
                               compute_dtype: str) -> ModelConfig:
    """Match an EfficientNet weight tree to a named B0-B7 variant.

    Structure observed from the tree: per-stage block counts, stem/top
    conv widths, and per-stage project widths; compared against each
    variant's scaled table (models/efficientnet.py::scaled_setting).
    """
    from irp_tpu.models.efficientnet import (
        EFFICIENTNET_VARIANTS, STAGE_COUNT, scaled_setting, top_channels)

    backbone = params["backbone"]
    counts = [0] * STAGE_COUNT
    for key in backbone:
        if key.startswith("stage") and "_block" in key:
            counts[int(key.split("_block")[0][len("stage"):]) - 1] += 1
    stem_ch = int(np.shape(backbone["stem_conv"]["kernel"])[-1])
    top_ch = int(np.shape(backbone["top_conv"]["kernel"])[-1])
    stage_out = [int(np.shape(
        backbone[f"stage{s + 1}_block0"]["project_conv"]["kernel"])[-1])
        for s in range(STAGE_COUNT)]
    for name, v in EFFICIENTNET_VARIANTS.items():
        wm, dm = v["width_mult"], v["depth_mult"]
        setting = scaled_setting(wm, dm)
        if (counts == [s[5] for s in setting]
                and stem_ch == setting[0][3]
                and stage_out == [s[4] for s in setting]
                and top_ch == top_channels(wm)):
            hidden_dim = int(np.shape(params["head_dense1"]["kernel"])[1])
            num_classes = int(np.shape(params["head_dense2"]["kernel"])[1])
            return ModelConfig(family="efficientnet", width_mult=wm,
                               depth_mult=dm, num_classes=num_classes,
                               hidden_dim=hidden_dim, image_size=image_size,
                               compute_dtype=compute_dtype)
    raise ValueError(
        f"EfficientNet weight tree matches no named B0-B7 variant "
        f"(stage blocks {counts}, stem {stem_ch}, top {top_ch}); "
        f"non-standard width/depth multipliers need an explicit "
        f"ModelConfig")


@dataclass
class PredictionResult:
    """Scored batch: argmax labels + full softmax probabilities."""

    labels: np.ndarray                     # (N,) int32
    probs: np.ndarray                      # (N, num_classes) float32
    class_names: Optional[Sequence[str]] = None
    keys: Optional[List[str]] = None       # file paths / shard keys

    def __len__(self):
        return int(self.labels.shape[0])

    def topk(self, k: int = 5) -> Tuple[np.ndarray, np.ndarray]:
        """(indices (N,k), probabilities (N,k)), descending."""
        k = min(k, self.probs.shape[1])
        idx = np.argsort(-self.probs, axis=1)[:, :k]
        return idx, np.take_along_axis(self.probs, idx, axis=1)

    def label_names(self) -> List[str]:
        if self.class_names is None:
            return [str(i) for i in self.labels]
        return [self.class_names[i] for i in self.labels]


@dataclass
class Predictor:
    """A compiled, padded-batch classifier forward.

    Build via :func:`load_predictor` (from a weights artifact) or directly
    from in-memory variables via :func:`make_predictor`.
    """

    model: object
    params: dict
    batch_stats: dict
    class_names: Optional[Sequence[str]] = None
    batch_size: int = 256
    mesh: Optional[object] = None
    source_size: Optional[int] = None  # exact HxW a prebuilt program needs
    # Allowed padded batch shapes (ascending, last == batch_size).  When
    # set, a chunk of n images pads to the SMALLEST bucket >= n instead
    # of always to batch_size — the TF-Serving allowed-batch-sizes idea:
    # a lone online request then costs a batch-1 program, not batch_size
    # images of padded device work.  One compiled program per bucket
    # (lazily, first hit; minutes-scale each on a cold TPU — opt in for
    # online serving, leave None for bulk scoring).
    pad_buckets: Optional[Tuple[int, ...]] = None
    # Test-time augmentation: average the softmax over the identity and
    # the horizontal flip INSIDE the one compiled program (the flip is a
    # free on-device relayout; the second forward is the only cost —
    # ~2x device time per image for the classic ~0.1-0.5pt top-1 bump).
    # Classes must be flip-invariant (true of Animals-10 and anything
    # trained with random flips in the augmentation pipeline,
    # ops/preprocess.py).  Baked into .irpx exports like the rest of the
    # forward.
    tta: bool = False
    _forward: object = field(default=None, repr=False)
    _batch_sharding: object = field(default=None, repr=False)
    # a deserialized Grad-CAM program riding in a .irpx artifact
    # (irp_tpu/export.py) — consumed by irp_tpu.explain.GradCAM, which
    # otherwise needs the live model to differentiate through
    _cam_call: object = field(default=None, repr=False)
    _cam_batch_size: Optional[int] = field(default=None, repr=False)

    def __post_init__(self):
        import jax
        import jax.numpy as jnp

        from irp_tpu.ops.preprocess import eval_preprocess_batch

        if self.class_names is not None:
            # validated HERE, once, for every construction path (CLIs,
            # make_predictor, the .irpx loader, replicas) — a wrong-length
            # list would otherwise surface later as an IndexError or as
            # silent mislabeling
            n = self.model.config.num_classes
            if len(self.class_names) != n:
                raise ValueError(f"{len(self.class_names)} class names "
                                 f"for a {n}-class model")
        if self.pad_buckets is not None:
            buckets = tuple(sorted(int(b) for b in self.pad_buckets))
            if (not buckets or buckets[0] < 1
                    or buckets[-1] != self.batch_size
                    or len(set(buckets)) != len(buckets)):
                raise ValueError(
                    f"pad_buckets must be distinct sizes in [1, "
                    f"batch_size] ending at batch_size={self.batch_size}, "
                    f"got {self.pad_buckets}")
            self.pad_buckets = buckets
        if self._forward is not None:
            # A prebuilt program (e.g. a deserialized jax.export artifact,
            # irp_tpu/export.py): batch shape, preprocessing, and platform
            # are baked into the program, so there is nothing to build —
            # and mesh re-placement cannot apply to it.  ``tta`` here is
            # INFORMATIONAL: it records whether the baked program already
            # flip-averages (the .irpx loader sets it from the artifact's
            # metadata) — it cannot add TTA to a program that lacks it.
            if self.mesh is not None:
                raise ValueError(
                    "a prebuilt-forward predictor cannot take a mesh: the "
                    "exported program's device assignment is fixed; load "
                    "the .npz/.pth weights with mesh= instead")
            # pad_buckets on a prebuilt predictor are the artifact's own
            # baked ladder (irp_tpu/export.py writes one program per
            # bucket and the loader only sets rungs it can serve) — the
            # generic ladder validation above already ran
            return

        cfg = self.model.config
        out_size = cfg.image_size
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        if self.mesh is not None:
            from irp_tpu.parallel.mesh import (DATA_AXIS, batch_sharding,
                                               replicated)
            n_data = self.mesh.shape[DATA_AXIS]
            # full batches must split evenly over the data axis
            self.batch_size = max(self.batch_size // n_data, 1) * n_data
            if self.pad_buckets is not None and any(
                    b % n_data for b in self.pad_buckets):
                raise ValueError(
                    f"every pad bucket must split evenly over the "
                    f"{n_data}-way data axis, got {self.pad_buckets}")
            rep = replicated(self.mesh)
            place = lambda t: jax.device_put(t, rep)  # noqa: E731
            self.params = jax.tree_util.tree_map(place, self.params)
            self.batch_stats = jax.tree_util.tree_map(place, self.batch_stats)
            self._batch_sharding = batch_sharding(self.mesh)

        apply_fn = self.model.apply

        use_tta = bool(self.tta)

        @jax.jit
        def forward(params, batch_stats, images_u8):
            x = eval_preprocess_batch(images_u8, out_size, dtype,
                                      IMAGENET_MEAN, IMAGENET_STD)

            def probs(xi):
                logits = apply_fn(
                    {"params": params, "batch_stats": batch_stats},
                    xi, train=False)
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

            p = probs(x)
            if use_tta:
                # flip the W axis of the preprocessed crop (the center
                # crop is symmetric, so this equals flipping the source)
                p = 0.5 * (p + probs(jnp.flip(x, axis=2)))
            return p

        self._forward = forward

    @property
    def num_classes(self) -> int:
        return self.model.config.num_classes

    def predict_probs(self, images_u8: np.ndarray) -> np.ndarray:
        """(N, cache, cache, 3) uint8 -> (N, num_classes) float32 softmax.

        N is arbitrary: the tail batch is padded to the fixed batch shape
        (single compiled program) and the pad rows are dropped.
        """
        import jax

        images_u8 = np.asarray(images_u8, np.uint8)
        if images_u8.ndim != 4 or images_u8.shape[-1] != 3:
            raise ValueError(f"expected (N,H,W,3) uint8, got {images_u8.shape}")
        out_size = self.model.config.image_size
        h, w = images_u8.shape[1:3]
        if h < out_size or w < out_size:
            # the center crop would slice with negative indices and feed
            # the global-pool ResNet a silently-wrong tiny crop
            raise ValueError(
                f"images are {h}x{w} but the model's eval crop is "
                f"{out_size}x{out_size}; supply sources at least that "
                "large (the cache contract decodes to 256x256, "
                "data/pipeline.py::decode_to_rgb256)")
        if (self.source_size is not None
                and (h, w) != (self.source_size, self.source_size)):
            # exported programs have a FIXED input shape; a mismatched
            # source would die inside XLA with an opaque shape error
            raise ValueError(
                f"this exported program requires sources of exactly "
                f"{self.source_size}x{self.source_size}, got {h}x{w} "
                "(re-export with a different source_size, or decode to "
                "the cache geometry first)")
        n = images_u8.shape[0]
        if n == 0:
            return np.zeros((0, self.num_classes), np.float32)
        bsz = self.batch_size
        out = []
        for start in range(0, n, bsz):
            chunk = images_u8[start:start + bsz]
            target = self._pad_target(chunk.shape[0])
            if chunk.shape[0] < target:  # pad to a compiled shape
                pad = np.broadcast_to(
                    chunk[-1:], (target - chunk.shape[0],) + chunk.shape[1:])
                chunk = np.concatenate([chunk, pad], axis=0)
            if self._batch_sharding is not None:
                chunk = jax.device_put(chunk, self._batch_sharding)
            out.append(np.asarray(
                self._forward(self.params, self.batch_stats, chunk)))
        return np.concatenate(out, axis=0)[:n]

    def _pad_target(self, n: int) -> int:
        """The compiled batch shape an n-image chunk pads to: the
        smallest allowed bucket >= n, else the full batch_size."""
        if self.pad_buckets is not None:
            for b in self.pad_buckets:
                if b >= n:
                    return b
        return self.batch_size

    def predict(self, images_u8: np.ndarray,
                keys: Optional[List[str]] = None) -> PredictionResult:
        probs = self.predict_probs(images_u8)
        return PredictionResult(labels=np.argmax(probs, axis=1).astype(np.int32),
                                probs=probs, class_names=self.class_names,
                                keys=keys)

    def decode_paths(self, paths: Sequence[str],
                     decoder: str = "auto") -> np.ndarray:
        """Read + decode image files to the cache geometry (N,256,256,3).

        ``decoder='auto'`` uses the native C++ batch JPEG decoder when
        built (native/decode.cpp), falling back to PIL; 'pil' forces PIL.
        Decode geometry is the cache contract (256x256 bilinear,
        data/pipeline.py::decode_to_rgb256) so files round-trip exactly
        like cached training data.
        """
        from irp_tpu.data.pipeline import decode_blobs

        blobs = []
        for path in paths:
            with open(path, "rb") as f:
                blobs.append(f.read())
        return decode_blobs(blobs, decoder=decoder)

    def predict_paths(self, paths: Sequence[str],
                      decoder: str = "auto") -> PredictionResult:
        """Score image files (JPEG/PNG/...) — see :meth:`decode_paths`
        for the decode contract.

        Streams in decode-chunks: host memory stays O(chunk), not
        O(dataset) — a 26k-image corpus would otherwise hold ~5 GB of
        decoded uint8 before the first forward.
        """
        paths = list(paths)
        chunk = max(self.batch_size, 1024)
        probs_parts = []
        for start in range(0, len(paths), chunk):
            part = self.decode_paths(paths[start:start + chunk],
                                     decoder=decoder)
            probs_parts.append(self.predict_probs(part))
        probs = (np.concatenate(probs_parts, axis=0) if probs_parts
                 else np.zeros((0, self.num_classes), np.float32))
        return PredictionResult(
            labels=np.argmax(probs, axis=1).astype(np.int32)
            if len(probs) else np.zeros(0, np.int32),
            probs=probs, class_names=self.class_names, keys=paths)

    def predict_shards(self, shard_paths: Sequence[str] | str,
                       decoder: str = "auto"
                       ) -> Tuple[PredictionResult, Optional[np.ndarray]]:
        """Bulk-score a WebDataset shard set (e.g. re-score after retrain).

        Returns (result, true_labels) — true_labels is the shards' ``cls``
        stream when present (for accuracy checks), else None.
        """
        from irp_tpu.data.pipeline import decode_blobs
        from irp_tpu.data.tar import iter_samples

        if isinstance(shard_paths, str):
            import os

            if os.path.exists(shard_paths):
                # a literal path wins over glob interpretation: '[' is a
                # legal filename char (run[3]/test-000.tar must not be
                # character-class-globbed into an empty result)
                shard_paths = [shard_paths]
            elif any(c in shard_paths for c in "*?["):
                # a glob pattern; an unmatched one means zero samples (the
                # caller's clean empty-result path), not a literal tar path
                import glob as globmod
                shard_paths = sorted(globmod.glob(shard_paths))
            else:
                shard_paths = [shard_paths]

        # stream in decode-chunks: host memory O(chunk), not O(dataset)
        chunk = max(self.batch_size, 1024)
        blobs, keys, truths, probs_parts = [], [], [], []
        have_truth = True

        def flush():
            if blobs:
                probs_parts.append(
                    self.predict_probs(decode_blobs(blobs,
                                                    decoder=decoder)))
                blobs.clear()

        for sample in iter_samples(shard_paths):
            jpg = sample.get("jpg") or sample.get("jpeg") or sample.get("png")
            if jpg is None:
                continue
            keys.append(str(sample.get("__key__", "")))
            cls = sample.get("cls")
            if cls is None:
                have_truth = False
            else:
                truths.append(int(cls))
            blobs.append(jpg)
            if len(blobs) >= chunk:
                flush()
        flush()
        if not keys:
            empty = PredictionResult(np.zeros(0, np.int32),
                                     np.zeros((0, self.num_classes),
                                              np.float32),
                                     self.class_names, [])
            return empty, None
        probs = np.concatenate(probs_parts, axis=0)
        result = PredictionResult(
            labels=np.argmax(probs, axis=1).astype(np.int32), probs=probs,
            class_names=self.class_names, keys=keys)
        truth = (np.asarray(truths, np.int32)
                 if have_truth and len(truths) == len(keys) else None)
        return result, truth


def power_of_two_buckets(max_batch: int) -> Tuple[int, ...]:
    """The 1,2,4,...,max_batch padded-shape ladder (max included even
    when not a power of two) — the 'auto' choice for online serving."""
    buckets = []
    b = 1
    while b < max_batch:
        buckets.append(b)
        b *= 2
    buckets.append(int(max_batch))
    return tuple(buckets)


def serving_buckets(spec: str, batch_size: int,
                    n_data: int = 1) -> Tuple[int, ...]:
    """Resolve a ``--batch-buckets`` spec (``'auto'`` or a comma list)
    into a padded-shape ladder whose every rung splits over an
    ``n_data``-way data axis.

    Under data parallelism each compiled program shards its batch dim
    ``n_data`` ways, so ``auto`` builds the ladder in ``n_data``
    multiples (``n_data, 2*n_data, ..., batch_size``) instead of
    starting at 1.  Raises ``ValueError`` for explicit buckets (or a
    batch size) that cannot split.
    """
    if spec == "auto":
        if batch_size % n_data:
            raise ValueError(
                f"batch size {batch_size} does not split over the "
                f"{n_data}-way data axis")
        return tuple(n_data * b
                     for b in power_of_two_buckets(batch_size // n_data))
    buckets = tuple(int(b) for b in spec.split(","))
    bad = [b for b in buckets if b % n_data]
    if bad:
        raise ValueError(
            f"buckets {bad} do not split over the {n_data}-way data "
            f"axis (every bucket must be a multiple of {n_data} under "
            "data parallelism)")
    return buckets


def replicate_predictor(pred: Predictor, devices=None,
                        n: Optional[int] = None) -> List[Predictor]:
    """One independent :class:`Predictor` per device, weights copied.

    The *other* way to use a multi-chip host for online serving (vs
    ``mesh=``, which shards each batch over the data axis and is the
    bulk-scoring choice): each device holds a FULL model copy and runs
    its own single-device program, so concurrent micro-batches dispatch
    in parallel with no collectives and single-chip latency — the
    TF-Serving / Triton instance-group pattern.  Wire the returned list
    into :class:`irp_tpu.serve.MicroBatcher` (one dispatch thread per
    replica).

    ``devices`` selects explicit devices; ``n`` takes the first n local
    devices; default is every local device.  Raises ``ValueError`` for
    mesh-sharded predictors (pick ONE strategy) and exported programs
    (their device assignment is baked — replicate from the .npz/.pth).
    """
    import jax

    if pred.mesh is not None:
        raise ValueError(
            "predictor is already mesh-sharded; replicas and batch "
            "sharding are alternative strategies — build the base "
            "predictor without mesh=")
    if pred.source_size is not None:
        raise ValueError(
            "an exported (.irpx) program has a fixed device assignment; "
            "replicate from the .npz/.pth weights instead")
    if devices is None:
        devices = jax.local_devices()
        if n is not None:
            if not 1 <= n <= len(devices):
                raise ValueError(
                    f"asked for {n} replicas but {len(devices)} local "
                    "devices are attached (need 1 <= n <= that)")
            devices = devices[:n]
    elif n is not None:
        raise ValueError("pass devices= or n=, not both")
    elif not devices:
        raise ValueError("devices is empty")
    replicas = []
    for d in devices:
        replicas.append(Predictor(
            model=pred.model,
            params=jax.device_put(pred.params, d),
            batch_stats=jax.device_put(pred.batch_stats, d),
            class_names=pred.class_names,
            batch_size=pred.batch_size,
            pad_buckets=pred.pad_buckets,
            tta=pred.tta))
    return replicas


def predictor_device(pred: Predictor):
    """The device a (non-sharded) predictor's weights live on."""
    import jax

    leaves = jax.tree_util.tree_leaves(pred.params)
    if not leaves or not hasattr(leaves[0], "devices"):
        return None  # host numpy weights: not yet committed anywhere
    devs = leaves[0].devices()
    return next(iter(devs)) if len(devs) == 1 else None


def make_predictor(variables: dict, class_names: Optional[Sequence[str]] = None,
                   cfg: Optional[ModelConfig] = None, batch_size: int = 256,
                   mesh=None, image_size: Optional[int] = None,
                   pad_buckets: Optional[Sequence[int]] = None,
                   tta: bool = False) -> Predictor:
    """Predictor from in-memory variables {'params':..., 'batch_stats':...}.

    ``image_size`` sets the eval crop when ``cfg`` is inferred from the
    weight tree (the tree itself cannot encode it: the global-pool ResNet
    accepts any spatial size, so a mismatch degrades silently instead of
    erroring).  Ignored when an explicit ``cfg`` is given.
    """
    from irp_tpu.models.classifier import get_classifier

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if cfg is None:
        cfg = infer_model_config(params, image_size=image_size or 224)
    model = get_classifier(cfg)
    return Predictor(model=model, params=params, batch_stats=batch_stats,
                     class_names=class_names, batch_size=batch_size,
                     mesh=mesh,
                     pad_buckets=(tuple(pad_buckets) if pad_buckets
                                  is not None else None),
                     tta=tta)


def load_predictor(weights_path: str,
                   class_names: Optional[Sequence[str]] = None,
                   cfg: Optional[ModelConfig] = None,
                   batch_size: int = 256, mesh=None,
                   image_size: Optional[int] = None,
                   pad_buckets: Optional[Sequence[int]] = None,
                   tta: bool = False) -> Predictor:
    """Predictor from a weights artifact.

    ``.npz`` = save_weights_npz output (the final trainer's canonical
    artifact); ``.pt/.pth`` = a torch state_dict — ours or the reference
    stack's fine-tuned AnimalClassifier (head keys ``classifier.1/4``,
    reference functions/model.py:30-36).  A backbone-only torchvision
    checkpoint is rejected: a randomly-initialized head must never serve.
    ``.irpx`` = a jax.export AOT artifact (irp_tpu/export.py): the
    compiled program is deserialized as-is, so ``cfg``/``image_size``/
    ``batch_size`` are baked in and those arguments are ignored.

    The eval crop size comes from (highest wins): explicit ``cfg``, the
    ``image_size`` argument, the npz artifact's embedded metadata (written
    by the final trainer since the image_size field was added), then 224.
    Models trained at a non-default image_size are therefore served with
    the right preprocessing automatically from their own artifact.
    """
    ext = os.path.splitext(weights_path)[1].lower()
    if ext == ".irpx":
        from irp_tpu.export import load_exported_predictor
        if mesh is not None:
            raise ValueError(
                ".irpx artifacts are fixed single-device programs; load "
                "the .npz/.pth weights with mesh= instead")
        if pad_buckets is not None:
            raise ValueError(
                "an .irpx serves only the pad_buckets ladder baked at "
                "export time (export a predictor built with "
                "pad_buckets=...); load-time buckets need the live "
                "weights (.npz/.pth)")
        # tta is a bake-time property of an .irpx: the loaded predictor's
        # .tta reflects the artifact's metadata.  Requesting it at load
        # time is fine when the artifact already bakes it (a no-op), and
        # an error when it does not (TTA cannot be added to a compiled
        # program).  Checked against the metadata BEFORE deserializing
        # any program — a guaranteed error must not pay the load; the
        # check itself is the CLIs' shared preflight.
        if tta:
            from irp_tpu.export import tta_preflight_error
            err = tta_preflight_error(
                weights_path, "a predictor built with tta=True")
            if err:
                raise ValueError(err)
        return load_exported_predictor(weights_path,
                                       class_names=class_names)
    if ext == ".npz":
        from irp_tpu.train.checkpoint import load_weights_npz
        params, batch_stats, meta = load_weights_npz(weights_path,
                                                     with_meta=True)
        variables = {"params": params, "batch_stats": batch_stats}
        if image_size is None:
            meta_size = meta.get("image_size")
            image_size = int(meta_size) if meta_size is not None else None
    elif ext in (".pth", ".pt"):
        from irp_tpu.models.convert import load_torch_checkpoint
        variables = load_torch_checkpoint(weights_path)
    else:
        raise ValueError(f"unsupported weights format: {weights_path} "
                         "(expected .npz or .pth)")
    if "head_dense2" not in variables["params"]:
        raise ValueError(
            f"{weights_path} has no classifier head — it is a backbone-only "
            "checkpoint; serve a trained final-weights artifact instead")
    return make_predictor(variables, class_names=class_names, cfg=cfg,
                          batch_size=batch_size, mesh=mesh,
                          image_size=image_size, pad_buckets=pad_buckets,
                          tta=tta)


def load_class_names(spec: str) -> List[str]:
    """Class names from a JSON file (list, or dict with 'class_names') or a
    comma-separated literal."""
    if os.path.exists(spec):
        with open(spec) as f:
            data = json.load(f)
        if isinstance(data, dict):
            data = data.get("class_names", data.get("classes"))
        if not isinstance(data, list):
            raise ValueError(f"{spec}: expected a JSON list of class names")
        return [str(x) for x in data]
    return [s.strip() for s in spec.split(",") if s.strip()]
