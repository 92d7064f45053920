"""Portable AOT model export — serialized StableHLO serving artifacts.

The reference's only deployment artifact is a torch ``state_dict``
(reference functions/final.py:339-354): loading it requires the full
model class, torchvision, and a matching python environment.  This
module is the TPU-native step past that: ``jax.export`` serializes the
predictor's ENTIRE compiled inference program — eval preprocessing +
ResNet forward + softmax — as versioned StableHLO, so a server can
score images with no model code on the hot path, and an artifact
exported on a CPU host runs unchanged on a TPU host (multi-platform
lowering, default ``platforms=("cpu", "tpu")``).

Artifact layout (``.irpx`` — a plain zip):

    program.shlo   jax.export serialization of
                   ``forward(params, batch_stats, images_u8) -> probs``
    program.bN.shlo  (optional) the same forward at padded batch shape
                   N — written when the exported predictor carries a
                   ``pad_buckets`` ladder, so the artifact serves
                   online traffic with TF-Serving allowed-batch-sizes
                   behavior (one program per rung)
    explain.shlo   (optional) the Grad-CAM program
                   ``(params, batch_stats, images_u8, class_idx) ->
                   (cams, logits)`` (irp_tpu/explain.py), so exported
                   artifacts can serve ``/explain`` with no model code
    weights.npz    the weight tree (train/checkpoint.py flat-npz format)
    meta.json      batch/source geometry, class names, format version

The exported programs have FIXED shapes (the XLA/TPU contract the rest
of this framework already follows): batches of exactly ``batch_size``
(or a baked bucket rung) at exactly ``source_size``² uint8 pixels.
The loader re-wraps
it in :class:`irp_tpu.infer.Predictor`, whose padding loop already
produces full fixed-shape batches; the exact-source-size requirement is
enforced with a loud error (``Predictor.source_size``).

Weights ride OUTSIDE the program (as arguments, not baked constants):
the StableHLO blob stays ~100 KB instead of embedding ~100 MB of
ResNet50 parameters, and the weights remain independently inspectable
(`np.load`) and upgradable.
"""

from __future__ import annotations

import json
import os
import tempfile
import zipfile
from types import SimpleNamespace
from typing import Optional, Sequence

import numpy as np

FORMAT_VERSION = 1
_PROGRAM_MEMBER = "program.shlo"
_BUCKET_MEMBER_FMT = "program.b{}.shlo"  # per-bucket padded shapes
_EXPLAIN_MEMBER = "explain.shlo"  # optional: loaders ignore its absence
_WEIGHTS_MEMBER = "weights.npz"
_META_MEMBER = "meta.json"


def _specs_like(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.result_type(a)), tree)


def export_predictor(predictor, path: str, source_size: Optional[int] = None,
                     platforms: Sequence[str] = ("cpu", "tpu", "axon"),
                     gradcam: bool = True,
                     gradcam_batch_size: Optional[int] = None) -> str:
    """Serialize a :class:`~irp_tpu.infer.Predictor` to a ``.irpx`` file.

    ``source_size`` fixes the input geometry the program accepts
    (default: the cache contract's 256, or the eval crop if larger —
    note run_serve/run_predict decode requests to exactly 256, so a
    non-256 artifact is usable only through the Python API).
    ``platforms`` lists every backend the program is lowered for —
    exporting from a CPU host for TPU serving works because jax.export
    cross-lowers without executing.  'axon' is included by default so
    the artifact also passes jax.export's call-time platform check on
    hosts that reach the TPU through the axon PJRT tunnel.

    ``gradcam=True`` (default) additionally bakes the Grad-CAM program
    into the artifact so ``/explain`` and ``--gradcam`` work with no
    model code (explain is interactive traffic, so its program is
    exported at ``gradcam_batch_size``, default ``min(8, batch_size)``
    — the same small-batch choice the serving daemon makes for live
    predictors).  The explain program is ~the size of program.shlo
    (weights are shared); ``gradcam=False`` omits it.
    """
    import jax
    from jax import export as jax_export

    from irp_tpu.train.checkpoint import save_weights_npz

    if getattr(predictor.model, "apply", None) is None:
        raise ValueError(
            "this predictor was itself loaded from an exported artifact; "
            "re-export from the .npz/.pth weights instead of nesting "
            "programs")
    if predictor.mesh is not None:
        raise ValueError(
            "mesh predictors cannot be exported: jax.export bakes the "
            "mesh's device assignment into the program; export a "
            "single-device predictor instead")
    cfg = predictor.model.config
    if source_size is None:
        source_size = max(256, cfg.image_size)
    if source_size < cfg.image_size:
        raise ValueError(
            f"source_size {source_size} is smaller than the model's eval "
            f"crop {cfg.image_size}")
    param_specs = _specs_like(predictor.params)
    stats_specs = _specs_like(predictor.batch_stats)

    def export_batch(n):
        images_spec = jax.ShapeDtypeStruct(
            (n, source_size, source_size, 3), np.uint8)
        return jax_export.export(
            predictor._forward, platforms=list(platforms))(
                param_specs, stats_specs, images_spec)

    # A bucketed predictor exports its WHOLE padded-shape ladder: one
    # program per bucket, so the artifact serves online traffic with
    # the same TF-Serving allowed-batch-sizes behavior as the live
    # model (a lone request costs a batch-1 program).  program.shlo is
    # always the full-batch program (format v1 loaders keep working).
    exported = export_batch(predictor.batch_size)
    bucket_programs = {}
    if predictor.pad_buckets is not None:
        for b in predictor.pad_buckets:
            if b != predictor.batch_size:
                bucket_programs[int(b)] = export_batch(int(b))
    exported_cam = None
    cam_batch = None
    if gradcam:
        from irp_tpu.explain import _build_cam_fn

        cam_batch = (min(8, predictor.batch_size) if gradcam_batch_size
                     is None else int(gradcam_batch_size))
        if cam_batch < 1:
            raise ValueError(f"gradcam_batch_size must be >= 1, "
                             f"got {cam_batch}")
        cam_images_spec = jax.ShapeDtypeStruct(
            (cam_batch, source_size, source_size, 3), np.uint8)
        class_idx_spec = jax.ShapeDtypeStruct((cam_batch,), np.int32)
        exported_cam = jax_export.export(
            _build_cam_fn(predictor.model, cfg.image_size),
            platforms=list(platforms))(
                param_specs, stats_specs, cam_images_spec, class_idx_spec)
    meta = {
        "format": "irpx",
        "format_version": FORMAT_VERSION,
        "batch_size": int(predictor.batch_size),
        "source_size": int(source_size),
        "image_size": int(cfg.image_size),
        "num_classes": int(cfg.num_classes),
        "class_names": (list(predictor.class_names)
                        if predictor.class_names is not None else None),
        "platforms": list(exported.platforms),
        "gradcam_batch_size": cam_batch,  # None = no explain program
        "pad_buckets": (list(predictor.pad_buckets)
                        if predictor.pad_buckets is not None else None),
        # TTA is baked into the serialized forward itself; recorded so
        # consumers can tell how the artifact scores (infer.py Predictor)
        "tta": bool(predictor.tta),
        "jax_version": jax.__version__,
    }
    tmp = path + ".tmp"
    try:
        with tempfile.TemporaryDirectory() as td:
            # image_size meta rides along so the weights.npz member is a
            # complete standalone artifact too (same convention as the
            # final trainer's npz — a non-default crop must survive)
            weights = save_weights_npz(os.path.join(td, "w.npz"),
                                       predictor.params,
                                       predictor.batch_stats,
                                       meta={"image_size":
                                             int(cfg.image_size)})
            with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as zf:
                zf.writestr(_META_MEMBER, json.dumps(meta, indent=1))
                zf.writestr(_PROGRAM_MEMBER, exported.serialize())
                for b, prog in bucket_programs.items():
                    zf.writestr(_BUCKET_MEMBER_FMT.format(b),
                                prog.serialize())
                if exported_cam is not None:
                    zf.writestr(_EXPLAIN_MEMBER, exported_cam.serialize())
                zf.write(weights, _WEIGHTS_MEMBER)
        os.replace(tmp, path)  # never leave a half-written artifact
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return path


def read_export_meta(path: str) -> dict:
    """The artifact's ``meta.json`` without deserializing the program."""
    try:
        with zipfile.ZipFile(path) as zf:
            meta = json.loads(zf.read(_META_MEMBER))
    except (zipfile.BadZipFile, KeyError, json.JSONDecodeError) as e:
        # truncated download / wrong file: one clean error, not a
        # zipfile traceback
        raise ValueError(f"{path}: not a readable irpx artifact "
                         f"({e})") from e
    if meta.get("format") != "irpx":
        raise ValueError(f"{path}: not an irpx artifact")
    return meta


def tta_preflight_error(path: str, reexport_hint: str) -> Optional[str]:
    """None when the ``.irpx`` at ``path`` bakes TTA, else a printable
    one-line error (unreadable artifact, or exported without TTA).

    The shared CLI preflight for ``--tta`` on an artifact: cheap (reads
    only meta.json — no program deserialization) and exception-free, so
    a typo'd path degrades to a clean message instead of a traceback.
    """
    try:
        baked = bool(read_export_meta(path).get("tta"))
    except (ValueError, OSError) as e:
        # ValueError = read_export_meta's own bad-zip/bad-meta wrapping;
        # OSError covers a missing/unreadable path (FileNotFoundError)
        return str(e)
    if not baked:
        return ("this .irpx was exported without TTA; an .irpx program "
                "bakes TTA at export time — re-export from the .npz/.pth "
                f"weights with {reexport_hint}")
    return None


def load_exported_predictor(path: str,
                            class_names: Optional[Sequence[str]] = None):
    """Rebuild a servable :class:`~irp_tpu.infer.Predictor` from ``.irpx``.

    No model code runs: the deserialized program IS the forward.  The
    returned predictor scores exactly like the one that was exported
    (same padding loop, same preprocessing — it is inside the program),
    but requires sources of exactly the exported ``source_size`` and
    cannot take a mesh (that needs the live model).  Grad-CAM works iff
    the artifact was exported with its explain program (the default —
    ``export_predictor(gradcam=True)``).
    """
    import jax
    from jax import export as jax_export

    from irp_tpu.infer import Predictor, infer_model_config
    from irp_tpu.train.checkpoint import load_weights_npz

    meta = read_export_meta(path)
    if meta.get("format_version", 0) > FORMAT_VERSION:
        raise ValueError(
            f"{path}: format_version {meta['format_version']} is newer "
            f"than this loader ({FORMAT_VERSION})")
    buckets = meta.get("pad_buckets")
    try:
        with zipfile.ZipFile(path) as zf:
            program = zf.read(_PROGRAM_MEMBER)
            bucket_blobs = {}
            if buckets:
                for b in buckets:
                    if int(b) != int(meta["batch_size"]):
                        bucket_blobs[int(b)] = zf.read(
                            _BUCKET_MEMBER_FMT.format(int(b)))
            explain = (zf.read(_EXPLAIN_MEMBER)
                       if _EXPLAIN_MEMBER in zf.namelist() else None)
            with tempfile.TemporaryDirectory() as td:
                params, batch_stats, _ = load_weights_npz(
                    zf.extract(_WEIGHTS_MEMBER, td), with_meta=True)
    except (zipfile.BadZipFile, KeyError) as e:
        raise ValueError(f"{path}: not a readable irpx artifact "
                         f"({e})") from e
    exported = jax_export.deserialize(program)
    forward = jax.jit(exported.call)
    if bucket_blobs:
        # one deserialized program per padded shape; Predictor's
        # padding loop guarantees the batch dim is always a ladder rung
        # or the full batch, so the dict lookup cannot miss
        calls = {b: jax.jit(jax_export.deserialize(blob).call)
                 for b, blob in bucket_blobs.items()}
        calls[int(meta["batch_size"])] = forward

        def forward(p, s, images):  # noqa: F811 — the dispatching form
            return calls[int(images.shape[0])](p, s, images)
    # cfg gives the Predictor its geometry/class metadata; the program
    # itself never consults it (jit of exported.call re-dispatches the
    # serialized computation as-is)
    cfg = infer_model_config(params, image_size=int(meta["image_size"]))
    names = class_names if class_names is not None else meta["class_names"]
    cam_batch = meta.get("gradcam_batch_size")
    has_cam = explain is not None and cam_batch is not None
    return Predictor(
        model=SimpleNamespace(config=cfg),  # no .apply: compiled-only
        params=params, batch_stats=batch_stats, class_names=names,
        batch_size=int(meta["batch_size"]),
        source_size=int(meta["source_size"]),
        pad_buckets=tuple(int(b) for b in buckets) if buckets else None,
        # informational: the program itself bakes (or lacks) the flip
        # average — this just lets callers see how the artifact scores
        tta=bool(meta.get("tta", False)),
        _forward=forward,
        _cam_call=jax.jit(jax_export.deserialize(explain).call)
        if has_cam else None,
        _cam_batch_size=int(cam_batch) if has_cam else None)
