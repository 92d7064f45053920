"""PyTorch <-> Flax weight conversion for the ResNet classifier.

The reference loads torchvision ``resnet50(IMAGENET1K_V2)`` weights
(reference functions/model.py:15).  This module converts a PyTorch
state_dict (torchvision backbone naming, optionally prefixed ``backbone.``
with a ``classifier.{1,4}`` head as in reference model.py:30-36) into the
Flax variable tree produced by irp_tpu.models.classifier.Classifier.

Layout rules:
- conv ``weight`` OIHW -> HWIO kernel (transpose 2,3,1,0)
- linear ``weight`` (out,in) -> (in,out) kernel
- bn ``weight/bias/running_mean/running_var`` ->
  params.scale/params.bias/batch_stats.mean/batch_stats.var

Gated on a weights file existing locally — this environment has no network
egress, so pretrained init is optional (random init otherwise).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np

from irp_tpu.models.resnet import STAGE_SIZES

_BN_MAP = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def _strip_prefix(key: str) -> str:
    return key[len("backbone."):] if key.startswith("backbone.") else key


def torch_key_to_flax(key: str):
    """Map one torchvision state_dict key to (collection, path tuple, kind).

    kind in {'conv', 'bn'} drives the tensor layout transform.
    Returns None for keys to skip (fc.*, num_batches_tracked).
    """
    key = _strip_prefix(key)
    if key.startswith("fc.") or key.endswith("num_batches_tracked"):
        return None

    m = re.match(r"^(conv1|bn1)\.(.+)$", key)
    if m:
        mod, field = m.groups()
        if mod == "conv1":
            return ("params", ("backbone", "conv1", "kernel"), "conv")
        coll, name = _BN_MAP[field]
        return (coll, ("backbone", "bn1", name), "bn")

    m = re.match(r"^layer(\d)\.(\d+)\.(conv\d|bn\d|downsample)\.(.+)$", key)
    if m:
        stage, block, mod, rest = m.groups()
        base = ("backbone", f"layer{stage}_block{block}")
        if mod == "downsample":
            sub, field = rest.split(".", 1)
            if sub == "0":  # downsample conv
                return ("params", base + ("downsample_conv", "kernel"), "conv")
            coll, name = _BN_MAP[field]
            return (coll, base + ("downsample_bn", name), "bn")
        if mod.startswith("conv"):
            return ("params", base + (mod, "kernel"), "conv")
        coll, name = _BN_MAP[rest]
        return (coll, base + (mod, name), "bn")

    m = re.match(r"^classifier\.(\d)\.(weight|bias)$", key)
    if m:
        idx, field = m.groups()
        dense = {"1": "head_dense1", "4": "head_dense2"}.get(idx)
        if dense is None:
            return None
        name = "kernel" if field == "weight" else "bias"
        return ("params", (dense, name), "linear")

    raise KeyError(f"unrecognized torch key: {key}")


def _set_path(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _is_vit_state_dict(state_dict) -> bool:
    return any(_strip_prefix(k) == "class_token"
               or _strip_prefix(k).startswith("encoder.")
               for k in state_dict)


def _is_convnext_state_dict(state_dict) -> bool:
    # the per-block layer_scale parameter is unique to ConvNeXt among
    # torchvision families (checked BEFORE EfficientNet: ConvNeXt also
    # uses a features.<s>.<j>.block.<k> layout)
    return any(_strip_prefix(k).endswith("layer_scale")
               for k in state_dict)


def _is_efficientnet_state_dict(state_dict) -> bool:
    # torchvision efficientnet_b* backbones live under ``features.`` —
    # but so do VGG/DenseNet/MobileNet/ConvNeXt.  Require the MBConv
    # submodule layout (``features.<s>.<j>.block.<k>.``), which among
    # the remaining families is EfficientNet-specific (ConvNeXt is
    # dispatched first on its layer_scale), so unsupported
    # features.-family checkpoints get a clear error (below) instead of
    # MBConv-mapping KeyErrors.
    return any(re.match(r"^features\.\d+\.\d+\.block\.", _strip_prefix(k))
               for k in state_dict)


def _has_features_prefix(state_dict) -> bool:
    return any(_strip_prefix(k).startswith("features.")
               for k in state_dict)


def _np(value) -> np.ndarray:
    v = getattr(value, "detach", lambda: value)()
    return np.asarray(getattr(v, "numpy", lambda: v)(), dtype=np.float32)


def _vit_state_dict_to_variables(state_dict) -> Dict[str, Dict]:
    """torchvision vision_transformer state_dict -> flax variables.

    Handles the layout differences from the Flax module (models/vit.py):
    packed ``in_proj`` (3E, E) is sliced into the separate q/k/v Dense
    kernels; conv/linear weights transpose as usual.  ``heads.*`` (the
    torchvision classification head) is skipped — the irp_tpu head loads
    from ``classifier.{1,4}`` keys like the ResNet family.
    """
    params: Dict = {}
    backbone: Dict = {}
    for key, value in state_dict.items():
        key = _strip_prefix(key)
        if key.startswith("heads."):
            continue
        arr = _np(value)
        if key == "class_token":
            backbone["class_token"] = arr
        elif key == "conv_proj.weight":
            _set_path(backbone, ("conv_proj", "kernel"),
                      arr.transpose(2, 3, 1, 0))
        elif key == "conv_proj.bias":
            _set_path(backbone, ("conv_proj", "bias"), arr)
        elif key == "encoder.pos_embedding":
            backbone["pos_embedding"] = arr
        elif key in ("encoder.ln.weight", "encoder.ln.bias"):
            name = "scale" if key.endswith("weight") else "bias"
            _set_path(backbone, ("ln", name), arr)
        else:
            m = re.match(
                r"^encoder\.layers\.encoder_layer_(\d+)\.(.+)$", key)
            if not m:
                m2 = re.match(r"^classifier\.(\d)\.(weight|bias)$", key)
                if m2:
                    idx, field = m2.groups()
                    dense = {"1": "head_dense1", "4": "head_dense2"}[idx]
                    name = "kernel" if field == "weight" else "bias"
                    _set_path(params, (dense, name),
                              arr.T if field == "weight" else arr)
                    continue
                raise KeyError(f"unrecognized ViT torch key: {key}")
            i, rest = m.groups()
            block = f"block{i}"
            if rest in ("ln_1.weight", "ln_1.bias",
                        "ln_2.weight", "ln_2.bias"):
                ln, field = rest.split(".")
                name = "scale" if field == "weight" else "bias"
                _set_path(backbone, (block, ln.replace("_", ""), name), arr)
            elif rest == "self_attention.in_proj_weight":
                e = arr.shape[1]
                for j, proj in enumerate(("attn_q", "attn_k", "attn_v")):
                    _set_path(backbone, (block, proj, "kernel"),
                              arr[j * e:(j + 1) * e].T)
            elif rest == "self_attention.in_proj_bias":
                e = arr.shape[0] // 3
                for j, proj in enumerate(("attn_q", "attn_k", "attn_v")):
                    _set_path(backbone, (block, proj, "bias"),
                              arr[j * e:(j + 1) * e])
            elif rest == "self_attention.out_proj.weight":
                _set_path(backbone, (block, "attn_out", "kernel"), arr.T)
            elif rest == "self_attention.out_proj.bias":
                _set_path(backbone, (block, "attn_out", "bias"), arr)
            elif rest.startswith("mlp."):
                _, idx, field = rest.split(".")
                dense = {"0": "mlp_dense1", "3": "mlp_dense2"}[idx]
                _set_path(backbone, (block, dense,
                                     "kernel" if field == "weight"
                                     else "bias"),
                          arr.T if field == "weight" else arr)
            else:
                raise KeyError(f"unrecognized ViT torch key: {key}")
    params["backbone"] = backbone
    return {"params": params, "batch_stats": {}}


# torchvision MBConv submodule roles by index inside ``block``: stage 1
# (expand_ratio == 1, models/efficientnet.py _BASE_SETTING) has no expand
# conv; every other stage does.  Fixed by the V1 architecture table, so
# conversion needs no variant name.
_EFF_ROLES_NO_EXPAND = {"0": "dw", "1": "se", "2": "project"}
_EFF_ROLES_EXPAND = {"0": "expand", "1": "dw", "2": "se", "3": "project"}


def _efficientnet_state_dict_to_variables(state_dict) -> Dict[str, Dict]:
    """torchvision efficientnet_b* state_dict -> flax variables
    (models/efficientnet.py naming).

    ``features.0`` / ``features.8`` are the stem / top
    Conv2dNormActivation pairs; ``features.{s}.{j}.block.{k}`` MBConv
    submodules map to expand/dw/se/project by the fixed V1 role table.
    SE fc1/fc2 are 1x1 convs with bias (same OIHW->HWIO transpose).
    torchvision's own ``classifier.1`` (single Linear) is skipped; the
    irp_tpu head loads from ``classifier.{1,4}`` keys only when the
    hidden Linear pair is present (reference model.py:30-36).
    """
    params: Dict = {}
    stats: Dict = {}
    backbone: Dict = {}
    bstats: Dict = {}
    head_keys = {k for k in state_dict
                 if _strip_prefix(k).startswith("classifier.")}
    has_mlp_head = any(_strip_prefix(k).startswith("classifier.4.")
                       for k in head_keys)
    for key, value in state_dict.items():
        key = _strip_prefix(key)
        if key.endswith("num_batches_tracked"):
            continue
        if key.startswith("classifier."):
            if not has_mlp_head:
                continue  # torchvision's own 1000-way head: not ours
            m = re.match(r"^classifier\.(\d)\.(weight|bias)$", key)
            dense = {"1": "head_dense1", "4": "head_dense2"}.get(m.group(1))
            if dense is None:
                continue  # dropout indices carry no params anyway
            arr = _np(value)
            _set_path(params, (dense,
                               "kernel" if m.group(2) == "weight"
                               else "bias"),
                      arr.T if m.group(2) == "weight" else arr)
            continue
        arr = _np(value)
        m = re.match(r"^features\.(\d+)\.(.+)$", key)
        if not m:
            raise KeyError(f"unrecognized EfficientNet torch key: {key}")
        fidx, rest = int(m.group(1)), m.group(2)
        if fidx in (0, 8):  # stem / top Conv2dNormActivation
            name = "stem" if fidx == 0 else "top"
            sub, field = rest.split(".", 1)
            if sub == "0":
                _set_path(backbone, (f"{name}_conv", "kernel"),
                          arr.transpose(2, 3, 1, 0))
            else:
                coll, leaf = _BN_MAP[field]
                target = backbone if coll == "params" else bstats
                _set_path(target, (f"{name}_bn", leaf), arr)
            continue
        m = re.match(r"^(\d+)\.block\.(\d+)\.(.+)$", rest)
        if not m:
            raise KeyError(f"unrecognized EfficientNet torch key: {key}")
        j, k, leaf_key = m.groups()
        block = f"stage{fidx}_block{j}"
        roles = _EFF_ROLES_NO_EXPAND if fidx == 1 else _EFF_ROLES_EXPAND
        role = roles.get(k)
        if role is None:
            raise KeyError(f"unrecognized EfficientNet torch key: {key}")
        if role == "se":
            fc, field = leaf_key.split(".")
            name = "kernel" if field == "weight" else "bias"
            _set_path(backbone, (block, f"se_{fc}", name),
                      arr.transpose(2, 3, 1, 0) if name == "kernel"
                      else arr)
        else:
            sub, field = leaf_key.split(".", 1)
            if sub == "0":
                _set_path(backbone, (block, f"{role}_conv", "kernel"),
                          arr.transpose(2, 3, 1, 0))
            else:
                coll, leaf = _BN_MAP[field]
                target = backbone if coll == "params" else bstats
                _set_path(target, (block, f"{role}_bn", leaf), arr)
    params["backbone"] = backbone
    stats["backbone"] = bstats
    return {"params": params, "batch_stats": stats}


def _convnext_state_dict_to_variables(state_dict) -> Dict[str, Dict]:
    """torchvision convnext_* state_dict -> flax variables
    (models/convnext.py naming).

    ``features.0`` is the 4x4/4 stem (conv + LayerNorm); odd features
    indices 1/3/5/7 are the four CNBlock stages (``features.{2s-1}.{j}``
    -> ``stage{s}_block{j}``); even indices 2/4/6 are the LayerNorm+conv
    downsamples INTO stages 2-4.  The post-pool LayerNorm arrives as
    torchvision's ``classifier.0`` (or ``ln`` from an irp_tpu export);
    torchvision's own ``classifier.2`` (single Linear head) is skipped —
    the irp_tpu head loads from ``classifier.{1,4}`` keys only when the
    hidden Linear pair is present (reference model.py:30-36).
    """
    params: Dict = {}
    backbone: Dict = {}
    has_mlp_head = any(_strip_prefix(k).startswith("classifier.4.")
                       for k in state_dict)

    def ln_leaf(field):
        return "scale" if field == "weight" else "bias"

    for key, value in state_dict.items():
        key = _strip_prefix(key)
        arr = _np(value)
        if key in ("ln.weight", "ln.bias"):  # irp_tpu-export final LN
            _set_path(backbone, ("ln", ln_leaf(key.split(".")[1])), arr)
            continue
        if key.startswith("classifier."):
            m = re.match(r"^classifier\.(\d+)\.(weight|bias)$", key)
            if m is None:
                raise KeyError(f"unrecognized ConvNeXt torch key: {key}")
            idx, field = m.groups()
            if idx == "0":  # torchvision's post-pool LayerNorm
                _set_path(backbone, ("ln", ln_leaf(field)), arr)
            elif has_mlp_head and idx in ("1", "4"):
                dense = {"1": "head_dense1", "4": "head_dense2"}[idx]
                _set_path(params, (dense,
                                   "kernel" if field == "weight" else "bias"),
                          arr.T if field == "weight" else arr)
            # else: torchvision's own classifier.2 Linear — not ours
            continue
        m = re.match(r"^features\.(\d+)\.(.+)$", key)
        if not m:
            raise KeyError(f"unrecognized ConvNeXt torch key: {key}")
        fidx, rest = int(m.group(1)), m.group(2)
        if fidx == 0:  # stem conv + LN
            sub, field = rest.split(".", 1)
            if sub == "0":
                _set_path(backbone, ("stem_conv",
                                     "kernel" if field == "weight"
                                     else "bias"),
                          arr.transpose(2, 3, 1, 0)
                          if field == "weight" else arr)
            else:
                _set_path(backbone, ("stem_ln", ln_leaf(field)), arr)
            continue
        if fidx % 2 == 1:  # CNBlock stages
            s = (fidx + 1) // 2
            m2 = re.match(r"^(\d+)\.(.+)$", rest)
            if m2 is None:
                raise KeyError(f"unrecognized ConvNeXt torch key: {key}")
            j, leaf_key = m2.groups()
            block = f"stage{s}_block{j}"
            if leaf_key == "layer_scale":
                _set_path(backbone, (block, "layer_scale"),
                          arr.reshape(-1))
                continue
            m3 = re.match(r"^block\.(\d+)\.(weight|bias)$", leaf_key)
            if m3 is None:
                raise KeyError(f"unrecognized ConvNeXt torch key: {key}")
            k, field = m3.groups()
            if k == "0":  # depthwise 7x7
                _set_path(backbone, (block, "dw_conv",
                                     "kernel" if field == "weight"
                                     else "bias"),
                          arr.transpose(2, 3, 1, 0)
                          if field == "weight" else arr)
            elif k == "2":
                _set_path(backbone, (block, "ln", ln_leaf(field)), arr)
            elif k in ("3", "5"):
                dense = "mlp_dense1" if k == "3" else "mlp_dense2"
                _set_path(backbone, (block, dense,
                                     "kernel" if field == "weight"
                                     else "bias"),
                          arr.T if field == "weight" else arr)
            else:
                raise KeyError(f"unrecognized ConvNeXt torch key: {key}")
            continue
        # even fidx 2/4/6: LayerNorm + 2x2/2 conv into stage fidx//2 + 1
        s = fidx // 2 + 1
        sub, field = rest.split(".", 1)
        if sub == "0":
            _set_path(backbone, (f"stage{s}_downsample_ln", ln_leaf(field)),
                      arr)
        else:
            _set_path(backbone, (f"stage{s}_downsample_conv",
                                 "kernel" if field == "weight" else "bias"),
                      arr.transpose(2, 3, 1, 0)
                      if field == "weight" else arr)
    params["backbone"] = backbone
    return {"params": params, "batch_stats": {}}


def torch_state_dict_to_variables(state_dict: Mapping[str, "np.ndarray"]):
    """Convert a torch state_dict (tensors or ndarrays) to flax variables.

    Returns ``{"params": ..., "batch_stats": ...}`` as nested dicts of
    float32 numpy arrays.  Missing head keys are fine (backbone-only
    torchvision checkpoints); merge over a randomly-initialized tree with
    ``merge_pretrained``.  ViT state_dicts (torchvision vit_*) are
    auto-detected by their class_token/encoder keys; ConvNeXt ones
    (torchvision convnext_*) by their layer_scale keys; EfficientNet ones
    (torchvision efficientnet_b*) by their MBConv ``features.`` keys.
    """
    if _is_vit_state_dict(state_dict):
        return _vit_state_dict_to_variables(state_dict)
    if _is_convnext_state_dict(state_dict):
        return _convnext_state_dict_to_variables(state_dict)
    if _is_efficientnet_state_dict(state_dict):
        return _efficientnet_state_dict_to_variables(state_dict)
    if _has_features_prefix(state_dict):
        # features.-prefixed but neither MBConv- nor CNBlock-shaped: some
        # other torchvision family (VGG / DenseNet / MobileNet / ...) —
        # name the heuristic instead of failing deep inside a converter
        raise ValueError(
            "state_dict has 'features.'-prefixed keys but neither the "
            "EfficientNet MBConv layout ('features.<s>.<j>.block.<k>.') "
            "nor ConvNeXt layer_scale keys: this looks like an "
            "unsupported torchvision family (e.g. VGG, DenseNet, "
            "MobileNet). Supported families: ResNet/ResNeXt/Wide-ResNet "
            "(conv1/layer*), ViT (class_token/encoder.*), EfficientNet "
            "(features.*.*.block.*), ConvNeXt (features.* + layer_scale)")
    out: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    for key, value in state_dict.items():
        mapped = torch_key_to_flax(key)
        if mapped is None:
            continue
        coll, path, kind = mapped
        arr = np.asarray(getattr(value, "numpy", lambda: value)(),
                         dtype=np.float32)
        if kind == "conv":
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif kind == "linear" and arr.ndim == 2:
            arr = arr.T  # (out,in) -> (in,out)
        _set_path(out[coll], path, arr)
    return out


def merge_pretrained(variables, pretrained) -> Dict:
    """Overlay converted pretrained arrays onto an init'd variable tree.

    Shape-checks every overlaid leaf; leaves absent from ``pretrained``
    (e.g. the head when loading a torchvision backbone) keep their random
    init.
    """
    import jax

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"pretrained key {path}/{k} not in model tree")
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, f"{path}/{k}")
            else:
                want = np.shape(dst[k])
                got = np.shape(v)
                if want != got:
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: model {want}, "
                        f"pretrained {got}")
                out[k] = np.asarray(v, dtype=np.result_type(dst[k]))
        return out

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    plain = {k: dict(v) for k, v in variables.items()}
    result = dict(plain)
    for coll in ("params", "batch_stats"):
        if coll in pretrained and pretrained[coll]:
            result[coll] = merge(plain[coll], pretrained[coll], coll)
    return result


def load_torch_checkpoint(path: str):
    """Load a .pth state_dict via torch (CPU) and convert.

    Accepts either a bare state_dict or a dict with a 'state_dict' entry.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return torch_state_dict_to_variables(obj)


def _vit_variables_to_torch_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse ViT conversion: separate q/k/v kernels re-pack into
    torchvision's in_proj layout."""
    params = variables["params"]
    b = params["backbone"]
    sd: Dict[str, np.ndarray] = {}
    sd["backbone.class_token"] = np.asarray(b["class_token"], np.float32)
    sd["backbone.conv_proj.weight"] = np.asarray(
        b["conv_proj"]["kernel"], np.float32).transpose(3, 2, 0, 1)
    sd["backbone.conv_proj.bias"] = np.asarray(
        b["conv_proj"]["bias"], np.float32)
    sd["backbone.encoder.pos_embedding"] = np.asarray(
        b["pos_embedding"], np.float32)
    blocks = sorted((k for k in b if k.startswith("block")),
                    key=lambda k: int(k[len("block"):]))
    for name in blocks:
        node = b[name]
        t = f"backbone.encoder.layers.encoder_layer_{name[len('block'):]}"
        for ln_flax, ln_torch in (("ln1", "ln_1"), ("ln2", "ln_2")):
            sd[f"{t}.{ln_torch}.weight"] = np.asarray(
                node[ln_flax]["scale"], np.float32)
            sd[f"{t}.{ln_torch}.bias"] = np.asarray(
                node[ln_flax]["bias"], np.float32)
        qkv_w = [np.asarray(node[p]["kernel"], np.float32).T
                 for p in ("attn_q", "attn_k", "attn_v")]
        qkv_b = [np.asarray(node[p]["bias"], np.float32)
                 for p in ("attn_q", "attn_k", "attn_v")]
        sd[f"{t}.self_attention.in_proj_weight"] = np.concatenate(qkv_w, 0)
        sd[f"{t}.self_attention.in_proj_bias"] = np.concatenate(qkv_b, 0)
        sd[f"{t}.self_attention.out_proj.weight"] = np.asarray(
            node["attn_out"]["kernel"], np.float32).T
        sd[f"{t}.self_attention.out_proj.bias"] = np.asarray(
            node["attn_out"]["bias"], np.float32)
        for flax_name, idx in (("mlp_dense1", "0"), ("mlp_dense2", "3")):
            sd[f"{t}.mlp.{idx}.weight"] = np.asarray(
                node[flax_name]["kernel"], np.float32).T
            sd[f"{t}.mlp.{idx}.bias"] = np.asarray(
                node[flax_name]["bias"], np.float32)
    sd["backbone.encoder.ln.weight"] = np.asarray(b["ln"]["scale"],
                                                  np.float32)
    sd["backbone.encoder.ln.bias"] = np.asarray(b["ln"]["bias"], np.float32)
    for idx, dense in (("1", "head_dense1"), ("4", "head_dense2")):
        sd[f"classifier.{idx}.weight"] = np.asarray(
            params[dense]["kernel"], np.float32).T
        sd[f"classifier.{idx}.bias"] = np.asarray(
            params[dense]["bias"], np.float32)
    return sd


def _efficientnet_variables_to_torch_state_dict(
        variables) -> Dict[str, np.ndarray]:
    """Inverse EfficientNet conversion (torchvision features.* layout)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    b, bs = params["backbone"], stats.get("backbone", {})
    sd: Dict[str, np.ndarray] = {}

    def put_conv(tkey, kernel):
        sd[tkey] = np.asarray(kernel, np.float32).transpose(3, 2, 0, 1)

    def put_bn(tprefix, pnode, snode):
        sd[f"{tprefix}.weight"] = np.asarray(pnode["scale"], np.float32)
        sd[f"{tprefix}.bias"] = np.asarray(pnode["bias"], np.float32)
        sd[f"{tprefix}.running_mean"] = np.asarray(snode["mean"], np.float32)
        sd[f"{tprefix}.running_var"] = np.asarray(snode["var"], np.float32)

    put_conv("backbone.features.0.0.weight", b["stem_conv"]["kernel"])
    put_bn("backbone.features.0.1", b["stem_bn"], bs["stem_bn"])
    blocks = sorted((k for k in b if k.startswith("stage")),
                    key=lambda k: (int(k.split("_block")[0][len("stage"):]),
                                   int(k.split("_block")[1])))
    for fkey in blocks:
        stage, j = fkey.split("_block")
        s = int(stage[len("stage"):])
        tbase = f"backbone.features.{s}.{j}.block"
        roles = _EFF_ROLES_NO_EXPAND if s == 1 else _EFF_ROLES_EXPAND
        idx_of = {v: k for k, v in roles.items()}
        node, snode = b[fkey], bs[fkey]
        for role in ("expand", "dw", "project"):
            if f"{role}_conv" not in node:
                continue
            k = idx_of[role]
            put_conv(f"{tbase}.{k}.0.weight", node[f"{role}_conv"]["kernel"])
            put_bn(f"{tbase}.{k}.1", node[f"{role}_bn"],
                   snode[f"{role}_bn"])
        k = idx_of["se"]
        for fc in ("fc1", "fc2"):
            put_conv(f"{tbase}.{k}.{fc}.weight",
                     node[f"se_{fc}"]["kernel"])
            sd[f"{tbase}.{k}.{fc}.bias"] = np.asarray(
                node[f"se_{fc}"]["bias"], np.float32)
    put_conv("backbone.features.8.0.weight", b["top_conv"]["kernel"])
    put_bn("backbone.features.8.1", b["top_bn"], bs["top_bn"])
    for idx, dense in (("1", "head_dense1"), ("4", "head_dense2")):
        sd[f"classifier.{idx}.weight"] = np.asarray(
            params[dense]["kernel"], np.float32).T
        sd[f"classifier.{idx}.bias"] = np.asarray(
            params[dense]["bias"], np.float32)
    return sd


def _convnext_variables_to_torch_state_dict(
        variables) -> Dict[str, np.ndarray]:
    """Inverse ConvNeXt conversion (torchvision features.* layout; the
    post-pool LayerNorm exports as ``backbone.ln`` — torchvision keeps it
    at ``classifier.0``, and the importer accepts both)."""
    params = variables["params"]
    b = params["backbone"]
    sd: Dict[str, np.ndarray] = {}

    def put_conv(tbase, node):
        sd[f"{tbase}.weight"] = np.asarray(node["kernel"],
                                           np.float32).transpose(3, 2, 0, 1)
        sd[f"{tbase}.bias"] = np.asarray(node["bias"], np.float32)

    def put_ln(tbase, node):
        sd[f"{tbase}.weight"] = np.asarray(node["scale"], np.float32)
        sd[f"{tbase}.bias"] = np.asarray(node["bias"], np.float32)

    put_conv("backbone.features.0.0", b["stem_conv"])
    put_ln("backbone.features.0.1", b["stem_ln"])
    blocks = sorted((k for k in b if re.fullmatch(r"stage\d+_block\d+", k)),
                    key=lambda k: (int(k.split("_block")[0][len("stage"):]),
                                   int(k.split("_block")[1])))
    for fkey in blocks:
        stage, j = fkey.split("_block")
        s = int(stage[len("stage"):])
        tbase = f"backbone.features.{2 * s - 1}.{j}"
        node = b[fkey]
        put_conv(f"{tbase}.block.0", node["dw_conv"])
        put_ln(f"{tbase}.block.2", node["ln"])
        for k, dense in (("3", "mlp_dense1"), ("5", "mlp_dense2")):
            sd[f"{tbase}.block.{k}.weight"] = np.asarray(
                node[dense]["kernel"], np.float32).T
            sd[f"{tbase}.block.{k}.bias"] = np.asarray(
                node[dense]["bias"], np.float32)
        sd[f"{tbase}.layer_scale"] = np.asarray(
            node["layer_scale"], np.float32).reshape(-1, 1, 1)
    for s in range(2, 5):
        if f"stage{s}_downsample_ln" in b:
            put_ln(f"backbone.features.{2 * s - 2}.0",
                   b[f"stage{s}_downsample_ln"])
            put_conv(f"backbone.features.{2 * s - 2}.1",
                     b[f"stage{s}_downsample_conv"])
    put_ln("backbone.ln", b["ln"])
    for idx, dense in (("1", "head_dense1"), ("4", "head_dense2")):
        sd[f"classifier.{idx}.weight"] = np.asarray(
            params[dense]["kernel"], np.float32).T
        sd[f"classifier.{idx}.bias"] = np.asarray(
            params[dense]["bias"], np.float32)
    return sd


def flax_variables_to_torch_state_dict(variables, depth: int = 50):
    """Inverse conversion (for exporting checkpoints the reference stack
    could load; reverse of torch_state_dict_to_variables).  ViT trees are
    auto-detected by their class_token key, ConvNeXt ones by their
    stem_ln key, EfficientNet ones by their stem_conv key; ``depth`` is
    ResNet-only."""
    if "class_token" in variables["params"].get("backbone", {}):
        return _vit_variables_to_torch_state_dict(variables)
    if "stem_ln" in variables["params"].get("backbone", {}):
        return _convnext_variables_to_torch_state_dict(variables)
    if "stem_conv" in variables["params"].get("backbone", {}):
        return _efficientnet_variables_to_torch_state_dict(variables)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}

    def put_conv(tkey, kernel):
        sd[tkey] = np.asarray(kernel, np.float32).transpose(3, 2, 0, 1)

    def put_bn(tprefix, pnode, snode):
        sd[f"{tprefix}.weight"] = np.asarray(pnode["scale"], np.float32)
        sd[f"{tprefix}.bias"] = np.asarray(pnode["bias"], np.float32)
        sd[f"{tprefix}.running_mean"] = np.asarray(snode["mean"], np.float32)
        sd[f"{tprefix}.running_var"] = np.asarray(snode["var"], np.float32)

    b = params["backbone"]
    bs = stats.get("backbone", {})
    put_conv("backbone.conv1.weight", b["conv1"]["kernel"])
    put_bn("backbone.bn1", b["bn1"], bs["bn1"])
    for i, n_blocks in enumerate(STAGE_SIZES[depth]):
        for j in range(n_blocks):
            fkey = f"layer{i + 1}_block{j}"
            tbase = f"backbone.layer{i + 1}.{j}"
            node, snode = b[fkey], bs[fkey]
            for conv_name in sorted(k for k in node if k.startswith("conv")):
                put_conv(f"{tbase}.{conv_name}.weight", node[conv_name]["kernel"])
                bn_name = "bn" + conv_name[-1]
                put_bn(f"{tbase}.{bn_name}", node[bn_name], snode[bn_name])
            if "downsample_conv" in node:
                put_conv(f"{tbase}.downsample.0.weight",
                         node["downsample_conv"]["kernel"])
                put_bn(f"{tbase}.downsample.1", node["downsample_bn"],
                       snode["downsample_bn"])
    for idx, dense in (("1", "head_dense1"), ("4", "head_dense2")):
        sd[f"classifier.{idx}.weight"] = np.asarray(
            params[dense]["kernel"], np.float32).T
        sd[f"classifier.{idx}.bias"] = np.asarray(
            params[dense]["bias"], np.float32)
    return sd
