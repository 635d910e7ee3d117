"""PyTorch checkpoint -> JAX parameter conversion.

The reference consumes four checkpoint families (SURVEY §5):

* DINO ViT-S weights (``dino_deitsmall8_300ep_pretrain.pth`` etc., ref
  ``utils/misc.py:230-246``);
* the trained SelfMask MaskFormer (``selfmask_nq20.pt`` /
  ``latest_model.pt['model']``, ref ``app.py:185-187``);
* MoCo-v2 / SwAV ResNet-50 (``networks/resnet.py:20-47``);
* torchvision supervised ResNet-50.

Conversion rules (see the layout conventions in ``sod_tpu.ops.layers`` /
``sod_tpu.models.vit``):

* torch ``nn.Linear`` stores (out, in); ours is (in, out) -> transpose;
* the patchify conv (D, 3, p, p) becomes a (p*p*3, D) matmul with rows
  flattened (py, px, c) -> permute(2, 3, 1, 0) then reshape;
* conv weights (O, I, kh, kw) -> HWIO;
* per-layer transformer blocks are STACKED along a leading axis (lax.scan
  layout) -> stack over the layer index;
* BatchNorm running statistics map to {mean, var}.

Inputs are plain ``state_dict``-like mappings of numpy arrays; use
``load_torch_state_dict`` to read a ``.pt``/``.pth`` file without CUDA.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

Array = np.ndarray


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Load a torch checkpoint to numpy on CPU (handles the reference's
    ``{'model': state_dict}`` wrapping, ``app.py:185-187``)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict", "teacher"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def _t(x: Array) -> Array:
    return np.ascontiguousarray(x.T)


def _ln(sd: Mapping[str, Array], prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _linear(sd: Mapping[str, Array], prefix: str) -> dict:
    p = {"w": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["b"] = sd[f"{prefix}.bias"]
    return p


# ---------------------------------------------------------------------------
# ViT (DINO deit_small naming, ref networks/vision_transformer.py)
# ---------------------------------------------------------------------------

def convert_vit(sd: Mapping[str, Array], depth: int = 12,
                prefix: str = "") -> dict:
    g = lambda k: sd[prefix + k]

    pw = g("patch_embed.proj.weight")            # (D, C, p, p)
    d, c, p, _ = pw.shape
    patch_w = pw.transpose(2, 3, 1, 0).reshape(p * p * c, d)

    blocks = []
    for i in range(depth):
        bp = f"blocks.{i}."
        blocks.append({
            "norm1": _ln(sd, prefix + bp + "norm1"),
            "attn": {
                "qkv": _linear(sd, prefix + bp + "attn.qkv"),
                "proj": _linear(sd, prefix + bp + "attn.proj"),
            },
            "norm2": _ln(sd, prefix + bp + "norm2"),
            "mlp": {"fc0": _linear(sd, prefix + bp + "mlp.fc1"),
                    "fc1": _linear(sd, prefix + bp + "mlp.fc2")},
        })
    stacked = _stack_trees(blocks)

    return {
        "patch_embed": {"w": patch_w, "b": g("patch_embed.proj.bias")},
        "cls_token": g("cls_token"),
        "pos_embed": g("pos_embed"),
        "blocks": stacked,
        "norm": _ln(sd, prefix + "norm"),
    }


def _stack_trees(trees):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


# ---------------------------------------------------------------------------
# MaskFormer (selfmask checkpoint naming, ref networks/maskformer/)
# ---------------------------------------------------------------------------

def _mha(sd: Mapping[str, Array], prefix: str) -> dict:
    return {
        "in_proj": {"w": _t(sd[f"{prefix}.in_proj_weight"]),
                    "b": sd[f"{prefix}.in_proj_bias"]},
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def convert_maskformer(sd: Mapping[str, Array], n_decoder_layers: int = 6,
                       depth: int = 12,
                       use_binary_classifier: bool = True) -> dict:
    params = {"encoder": convert_vit(sd, depth=depth, prefix="encoder.")}

    layers = []
    for i in range(n_decoder_layers):
        lp = f"decoder.layers.{i}"
        layers.append({
            "self_attn": _mha(sd, f"{lp}.self_attn"),
            "cross_attn": _mha(sd, f"{lp}.multihead_attn"),
            "linear1": _linear(sd, f"{lp}.linear1"),
            "linear2": _linear(sd, f"{lp}.linear2"),
            "norm1": _ln(sd, f"{lp}.norm1"),
            "norm2": _ln(sd, f"{lp}.norm2"),
            "norm3": _ln(sd, f"{lp}.norm3"),
        })
    params["decoder"] = {"layers": _stack_trees(layers),
                         "norm": _ln(sd, "decoder.norm")}
    params["query_embed"] = sd["query_embed"]

    n_ffn = len({k.split(".")[2] for k in sd
                 if k.startswith("ffn.layers.")})
    params["ffn"] = {f"fc{i}": _linear(sd, f"ffn.layers.{i}")
                     for i in range(n_ffn)}
    if not use_binary_classifier:
        params["linear_classifier"] = _linear(sd, "linear_classifier")
        params["norm"] = _ln(sd, "norm")
    return params


# ---------------------------------------------------------------------------
# JAX -> PyTorch export (the exact inverse of convert_maskformer)
# ---------------------------------------------------------------------------
# The reference consumes ``checkpoint['model']`` state dicts
# (``app.py:185-187``; ``evaluator.py --p_state_dict``,  README.md:105-108).
# Exporting OUR trained params into that layout closes the interop loop:
# train on TPU here, keep serving/evaluating from the torch stack there.
# The reference itself has no export/import story beyond torch.save.

def _unstack(stacked: dict):
    """[L, ...]-stacked block tree -> list of per-layer trees."""
    import jax

    leaves = jax.tree.leaves(stacked)
    depth = int(np.asarray(leaves[0]).shape[0])
    return [jax.tree.map(lambda x: np.asarray(x)[i], stacked)
            for i in range(depth)], depth


def _ex_ln(out: dict, prefix: str, p: dict) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _ex_linear(out: dict, prefix: str, p: dict) -> None:
    out[f"{prefix}.weight"] = _t(np.asarray(p["w"]))
    if "b" in p:
        out[f"{prefix}.bias"] = np.asarray(p["b"])


def _ex_mha(out: dict, prefix: str, p: dict) -> None:
    out[f"{prefix}.in_proj_weight"] = _t(np.asarray(p["in_proj"]["w"]))
    if "b" in p["in_proj"]:
        out[f"{prefix}.in_proj_bias"] = np.asarray(p["in_proj"]["b"])
    _ex_linear(out, f"{prefix}.out_proj", p["out_proj"])


def export_vit(params: dict, prefix: str = "") -> Dict[str, Array]:
    """JAX ViT params -> torch state-dict arrays (DINO deit naming) —
    inverse of :func:`convert_vit`, asserted round-trip-exact in
    ``tests/test_convert.py``."""
    out: Dict[str, Array] = {}
    pw = np.asarray(params["patch_embed"]["w"])      # (p*p*c, D)
    d = pw.shape[1]
    p = int(round((pw.shape[0] // 3) ** 0.5))
    out[prefix + "patch_embed.proj.weight"] = np.ascontiguousarray(
        pw.reshape(p, p, 3, d).transpose(3, 2, 0, 1))
    out[prefix + "patch_embed.proj.bias"] = np.asarray(
        params["patch_embed"]["b"])
    out[prefix + "cls_token"] = np.asarray(params["cls_token"])
    out[prefix + "pos_embed"] = np.asarray(params["pos_embed"])

    blocks = params["blocks"]
    if "q" in blocks.get("attn", {}):   # p3 TP-split storage (parallel/p3.py)
        from sod_tpu.parallel.p3 import p3_merge_blocks

        blocks = p3_merge_blocks(blocks)
    per_layer, _ = _unstack(blocks)
    for i, bp in enumerate(per_layer):
        b = prefix + f"blocks.{i}."
        _ex_ln(out, b + "norm1", bp["norm1"])
        _ex_linear(out, b + "attn.qkv", bp["attn"]["qkv"])
        _ex_linear(out, b + "attn.proj", bp["attn"]["proj"])
        _ex_ln(out, b + "norm2", bp["norm2"])
        _ex_linear(out, b + "mlp.fc1", bp["mlp"]["fc0"])
        _ex_linear(out, b + "mlp.fc2", bp["mlp"]["fc1"])
    _ex_ln(out, prefix + "norm", params["norm"])
    return out


def export_maskformer(params: dict) -> Dict[str, Array]:
    """JAX MaskFormer params -> the reference's selfmask state-dict
    layout — inverse of :func:`convert_maskformer`.  The model shape
    (decoder depth, ffn width, binary-classifier heads) is read off the
    param tree itself; no config needed."""
    out = export_vit(params["encoder"], prefix="encoder.")
    layers, _ = _unstack(params["decoder"]["layers"])
    for i, lp in enumerate(layers):
        d = f"decoder.layers.{i}"
        _ex_mha(out, f"{d}.self_attn", lp["self_attn"])
        _ex_mha(out, f"{d}.multihead_attn", lp["cross_attn"])
        _ex_linear(out, f"{d}.linear1", lp["linear1"])
        _ex_linear(out, f"{d}.linear2", lp["linear2"])
        _ex_ln(out, f"{d}.norm1", lp["norm1"])
        _ex_ln(out, f"{d}.norm2", lp["norm2"])
        _ex_ln(out, f"{d}.norm3", lp["norm3"])
    _ex_ln(out, "decoder.norm", params["decoder"]["norm"])
    out["query_embed"] = np.asarray(params["query_embed"])
    for i in sorted(int(k[2:]) for k in params["ffn"]):
        _ex_linear(out, f"ffn.layers.{i}", params["ffn"][f"fc{i}"])
    if "linear_classifier" in params:       # use_binary_classifier=False
        _ex_linear(out, "linear_classifier", params["linear_classifier"])
        _ex_ln(out, "norm", params["norm"])
    return out


def save_torch_checkpoint(path: str, params: dict, extra: dict = None) -> str:
    """Write ``{'model': state_dict}`` exactly as the reference's
    consumers expect (``app.py:185-187`` pops ``['model']``;
    ``torch.load`` + ``load_state_dict`` on their side).  fp32 tensors —
    bf16 compute params are upcast, matching torch's default dtype."""
    import torch

    # copy: np.asarray of a jax array is read-only and torch.from_numpy
    # warns on (and forbids writing to) non-writable buffers
    sd = {k: torch.from_numpy(
              np.array(v, dtype=np.float32, copy=True))
          for k, v in export_maskformer(params).items()}
    obj = {"model": sd}
    if extra:
        obj.update(extra)
    torch.save(obj, path)
    return path


# ---------------------------------------------------------------------------
# ResNet-50 (torchvision / MoCo-v2 / SwAV naming, ref networks/resnet.py)
# ---------------------------------------------------------------------------

_RESNET_PREFIXES = ("module.encoder_q.", "module.", "encoder_q.", "network.")


def _strip_resnet_prefix(sd: Mapping[str, Array]) -> Dict[str, Array]:
    out = {}
    for k, v in sd.items():
        for p in _RESNET_PREFIXES:
            if k.startswith(p):
                k = k[len(p):]
                break
        # drop heads (ref networks/resnet.py:26-48)
        if any(w in k for w in ("fc.", "projection_head", "prototypes",
                                "num_batches_tracked")):
            continue
        # reference's own naming uses a "prefix." stem
        k = k.replace("prefix.", "")
        out[k] = v
    return out


def _bn(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"],
            "mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"]}


def _conv_w(x: Array) -> Array:
    return np.ascontiguousarray(x.transpose(2, 3, 1, 0))   # OIHW -> HWIO


def convert_resnet50(sd: Mapping[str, Array]) -> dict:
    sd = _strip_resnet_prefix(sd)
    params = {"prefix": {"conv1": _conv_w(sd["conv1.weight"]),
                         "bn1": _bn(sd, "bn1")}}
    layer_sizes = (3, 4, 6, 3)
    for li, n in enumerate(layer_sizes, start=1):
        blocks = {}
        for b in range(n):
            bp = f"layer{li}.{b}"
            blk = {
                "conv1": _conv_w(sd[f"{bp}.conv1.weight"]),
                "bn1": _bn(sd, f"{bp}.bn1"),
                "conv2": _conv_w(sd[f"{bp}.conv2.weight"]),
                "bn2": _bn(sd, f"{bp}.bn2"),
                "conv3": _conv_w(sd[f"{bp}.conv3.weight"]),
                "bn3": _bn(sd, f"{bp}.bn3"),
            }
            if f"{bp}.downsample.0.weight" in sd:
                blk["down_conv"] = _conv_w(sd[f"{bp}.downsample.0.weight"])
                blk["down_bn"] = _bn(sd, f"{bp}.downsample.1")
            blocks[f"block{b}"] = blk
        params[f"layer{li}"] = blocks
    return params
