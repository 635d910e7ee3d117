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
