"""Distilled DeiT (ref ``networks/timm_deit.py:21-135``
``DistilledVisionTransformer``): a ViT with an extra distillation token and
twin classifier heads; at inference the two head outputs are averaged
(ref ``timm_deit.py:126-135``).

Reachable in the reference only via ``training_method="deit"``
(``utils/misc.py:198-200``); note the reference's MaskFormer cannot
actually consume it (timm models lack the ``n_embs``/``n_heads``
attributes its ctor reads) — this is a standalone-backbone capability.

The dormant ``networks/timm_vit.py`` experiments
(``get_multi_scale_features`` etc.) reference undefined submodules and
cannot run (SURVEY §2.4); they are intentionally not ported.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sod_tpu.models.vit import ViTConfig, _block_apply, patchify, vit_init
from sod_tpu.ops.layers import layer_norm, linear, linear_init, trunc_normal
from sod_tpu.ops.resize import interpolate_bicubic


@dataclass(frozen=True)
class DeiTConfig:
    vit: ViTConfig = ViTConfig(patch_size=16, embed_dim=384, n_heads=6,
                               pos_grid=14)
    num_classes: int = 1000


def deit_small_distilled_patch16_224() -> DeiTConfig:
    return DeiTConfig()


def deit_init(rng: jax.Array, cfg: DeiTConfig, dtype=jnp.float32) -> dict:
    k_vit, k_dist, k_pos, k_head, k_headd = jax.random.split(rng, 5)
    params = vit_init(k_vit, cfg.vit, dtype)
    n = cfg.vit.pos_grid ** 2
    # distilled models carry a (N + 2)-token pos-embed (cls + dist)
    params["pos_embed"] = trunc_normal(k_pos, (1, n + 2, cfg.vit.embed_dim),
                                       std=0.02, dtype=dtype)
    params["dist_token"] = trunc_normal(k_dist, (1, 1, cfg.vit.embed_dim),
                                        std=0.02, dtype=dtype)
    if cfg.num_classes > 0:
        params["head"] = linear_init(k_head, cfg.vit.embed_dim,
                                     cfg.num_classes, dtype=dtype)
        params["head_dist"] = linear_init(k_headd, cfg.vit.embed_dim,
                                          cfg.num_classes, dtype=dtype)
    return params


def deit_forward_features(params: dict, x: jax.Array,
                          cfg: DeiTConfig) -> jax.Array:
    """[B, H, W, 3] -> [B, 2 + N, D] final-norm tokens (cls, dist, patches)."""
    vcfg = cfg.vit
    tokens = patchify(params["patch_embed"], x, vcfg.patch_size)
    b = tokens.shape[0]
    d = tokens.shape[-1]
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype),
                           (b, 1, d))
    dist = jnp.broadcast_to(params["dist_token"].astype(tokens.dtype),
                            (b, 1, d))
    tokens = jnp.concatenate([cls, dist, tokens], axis=1)

    pe = params["pos_embed"]
    gh = x.shape[1] // vcfg.patch_size
    gw = x.shape[2] // vcfg.patch_size
    if (gh, gw) != (vcfg.pos_grid, vcfg.pos_grid):
        prefix, patch_pe = pe[:, :2], pe[:, 2:]
        patch_pe = patch_pe.reshape(1, vcfg.pos_grid, vcfg.pos_grid, d)
        patch_pe = interpolate_bicubic(patch_pe.transpose(0, 3, 1, 2), gh, gw)
        patch_pe = patch_pe.transpose(0, 2, 3, 1).reshape(1, gh * gw, d)
        pe = jnp.concatenate([prefix, patch_pe], axis=1)
    tokens = tokens + pe.astype(tokens.dtype)

    def body(carry, bp):
        return _block_apply(bp, carry, vcfg), None

    tokens, _ = jax.lax.scan(body, tokens, params["blocks"])
    return layer_norm(params["norm"], tokens, vcfg.ln_eps)


def deit_apply(params: dict, x: jax.Array, cfg: DeiTConfig) -> jax.Array:
    """Classification forward: mean of the cls/dist head logits
    (ref ``timm_deit.py:126-135``)."""
    tokens = deit_forward_features(params, x, cfg)
    logits = linear(params["head"], tokens[:, 0])
    logits_d = linear(params["head_dist"], tokens[:, 1])
    return (logits + logits_d) / 2.0
