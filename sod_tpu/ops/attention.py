"""Multi-head attention primitives.

Two attention call-sites exist in the reference:

* The ViT encoder's fused-QKV self-attention (ref
  ``networks/vision_transformer.py:97-133``): one (D, 3D) projection,
  scale = head_dim**-0.5, dense softmax(QK^T)V, output projection.
* torch ``nn.MultiheadAttention`` inside the DETR decoder layers (ref
  ``networks/maskformer/transformer_decoder.py:240-241``): packed in_proj
  (3D, D) + out_proj, identical math.

Both reduce to the same core ``_sdpa``.  On TPU the ViT path can route
through the fused Pallas flash-attention kernel
(``sod_tpu.ops.flash_attention``); the XLA einsum path below is the
reference-exact fallback (and the only path on CPU test meshes).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sod_tpu.ops.layers import linear


def _sdpa(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
          key_mask: Optional[jax.Array] = None,
          return_probs: bool = False):
    """softmax(q k^T * scale) v  over [B, H, N, d] tensors (fp32 softmax).

    :param key_mask: optional [B, Nk] bool; False keys are excluded from the
        softmax (canvas-padding tokens in fixed-shape variable-size eval).
    :param return_probs: also return the fp32 attention probabilities
        (single source of truth for the attn-returning paths).
    """
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    if return_probs:
        return out, probs
    return out


def _split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    b, n, d = x.shape
    return x.reshape(b, n, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, n, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * hd)


def self_attention_qkv(
    params: dict,
    x: jax.Array,
    n_heads: int,
    return_attn: bool = False,
    use_flash: bool = False,
    key_mask: Optional[jax.Array] = None,
):
    """ViT-style fused-QKV self-attention.

    params: {"qkv": {"w": (D, 3D), "b": (3D,)}, "proj": {"w": (D, D), "b": (D,)}}
    x: [B, N, D].  Returns [B, N, D] (and attn [B, H, N, N] if requested —
    mirroring the reference's ``(out, attn)`` return at
    ``vision_transformer.py:133``).
    """
    b, n, d = x.shape
    head_dim = d // n_heads
    scale = head_dim ** -0.5

    qkv = linear(params["qkv"], x)                     # [B, N, 3D]
    qkv = qkv.reshape(b, n, 3, n_heads, head_dim)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)             # [B, H, N, hd]
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)

    if return_attn:
        out, probs = _sdpa(q, k, v, scale, key_mask, return_probs=True)
        out = linear(params["proj"], _merge_heads(out))
        return out, probs

    if use_flash:
        from sod_tpu.ops.flash_attention import flash_attention

        out = flash_attention(q, k, v, scale, key_mask)
    else:
        out = _sdpa(q, k, v, scale, key_mask)
    return linear(params["proj"], _merge_heads(out))


def multi_head_attention(
    params: dict,
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    n_heads: int,
    key_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """torch ``nn.MultiheadAttention`` equivalent (batch-first layout here).

    params: {"in_proj": {"w": (D, 3D), "b": (3D,)}, "out_proj": {...}}
    query/key/value: [B, Nq/Nk/Nk, D].
    """
    d = query.shape[-1]
    head_dim = d // n_heads
    scale = head_dim ** -0.5

    w = params["in_proj"]["w"]          # (D, 3D) — columns [q | k | v]
    bias = params["in_proj"].get("b")
    wq, wk, wv = w[:, :d], w[:, d:2 * d], w[:, 2 * d:]

    def proj(x, wpart, off):
        y = jnp.dot(x, wpart.astype(x.dtype), preferred_element_type=jnp.float32)
        if bias is not None:
            y = y + bias[off:off + d].astype(jnp.float32)
        return y.astype(x.dtype)

    q = _split_heads(proj(query, wq, 0), n_heads)
    k = _split_heads(proj(key, wk, d), n_heads)
    v = _split_heads(proj(value, wv, 2 * d), n_heads)

    out = _sdpa(q, k, v, scale, key_mask)
    return linear(params["out_proj"], _merge_heads(out))


def mha_init(rng: jax.Array, dim: int, dtype=jnp.float32) -> dict:
    """Init matching torch ``nn.MultiheadAttention``: xavier_uniform in_proj,
    zero in_proj bias, torch-default out_proj."""
    import math

    k1, k2 = jax.random.split(rng)
    bound = math.sqrt(6.0 / (dim + 3 * dim))
    in_w = jax.random.uniform(k1, (dim, 3 * dim), minval=-bound, maxval=bound,
                              dtype=dtype)
    out_w = jax.random.uniform(k2, (dim, dim),
                               minval=-1.0 / math.sqrt(dim),
                               maxval=1.0 / math.sqrt(dim), dtype=dtype)
    return {
        "in_proj": {"w": in_w, "b": jnp.zeros((3 * dim,), dtype)},
        "out_proj": {"w": out_w, "b": jnp.zeros((dim,), dtype)},
    }
