"""Fully-fused ViT transformer block (Pallas/TPU) — inference fast path.

One kernel invocation computes an ENTIRE encoder block for one image:
LayerNorm -> QKV projection -> per-head attention -> output projection ->
residual -> LayerNorm -> MLP (GELU) -> residual, with every intermediate
(normed tokens, QKV, attention scores/probs, MLP hidden) living in VMEM.
The XLA path writes each of those to HBM between ops; profiling on v5e
showed the ViT at ~21% MXU utilisation with the per-op pipeline — the
token/QKV/MLP HBM round trips are the gap this kernel closes.

Layout contract:
* tokens are padded once to a multiple of 128 (``n_pad``) BEFORE the layer
  scan; padded rows flow through as garbage and padded KEYS are masked in
  the attention softmax (``n_real``), so results for real tokens are
  exactly the unfused block's;
* weights arrive in the (in, out) matmul layout of ``sod_tpu.ops.layers``
  (one [D, 3D] QKV, biases as [1, dim] rows);
* grid = (B,): one program per image — at ViT-S sizes the whole working
  set (~12 MB: tokens + weights + one head's f32 scores + MLP hidden)
  fits VMEM; heads are a static 6-way unroll sharing the scores buffer.

Used for inference only (``ViTConfig.fused_blocks``); training keeps the
unfused path (flash attention has the custom VJP there).  Numerical parity
with the unfused block is asserted in tests at bf16 tolerance.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _kernel(x_ref, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
            ln2s, ln2b, wfc1, bfc1, wfc2, bfc2, o_ref, *,
            n_heads: int, n_real: int, eps: float, scale: float,
            mask_ref=None):
    x0 = x_ref[0].astype(jnp.float32)                     # [N, D]
    n, d = x0.shape
    hd = d // n_heads

    def layer_norm(v, s_ref, b_ref):
        mean = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v - mean), axis=-1, keepdims=True)
        return ((v - mean) * jax.lax.rsqrt(var + eps)
                * s_ref[0].astype(jnp.float32)
                + b_ref[0].astype(jnp.float32))

    h = layer_norm(x0, ln1s, ln1b).astype(jnp.bfloat16)
    qkv = jnp.dot(h, wqkv[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv[0].astype(jnp.float32)).astype(jnp.bfloat16)  # [N, 3D]

    # q-row chunking bounds the f32 score slab at large N; the <=1024
    # single-slab layout is kept verbatim (measured fastest on v5e —
    # restructuring it into a 1-chunk loop regressed 3x)
    if n <= 1024:
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        key_ok = col < n_real
        if mask_ref is not None:
            key_ok = key_ok & (mask_ref[0, 0][None, :] > 0)
        heads = []
        for i in range(n_heads):                           # static unroll
            q = qkv[:, i * hd:(i + 1) * hd]
            k = qkv[:, d + i * hd:d + (i + 1) * hd]
            v = qkv[:, 2 * d + i * hd:2 * d + (i + 1) * hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(key_ok, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            heads.append(jnp.dot(p.astype(jnp.bfloat16), v,
                                 preferred_element_type=jnp.float32)
                         .astype(jnp.bfloat16))
        attn = jnp.concatenate(heads, axis=1)              # [N, D]
    else:
        key_row = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0] < n_real
        if mask_ref is not None:
            key_row = key_row & (mask_ref[0, 0] > 0)
        CHUNK = 512
        chunks = []
        for c0 in range(0, n, CHUNK):                      # static unroll
            heads = []
            for i in range(n_heads):                       # static unroll
                q = qkv[c0:c0 + CHUNK, i * hd:(i + 1) * hd]
                k = qkv[:, d + i * hd:d + (i + 1) * hd]
                v = qkv[:, 2 * d + i * hd:2 * d + (i + 1) * hd]
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32) * scale
                s = jnp.where(key_row[None, :], s, -1e30)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
                heads.append(jnp.dot(p.astype(jnp.bfloat16), v,
                                     preferred_element_type=jnp.float32)
                             .astype(jnp.bfloat16))
            chunks.append(jnp.concatenate(heads, axis=1))  # [CHUNK, D]
        attn = jnp.concatenate(chunks, axis=0)             # [N, D]

    y = jnp.dot(attn, wproj[:], preferred_element_type=jnp.float32)
    x1 = x0 + y + bproj[0].astype(jnp.float32)

    h2 = layer_norm(x1, ln2s, ln2b).astype(jnp.bfloat16)

    def mlp(rows):
        hid = jnp.dot(rows, wfc1[:], preferred_element_type=jnp.float32)
        hid = hid + bfc1[0].astype(jnp.float32)
        # tanh-approximate GELU: Mosaic lowers neither erf nor erfc; the
        # approximation error (<1e-3 absolute) is below bf16 activation
        # rounding, and this kernel is the inference-only fast path
        hid = (0.5 * hid * (1.0 + jnp.tanh(
            0.7978845608028654 * (hid + 0.044715 * hid ** 3)))
               ).astype(jnp.bfloat16)
        return jnp.dot(hid, wfc2[:], preferred_element_type=jnp.float32)

    if n <= 1024:
        out = mlp(h2)
    else:
        out = jnp.concatenate([mlp(h2[c0:c0 + 512])
                               for c0 in range(0, n, 512)], axis=0)
    x2 = x1 + out + bfc2[0].astype(jnp.float32)
    o_ref[0] = x2.astype(o_ref.dtype)


def _masked_kernel(x_ref, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
                   ln2s, ln2b, wfc1, bfc1, wfc2, bfc2, mask_ref, o_ref, *,
                   n_heads: int, n_real: int, eps: float, scale: float):
    _kernel(x_ref, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
            ln2s, ln2b, wfc1, bfc1, wfc2, bfc2, o_ref,
            n_heads=n_heads, n_real=n_real, eps=eps, scale=scale,
            mask_ref=mask_ref)


def fused_vit_block(x: jax.Array, bp: dict, n_heads: int, n_real: int,
                    eps: float = 1e-6, interpret: bool = False,
                    key_mask=None) -> jax.Array:
    """Apply one encoder block to padded tokens [B, N_pad, D] (bf16).

    :param key_mask: optional [B, N_pad] bool — per-image token validity
        (fixed-canvas eval); combined with the static ``n_real`` prefix."""
    b, n, d = x.shape
    assert n % 128 == 0, f"pad tokens to a multiple of 128, got {n}"
    hd = d // n_heads
    scale = hd ** -0.5

    row = lambda a: a.reshape(1, -1)
    weights = [
        row(bp["norm1"]["scale"]), row(bp["norm1"]["bias"]),
        bp["attn"]["qkv"]["w"], row(bp["attn"]["qkv"]["b"]),
        bp["attn"]["proj"]["w"], row(bp["attn"]["proj"]["b"]),
        row(bp["norm2"]["scale"]), row(bp["norm2"]["bias"]),
        bp["mlp"]["fc0"]["w"], row(bp["mlp"]["fc0"]["b"]),
        bp["mlp"]["fc1"]["w"], row(bp["mlp"]["fc1"]["b"]),
    ]
    weights = [w.astype(jnp.bfloat16) for w in weights]

    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [rep(w.shape) for w in weights]

    hidden = bp["mlp"]["fc0"]["w"].shape[1]
    flops = 2 * b * n * d * (3 * d + d + 2 * hidden) + 4 * b * n * n * d
    common = dict(
        grid=(b,),
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # per-image programs are independent — lets Mosaic overlap
            # the grid (DMA of image i+1 under compute of image i)
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * b * n * d * 2,
            transcendentals=b * n * n + b * n * hidden),
        interpret=interpret,
    )
    if key_mask is None:
        return pl.pallas_call(
            functools.partial(_kernel, n_heads=n_heads, n_real=n_real,
                              eps=eps, scale=scale),
            in_specs=in_specs, **common)(x, *weights)
    mask = key_mask.astype(jnp.int32)[:, None, :]          # [B, 1, N]
    mask_spec = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_masked_kernel, n_heads=n_heads, n_real=n_real,
                          eps=eps, scale=scale),
        in_specs=in_specs + [mask_spec], **common)(x, *weights, mask)


def fused_available() -> bool:
    if not _HAS_PLTPU:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
