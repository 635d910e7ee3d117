"""Int8 (W8A8) fully-fused ViT block — quantized inference fast path.

The v5e MXU runs int8×int8→int32 matmuls at ~1.8× its bf16 rate (measured
321.9 TOPS vs 175.9 TF/s on this chip, docs/PERFORMANCE.md).  This kernel
is the bf16 whole-block kernel (``sod_tpu.ops.fused_block``) with the four
projection matmuls (QKV, attention output, MLP fc0/fc1 — ~75 % of the
block's FLOPs) switched to int8:

* **weights** are quantized ONCE at load time, per output channel
  (symmetric, scale = max|w[:, c]| / 127) by :func:`quantize_vit_blocks`;
* **activations** are quantized per token row inside the kernel
  (dynamic symmetric, scale = max|h[n, :]| / 127) right after the
  LayerNorm / GELU that precedes each matmul — the rows are already in
  VMEM, so the quantize/dequantize epilogues are VPU work hidden under
  the MXU;
* accumulation is int32; dequantization multiplies by
  ``row_scale[:, None] * col_scale[None, :]`` in f32 before the bias;
* the attention itself (scores softmax, prob·V — the remaining ~25 % of
  FLOPs) stays bf16: softmax needs the dynamic range, and the accuracy
  headroom is spent where the FLOPs are.

This is a capability the reference does not have (its serving path runs
the torch fp32 block, ``networks/vision_transformer.py:136-170``); it is
opt-in (``Config.quantize = "int8"``) and ships with a measured accuracy
report (docs/PERFORMANCE.md) — the bf16 kernel remains the default.

Layout contract is identical to ``fused_block.fused_vit_block``: tokens
padded to a multiple of 128, padded KEYS masked in the softmax, weights
(in, out).  int8 VMEM tiling wants both matmul dims to be multiples of
(32, 128), which every ViT-S/Ti width satisfies.
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


# ---------------------------------------------------------------------------
# Quantization (load time, once)
# ---------------------------------------------------------------------------

def _quantize_weight(w: jax.Array):
    """Per-output-channel symmetric int8: w ≈ q * s, q ∈ [-127, 127].

    :param w: [..., in, out] float weights (stacked leading layer dim ok).
    :return: (q int8 same shape, s f32 [..., 1, out])."""
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_vit_blocks(blocks: dict) -> dict:
    """Quantize the stacked encoder-block params (``vit params["blocks"]``).

    Returns a new stacked tree with int8 weights + f32 per-channel scales
    for the four projection matmuls; LayerNorm params and biases pass
    through in f32.  Scan-compatible: every leaf keeps the leading [L]
    layer dimension.
    """
    def mat(p):
        q, s = _quantize_weight(p["w"])
        out = {"q": q, "s": s}
        if "b" in p:
            out["b"] = p["b"].astype(jnp.float32)
        return out

    f32 = functools.partial(jax.tree.map, lambda a: a.astype(jnp.float32))
    return {
        "norm1": f32(blocks["norm1"]),
        "norm2": f32(blocks["norm2"]),
        "qkv": mat(blocks["attn"]["qkv"]),
        "proj": mat(blocks["attn"]["proj"]),
        "fc0": mat(blocks["mlp"]["fc0"]),
        "fc1": mat(blocks["mlp"]["fc1"]),
    }


def vit_quantize_int8(vit_params: dict) -> dict:
    """Return ViT params with an added ``blocks_q`` quantized twin.

    ``vit_apply(..., fused=True)`` routes through the int8 kernel whenever
    ``blocks_q`` is present (and the shape fits the whole-block kernel);
    everything outside the encoder blocks (patch embed, pos embed, final
    norm — <5 % of the FLOPs) stays in the float path.
    """
    out = dict(vit_params)
    out["blocks_q"] = quantize_vit_blocks(vit_params["blocks"])
    return out


# ---------------------------------------------------------------------------
# Shared quantized-math building blocks (used by the kernel AND the pure-XLA
# reference so parity tests pin the exact same arithmetic)
# ---------------------------------------------------------------------------

def _quant_rows(h: jax.Array):
    """Dynamic per-row symmetric int8: h ≈ q * s, s = max|row|/127."""
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
    return q, s


def _qdot(h: jax.Array, wq: jax.Array, ws: jax.Array) -> jax.Array:
    """f32 rows × int8 weights → f32, via int8 MXU with int32 accumulate.

    :param h: [N, K] f32; :param wq: [K, M] int8; :param ws: [1, M] f32."""
    q, s = _quant_rows(h)
    acc = jax.lax.dot(q, wq, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s * ws


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _kernel(x_ref, ln1s, ln1b, qkv_q, qkv_s, qkv_b, proj_q, proj_s, proj_b,
            ln2s, ln2b, fc0_q, fc0_s, fc0_b, fc1_q, fc1_s, fc1_b, o_ref, *,
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

    h = layer_norm(x0, ln1s, ln1b)
    qkv = (_qdot(h, qkv_q[:], qkv_s[0][None, :])
           + qkv_b[0].astype(jnp.float32)).astype(jnp.bfloat16)  # [N, 3D]

    # attention stays bf16 — identical to fused_block._kernel's <=1024
    # single-slab layout (this kernel guards n <= 1024 in the wrapper)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    key_ok = col < n_real
    if mask_ref is not None:
        key_ok = key_ok & (mask_ref[0, 0][None, :] > 0)
    heads = []
    for i in range(n_heads):                               # static unroll
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
    attn = jnp.concatenate(heads, axis=1)                  # [N, D]

    y = _qdot(attn.astype(jnp.float32), proj_q[:], proj_s[0][None, :])
    x1 = x0 + y + proj_b[0].astype(jnp.float32)

    h2 = layer_norm(x1, ln2s, ln2b)
    hid = _qdot(h2, fc0_q[:], fc0_s[0][None, :]) + fc0_b[0].astype(jnp.float32)
    # tanh-approximate GELU (Mosaic lowers neither erf nor erfc; same
    # approximation as the bf16 fast path — error below the quantization
    # noise floor)
    hid = 0.5 * hid * (1.0 + jnp.tanh(
        0.7978845608028654 * (hid + 0.044715 * hid ** 3)))
    out = _qdot(hid, fc1_q[:], fc1_s[0][None, :])
    x2 = x1 + out + fc1_b[0].astype(jnp.float32)
    o_ref[0] = x2.astype(o_ref.dtype)


def _masked_kernel(x_ref, ln1s, ln1b, qkv_q, qkv_s, qkv_b,
                   proj_q, proj_s, proj_b, ln2s, ln2b,
                   fc0_q, fc0_s, fc0_b, fc1_q, fc1_s, fc1_b,
                   mask_ref, o_ref, *,
                   n_heads: int, n_real: int, eps: float, scale: float):
    _kernel(x_ref, ln1s, ln1b, qkv_q, qkv_s, qkv_b, proj_q, proj_s, proj_b,
            ln2s, ln2b, fc0_q, fc0_s, fc0_b, fc1_q, fc1_s, fc1_b, o_ref,
            n_heads=n_heads, n_real=n_real, eps=eps, scale=scale,
            mask_ref=mask_ref)


def fused_vit_block_int8(x: jax.Array, bq: dict, n_heads: int, n_real: int,
                         eps: float = 1e-6, interpret: bool = False,
                         key_mask=None) -> jax.Array:
    """Apply one int8-quantized encoder block to padded tokens [B, N, D].

    :param bq: one layer's slice of :func:`quantize_vit_blocks` output.
    :param key_mask: optional [B, N] bool per-image token validity."""
    b, n, d = x.shape
    assert n % 128 == 0, f"pad tokens to a multiple of 128, got {n}"
    assert n <= 1024, "int8 whole-block kernel is the <=1024-token fast path"
    hd = d // n_heads
    scale = hd ** -0.5

    row = lambda a: a.reshape(1, -1)
    weights = [
        row(bq["norm1"]["scale"]).astype(jnp.float32),
        row(bq["norm1"]["bias"]).astype(jnp.float32),
        bq["qkv"]["q"], bq["qkv"]["s"].reshape(1, -1).astype(jnp.float32),
        row(bq["qkv"]["b"]).astype(jnp.float32),
        bq["proj"]["q"], bq["proj"]["s"].reshape(1, -1).astype(jnp.float32),
        row(bq["proj"]["b"]).astype(jnp.float32),
        row(bq["norm2"]["scale"]).astype(jnp.float32),
        row(bq["norm2"]["bias"]).astype(jnp.float32),
        bq["fc0"]["q"], bq["fc0"]["s"].reshape(1, -1).astype(jnp.float32),
        row(bq["fc0"]["b"]).astype(jnp.float32),
        bq["fc1"]["q"], bq["fc1"]["s"].reshape(1, -1).astype(jnp.float32),
        row(bq["fc1"]["b"]).astype(jnp.float32),
    ]

    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [rep(w.shape) for w in weights]

    hidden = bq["fc0"]["q"].shape[1]
    flops = 2 * b * n * d * (3 * d + d + 2 * hidden) + 4 * b * n * n * d
    common = dict(
        grid=(b,),
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
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


# ---------------------------------------------------------------------------
# Pure-XLA twin: the EXACT same quantized math (for parity tests and as the
# off-TPU execution path)
# ---------------------------------------------------------------------------

def xla_int8_block(x: jax.Array, bq: dict, n_heads: int, n_real: int,
                   eps: float = 1e-6, key_mask=None) -> jax.Array:
    """Reference implementation of the int8 block (same math, plain XLA)."""
    b, n, d = x.shape
    hd = d // n_heads
    scale = hd ** -0.5
    x0 = x.astype(jnp.float32)

    def ln(v, p):
        mean = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v - mean), axis=-1, keepdims=True)
        return ((v - mean) * jax.lax.rsqrt(var + eps)
                * p["scale"].astype(jnp.float32)
                + p["bias"].astype(jnp.float32))

    def qdot(h, m):
        return jax.vmap(lambda hh: _qdot(hh, m["q"],
                                         m["s"].reshape(1, -1)
                                         .astype(jnp.float32)))(h)

    h = ln(x0, bq["norm1"])
    qkv = (qdot(h, bq["qkv"]) + bq["qkv"]["b"].astype(jnp.float32)
           ).astype(jnp.bfloat16)

    key_ok = (jnp.arange(n) < n_real)[None, None, :]       # [1, 1, N]
    if key_mask is not None:
        key_ok = key_ok & key_mask[:, None, :]
    q, k, v = [t.reshape(b, n, n_heads, hd).transpose(0, 2, 1, 3)
               for t in jnp.split(qkv, 3, axis=-1)]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = jnp.where(key_ok[:, :, None, :], s, -1e30)   # [B|1, 1, 1, N]
    p = jax.nn.softmax(s, axis=-1)
    attn = jnp.einsum("bhnm,bhmd->bhnd", p.astype(jnp.bfloat16), v,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d)

    y = qdot(attn.astype(jnp.float32), bq["proj"])
    x1 = x0 + y + bq["proj"]["b"].astype(jnp.float32)

    h2 = ln(x1, bq["norm2"])
    hid = qdot(h2, bq["fc0"]) + bq["fc0"]["b"].astype(jnp.float32)
    hid = 0.5 * hid * (1.0 + jnp.tanh(
        0.7978845608028654 * (hid + 0.044715 * hid ** 3)))
    out = qdot(hid, bq["fc1"])
    x2 = x1 + out + bq["fc1"]["b"].astype(jnp.float32)
    return x2.astype(x.dtype)
