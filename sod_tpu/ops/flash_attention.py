"""Fused attention kernel for the ViT encoder (Pallas/TPU).

Replaces the reference's materialised ``softmax(QK^T)V`` (ref
``networks/vision_transformer.py:110-133``) with a Pallas kernel that keeps
the [N, N] score matrix in VMEM — for ViT-S/8 at 224px (N = 785 tokens,
64-dim heads) the scores never touch HBM, saving ~2x B x H x N^2 x 4B of
HBM traffic per block vs the XLA fallback (measured 1.3x faster in bf16 on
v5e at ViT-S/8 shapes).

Design notes (see /opt/skills/guides/pallas_guide.md):

* grid = (batch*heads, query blocks); each program computes one 256-row
  query block against the full key/value slab for its (batch, head) — at
  ViT sequence lengths the K/V slab (<= ~230 KB fp32) fits VMEM easily, so
  no online-softmax streaming is needed; scores stay in VMEM.
* sequence is padded to a multiple of the query block; padded KEYS are
  masked to -inf before the softmax (padded queries produce garbage rows
  that the wrapper slices off).
* an optional per-image token validity mask [B, N] supports the
  fixed-canvas variable-resolution evaluation path: canvas-padding tokens
  are excluded as keys exactly like sequence padding.
* both matmuls request fp32 accumulation (``preferred_element_type``).
* backward is a custom VJP that recomputes the probabilities with XLA
  einsums (flash-style rematerialisation: saves memory, costs one extra
  QK^T) — exact standard softmax-attention gradients.

The public entry ``flash_attention(q, k, v, scale, key_mask=None)`` takes
[B, H, N, d] and transparently falls back to the XLA path on non-TPU
backends.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU test machines
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_BLOCK_Q = 256  # best measured on v5e for ViT-S shapes


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_real: int):
    q = q_ref[0]                                   # [Bq, d]
    k = k_ref[0]                                   # [Nk, d]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [Bq, Nk]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_real, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _fwd_kernel_masked(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                       scale: float, n_real: int):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    valid = (col < n_real) & (mask_ref[0, 0][None, :] > 0)
    s = jnp.where(valid, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_forward(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                   key_mask: Optional[jax.Array] = None,
                   interpret: bool = False) -> jax.Array:
    b, h, n, d = q.shape
    n_pad = _ceil_to(n, _BLOCK_Q)
    bh = b * h

    def prep(x):
        x = x.reshape(bh, n, d)
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        return x

    qp, kp, vp = prep(q), prep(k), prep(v)
    grid = (bh, n_pad // _BLOCK_Q)

    cost = pl.CostEstimate(
        flops=4 * bh * n_pad * n_pad * d,
        bytes_accessed=4 * bh * n_pad * d * q.dtype.itemsize,
        transcendentals=bh * n_pad * n_pad,
    )
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec((1, _BLOCK_Q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )
    qkv_specs = [
        pl.BlockSpec((1, _BLOCK_Q, d), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_pad, d), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    if key_mask is None:
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, scale=scale, n_real=n),
            in_specs=qkv_specs, **common)(qp, kp, vp)
    else:
        mask = key_mask.astype(jnp.int32)
        if n_pad != n:
            mask = jnp.pad(mask, ((0, 0), (0, n_pad - n)))
        # Mosaic needs the last two block dims divisible by (8, 128) or
        # equal to the array dims -> carry the mask as [B, 1, n_pad]
        mask = mask[:, None, :]
        mask_spec = pl.BlockSpec((1, 1, n_pad), lambda i, j: (i // h, 0, 0),
                                 memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_masked, scale=scale, n_real=n),
            in_specs=qkv_specs + [mask_spec], **common)(qp, kp, vp, mask)
    return out[:, :n].reshape(b, h, n, d)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float, n_real: int):
    """Whole-N attention backward for one (batch, head) program.

    Recomputes the probabilities and produces dq/dk/dv with every [N, N]
    slab living in VMEM — the XLA backward materialises ``p`` and ``ds``
    ([B, H, N, N] f32) in HBM, which dominated the train step's backward
    time.  Padded q rows carry zero ``do`` so their contributions vanish;
    padded key columns are masked out of the softmax.
    """
    q = q_ref[0]                                   # [N, d] bf16
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [N, N]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_real, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    pc = p.astype(q.dtype)
    dv = jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dsc = ds.astype(q.dtype)
    dq = jnp.dot(dsc, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(dsc, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


#: whole-N backward keeps ~4 f32 [N, N] slabs in VMEM; 1536² x 4 x 4B
#: = 38 MB stays comfortably under the 100 MB budget
_BWD_MAX_N = 1536


def _flash_backward(q, k, v, do, scale, interpret: bool = False):
    b, h, n, d = q.shape
    n_pad = _ceil_to(n, 128)
    bh = b * h

    def prep(x):
        x = x.reshape(bh, n, d)
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        return x

    qp, kp, vp, dop = prep(q), prep(k), prep(v), prep(do.astype(q.dtype))
    spec = pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype)
    cost = pl.CostEstimate(
        flops=10 * bh * n_pad * n_pad * d,
        bytes_accessed=7 * bh * n_pad * d * q.dtype.itemsize,
        transcendentals=bh * n_pad * n_pad,
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_real=n),
        grid=(bh,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[shape] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=cost,
        interpret=interpret,
    )(qp, kp, vp, dop)
    post = lambda x: x[:, :n].reshape(b, h, n, d)
    return post(dq), post(dk), post(dv)


def _xla_attention(q, k, v, scale, key_mask=None):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.lru_cache(maxsize=1)
def _use_pallas() -> bool:
    if not _HAS_PLTPU:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _dispatch(q, k, v, scale, key_mask):
    if _use_pallas():
        return _flash_forward(q, k, v, scale, key_mask)
    return _xla_attention(q, k, v, scale, key_mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                    key_mask: Optional[jax.Array] = None) -> jax.Array:
    """softmax(q k^T * scale) v over [B, H, N, d], optional key mask [B, N]."""
    return _dispatch(q, k, v, scale, key_mask)


def _fwd(q, k, v, scale, key_mask):
    out = _dispatch(q, k, v, scale, key_mask)
    return out, (q, k, v, key_mask)


def _bwd(scale, res, g):
    q, k, v, key_mask = res
    if (_use_pallas() and key_mask is None
            and _ceil_to(q.shape[2], 128) <= _BWD_MAX_N):
        dq, dk, dv = _flash_backward(q, k, v, g, scale)
        return dq, dk, dv, None
    # recompute probabilities (flash-style remat); the softmax itself stays
    # fp32, the big matmuls run in the inputs' (bf16) dtype with fp32
    # accumulation — standard mixed-precision attention backward
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    pc = p.astype(q.dtype)
    gc = g.astype(q.dtype)
    dv = jnp.einsum("bhqk,bhqd->bhkd", pc, gc,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gc, v,
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsc = ds.astype(q.dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", dsc, k,
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", dsc, q,
                    preferred_element_type=jnp.float32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


flash_attention.defvjp(_fwd, _bwd)
