"""Fused LayerNorm -> QKV -> multi-head self-attention -> output projection
-> +residual (Pallas/TPU) — the attention half of a ViT encoder block, with
a Pallas kernel in BOTH directions.

Round 2 measured the train step at ~24 % MFU with the backward as its
dominant cost: the ``use_fused_train`` path ran a fused *forward* but its
VJP recomputed the block through per-op XLA glue (LN fwd/bwd, qkv matmul
fwd/bwd, proj bwd as separate HLOs, each with an HBM round trip) around the
flash-attention backward.  This kernel closes that gap: the backward is ONE
program per image that recomputes LN/QKV/probabilities in VMEM and emits
dx plus every weight gradient, accumulated across the batch grid exactly
like ``ops.fused_mlp``'s backward.  Composed with ``fused_ln_mlp`` the
whole train-mode encoder block is Pallas forward and backward.

Semantics (bit-comparable to the unfused block half at bf16 tolerance):

* LayerNorm in f32, matmuls in bf16 with f32 accumulation;
* tokens padded to a 128 multiple; padded KEYS are masked from the softmax
  (``n_real``); padded q rows carry zero upstream gradient so their
  contributions to weight grads vanish identically;
* weights in the (in, out) layout of ``sod_tpu.ops.layers``.

Reference: the attention half of ``networks/vision_transformer.py:136-170``
(Block.forward) — fused here because the reference's per-op torch pipeline
has no TPU equivalent worth copying.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

#: whole-N f32 score slabs per head; 1536 matches the flash backward's cap
#: (~4 slabs x 9.4 MB under the 100 MB VMEM budget)
_MAX_N = 1536
_MAX_D = 768


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Forward kernel (one image per program)
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, ln_s, ln_b, wqkv, bqkv, wproj, bproj, o_ref, *,
                n_heads: int, n_real: int, eps: float, scale: float,
                qkv_ref=None, attn_ref=None):
    """Forward for one image.  ``qkv_ref`` (save-acts variant, wired by
    ``_fwd_kernel_save``) additionally streams the post-bias qkv (bf16)
    to HBM so the backward can skip its recompute matmul; ``attn_ref``
    (save-attn variant) streams the pre-projection attention output
    instead — 3x smaller, and it spares the backward the six
    64-wide ``p @ v`` recompute matmuls per image."""
    x = x_ref[0].astype(jnp.float32)                       # [N, D]
    n, d = x.shape
    hd = d // n_heads

    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    h = ((x - mean) * jax.lax.rsqrt(var + eps)
         * ln_s[0].astype(jnp.float32)
         + ln_b[0].astype(jnp.float32)).astype(jnp.bfloat16)
    qkv = jnp.dot(h, wqkv[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv[0].astype(jnp.float32)).astype(jnp.bfloat16)
    if qkv_ref is not None:
        qkv_ref[0] = qkv

    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    key_ok = col < n_real
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
    if attn_ref is not None:
        attn_ref[0] = attn
    y = jnp.dot(attn, wproj[:], preferred_element_type=jnp.float32)
    o_ref[0] = (x + y + bproj[0].astype(jnp.float32)).astype(o_ref.dtype)


def _fwd_kernel_save(x_ref, ln_s, ln_b, wqkv, bqkv, wproj, bproj, o_ref,
                     qkv_ref, *, n_heads: int, n_real: int, eps: float,
                     scale: float):
    _fwd_kernel(x_ref, ln_s, ln_b, wqkv, bqkv, wproj, bproj, o_ref,
                n_heads=n_heads, n_real=n_real, eps=eps, scale=scale,
                qkv_ref=qkv_ref)


def _fwd_kernel_save_attn(x_ref, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                          o_ref, attn_ref, *, n_heads: int, n_real: int,
                          eps: float, scale: float):
    _fwd_kernel(x_ref, ln_s, ln_b, wqkv, bqkv, wproj, bproj, o_ref,
                n_heads=n_heads, n_real=n_real, eps=eps, scale=scale,
                attn_ref=attn_ref)


def _fwd_pallas(x, weights, n_heads, n_real, eps, scale,
                interpret=False, want=None):
    """``want``: None | "qkv" | "attn" — stream an extra activation slab
    to HBM for the backward (see the kernel docstring)."""
    b, n, d = x.shape
    weights = [w.astype(jnp.bfloat16) for w in weights]
    rep = lambda w: pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                 memory_space=pltpu.VMEM)
    img = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    img3 = pl.BlockSpec((1, n, 3 * d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    if want == "qkv":
        kernel, extra_spec = _fwd_kernel_save, img3
        extra_shape = jax.ShapeDtypeStruct((b, n, 3 * d), jnp.bfloat16)
    elif want == "attn":
        kernel, extra_spec = _fwd_kernel_save_attn, img
        extra_shape = jax.ShapeDtypeStruct((b, n, d), jnp.bfloat16)
    else:
        kernel, extra_spec, extra_shape = _fwd_kernel, None, None
    return pl.pallas_call(
        functools.partial(kernel, n_heads=n_heads, n_real=n_real,
                          eps=eps, scale=scale),
        grid=(b,),
        in_specs=[img] + [rep(w) for w in weights],
        out_specs=[img, extra_spec] if want else img,
        out_shape=([jax.ShapeDtypeStruct((b, n, d), x.dtype), extra_shape]
                   if want else
                   jax.ShapeDtypeStruct((b, n, d), x.dtype)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d * 4 * d + 4 * b * n * n * d,
            bytes_accessed=2 * b * n * d * 2,
            transcendentals=b * n * n),
        interpret=interpret,
    )(x, *weights)


# ---------------------------------------------------------------------------
# Backward kernel (one image per program; weight grads accumulate across
# the batch grid — constant-index output blocks stay VMEM resident)
# ---------------------------------------------------------------------------

#: q-row chunk for the backward's score slabs — bounds the transient
#: [CHUNK, N] f32 buffers against XLA's scoped-VMEM budget.  History of
#: measured policies (all at ViT-S/8 224px, n=896 padded): r3 shipped 256
#: (512 failed the B>=64 16.00 MB default budget); r4 first widened to 512
#: at B<=32 (430 -> 440 img/s), then found the real fix — raise the
#: per-compile scoped limit (``train.step._jit_train`` sets 32 MB for the
#: fused-train jit) and run the score slab MONOLITHIC (one chunk = the
#: whole padded token count).  One uniform (896, 32 MB) policy measured
#: 456/428/381 img/s at B=32/16/8 and 450/447/416 at B=48/64/128 (vs
#: 449/418/375 and 439/436/404 for the per-batch chunk policy it
#: replaces); 48 MB budgets scheduled WORSE at B=48 (441).  The chunk is
#: clamped to n, so n>896 shapes (not a supported train resolution) fall
#: back to 896-row slabs.  SOD_BWD_CHUNK overrides (pair it with
#: SOD_SCOPED_VMEM_KIB when shrinking the budget).
_BWD_CHUNK = 896


def _bwd_kernel(x_ref, g_ref, ln_s, ln_b, wqkv, bqkv, wproj,
                dx_ref, dls_ref, dlb_ref, dwqkv_ref, dbqkv_ref,
                dwproj_ref, dbproj_ref, dqkv_s, attn_s, *,
                n_heads: int, n_real: int, eps: float, scale: float,
                qkv_ref=None, attn_in=None, chunk_size: int = _BWD_CHUNK):
    """Backward for one image.  ``qkv_ref`` (saved-activation variant,
    wired by ``_bwd_kernel_saved``) skips the [N, D] x [D, 3D] qkv
    recompute matmul; LN is still recomputed (VPU-only) because ``h``
    feeds the weight gradients.  ``attn_in`` (save-attn variant) is the
    forward-streamed pre-projection attention output — the per-chunk
    ``p @ v`` recompute (six 64-wide matmuls per image) is skipped and
    dWproj contracts the saved slab directly.

    Weight grads / dh run as FULL-WIDTH matmuls over the [N, 3D] bf16
    ``dqkv_s`` and [N, D] ``attn_s`` scratch slabs (round 4): the round-3
    per-head formulation emitted 18 dW, 18 dh and 6 dWproj matmuls per
    image with a 64-wide M/K/N dimension — each at ~half MXU utilization
    against the 128-lane tile.  Assembling dq/dk/dv (and the recomputed
    attention output) per head and contracting once at full width runs
    the same FLOPs at full tile occupancy for ~2.75 GFLOP/img/block of
    the backward."""
    i = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)                       # [N, D]
    g = g_ref[0].astype(jnp.float32)                       # [N, D] (padded
    n, d = x.shape                                         #  rows are zero)
    hd = d // n_heads
    s_ln = ln_s[0].astype(jnp.float32)

    # ---- recompute forward intermediates in VMEM ----
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * inv
    h = (xhat * s_ln + ln_b[0].astype(jnp.float32)).astype(jnp.bfloat16)
    if qkv_ref is not None:
        qkv = qkv_ref[0]                                   # saved (bf16)
    else:
        qkv = jnp.dot(h, wqkv[:], preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv[0].astype(jnp.float32)).astype(jnp.bfloat16)

    gc = g.astype(jnp.bfloat16)
    # dattn = g @ Wproj^T
    dattn = jax.lax.dot_general(gc, wproj[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)     # [N, D]

    first = i == 0
    chunk = min(chunk_size, n)
    key_row = (jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) < n_real)
    for hi in range(n_heads):                              # static unroll
        q = qkv[:, hi * hd:(hi + 1) * hd]
        k = qkv[:, d + hi * hd:d + (hi + 1) * hd]
        v = qkv[:, 2 * d + hi * hd:2 * d + (hi + 1) * hd]
        do = dattn[:, hi * hd:(hi + 1) * hd]
        dk = jnp.zeros((n, hd), jnp.float32)
        dv = jnp.zeros((n, hd), jnp.float32)
        dbq = jnp.zeros((1, hd), jnp.float32)
        for c0 in range(0, n, chunk):                      # q-row chunks
            qc = q[c0:c0 + chunk]
            doc = do[c0:c0 + chunk]
            s = jax.lax.dot_general(
                qc, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale    # [C, N]
            s = jnp.where(key_row, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            pc = p.astype(jnp.bfloat16)
            if attn_in is None:
                attn_s[c0:c0 + chunk, hi * hd:(hi + 1) * hd] = (
                    jnp.dot(pc, v, preferred_element_type=jnp.float32)
                    .astype(jnp.bfloat16))
            dv = dv + jax.lax.dot_general(
                pc, doc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                doc, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # [C, N]
            ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                  ) * scale
            dsc = ds.astype(jnp.bfloat16)
            # bf16: dq only feeds bf16 matmuls downstream; halving it
            # keeps the kernel under the 16.00 MB scoped budget of the
            # B>=64 step (measured 16.12 MB with f32 chunks)
            dq_c = (jnp.dot(dsc, k, preferred_element_type=jnp.float32)
                    .astype(jnp.bfloat16))
            dqkv_s[c0:c0 + chunk, hi * hd:(hi + 1) * hd] = dq_c
            dbq = dbq + jnp.sum(dq_c.astype(jnp.float32), axis=0,
                                keepdims=True)
            dk = dk + jax.lax.dot_general(
                dsc, qc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dqkv_s[:, d + hi * hd:d + (hi + 1) * hd] = dk.astype(jnp.bfloat16)
        dqkv_s[:, 2 * d + hi * hd:2 * d + (hi + 1) * hd] = (
            dv.astype(jnp.bfloat16))
        # bias grads keep the round-3 precision (f32 dk/dv, bf16 dq) —
        # only the matmul operands go through the bf16 scratch
        for db, off in ((dbq, hi * hd),
                        (jnp.sum(dk, axis=0, keepdims=True), d + hi * hd),
                        (jnp.sum(dv, axis=0, keepdims=True),
                         2 * d + hi * hd)):
            sl = slice(off, off + hd)

            @pl.when(first)
            def _(db=db, sl=sl):
                dbqkv_ref[:, sl] = db

            @pl.when(jnp.logical_not(first))
            def _(db=db, sl=sl):
                dbqkv_ref[:, sl] += db

    # ---- full-width weight grads + dh (one matmul each) ----
    dqkv_all = dqkv_s[:]                                   # [N, 3D] bf16
    attn_slab = attn_s[:] if attn_in is None else attn_in[0]
    dwp = jax.lax.dot_general(attn_slab, gc, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # [D, D]
    dw = jax.lax.dot_general(h, dqkv_all, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)   # [D, 3D]
    dh = jax.lax.dot_general(dqkv_all, wqkv[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)   # [N, D]

    @pl.when(first)
    def _set_w():
        dwqkv_ref[:] = dw
        dwproj_ref[:] = dwp

    @pl.when(jnp.logical_not(first))
    def _acc_w():
        dwqkv_ref[:] += dw
        dwproj_ref[:] += dwp

    dbproj = jnp.sum(g, axis=0, keepdims=True)

    # LayerNorm backward (+ residual)
    dls = jnp.sum(dh * xhat, axis=0, keepdims=True)
    dlb = jnp.sum(dh, axis=0, keepdims=True)
    dxhat = dh * s_ln
    dx = g + inv * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                    - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(first)
    def _init():
        dls_ref[:] = dls
        dlb_ref[:] = dlb
        dbproj_ref[:] = dbproj

    @pl.when(jnp.logical_not(first))
    def _acc():
        dls_ref[:] += dls
        dlb_ref[:] += dlb
        dbproj_ref[:] += dbproj


def _bwd_kernel_saved(x_ref, g_ref, qkv_ref, ln_s, ln_b, wqkv, bqkv,
                      wproj, dx_ref, dls_ref, dlb_ref, dwqkv_ref,
                      dbqkv_ref, dwproj_ref, dbproj_ref, dqkv_s, attn_s, *,
                      n_heads: int, n_real: int, eps: float, scale: float):
    _bwd_kernel(x_ref, g_ref, ln_s, ln_b, wqkv, bqkv, wproj,
                dx_ref, dls_ref, dlb_ref, dwqkv_ref, dbqkv_ref,
                dwproj_ref, dbproj_ref, dqkv_s, attn_s,
                n_heads=n_heads, n_real=n_real,
                eps=eps, scale=scale, qkv_ref=qkv_ref,
                # the saved-qkv input block costs ~4 MB of double-buffered
                # VMEM; halving the score-slab chunk pays for it under the
                # 16.00 MB scoped budget (measured 17.45 MB at chunk 256)
                chunk_size=128)


def _bwd_kernel_attn(x_ref, g_ref, attn_ref, ln_s, ln_b, wqkv, bqkv,
                     wproj, dx_ref, dls_ref, dlb_ref, dwqkv_ref,
                     dbqkv_ref, dwproj_ref, dbproj_ref, dqkv_s, *,
                     n_heads: int, n_real: int, eps: float, scale: float,
                     chunk_size: int):
    _bwd_kernel(x_ref, g_ref, ln_s, ln_b, wqkv, bqkv, wproj,
                dx_ref, dls_ref, dlb_ref, dwqkv_ref, dbqkv_ref,
                dwproj_ref, dbproj_ref, dqkv_s, None,
                n_heads=n_heads, n_real=n_real, eps=eps, scale=scale,
                attn_in=attn_ref, chunk_size=chunk_size)


def _bwd_pallas(x, g, weights, n_heads, n_real, eps, scale,
                interpret=False, qkv_saved=None, attn_saved=None):
    b, n, d = x.shape
    weights = [w.astype(jnp.bfloat16) for w in weights]
    ln_s, ln_b, wqkv, bqkv, wproj, _bproj = weights
    rep = lambda w: pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                 memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    img = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    img3 = pl.BlockSpec((1, n, 3 * d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_specs = [img, acc((1, d)), acc((1, d)), acc((d, 3 * d)),
                 acc((1, 3 * d)), acc((d, d)), acc((1, d))]
    out_shape = [jax.ShapeDtypeStruct((b, n, d), x.dtype),
                 jax.ShapeDtypeStruct((1, d), f32),
                 jax.ShapeDtypeStruct((1, d), f32),
                 jax.ShapeDtypeStruct((d, 3 * d), f32),
                 jax.ShapeDtypeStruct((1, 3 * d), f32),
                 jax.ShapeDtypeStruct((d, d), f32),
                 jax.ShapeDtypeStruct((1, d), f32)]
    import os

    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    cost = pl.CostEstimate(
        flops=3 * (2 * b * n * d * 4 * d + 4 * b * n * n * d),
        bytes_accessed=4 * b * n * d * 2,
        transcendentals=b * n * n)
    # full-width weight-grad slabs: dq/dk/dv assembled (bf16) then
    # contracted once against h / wqkv at full MXU tile occupancy
    scratch = [pltpu.VMEM((n, 3 * d), jnp.bfloat16),
               pltpu.VMEM((n, d), jnp.bfloat16)]
    chunk_size = int(os.environ.get("SOD_BWD_CHUNK", _BWD_CHUNK))
    if attn_saved is not None:
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel_attn, n_heads=n_heads,
                              n_real=n_real, eps=eps, scale=scale,
                              chunk_size=chunk_size),
            grid=(b,),
            in_specs=[img, img, img, rep(ln_s), rep(ln_b), rep(wqkv),
                      rep(bqkv), rep(wproj)],
            out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=scratch[:1],        # no attn scratch needed
            compiler_params=cp, cost_estimate=cost, interpret=interpret,
        )(x, g, attn_saved, ln_s, ln_b, wqkv, bqkv, wproj)
    elif qkv_saved is not None:
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel_saved, n_heads=n_heads,
                              n_real=n_real, eps=eps, scale=scale),
            grid=(b,),
            in_specs=[img, img, img3, rep(ln_s), rep(ln_b), rep(wqkv),
                      rep(bqkv), rep(wproj)],
            out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=cp, cost_estimate=cost, interpret=interpret,
        )(x, g, qkv_saved, ln_s, ln_b, wqkv, bqkv, wproj)
    else:
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel, n_heads=n_heads, n_real=n_real,
                              eps=eps, scale=scale, chunk_size=chunk_size),
            grid=(b,),
            in_specs=[img, img, rep(ln_s), rep(ln_b), rep(wqkv),
                      rep(bqkv), rep(wproj)],
            out_specs=out_specs, out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=cp, cost_estimate=cost, interpret=interpret,
        )(x, g, ln_s, ln_b, wqkv, bqkv, wproj)
    return outs            # dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj


# ---------------------------------------------------------------------------
# Large-N / any-d forward: a REAL grid instead of unrolled chunks
# (VERDICT r2 item 2 — the whole-block kernel's Python-unrolled chunk x head
# segments blew Mosaic compile past 25 min at canvas scale and its VMEM
# footprint locked out d=768).  Two gridded kernels:
#   1. LN + QKV projection — row-parallel, any token count;
#   2. attention + output projection + residual — grid (B, q-chunks); the
#      [N, 3D] qkv slab stays VMEM-resident across a batch row's chunk
#      iterations (constant index map), each program computes one q-chunk
#      for all heads.
# Compile time is bounded (ONE chunk body, heads unrolled once) at any N,
# and per-program VMEM stays ~12 MB at 400 px canvas scale.
# ---------------------------------------------------------------------------

def _large_chunk(d: int) -> int:
    """q-row chunk for the gridded inference pipeline, by model width.

    Measured on v5e: 512 is +1.4 % at d=384 canvas scale in paired
    back-to-back A/B (296.1 vs 291.9 and 297.1 vs 292.9 img/s eval-step
    — consistent direction, though within session-to-session noise) but
    REGRESSES d=768 hard (ViT-B B=64: 1793 vs 2567/2582 img/s — the
    per-program qkv rows triple in bytes and scheduling collapses), so
    the default is width-dependent.  SOD_LARGE_CHUNK overrides both.
    """
    return int(os.environ.get("SOD_LARGE_CHUNK", 512 if d <= 512 else 256))


def _ln_qkv_kernel(x_ref, ln_s, ln_b, wqkv, bqkv, o_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)                       # [C, D]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    h = ((x - mean) * jax.lax.rsqrt(var + eps)
         * ln_s[0].astype(jnp.float32)
         + ln_b[0].astype(jnp.float32)).astype(jnp.bfloat16)
    qkv = jnp.dot(h, wqkv[:], preferred_element_type=jnp.float32)
    o_ref[0] = (qkv + bqkv[0].astype(jnp.float32)).astype(o_ref.dtype)


def _attn_proj_kernel(x_ref, qkvc_ref, qkv_ref, wproj, bproj, o_ref, *,
                      n_heads: int, n_real: int, scale: float,
                      mask_ref=None):
    xc = x_ref[0].astype(jnp.float32)                      # [C, D]
    qkv = qkv_ref[0]                                       # [N, 3D] bf16
    qkvc = qkvc_ref[0]                                     # [C, 3D] (this
    n, d3 = qkv.shape                                      #  program's rows)
    d = d3 // 3
    hd = d // n_heads

    key_row = (jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) < n_real)
    if mask_ref is not None:
        key_row = key_row & (mask_ref[0, 0][None, :] > 0)
    heads = []
    for hi in range(n_heads):                              # static unroll
        q = qkvc[:, hi * hd:(hi + 1) * hd]
        k = qkv[:, d + hi * hd:d + (hi + 1) * hd]
        v = qkv[:, 2 * d + hi * hd:2 * d + (hi + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(key_row, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        heads.append(jnp.dot(p.astype(jnp.bfloat16), v,
                             preferred_element_type=jnp.float32)
                     .astype(jnp.bfloat16))
    attn = jnp.concatenate(heads, axis=1)                  # [C, D]
    y = jnp.dot(attn, wproj[:], preferred_element_type=jnp.float32)
    o_ref[0] = (xc + y + bproj[0].astype(jnp.float32)).astype(o_ref.dtype)


def _fwd_pallas_large(x, weights, n_heads, n_real, eps, scale,
                      key_mask=None, interpret=False):
    """x: [B, N_pad, D] with N_pad a multiple of ``_large_chunk(d)``."""
    b, n, d = x.shape
    ln_s, ln_b, wqkv, bqkv, wproj, bproj = [
        w.astype(jnp.bfloat16) for w in weights]
    rep = lambda w: pl.BlockSpec(w.shape, lambda *a: (0,) * w.ndim,
                                 memory_space=pltpu.VMEM)
    c = _large_chunk(d)
    rows2 = pl.BlockSpec((1, c, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    qkv = pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=eps),
        grid=(b, n // c),
        in_specs=[rows2, rep(ln_s), rep(ln_b), rep(wqkv), rep(bqkv)],
        out_specs=pl.BlockSpec((1, c, 3 * d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, 3 * d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d * 3 * d,
            bytes_accessed=b * n * d * 2 * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, ln_s, ln_b, wqkv, bqkv)

    in_specs = [rows2,
                # the SAME qkv array twice: this program's q-rows as a
                # chunked block (Mosaic lowers no dynamic_slice on
                # values) + the full K/V slab, VMEM-resident per image
                pl.BlockSpec((1, c, 3 * d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, 3 * d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                rep(wproj), rep(bproj)]
    args = [x, qkv, qkv, wproj, bproj]
    if key_mask is not None:
        mask = key_mask.astype(jnp.int32)[:, None, :]
        in_specs.append(pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
        kernel = functools.partial(
            _attn_proj_masked_kernel, n_heads=n_heads, n_real=n_real,
            scale=scale)
    else:
        kernel = functools.partial(
            _attn_proj_kernel, n_heads=n_heads, n_real=n_real, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b, n // c),
        in_specs=in_specs,
        out_specs=rows2,
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            # chunk axis "arbitrary": the full-qkv block's index map is
            # constant along it, so the slab stays resident per image
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * n * d + 2 * b * n * d * d,
            bytes_accessed=b * n * 4 * d * 2,
            transcendentals=b * n * n),
        interpret=interpret,
    )(*args)


def _attn_proj_masked_kernel(x_ref, qkvc_ref, qkv_ref, wproj, bproj,
                             mask_ref, o_ref,
                             *, n_heads: int, n_real: int, scale: float):
    _attn_proj_kernel(x_ref, qkvc_ref, qkv_ref, wproj, bproj, o_ref,
                      n_heads=n_heads, n_real=n_real, scale=scale,
                      mask_ref=mask_ref)


def fused_ln_attn_infer(x: jax.Array, attn_params: dict, ln_params: dict,
                        n_heads: int, eps: float = 1e-6,
                        key_mask: Optional[jax.Array] = None,
                        interpret: bool = False) -> jax.Array:
    """Inference-only attention half at ANY token count / width: the
    gridded large-N pipeline above (canvas-scale eval, ViT-B).  Not
    differentiable — the train path uses :func:`fused_ln_attn`."""
    b, n, d = x.shape
    n_pad = _ceil_to(n, _large_chunk(d))
    weights = _prep_weights(attn_params, ln_params)
    if not (_available() or interpret):
        # exact-math unfused fallback (handles key_mask) off-TPU
        from sod_tpu.ops.attention import self_attention_qkv
        from sod_tpu.ops.layers import layer_norm

        return x + self_attention_qkv(
            attn_params, layer_norm(ln_params, x, eps), n_heads,
            key_mask=key_mask)
    xp = x
    km = key_mask
    if n_pad != n:
        xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        if km is not None:
            km = jnp.pad(km, ((0, 0), (0, n_pad - n)))
    scale = (d // n_heads) ** -0.5
    out = _fwd_pallas_large(xp, weights, n_heads, n, eps, scale,
                            key_mask=km, interpret=interpret)
    return out[:, :n] if n_pad != n else out


# ---------------------------------------------------------------------------
# XLA twin (fallback forward + off-TPU backward; identical math)
# ---------------------------------------------------------------------------

def _ln_f32(x, s, b, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * s + b


def _reference_forward(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, n_heads,
                       eps, n_real=None):
    """XLA twin of the kernel.  Matmul inputs follow ``x.dtype`` (bf16 in
    the train path => same precision as the kernel; f32 on CPU parity
    paths => exact unfused math), always with f32 accumulation."""
    b, n, d = x.shape
    hd = d // n_heads
    scale = hd ** -0.5
    cast = x.dtype
    xf = x.astype(jnp.float32)
    h = _ln_f32(xf, ln_s[0].astype(jnp.float32),
                ln_b[0].astype(jnp.float32), eps).astype(cast)
    qkv = jnp.dot(h, wqkv.astype(cast), preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv[0].astype(jnp.float32)).astype(cast)
    qkv = qkv.reshape(b, n, 3, n_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]                       # [B, H, N, hd]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if n_real is not None and n_real < n:
        col = jnp.arange(n)
        s = jnp.where(col[None, None, None, :] < n_real, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(cast), v,
                   preferred_element_type=jnp.float32).astype(cast)
    attn = o.transpose(0, 2, 1, 3).reshape(b, n, d)
    y = jnp.dot(attn, wproj.astype(cast),
                preferred_element_type=jnp.float32)
    return (xf + y + bproj[0].astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# custom-VJP core + public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _core(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, n_heads, eps, n_real,
          save_acts=False):
    if _available():
        scale = (x.shape[-1] // n_heads) ** -0.5
        return _fwd_pallas(x, (ln_s, ln_b, wqkv, bqkv, wproj, bproj),
                           n_heads, n_real, eps, scale)
    return _reference_forward(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj,
                              n_heads, eps, n_real=n_real)


def _core_fwd(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, n_heads, eps,
              n_real, save_acts):
    if save_acts and _available():
        # stream an activation slab out of the forward; the backward then
        # skips the matching recompute ("qkv": the [N, D] x [D, 3D]
        # matmul; "attn": the six p @ v head matmuls — see _fwd_kernel)
        scale = (x.shape[-1] // n_heads) ** -0.5
        out, extra = _fwd_pallas(
            x, (ln_s, ln_b, wqkv, bqkv, wproj, bproj), n_heads, n_real,
            eps, scale, want=("attn" if save_acts == "attn" else "qkv"))
        return out, (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, extra)
    out = _core(x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, n_heads, eps,
                n_real, save_acts)
    return out, (x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, None)


def _core_bwd(n_heads, eps, n_real, save_acts, res, g):
    import os

    x, ln_s, ln_b, wqkv, bqkv, wproj, bproj, saved = res
    if _available() and not os.environ.get("SOD_FUSED_ATTN_XLA_BWD"):
        scale = (x.shape[-1] // n_heads) ** -0.5
        qkv_saved = saved if save_acts == "qkv" else None
        attn_saved = saved if save_acts == "attn" else None
        dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = _bwd_pallas(
            x, g.astype(x.dtype), (ln_s, ln_b, wqkv, bqkv, wproj, bproj),
            n_heads, n_real, eps, scale, qkv_saved=qkv_saved,
            attn_saved=attn_saved)
        return (dx.astype(x.dtype), dls.astype(ln_s.dtype),
                dlb.astype(ln_b.dtype), dwqkv.astype(wqkv.dtype),
                dbqkv.astype(bqkv.dtype), dwproj.astype(wproj.dtype),
                dbproj.astype(bproj.dtype))
    # off-TPU: differentiate the XLA twin
    _, vjp = jax.vjp(
        lambda x_, a, b, c, d_, e, f: _reference_forward(
            x_, a, b, c, d_, e, f, n_heads, eps, n_real=n_real),
        x, ln_s, ln_b, wqkv, bqkv, wproj, bproj)
    return vjp(g.astype(x.dtype))


_core.defvjp(_core_fwd, _core_bwd)


def _prep_weights(attn_p: dict, ln_p: dict):
    """Row-reshape biases/LN params; dtypes are preserved here (the Pallas
    wrappers cast the matmul weights to bf16 inside the custom-VJP core,
    so f32 CPU-parity callers keep exact f32 math in the twin)."""
    row = lambda a: a.reshape(1, -1)
    return (row(ln_p["scale"]), row(ln_p["bias"]),
            attn_p["qkv"]["w"], row(attn_p["qkv"]["b"]),
            attn_p["proj"]["w"], row(attn_p["proj"]["b"]))


def fused_ln_attn(x: jax.Array, attn_params: dict, ln_params: dict,
                  n_heads: int, eps: float = 1e-6,
                  save_acts: bool = False,
                  save_attn: bool = False) -> jax.Array:
    """``x + proj(MHSA(LN(x)))`` with Pallas forward AND backward.

    :param x: [B, N, D] tokens.
    :param attn_params: {"qkv": {w, b}, "proj": {w, b}} ((in, out) layout).
    :param ln_params: {"scale", "bias"}.
    :param save_acts: the forward streams qkv to HBM (bf16) so the
        backward skips its recompute matmul — measured SLOWER on v5e
        (docs/PERFORMANCE.md), kept for other chips/shapes.
    :param save_attn: train fast path (round 4) — the forward streams the
        pre-projection attention output instead (3x smaller than qkv),
        sparing the backward its six 64-wide ``p @ v`` recompute matmuls
        per image.  Off by default (inference shouldn't pay the write).

    Tokens are padded to a 128 multiple internally; padded keys are masked
    and padded rows carry zero gradient.  Falls back to the identical-math
    XLA twin off-TPU or beyond the VMEM caps (N_pad > 1536 or D > 768).
    """
    b, n, d = x.shape
    n_pad = _ceil_to(n, 128)
    weights = _prep_weights(attn_params, ln_params)
    if not (_available() and n_pad <= _MAX_N and d <= _MAX_D):
        # beyond the kernel's VMEM caps (or off-TPU): the XLA twin,
        # differentiated by autodiff.  MUST bypass _core here — _core
        # re-checks only _available(), so on TPU it would re-enter the
        # Pallas kernel at exactly the shapes this guard excludes
        # (unpadded N, oversized score slabs).
        return _reference_forward(x, *weights, n_heads, eps, n_real=n)
    xp = x
    if n_pad != n:
        xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    mode = "attn" if save_attn else ("qkv" if save_acts else False)
    out = _core(xp, *weights, n_heads, eps, n, mode)
    return out[:, :n] if n_pad != n else out


def _available() -> bool:
    if not _HAS_PLTPU:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


fused_attn_available = _available
