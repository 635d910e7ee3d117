"""Fused 255-threshold F-measure sweep accumulators (Pallas/TPU).

The evaluator's F-max needs, per mask, ``tp[t] = |{pred > t/255} ∩ gt|``
and ``cnt[t] = |{pred > t/255}|`` for t in 0..254 (ref
``metrics/f_measure.py:62-80``; our dense XLA formulation in
``metrics.batched.rect_metrics``).  On the canvas eval path that XLA
chain materializes [255, H, W] boolean slabs in HBM three times per mask
— the bandwidth-bound tail that scales linearly with batch
(VERDICT r3 weak item 3).  This kernel reads every canvas pixel ONCE and
keeps the 255 accumulators VMEM-resident across the row-chunk grid, so
the sweep costs ~compare+add per threshold-pixel on the VPU and ~one
HBM pass over the selected masks.

Measured on v5e (400 px canvas, within-session A/B, cached compiles):
the kernel wins only above a total-pixel crossover — B=32 batches run
116.4 vs 125.0 ms (−7 %), while at B=16 the dense formulation still
wins (53.2 vs 56.3 ms): below ~4 M canvas pixels XLA's fused
compare/reduce chain stays cache-friendly and the kernel's fixed VPU
sweep cost dominates.  ``fmax_tp_cnt`` therefore self-selects by
``B*H*W`` (``_MIN_PIXELS``, env ``SOD_FSWEEP_MIN_PIXELS``; a chunk that
tiles H exactly matters — the first cut's 128-row chunk padded 400 →
512 rows and lost its B=32 edge to 28 % wasted sweep work).

Counts are integer-exact (f32 accumulation of 0/1 over <2^24 pixels), so
the F-max computed from them is bit-equal to the dense sweep.

Inputs are masked by per-image valid rectangles (``rowv``/``colv``), the
same masked-reduction semantics as ``rect_metrics``.

Block-mapping note (Mosaic requires every block's last two dims to be
(8k, 128k) or equal to the array dims): the mask dimension M lives
INSIDE each program (M is 2 on the eval path — selected + upper-bound),
so the [B, M, n_thr] output block covers the full (M, n_thr) trailing
dims; rowv ships as [B, H, 1] and colv as [B, 1, W] so their trailing
block dims are legal without in-kernel transposes.
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

#: canvas rows per program  (see module docstring) — bounds the per-program pixel tile; the
#: [_SUB, W, n_thr] compare slabs below stay ~3 MB at a 400-px canvas
_ROW_CHUNK = 128
_SUB = 8


def _sweep_kernel(pm_ref, gt_ref, rv_ref, cv_ref, tp_ref, cnt_ref, *,
                  n_thr: int):
    j = pl.program_id(1)
    gt = gt_ref[0].astype(jnp.float32)                     # [C, W]
    c, w = gt.shape
    valid = (rv_ref[0] > 0) & (cv_ref[0] > 0)              # [C,1]&[1,W]
    gtb = (gt > 0) & valid
    thr = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_thr), 2)
           .astype(jnp.float32) / n_thr)                   # t/255
    m = pm_ref.shape[1]
    tps, cnts = [], []
    for kk in range(m):                                    # M=2: static
        pm = pm_ref[0, kk].astype(jnp.float32)             # [C, W]
        # sentinel -1: never exceeds any threshold (thresholds >= 0), so
        # the masked compares reduce to plain ``>`` sweeps.  Two compares
        # per threshold-pixel on the VPU, summed over the [S, W] pixel
        # dims of each sub-slab with the [n_thr] lanes kept minor.
        # (Mosaic restructure attempts that measured/compiled worse: a
        # single-compare variant needs a bool minor-dim broadcast it
        # refuses to lower, and riding the reduction on the MXU needs a
        # [S, W] -> [1, S*W] shape cast it rejects — both 2026-08-17.)
        pm_tp = jnp.where(gtb, pm, -1.0)
        pm_cnt = jnp.where(valid, pm, -1.0)
        tp = jnp.zeros((n_thr,), jnp.float32)
        cnt = jnp.zeros((n_thr,), jnp.float32)
        for r0 in range(0, c, _SUB):                       # static unroll
            a = pm_tp[r0:r0 + _SUB][:, :, None] > thr      # [S, W, T]
            b2 = pm_cnt[r0:r0 + _SUB][:, :, None] > thr
            tp = tp + jnp.sum(a.astype(jnp.float32), axis=(0, 1))
            cnt = cnt + jnp.sum(b2.astype(jnp.float32), axis=(0, 1))
        cnts.append(cnt)
        tps.append(tp)
    tp_all = jnp.stack(tps)                                # [M, T]
    cnt_all = jnp.stack(cnts)

    @pl.when(j == 0)
    def _init():
        tp_ref[0] = tp_all
        cnt_ref[0] = cnt_all

    @pl.when(j != 0)
    def _acc():
        tp_ref[0] += tp_all
        cnt_ref[0] += cnt_all


def _tp_cnt_pallas(masks, gt, rowv, colv, n_thr, interpret=False):
    b, m, h, w = masks.shape
    c = min(_ROW_CHUNK, h)
    # prefer the largest multiple-of-8 chunk <= _ROW_CHUNK that tiles H
    # exactly: the 128-row chunk pads the 400-row canvas to 512 — 28 %
    # of the sweep work done on rows the row-valid mask zeroes anyway
    # (chunk 80 tiles 400 in 5; 512-canvas keeps 128)
    for cand in range(min(_ROW_CHUNK, h) // 8 * 8, 7, -8):
        if h % cand == 0:
            c = cand
            break
    h_pad = -(-h // c) * c
    if h_pad != h:
        masks = jnp.pad(masks, ((0, 0), (0, 0), (0, h_pad - h), (0, 0)))
        gt = jnp.pad(gt, ((0, 0), (0, h_pad - h), (0, 0)))
        rowv = jnp.pad(rowv, ((0, 0), (0, h_pad - h)))     # False rows
    rowv = rowv.astype(jnp.int32)[:, :, None]              # [B, H, 1]
    colv = colv.astype(jnp.int32)[:, None, :]              # [B, 1, W]
    grid = (b, h_pad // c)
    out = pl.pallas_call(
        functools.partial(_sweep_kernel, n_thr=n_thr),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m, c, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m, n_thr), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, n_thr), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, m, n_thr), jnp.float32),
                   jax.ShapeDtypeStruct((b, m, n_thr), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * m * h_pad * w * n_thr,
            bytes_accessed=4 * b * m * h_pad * w + 4 * b * h_pad * w,
            transcendentals=0),
        interpret=interpret,
    )(masks.astype(jnp.float32), gt.astype(jnp.float32), rowv, colv)
    return out[0], out[1]


#: total canvas pixels (B*H*W) above which the Pallas sweep beats the
#: dense XLA formulation on v5e (measured crossover, 400 px canvas:
#: dense wins B=16 / 2.56 M px 53.2 vs 56.3 ms, the kernel wins B=32 /
#: 5.12 M px 116.4 vs 125.0 ms — below the threshold the dense sweep's
#: slabs still ride the cache/fusion sweet spot, above it the kernel's
#: single HBM pass wins; docs/PERFORMANCE.md "Round-4 eval metric tail")
_MIN_PIXELS = 4_000_000


def sweep_available(n_pixels: int = None) -> bool:
    import os

    if not _HAS_PLTPU or os.environ.get("SOD_NO_FSWEEP"):  # A/B lever
        return False
    if n_pixels is not None:
        min_px = int(os.environ.get("SOD_FSWEEP_MIN_PIXELS", _MIN_PIXELS))
        if n_pixels < min_px:
            return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def fmax_tp_cnt(masks: jax.Array, gt: jax.Array, rowv: jax.Array,
                colv: jax.Array, n_thr: int = 255,
                interpret: bool = False):
    """Threshold-sweep accumulators for a batch of selected masks.

    :param masks: [B, M, H, W] float canvas masks (M = e.g. selected+UB).
    :param gt: [B, H, W] canvas GT (binarized at > 0).
    :param rowv: [B, H] bool — row < true image height.
    :param colv: [B, W] bool — col < true image width.
    :return: (tp, cnt) each [B, M, n_thr] f32, integer-exact counts equal
        to the dense ``rect_metrics`` sweep.
    """
    b, _, h, w = masks.shape
    if interpret or sweep_available(n_pixels=b * h * w):
        return _tp_cnt_pallas(masks, gt, rowv, colv, n_thr,
                              interpret=interpret)
    # XLA twin (CPU tests / non-TPU): scan over thresholds keeps the
    # memory profile at one [B, M, H, W] slab per step, identical counts
    valid = (rowv[:, None, :, None] & colv[:, None, None, :])
    gtb = (gt[:, None] > 0) & valid
    pm_tp = jnp.where(gtb, masks, -1.0)
    pm_cnt = jnp.where(valid, masks, -1.0)
    thr = jnp.arange(n_thr, dtype=jnp.float32) / n_thr

    def one(_, t):
        tp = jnp.sum(pm_tp > t, axis=(2, 3)).astype(jnp.float32)
        cnt = jnp.sum(pm_cnt > t, axis=(2, 3)).astype(jnp.float32)
        return None, (tp, cnt)

    _, (tp, cnt) = jax.lax.scan(one, None, thr)
    return (jnp.moveaxis(tp, 0, -1), jnp.moveaxis(cnt, 0, -1))
