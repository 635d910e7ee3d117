"""Batched fixed-canvas metric evaluation.

The reference evaluator computes its 7 metrics per image in a Python loop
with GPU->CPU syncs (evaluator pyc 55-99, 216-226).  Here one jit region
computes ALL metrics for a whole batch of canvas-padded images, each
restricted to its true (h, w) rectangle via masked reductions — values are
identical to slicing each image out first.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from sod_tpu.metrics.s_measure import s_measure_rect


def _rect(shape, h, w):
    H, W = shape
    return ((jnp.arange(H)[:, None] < h) & (jnp.arange(W)[None, :] < w))


def rect_metrics(pred: jax.Array, gt: jax.Array, h, w,
                 beta_square: float = 0.3, n_bins: int = 255,
                 eps: float = 1e-7, tp_cnt=None) -> Dict[str, jax.Array]:
    """All evaluator metrics for ONE canvas pair restricted to (h, w).

    :param pred: [H, W] float in [0, 1] (canvas; anything outside (h, w) is
        ignored).  :param gt: [H, W] binary.
    :param tp_cnt: optional precomputed ([n_bins], [n_bins]) threshold-
        sweep accumulators from ``ops.fsweep.fmax_tp_cnt`` (integer-exact
        == the dense sweep below, so f_max is bit-equal); the canvas
        evaluator passes them to avoid the bandwidth-bound dense sweep.
    :return: iou, pixel_acc, f_measure, f_max, f_mean, mae, s_measure.
    """
    valid = _rect(pred.shape, h, w)
    n = valid.sum().astype(jnp.float32)
    gt_b = (gt > 0) & valid
    gtf = gt_b.astype(jnp.float32)
    predv = jnp.where(valid, pred, 0.0)

    b2 = beta_square ** 2  # ref quirk: FMeasure squares beta_square again

    def prec_recall(binary):
        tp = (binary & gt_b).sum().astype(jnp.float32)
        prec = tp / (binary.sum() + eps)
        rec = tp / (gt_b.sum() + eps)
        return prec, rec

    def f(prec, rec):
        return ((1 + b2) * prec * rec) / (b2 * prec + rec + eps)

    # IoU / pixel acc / MAE (ref metrics/iou.py, pixel_acc.py, mae.py)
    pb = (pred > 0.5) & valid
    inter = (pb & gt_b).sum()
    union = (pb | gt_b).sum()
    iou = inter / (union + eps)
    pixel_acc = ((pb == gt_b) & valid).sum() / n
    mae = (jnp.abs(predv - gtf) * valid).sum() / n

    # F-measure @0.5
    f_measure = f(*prec_recall(pb))

    # F-max over 255 thresholds — dense tensorised sweep (the reference
    # loops this per image, metrics/f_measure.py:62-80).  Measured on v5e
    # at canvas scale this VPU-friendly formulation runs ~12 ms/batch;
    # histogram-scatter and sort/cumsum reformulations compile faster but
    # run 20-35x slower (TPU scatters/sorts).  The canvas evaluator
    # precomputes (tp, cnt) in ONE Pallas pass over the selected masks
    # (``ops.fsweep``) — identical integer counts, one HBM read instead
    # of three [255, H, W] slabs per mask.
    if tp_cnt is None:
        thresholds = jnp.arange(n_bins, dtype=jnp.float32) / n_bins
        binary = (predv[None] > thresholds[:, None, None]) & valid[None]
        tp = (binary & gt_b[None]).sum(axis=(-1, -2)).astype(jnp.float32)
        prec = tp / (binary.sum(axis=(-1, -2)) + eps)
    else:
        tp, cnt = tp_cnt
        prec = tp / (cnt + eps)
    rec = tp / (gt_b.sum() + eps)
    f_max = f(prec, rec).max()

    # F-mean @ adaptive 2*mean threshold (mean over the valid rect)
    adaptive = 2.0 * predv.sum() / n
    f_mean = f(*prec_recall((predv > adaptive) & valid))

    s_m = s_measure_rect(predv, gtf, h, w)

    return {"iou": iou, "pixel_acc": pixel_acc, "f_measure": f_measure,
            "f_max": f_max, "f_mean": f_mean, "mae": mae, "s_measure": s_m}


def upper_bound_index(pred_masks: jax.Array, gt: jax.Array, h, w,
                      quantity: str = "iou") -> jax.Array:
    """Best query index vs GT (ref evaluator pyc ``_get_upper_bound_mask``):
    argmax IoU@0.5 (default) / argmax f_measure or f_max / argmin MAE over
    queries.  The reference binarizes the predictions BEFORE this search
    (``__call__`` passes ``pred_masks > 0.5``, pyc 216-218), so every
    quantity — including MAE — scores the binary masks.

    :param pred_masks: [Q, H, W] canvas; gt [H, W]."""
    valid = _rect(gt.shape, h, w)
    gt_b = (gt > 0) & valid
    n = valid.sum().astype(jnp.float32)
    pb = (pred_masks > 0.5) & valid[None]
    if quantity == "iou":
        inter = (pb & gt_b[None]).sum(axis=(-1, -2))
        union = (pb | gt_b[None]).sum(axis=(-1, -2))
        return jnp.argmax(inter / (union + 1e-7))
    if quantity in ("f_measure", "f_max"):
        # on binary masks the 255-threshold f_max sweep collapses to the
        # single-threshold f_measure, so the ref accepts both spellings
        tp = (pb & gt_b[None]).sum(axis=(-1, -2)).astype(jnp.float32)
        prec = tp / (pb.sum(axis=(-1, -2)) + 1e-7)
        rec = tp / (gt_b.sum() + 1e-7)
        b2 = 0.3 ** 2
        return jnp.argmax(((1 + b2) * prec * rec) / (b2 * prec + rec + 1e-7))
    if quantity == "mae":
        gtf = gt_b.astype(jnp.float32)
        mae = (jnp.abs(pb.astype(jnp.float32) - gtf[None])
               * valid[None]).sum(axis=(-1, -2)) / n
        return jnp.argmin(mae)
    raise ValueError(quantity)


def eval_batch_metrics(pred_masks: jax.Array, objectness: jax.Array,
                       gt: jax.Array, sizes: jax.Array,
                       cost_type: str = "iou") -> Dict[str, jax.Array]:
    """Per-image metric suite for a canvas batch, fully on device.

    :param pred_masks: [B, Q, H, W] upsampled-to-canvas sigmoid masks.
    :param objectness: [B, Q].
    :param gt: [B, H, W] binary canvas GT.
    :param sizes: [B, 2] true (h, w) per image.
    :return: {metric: [B]} for the 7 metrics x {selected, _ub} plus the
        chosen indices.
    """
    from sod_tpu.ops.fsweep import fmax_tp_cnt

    H, W = pred_masks.shape[-2:]
    sel_idx = jnp.argmax(objectness, axis=1)   # ref evaluator pyc 219-221
    ub_idx = jax.vmap(
        lambda pm, g, hw: upper_bound_index(pm, g, hw[0], hw[1], cost_type)
    )(pred_masks, gt, sizes)
    pair = jnp.stack([sel_idx, ub_idx], axis=1)            # [B, 2]
    both = jnp.take_along_axis(pred_masks, pair[:, :, None, None],
                               axis=1)                     # [B, 2, H, W]
    # the 255-threshold sweep for the two masks that need it, fused into
    # one single-HBM-pass Pallas kernel on TPU (bit-equal counts)
    rowv = jnp.arange(H)[None, :] < sizes[:, :1]
    colv = jnp.arange(W)[None, :] < sizes[:, 1:2]
    tp, cnt = fmax_tp_cnt(both, gt, rowv, colv)            # [B, 2, 255]

    return _pair_metrics(both, gt, sizes, sel_idx, ub_idx, tp, cnt)


def _pair_metrics(both, gt, sizes, sel_idx, ub_idx, tp, cnt):
    """Full metric suite for the [B, 2, H, W] (selected, UB) mask pairs."""
    def per_image(pm2, g, hw, tp2, cnt2):
        h, w = hw[0], hw[1]
        out = rect_metrics(pm2[0], g, h, w, tp_cnt=(tp2[0], cnt2[0]))
        for k, v in rect_metrics(pm2[1], g, h, w,
                                 tp_cnt=(tp2[1], cnt2[1])).items():
            out[f"{k}_ub"] = v
        return out

    out = jax.vmap(per_image)(both, gt, sizes, tp, cnt)
    out["selected_index"] = sel_idx
    out["ub_index"] = ub_idx
    return out


def _ub_score(inter, cnt, gtsum, n, cost_type):
    """Per-query UB score from binarized-mask counts — exactly the
    quantities ``upper_bound_index`` computes from the materialized
    canvas stack (on BINARY masks every cost reduces to these three
    integers; see ``ops.fused_ub``).  Returns (scores [B, Q], take_max)."""
    if cost_type == "iou":
        return inter / (cnt + gtsum - inter + 1e-7), True
    if cost_type in ("f_measure", "f_max"):
        prec = inter / (cnt + 1e-7)
        rec = inter / (gtsum + 1e-7)
        b2 = 0.3 ** 2
        return ((1 + b2) * prec * rec) / (b2 * prec + rec + 1e-7), True
    if cost_type == "mae":
        return (cnt + gtsum - 2.0 * inter) / n, False
    raise ValueError(cost_type)


def eval_batch_metrics_lowres(low_masks: jax.Array, objectness: jax.Array,
                              gt: jax.Array, sizes: jax.Array,
                              cost_type: str = "iou") -> Dict[str, jax.Array]:
    """``eval_batch_metrics`` computed WITHOUT materializing the
    x4-upsampled [B, Q, H, W] canvas stack (409 MB at B=32/Q=20/400 px).

    The UB search needs only binarized-overlap counts per query, which
    ``ops.fused_ub`` computes with the bilinear upsample done per query
    in VMEM; only the two chosen masks are then upsampled for the full
    metric suite — the same einsum path, though upsampling a [B, 2]
    gather instead of all [B, Q] lets XLA batch the resize matmuls
    differently, so continuous metrics can differ in the last float32
    bit (integer threshold counts match; ``tests/test_fused_ub.py``).
    Selection itself can differ only if a pixel lands EXACTLY on a 0.5
    crossing whose float bits differ between the orders — see
    ``ops/fused_ub.py``; wired under ``use_fused_eval``, the documented
    fast eval mode.

    :param low_masks: [B, Q, h0, w0] pre-upsample sigmoid masks.
    :param gt: [B, H, W] binary canvas GT at H = 4*h0, W = 4*w0.
    """
    from sod_tpu.ops.fsweep import fmax_tp_cnt
    from sod_tpu.ops.fused_ub import ub_inter_cnt
    from sod_tpu.ops.resize import _resize_matrix, interpolate_bilinear

    b, q, h0, w0 = low_masks.shape
    H, W = gt.shape[-2:]
    rowv = jnp.arange(H)[None, :] < sizes[:, :1]
    colv = jnp.arange(W)[None, :] < sizes[:, 1:2]
    wh = _resize_matrix(h0, H, "bilinear")                 # [H, h0]
    wwt = _resize_matrix(w0, W, "bilinear").T              # [w0, W]

    inter, cnt_q = ub_inter_cnt(low_masks.astype(jnp.float32), gt,
                                rowv, colv, wh, wwt)       # [B, Q]
    valid = rowv[:, :, None] & colv[:, None, :]
    gtsum = jnp.sum((gt > 0) & valid, axis=(1, 2)).astype(jnp.float32)
    n = (sizes[:, 0] * sizes[:, 1]).astype(jnp.float32)
    scores, take_max = _ub_score(inter, cnt_q, gtsum[:, None], n[:, None],
                                 cost_type)
    ub_idx = (jnp.argmax(scores, axis=1) if take_max
              else jnp.argmin(scores, axis=1))
    sel_idx = jnp.argmax(objectness, axis=1)   # ref evaluator pyc 219-221

    pair = jnp.stack([sel_idx, ub_idx], axis=1)            # [B, 2]
    low_pair = jnp.take_along_axis(low_masks, pair[:, :, None, None],
                                   axis=1)                 # [B, 2, h0, w0]
    both = interpolate_bilinear(low_pair.astype(jnp.float32), H, W)
    tp, cnt = fmax_tp_cnt(both, gt, rowv, colv)            # [B, 2, 255]
    return _pair_metrics(both, gt, sizes, sel_idx, ub_idx, tp, cnt)
