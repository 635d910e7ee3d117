"""F-measure — fixed threshold, max over 255 thresholds, adaptive threshold
(ref ``metrics/f_measure.py:4-92``).

The reference's per-threshold Python loop becomes a single tensorised sweep:
[n_bins, H, W] comparisons and reductions in one jit region, vmappable over
a batch of masks.

Faithfully reproduced quirk: the reference squares its ``beta_square``
parameter again in the formula (``self.beta_square ** 2`` with
beta_square=0.3), so the effective coefficient is 0.09 — we keep that
behaviour to preserve metric parity with published numbers.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _prec_recall(binary_pred: jax.Array, gt: jax.Array, eps: float):
    tp = jnp.logical_and(binary_pred, gt).sum(axis=(-1, -2)).astype(jnp.float32)
    tp_fp = binary_pred.sum(axis=(-1, -2)).astype(jnp.float32)
    tp_fn = gt.sum(axis=(-1, -2)).astype(jnp.float32)
    return tp / (tp_fp + eps), tp / (tp_fn + eps)


def _f(prec, recall, b2, eps):
    return ((1 + b2) * prec * recall) / (b2 * prec + recall + eps)


def f_measure_all(pred_mask: jax.Array, gt_mask: jax.Array,
                  default_thres: float = 0.5, beta_square: float = 0.3,
                  n_bins: int = 255, eps: float = 1e-7) -> Dict[str, jax.Array]:
    """All three F-measure variants for one [H, W] mask pair.

    :return: {"f_measure", "f_max", "f_mean"} scalars (vmap for batches).
    """
    b2 = beta_square ** 2          # ref quirk: 0.3 ** 2 = 0.09
    gt = gt_mask.astype(bool)

    # fixed threshold
    prec, rec = _prec_recall(pred_mask > default_thres, gt, eps)
    f_fixed = _f(prec, rec, b2, eps)

    # max over n_bins thresholds: arange(0, 1, 1/n_bins)
    thresholds = jnp.arange(n_bins, dtype=jnp.float32) / n_bins
    binary = pred_mask[None] > thresholds[:, None, None]     # [T, H, W]
    prec_t, rec_t = _prec_recall(binary, gt[None], eps)
    f_max = _f(prec_t, rec_t, b2, eps).max()

    # adaptive threshold: 2 * mean
    adaptive = 2.0 * pred_mask.mean()
    prec_a, rec_a = _prec_recall(pred_mask > adaptive, gt, eps)
    f_mean = _f(prec_a, rec_a, b2, eps)

    return {"f_measure": f_fixed, "f_max": f_max, "f_mean": f_mean}
