"""IoU / MAE / pixel accuracy (ref ``metrics/iou.py``, ``metrics/mae.py``,
``metrics/pixel_acc.py``) — pure jit-able functions over [..., H, W]."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def compute_iou(pred_mask: jax.Array, gt_mask: jax.Array,
                threshold: Optional[float] = 0.5,
                eps: float = 1e-7) -> jax.Array:
    """IoU at a binarization threshold (ref ``metrics/iou.py:6-32``)."""
    if threshold is not None:
        pred_mask = pred_mask > threshold
    pred_b = pred_mask.astype(bool)
    gt_b = gt_mask.astype(bool)
    inter = jnp.logical_and(pred_b, gt_b).sum(axis=(-1, -2))
    union = jnp.logical_or(pred_b, gt_b).sum(axis=(-1, -2))
    return inter / (union + eps)


def compute_mae(pred_mask: jax.Array, gt_mask: jax.Array) -> jax.Array:
    """Mean absolute error (ref ``metrics/mae.py:4-9``)."""
    return jnp.mean(jnp.abs(pred_mask - gt_mask.astype(jnp.float32)),
                    axis=(-1, -2))


def compute_pixel_accuracy(pred_mask: jax.Array, gt_mask: jax.Array,
                           threshold: Optional[float] = 0.5) -> jax.Array:
    """Binary pixel accuracy (ref ``metrics/pixel_acc.py:5-14``)."""
    if threshold is not None:
        pred_mask = pred_mask > threshold
    return (pred_mask == gt_mask.astype(pred_mask.dtype)).astype(
        jnp.float32).mean(axis=(-1, -2))
