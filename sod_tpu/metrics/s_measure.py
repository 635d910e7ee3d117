"""S-measure (structure measure, Fan et al.) — ref ``metrics/s_measure.py``.

The reference's data-dependent control flow (centroid-located quadrant
slicing) is re-expressed with membership masks so the whole metric is one
static-shape jit region:

* quadrant slices ``gt[:Y, :X]`` etc. become boolean masks built from
  broadcasted row/col indices vs the (traced) centroid;
* slice means/variances/covariances become masked sums divided by masked
  counts — identical values to the sliced computation;
* the reference's ``torch.round`` (half-to-even) centroid rounding is
  matched by ``jnp.round``.

``s_measure_rect(pred, gt, h, w)`` additionally restricts everything to the
top-left (h, w) rectangle of a fixed canvas — the batched
variable-resolution evaluator computes the metric for every image of a
batch in one jit region, each at its true size, with identical values to
slicing the canvas per image.

Divergence (documented): when a quadrant is empty the reference computes
``nan`` (mean of an empty slice) which then poisons the weighted sum even
though the empty quadrant's weight is 0; we return that quadrant's SSIM
as 0 so the (0-weighted) term stays finite.  The reference also hardcodes
``.cuda()`` in ``_centroid`` (``metrics/s_measure.py:6-124``); irrelevant
here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(x, mask, n):
    return jnp.where(n > 0, (x * mask).sum() / jnp.maximum(n, 1), 0.0)


def _ssim_masked(pred, gt, mask):
    """SSIM over the region selected by ``mask`` (ref ``_ssim``)."""
    n = mask.sum()
    x = _masked_mean(pred, mask, n)
    y = _masked_mean(gt, mask, n)
    dn = n - 1 + 1e-20
    sigma_x2 = (((pred - x) ** 2) * mask).sum() / dn
    sigma_y2 = (((gt - y) ** 2) * mask).sum() / dn
    sigma_xy = (((pred - x) * (gt - y)) * mask).sum() / dn

    alpha = 4 * x * y * sigma_xy
    beta = (x * x + y * y) * (sigma_x2 + sigma_y2)

    q = jnp.where(alpha != 0, alpha / (beta + 1e-20),
                  jnp.where(beta == 0, 1.0, 0.0))
    return jnp.where(n > 0, q, 0.0)


def _object_score(pred, region_mask):
    """``_object``: stats of pred over the region (torch .std is unbiased)."""
    n = region_mask.sum()
    x = _masked_mean(pred, region_mask, n)
    var = (((pred - x) ** 2) * region_mask).sum() / jnp.maximum(n - 1, 1)
    sigma = jnp.sqrt(jnp.maximum(var, 0.0))
    sigma = jnp.where(n > 1, sigma, 0.0)
    return 2.0 * x / (x * x + 1.0 + sigma + 1e-20)


def _s_object(pred, gt, valid):
    fg = jnp.where(gt == 0, 0.0, pred)
    bg = jnp.where(gt == 1, 0.0, 1.0 - pred)
    o_fg = _object_score(fg, ((gt == 1) & (valid > 0)).astype(jnp.float32))
    o_bg = _object_score(bg, ((gt == 0) & (valid > 0)).astype(jnp.float32))
    u = _masked_mean(gt, valid, valid.sum())
    return u * o_fg + (1 - u) * o_bg


def _centroid(gt, h, w):
    rows, cols = gt.shape
    total = gt.sum()                      # gt is zero outside the valid rect
    i = jnp.arange(cols, dtype=jnp.float32)
    j = jnp.arange(rows, dtype=jnp.float32)
    x = jnp.round((gt.sum(axis=0) * i).sum() / jnp.maximum(total, 1e-20))
    y = jnp.round((gt.sum(axis=1) * j).sum() / jnp.maximum(total, 1e-20))
    # empty gt -> round(cols/2) of the VALID size (ref _centroid; round()
    # is Python's banker's rounding, matched by jnp.round on x.5 values)
    x = jnp.where(total == 0, jnp.round(w / 2.0), x)
    y = jnp.where(total == 0, jnp.round(h / 2.0), y)
    return x.astype(jnp.int32), y.astype(jnp.int32)


def _s_region(pred, gt, valid, h, w):
    H, W = gt.shape
    X, Y = _centroid(gt, h, w)
    area = (h * w).astype(jnp.float32) if hasattr(h, "astype") else float(h * w)

    col_ids = jnp.arange(W)[None, :]
    row_ids = jnp.arange(H)[:, None]
    left = col_ids < X
    top = row_ids < Y
    vb = valid > 0
    quadrants = [top & left & vb, top & ~left & vb,
                 ~top & left & vb, ~top & ~left & vb]
    Xf, Yf = X.astype(jnp.float32), Y.astype(jnp.float32)
    w1 = Xf * Yf / area
    w2 = (w - Xf) * Yf / area
    w3 = Xf * (h - Yf) / area
    w4 = 1.0 - w1 - w2 - w3
    weights = [w1, w2, w3, w4]

    q = 0.0
    for mask, wt in zip(quadrants, weights):
        q = q + wt * _ssim_masked(pred, gt, mask.astype(jnp.float32))
    return q


def s_measure_rect(pred_mask: jax.Array, gt_mask: jax.Array,
                   h, w, alpha: float = 0.5) -> jax.Array:
    """Structure measure of the top-left (h, w) rectangle of a canvas pair
    (ref ``SMeasure.__call__``).  h/w may be traced ints."""
    H, W = pred_mask.shape
    valid = ((jnp.arange(H)[:, None] < h) &
             (jnp.arange(W)[None, :] < w)).astype(jnp.float32)
    pred = pred_mask.astype(jnp.float32) * valid
    gt_raw = gt_mask.astype(jnp.float32) * valid
    n = valid.sum()

    y = _masked_mean(gt_raw, valid, n)
    x = _masked_mean(pred, valid, n)

    gt = (gt_raw >= 0.5).astype(jnp.float32)
    q_mixed = (alpha * _s_object(pred, gt, valid) +
               (1 - alpha) * _s_region(pred, gt, valid,
                                       jnp.asarray(h, jnp.float32),
                                       jnp.asarray(w, jnp.float32)))
    q_mixed = jnp.maximum(q_mixed, 0.0)

    return jnp.where(y == 0, 1.0 - x, jnp.where(y == 1, x, q_mixed))


def s_measure(pred_mask: jax.Array, gt_mask: jax.Array,
              alpha: float = 0.5) -> jax.Array:
    """Structure measure of one full [H, W] pair."""
    h, w = pred_mask.shape
    return s_measure_rect(pred_mask, gt_mask, h, w, alpha)
