"""Training objective — jit-able re-design of the reference ``criterion.py``
(bytecode-only module; semantics recovered from
``__pycache__/criterion.cpython-312.pyc`` and cited below by pyc offset).

Key differences from the reference's *implementation* (not its math):

* The reference loops Python-side over images and decoder layers, calling
  scipy's Hungarian on CPU per (image, layer) — a device sync per iteration
  (pyc 1696-1810).  Here everything is one static-shape jit region: dice
  matrices for the whole [B, L] grid come from one einsum, the Hungarian
  runs on device (``sod_tpu.ops.hungarian``) under vmap, and ragged GT mask
  stacks are padded to ``max_gt_masks`` with a validity mask.
* The compiled classification branch indexes a [1, Q] objectness tensor
  with GT row indices >= 1 and would crash for its own 2-row one-hot
  targets (pyc 1642-1684 ``.t()`` + pyc 1958-1966); we implement the
  intended semantics (match {background, foreground} one-hot targets to
  queries; -log objectness of each matched query).

Reference semantics mirrored exactly:

* dice matrix ``1 - (2*einsum('nc,mc->nm') + 1) / (sum_n + sum_m + 1)``
  (pyc ``_dice_loss``).
* the LIVE branch (``use_classification_loss=False``, i.e. the shipped
  ``use_binary_classifier: true`` config): dice summed over ALL
  (query x GT) pairs per layer (pyc 2068-2104); ranking loss from queries
  sorted by dice loss DESCENDING, penalising negative entries of the
  strictly-upper-triangular pairwise objectness difference (pyc 2260-2522)
  — reproduced verbatim including its surprising orientation;
  ``gt_to_query = argmin dice`` (pyc 2106-2210).
* classification branch: cost = dice - objectness^T, Hungarian, matched
  dice + ``-log(objectness + 1e-7)`` (pyc 1572-1990), GT converted to
  {bg, fg} one-hot rows (pyc 1198-1288, utils.misc:to_one_hot).
* supervised-InfoNCE contrastive term with max-subtraction, non-self
  denominator mask and 1e-12 guards (pyc ``_contrastive_loss``); computed
  once per batch, weighted, and normalised together with the rest by the
  batch size (pyc 3870-3928).
* focal (RetinaNet pairwise, alpha=0.25 gamma=2, normalised by HW) and
  broadcast-BCE matrices are provided for capability parity (pyc
  ``_focal_loss`` / ``_binary_cross_entropy_loss``); their weights are 0 in
  the live config and, exactly as in the reference's compiled ``_forward``,
  they do not enter the total.
* per-image IoU@0.5 of the matched last-layer masks for logging
  (pyc 3380-3810).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from sod_tpu.ops.hungarian import hungarian
from sod_tpu.ops.resize import _resize_matrix, interpolate_bilinear


# ---------------------------------------------------------------------------
# Pairwise loss matrices (pred [N, C] x gt [M, C] -> [N, M])
# ---------------------------------------------------------------------------

def dice_loss_matrix(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Pairwise dice loss (ref criterion pyc ``_dice_loss``)."""
    num = 2.0 * jnp.einsum("nc,mc->nm", pred, gt,
                           preferred_element_type=jnp.float32)
    den = pred.sum(-1)[:, None] + gt.sum(-1)[None, :]
    return 1.0 - (num + 1.0) / (den + 1.0)


def focal_loss_matrix(pred: jax.Array, gt: jax.Array, alpha: float = 0.25,
                      gamma: float = 2.0, eps: float = 1e-7) -> jax.Array:
    """Pairwise RetinaNet focal cost (ref criterion pyc ``_focal_loss``):
    ``(einsum(fl_pos, gt) + einsum(fl_neg, 1-gt)) / HW``."""
    hw = pred.shape[1]
    p = jnp.clip(pred, eps, 1.0 - eps)
    fl_pos = ((1.0 - p) ** gamma) * (-jnp.log(p))
    fl_neg = (p ** gamma) * (-jnp.log(1.0 - p))
    if alpha >= 0:
        fl_pos = alpha * fl_pos
        fl_neg = (1.0 - alpha) * fl_neg
    loss = (jnp.einsum("nc,mc->nm", fl_pos, gt) +
            jnp.einsum("nc,mc->nm", fl_neg, 1.0 - gt))
    return loss / hw


def bce_loss_matrix(pred: jax.Array, gt: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Pairwise broadcast BCE, mean over pixels (ref criterion pyc
    ``_binary_cross_entropy_loss``)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    # mean_c[-gt*log(p) - (1-gt)*log(1-p)] decomposes into two einsums
    hw = pred.shape[1]
    pos = jnp.einsum("nc,mc->nm", -jnp.log(p), gt)
    neg = jnp.einsum("nc,mc->nm", -jnp.log(1.0 - p), 1.0 - gt)
    return (pos + neg) / hw


def contrastive_loss(features: jax.Array, labels: jax.Array,
                     temperature: float,
                     valid: Optional[jax.Array] = None) -> jax.Array:
    """Supervised InfoNCE over pooled decoder queries (ref criterion pyc
    ``_contrastive_loss``).

    :param features: [B, D]; :param labels: [B] int.
    :param valid: optional [B] bool — rows corresponding to images the
        reference's collate_fn would have dropped are excluded everywhere
        (positives, denominator, final mean), so a padded batch gives the
        exact value the reference computes on its ragged batch.
    Guards (return 0.0): fewer than 2 valid rows or no positive pairs.
    """
    b = features.shape[0]
    if b < 2:
        return jnp.float32(0.0)
    if valid is None:
        valid = jnp.ones((b,), bool)
    validf = valid.astype(jnp.float32)
    n_valid = validf.sum()

    f = features.astype(jnp.float32)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    sim = (f @ f.T) / temperature                                  # [B, B]

    labels = labels.reshape(-1, 1)
    pair_valid = validf[:, None] * validf[None, :]
    pos_mask = (labels == labels.T).astype(jnp.float32) * pair_valid
    eye = jnp.eye(b, dtype=bool)
    pos_mask = jnp.where(eye, 0.0, pos_mask)

    # max over valid columns only (invalid rows never contribute anyway)
    row_max = jax.lax.stop_gradient(
        jnp.max(jnp.where(validf[None, :] > 0, sim, -jnp.inf),
                axis=1, keepdims=True))
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    logits = sim - row_max
    exp_logits = jnp.exp(logits)
    non_self = (1.0 - jnp.eye(b, dtype=jnp.float32)) * validf[None, :]
    log_prob = logits - jnp.log((exp_logits * non_self).sum(axis=1,
                                                            keepdims=True) + 1e-12)
    mean_log_prob_pos = (pos_mask * log_prob).sum(1) / (pos_mask.sum(1) + 1e-12)
    loss = -(mean_log_prob_pos * validf).sum() / jnp.maximum(n_valid, 1.0)
    # no positives anywhere, or < 2 valid rows -> 0 (ref pyc 716-818)
    ok = (pos_mask.sum() > 0) & (n_valid >= 2)
    return jnp.where(ok, loss, 0.0)


# ---------------------------------------------------------------------------
# Full criterion
# ---------------------------------------------------------------------------

def _per_image_layer_rank(dice_q: jax.Array, objectness_q: jax.Array):
    """Ranking loss for one (image, layer) (ref pyc 2260-2522).

    :param dice_q: [Q] dice loss of each query vs the first GT mask.
    :param objectness_q: [Q].
    """
    order = jnp.argsort(-dice_q)                     # descending dice loss
    o = objectness_q[order]
    diff = o[:, None] - o[None, :]                   # [Q, Q]: o_i - o_j
    q = dice_q.shape[0]
    upper = jnp.triu(jnp.ones((q, q), bool), k=1)
    neg = upper & (diff < 0)
    return jnp.where(neg, -diff, 0.0).sum()


def criterion_forward(
    mask_pred: jax.Array,
    gt_masks: jax.Array,
    gt_valid: jax.Array,
    objectness: Optional[jax.Array],
    use_classification_loss: bool,
    features: Optional[jax.Array] = None,
    feature_labels: Optional[jax.Array] = None,
    weight_contrastive_loss: float = 0.1,
    weight_rank_loss: float = 1.0,
    temperature: float = 0.07,
) -> Dict[str, jax.Array]:
    """The criterion ``_forward`` (ref pyc 207-382) as one jit region.

    :param mask_pred: [B, L, Q, h, w] sigmoid mask predictions.
    :param gt_masks:  [B, M, H, W] float binary GT stacks, padded over M.
    :param gt_valid:  [B, M] bool validity of each GT row.
    :param objectness: [B, L, Q, 1] or None.
    :param use_classification_loss: Hungarian-matched branch (the trainer
        passes ``not model.use_binary_classifier``, trainer pyc 113-117).
    :return: dict with ``loss`` plus per-batch diagnostic means mirroring
        the reference's meters (dice/ranking/classification/contrastive/iou),
        and ``gt_to_query`` [B] (ranking branch) / [B, 2] (cls branch).
    """
    b, l, q, ph, pw = mask_pred.shape
    _, m, H, W = gt_masks.shape

    # The reference bilinearly resizes predictions to GT resolution before
    # the dice einsum (ref pyc 1082-1156).  Upsampling is linear, so
    # <up(P), G> = <P, up^T(G)>: instead of materialising [B, L, Q, H, W]
    # and contracting over H*W (~770 GFLOP fp32 per step at the live
    # shapes — more than the ViT forward), we adjoint-downsample the GT
    # once with the transposed interpolation matrices and contract at the
    # prediction resolution.  Bit-exact up to fp reassociation.
    predf = mask_pred.astype(jnp.float32)
    pred_flat = predf.reshape(b, l, q, ph * pw)
    gtf = gt_masks.astype(jnp.float32)
    gt_flat = gtf.reshape(b, m, H * W)

    wh = jnp.asarray(_resize_matrix(ph, H, "bilinear"))    # [H, ph]
    ww = jnp.asarray(_resize_matrix(pw, W, "bilinear"))    # [W, pw]

    def adjoint_down(g):                                   # [..., H, W]
        y = jnp.einsum("Hh,...HW,Ww->...hw", wh, g, ww,
                       preferred_element_type=jnp.float32)
        return y

    gt_down = adjoint_down(gtf).reshape(b, m, ph * pw)     # [B, M, hw]
    # sum over pixels of up(P) = c_h^T P c_w with the matrices' col-sums
    ch = wh.sum(axis=0)                                     # [ph]
    cw = ww.sum(axis=0)                                     # [pw]
    pred_up_sum = jnp.einsum("h,blqhw,w->blq", ch,
                             predf.reshape(b, l, q, ph, pw), cw)

    img_valid = gt_valid.any(axis=1)                       # [B]
    n_imgs = jnp.maximum(img_valid.sum(), 1)

    # first valid GT row per image (collate keeps real masks first)
    gt0 = gt_flat[:, 0]                                     # [B, HW]
    gt0_down = gt_down[:, 0]                                # [B, hw]

    def dice_matrix_lowres(pf, gd, gsum, psum):
        """Pairwise dice using adjoint-downsampled GT.

        pf: [Q, hw] preds at native res; gd: [M, hw] adjoint GT;
        gsum: [M] GT pixel sums at full res; psum: [Q] upsampled-pred sums.
        """
        num = 2.0 * jnp.einsum("qc,mc->qm", pf, gd,
                               preferred_element_type=jnp.float32)
        den = psum[:, None] + gsum[None, :]
        return 1.0 - (num + 1.0) / (den + 1.0)

    gt_sums = gt_flat.sum(-1)                               # [B, M]

    if objectness is None:
        # the reference skips EVERY per-layer loss when no objectness is
        # given (pyc 1562-1566: ``if batch_objectness is None: continue``)
        # — but then CRASHES at ``batch_gt_to_query.append(gt_to_query)``
        # (pyc 2592, LOAD_FAST_CHECK on a never-assigned local).  We keep
        # the skip semantics and return the contrastive term alone — a
        # deliberate, documented divergence from an unreachable-in-practice
        # reference code path (the live config always has objectness).
        if features is not None and feature_labels is not None:
            con = contrastive_loss(features, feature_labels, temperature,
                                   valid=img_valid)
        else:
            con = jnp.float32(0.0)
        zero = jnp.float32(0.0)
        return {
            "loss": weight_contrastive_loss * con / n_imgs,
            "gt_to_query": jnp.zeros((b,), jnp.int32),
            "avg_loss": zero,
            "avg_contrastive_loss": con,
            "dice_loss": zero,
            "ranking_loss": zero,
            "classification_loss": zero,
            "avg_dice_loss": zero,
            "avg_ranking_loss": zero,
            "avg_classification_loss": zero,
            "avg_iou": zero,
        }

    if not use_classification_loss:
        # ---- LIVE branch: all-queries dice + ranking (pyc 1998-2526) ----
        # dice over every (layer, query, valid gt row)
        dice_bl = jax.vmap(jax.vmap(dice_matrix_lowres,
                                    in_axes=(0, None, None, 0)),
                           in_axes=(0, 0, 0, 0))(
            pred_flat, gt_down, gt_sums, pred_up_sum)       # [B, L, Q, M]
        valid_rows = gt_valid[:, None, None, :]
        dice_total_per_img = jnp.where(valid_rows, dice_bl, 0.0).sum((1, 2, 3))

        dice_q0 = dice_bl[..., 0]                          # [B, L, Q] vs gt row 0
        obj = objectness[..., 0]                            # [B, L, Q]
        rank_per = jax.vmap(jax.vmap(_per_image_layer_rank))(dice_q0, obj)
        rank_per_img = rank_per.sum(axis=1)                 # [B]

        dice_loss = jnp.where(img_valid, dice_total_per_img, 0.0).sum()
        ranking_loss = jnp.where(img_valid, rank_per_img, 0.0).sum()
        classification_loss = jnp.float32(0.0)

        # gt_to_query: argmin dice of the LAST layer (ref keeps the final
        # loop iteration's dict, pyc 2106-2210 + 2570-2602)
        gt_to_query = jnp.argmin(dice_q0[:, -1], axis=-1)   # [B]

        # matched-mask IoU diagnostics on the last layer (pyc 3380-3810):
        # binarisation is nonlinear, so upsample just the selected query
        sel_low = jnp.take_along_axis(
            predf[:, -1].reshape(b, q, ph, pw),
            gt_to_query[:, None, None, None], axis=1)[:, 0]  # [B, ph, pw]
        sel = interpolate_bilinear(sel_low, H, W).reshape(b, H * W)
        bin_sel = sel > 0.5
        inter = jnp.sum(jnp.logical_and(gt0 > 0, bin_sel), axis=-1)
        union = jnp.sum(jnp.logical_or(gt0 > 0, bin_sel), axis=-1)
        iou = inter / (union + 1e-7)

        total_main = dice_loss + weight_rank_loss * ranking_loss
        diag = {
            "avg_dice_loss": jnp.where(img_valid, dice_total_per_img, 0.0).sum() / n_imgs,
            "avg_ranking_loss": jnp.where(img_valid, rank_per_img, 0.0).sum() / n_imgs,
            "avg_classification_loss": jnp.float32(0.0),
            "avg_iou": jnp.where(img_valid, iou, 0.0).sum() / n_imgs,
        }
    else:
        # ---- Hungarian-matched classification branch (pyc 1572-1990) ----
        # targets: {background, foreground} one-hot rows of GT row 0
        # (ref pyc 1198-1288 via utils.misc:to_one_hot).  Adjoint of the
        # background row: up^T(1 - G) = up^T(1) - up^T(G) with
        # up^T(1)[h,w] = ch[h]*cw[w].
        ones_down = (ch[:, None] * cw[None, :]).reshape(-1)  # [hw]
        gt0_sum = gt_flat[:, 0].sum(-1)                      # [B]
        targets_down = jnp.stack([ones_down[None, :] - gt0_down, gt0_down],
                                 axis=1)                     # [B, 2, hw]
        target_sums = jnp.stack([H * W - gt0_sum, gt0_sum], axis=1)  # [B, 2]

        dice_bl = jax.vmap(jax.vmap(dice_matrix_lowres,
                                    in_axes=(0, None, None, 0)),
                           in_axes=(0, 0, 0, 0))(
            pred_flat, targets_down, target_sums, pred_up_sum)  # [B, L, Q, 2]
        dice_mq = dice_bl.transpose(0, 1, 3, 2)             # [B, L, 2(M), Q]
        obj = objectness[..., 0]                             # [B, L, Q]
        cost = dice_mq - obj[:, :, None, :]                  # [B, L, 2, Q]

        flat_cost = cost.reshape(b * l, 2, q)
        assign = jax.vmap(hungarian)(
            jax.lax.stop_gradient(flat_cost)).reshape(b, l, 2)  # [B, L, 2]

        matched_dice = jnp.take_along_axis(
            dice_mq, assign[..., None], axis=-1)[..., 0]     # [B, L, 2]
        matched_obj = jnp.take_along_axis(obj, assign.reshape(b, l, 2),
                                          axis=-1)           # [B, L, 2]
        dice_per_img = matched_dice.sum((1, 2))
        cls_per_img = (-jnp.log(matched_obj + 1e-7)).sum((1, 2))

        dice_loss = jnp.where(img_valid, dice_per_img, 0.0).sum()
        classification_loss = jnp.where(img_valid, cls_per_img, 0.0).sum()
        ranking_loss = jnp.float32(0.0)

        gt_to_query = assign[:, -1]                          # [B, 2] last layer

        # IoU of the matched foreground query on the last layer
        fg_q = assign[:, -1, 1]
        sel_low = jnp.take_along_axis(
            predf[:, -1].reshape(b, q, ph, pw),
            fg_q[:, None, None, None], axis=1)[:, 0]
        sel = interpolate_bilinear(sel_low, H, W).reshape(b, H * W)
        bin_sel = sel > 0.5
        inter = jnp.sum(jnp.logical_and(gt0 > 0, bin_sel), axis=-1)
        union = jnp.sum(jnp.logical_or(gt0 > 0, bin_sel), axis=-1)
        iou = inter / (union + 1e-7)

        total_main = dice_loss + classification_loss
        diag = {
            "avg_dice_loss": jnp.where(img_valid, dice_per_img, 0.0).sum() / n_imgs,
            "avg_ranking_loss": jnp.float32(0.0),
            "avg_classification_loss": jnp.where(img_valid, cls_per_img, 0.0).sum() / n_imgs,
            "avg_iou": jnp.where(img_valid, iou, 0.0).sum() / n_imgs,
        }

    # contrastive term: once per batch, weighted, normalised with the rest
    # (pyc 526-708 + 3870-3928)
    if features is not None and feature_labels is not None:
        con = contrastive_loss(features, feature_labels, temperature,
                               valid=img_valid)
    else:
        con = jnp.float32(0.0)

    # normalise by the number of images that actually contributed — the
    # reference divides by len(batch_one_hot_gt_mask) AFTER its collate_fn
    # dropped empty-mask images (pyc 3906-3932, datasets/duts.py:84-86);
    # padded/invalid rows here correspond to those dropped images.
    loss = (total_main + weight_contrastive_loss * con) / n_imgs

    out = {
        "loss": loss,
        "gt_to_query": gt_to_query,
        "avg_loss": (total_main / jnp.maximum(n_imgs, 1)),
        "avg_contrastive_loss": con,
        "dice_loss": dice_loss,
        "ranking_loss": ranking_loss,
        "classification_loss": classification_loss,
    }
    out.update(diag)
    return out


@dataclass
class Criterion:
    """Configured criterion mirroring the reference ``Loss`` ctor (pyc 10-44).

    ``weight_dice_loss`` / ``weight_focal_loss`` / ``weight_bce_loss`` are
    accepted for config parity; exactly as in the reference's compiled
    ``_forward``, only dice enters the total (focal/bce weights are 0 in the
    live config and the compiled code never calls them).
    """
    weight_dice_loss: float = 1.0
    weight_focal_loss: float = 0.0
    weight_bce_loss: float = 0.0
    weight_contrastive_loss: float = 0.1
    temperature: float = 0.07
    weight_cls_loss: float = 0.05     # defined but unused (ref pyc 28)
    weight_rank_loss: float = 1.0     # ref pyc 29

    def __call__(self, mask_pred, gt_masks, gt_valid, objectness,
                 use_classification_loss, features=None, feature_labels=None):
        return criterion_forward(
            mask_pred, gt_masks, gt_valid, objectness,
            use_classification_loss, features, feature_labels,
            weight_contrastive_loss=self.weight_contrastive_loss,
            weight_rank_loss=self.weight_rank_loss,
            temperature=self.temperature,
        )
