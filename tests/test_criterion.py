"""Criterion parity vs a NumPy transcription of the reference bytecode
semantics (criterion.cpython-312.pyc, see sod_tpu/losses/criterion.py)."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sod_tpu.losses.criterion import (
    bce_loss_matrix,
    contrastive_loss,
    criterion_forward,
    dice_loss_matrix,
    focal_loss_matrix,
)


def np_dice_matrix(pred, gt):
    num = 2.0 * pred @ gt.T
    den = pred.sum(-1)[:, None] + gt.sum(-1)[None, :]
    return 1.0 - (num + 1.0) / (den + 1.0)


def np_bilinear(x, H, W):
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(x)
    return F.interpolate(t, size=(H, W), mode="bilinear",
                         align_corners=False).numpy()


def reference_rank_branch(mask_pred, gt_masks, objectness, w_rank=1.0):
    """Transcription of criterion pyc 1998-2526 (per-image loop)."""
    B, L, Q, h, w = mask_pred.shape
    dice_loss = 0.0
    ranking_loss = 0.0
    for nb in range(B):
        gt = gt_masks[nb]                     # [M, H, W]
        if gt.sum() == 0:
            continue
        H, W = gt.shape[-2:]
        pred = np_bilinear(mask_pred[nb], H, W)      # [L, Q, H, W]
        pred = pred.reshape(L, Q, H * W)
        gtf = gt.reshape(len(gt), H * W).astype(np.float32)
        for nl in range(L):
            d = np_dice_matrix(pred[nl], gtf).T      # [M, Q]
            dice_loss += d.sum()
            o = objectness[nb, nl, :, 0]
            order = np.argsort(-d[0])                 # descending
            os_ = o[order]
            diff = os_[:, None] - os_[None, :]
            upper = np.triu(np.ones((Q, Q), bool), k=1)
            ranking_loss += np.abs(diff[upper & (diff < 0)]).sum()
    return dice_loss, ranking_loss


def test_dice_matrix_formula(rng):
    pred = rng.rand(4, 30).astype(np.float32)
    gt = (rng.rand(3, 30) > 0.5).astype(np.float32)
    ours = np.asarray(dice_loss_matrix(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(ours, np_dice_matrix(pred, gt), rtol=1e-5)


def test_bce_matrix_vs_torch(rng):
    import torch
    import torch.nn.functional as F

    pred = rng.rand(4, 30).astype(np.float32) * 0.98 + 0.01
    gt = (rng.rand(3, 30) > 0.5).astype(np.float32)
    ours = np.asarray(bce_loss_matrix(jnp.asarray(pred), jnp.asarray(gt)))
    p = torch.from_numpy(pred)[:, None].repeat(1, 3, 1)
    g = torch.from_numpy(gt)[None].repeat(4, 1, 1)
    theirs = F.binary_cross_entropy(p, g, reduction="none").mean(-1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_focal_matrix_properties(rng):
    pred = rng.rand(4, 30).astype(np.float32) * 0.98 + 0.01
    gt = (rng.rand(3, 30) > 0.5).astype(np.float32)
    out = np.asarray(focal_loss_matrix(jnp.asarray(pred), jnp.asarray(gt)))
    assert out.shape == (4, 3)
    assert (out >= 0).all()
    # perfect prediction ~ near-zero focal cost
    perfect = np.asarray(focal_loss_matrix(jnp.asarray(gt * 0.999 + 5e-4),
                                           jnp.asarray(gt)))
    assert np.diag(perfect).max() < 0.01


def test_contrastive_vs_reference(rng):
    """Supervised InfoNCE vs a NumPy transcription of pyc 314-1202."""
    feats = rng.randn(6, 16).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 3])
    tau = 0.07
    ours = float(contrastive_loss(jnp.asarray(feats), jnp.asarray(labels), tau))

    f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    sim = f @ f.T / tau
    pos = (labels[:, None] == labels[None, :]).astype(np.float32)
    np.fill_diagonal(pos, 0.0)
    logits = sim - sim.max(axis=1, keepdims=True)
    expl = np.exp(logits)
    non_self = 1.0 - np.eye(6)
    log_prob = logits - np.log((expl * non_self).sum(1, keepdims=True) + 1e-12)
    mlpp = (pos * log_prob).sum(1) / (pos.sum(1) + 1e-12)
    expected = -mlpp.mean()
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_contrastive_guards(rng):
    feats = rng.randn(1, 8).astype(np.float32)
    assert float(contrastive_loss(jnp.asarray(feats), jnp.asarray([0]), 0.07)) == 0.0
    feats = rng.randn(3, 8).astype(np.float32)
    # all-distinct labels -> no positives -> 0
    assert float(contrastive_loss(jnp.asarray(feats),
                                  jnp.asarray([0, 1, 2]), 0.07)) == 0.0


def test_rank_branch_matches_reference(rng):
    B, L, Q, h, w = 2, 3, 6, 8, 8
    H = W = 16
    mask_pred = rng.rand(B, L, Q, h, w).astype(np.float32)
    gt = (rng.rand(B, 1, H, W) > 0.5).astype(np.float32)
    objectness = rng.rand(B, L, Q, 1).astype(np.float32)

    out = criterion_forward(
        jnp.asarray(mask_pred), jnp.asarray(gt),
        jnp.ones((B, 1), bool), jnp.asarray(objectness),
        use_classification_loss=False,
        features=None, feature_labels=None,
    )
    ref_dice, ref_rank = reference_rank_branch(mask_pred, gt, objectness)
    np.testing.assert_allclose(float(out["dice_loss"]), ref_dice, rtol=1e-4)
    np.testing.assert_allclose(float(out["ranking_loss"]), ref_rank, rtol=1e-3,
                               atol=1e-5)
    expected_loss = (ref_dice + ref_rank) / B
    np.testing.assert_allclose(float(out["loss"]), expected_loss, rtol=1e-4)


def test_cls_branch_matches_hungarian(rng):
    B, L, Q, h, w = 2, 2, 5, 8, 8
    H = W = 8
    mask_pred = rng.rand(B, L, Q, h, w).astype(np.float32)
    gt = (rng.rand(B, 1, H, W) > 0.5).astype(np.float32)
    objectness = rng.rand(B, L, Q, 1).astype(np.float32)

    out = criterion_forward(
        jnp.asarray(mask_pred), jnp.asarray(gt),
        jnp.ones((B, 1), bool), jnp.asarray(objectness),
        use_classification_loss=True,
    )

    # independent computation with scipy Hungarian
    total_dice = total_cls = 0.0
    for nb in range(B):
        gt0 = gt[nb, 0].reshape(-1)
        targets = np.stack([1.0 - gt0, gt0])
        pred = mask_pred[nb].reshape(L, Q, H * W)
        for nl in range(L):
            d = np_dice_matrix(pred[nl], targets).T        # [2, Q]
            o = objectness[nb, nl, :, 0]
            cost = d - o[None, :]
            rows, cols = linear_sum_assignment(cost)
            total_dice += d[rows, cols].sum()
            total_cls += (-np.log(o[cols] + 1e-7)).sum()
    np.testing.assert_allclose(float(out["dice_loss"]), total_dice, rtol=1e-4)
    np.testing.assert_allclose(float(out["classification_loss"]), total_cls,
                               rtol=1e-4)


def test_invalid_images_are_skipped(rng):
    B, L, Q = 3, 2, 4
    mask_pred = rng.rand(B, L, Q, 8, 8).astype(np.float32)
    gt = (rng.rand(B, 2, 8, 8) > 0.5).astype(np.float32)
    valid = np.array([[True, True], [True, False], [False, False]])
    gt[2] = 0.0
    objectness = rng.rand(B, L, Q, 1).astype(np.float32)
    out = criterion_forward(
        jnp.asarray(mask_pred), jnp.asarray(gt), jnp.asarray(valid),
        jnp.asarray(objectness), use_classification_loss=False)
    assert np.isfinite(float(out["loss"]))

    # image 2 contributes nothing: zeroing its preds must not change loss
    mask_pred2 = mask_pred.copy()
    mask_pred2[2] = 0.123
    out2 = criterion_forward(
        jnp.asarray(mask_pred2), jnp.asarray(gt), jnp.asarray(valid),
        jnp.asarray(objectness), use_classification_loss=False)
    np.testing.assert_allclose(float(out["loss"]), float(out2["loss"]),
                               rtol=1e-5)


def test_criterion_is_differentiable(rng):
    import jax

    B, L, Q = 2, 2, 4
    mask_pred = jnp.asarray(rng.rand(B, L, Q, 8, 8).astype(np.float32))
    gt = jnp.asarray((rng.rand(B, 1, 8, 8) > 0.5).astype(np.float32))
    objectness = jnp.asarray(rng.rand(B, L, Q, 1).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, 16).astype(np.float32))
    labels = jnp.asarray(np.array([1, 1]))

    def f(mp, ob, ft):
        return criterion_forward(mp, gt, jnp.ones((B, 1), bool), ob,
                                 use_classification_loss=False,
                                 features=ft, feature_labels=labels)["loss"]

    grads = jax.grad(f, argnums=(0, 1, 2))(mask_pred, objectness, feats)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


def test_no_objectness_contrastive_only(rng):
    """With objectness=None the reference skips every per-layer loss
    (pyc 1562-1566) — only the contrastive term survives."""
    B, L, Q = 3, 2, 4
    mask_pred = jnp.asarray(rng.rand(B, L, Q, 8, 8).astype(np.float32))
    gt = jnp.asarray((rng.rand(B, 1, 8, 8) > 0.5).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, 16).astype(np.float32))
    labels = jnp.asarray(np.array([1, 1, 2]))
    out = criterion_forward(mask_pred, gt, jnp.ones((B, 1), bool), None,
                            use_classification_loss=True,
                            features=feats, feature_labels=labels)
    assert float(out["dice_loss"]) == 0.0
    assert float(out["classification_loss"]) == 0.0
    assert float(out["avg_contrastive_loss"]) != 0.0
    expected = 0.1 * float(out["avg_contrastive_loss"]) / B
    np.testing.assert_allclose(float(out["loss"]), expected, rtol=1e-5)
