"""Fused upsample + UB-selection statistics (``ops.fused_ub``) and the
low-res eval-metrics path (``metrics.batched.eval_batch_metrics_lowres``).

Equality target: the materializing pipeline (x4 ``interpolate_bilinear``
of every query, then ``eval_batch_metrics``) — ref evaluator pyc 209-226.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from sod_tpu.metrics.batched import eval_batch_metrics, eval_batch_metrics_lowres
from sod_tpu.ops.fused_ub import ub_inter_cnt
from sod_tpu.ops.resize import _resize_matrix, interpolate_bilinear


def _case(b=3, q=5, h0=13, w0=11, s=4, seed=0):
    rng = np.random.RandomState(seed)
    low = rng.rand(b, q, h0, w0).astype(np.float32)
    H, W = h0 * s, w0 * s
    gt = (rng.rand(b, H, W) > 0.6).astype(np.float32)
    hs = rng.randint(H // 2, H + 1, size=b)
    ws = rng.randint(W // 2, W + 1, size=b)
    sizes = np.stack([hs, ws], 1).astype(np.int32)
    obj = rng.rand(b, q).astype(np.float32)
    return (jnp.asarray(low), jnp.asarray(obj), jnp.asarray(gt),
            jnp.asarray(sizes))


def _ref_counts(low, gt, sizes):
    """Counts via the materializing pipeline (the equality target)."""
    H, W = gt.shape[-2:]
    up = interpolate_bilinear(low, H, W)
    rowv = np.arange(H)[None, :] < np.asarray(sizes)[:, :1]
    colv = np.arange(W)[None, :] < np.asarray(sizes)[:, 1:2]
    valid = rowv[:, None, :, None] & colv[:, None, None, :]
    pb = (np.asarray(up) > 0.5) & valid
    gtb = (np.asarray(gt)[:, None] > 0) & valid
    return (pb & gtb).sum((2, 3)).astype(np.float32), \
        pb.sum((2, 3)).astype(np.float32)


@pytest.mark.parametrize("interpret", [False, True],
                         ids=["twin", "kernel-interpret"])
def test_ub_inter_cnt_matches_materializing_pipeline(interpret):
    low, _obj, gt, sizes = _case()
    b, q, h0, w0 = low.shape
    H, W = gt.shape[-2:]
    rowv = jnp.arange(H)[None, :] < sizes[:, :1]
    colv = jnp.arange(W)[None, :] < sizes[:, 1:2]
    wh = _resize_matrix(h0, H, "bilinear")
    wwt = _resize_matrix(w0, W, "bilinear").T
    inter, cnt = ub_inter_cnt(low, gt, rowv, colv, wh, wwt,
                              interpret=interpret)
    ref_inter, ref_cnt = _ref_counts(low, gt, sizes)
    np.testing.assert_array_equal(np.asarray(inter), ref_inter)
    np.testing.assert_array_equal(np.asarray(cnt), ref_cnt)


def _assert_metrics_equal(ref, got):
    """Indices exactly; float metrics to ULPs — upsampling [B, 2] gathered
    masks instead of all [B, Q] changes XLA's batching of the resize
    matmuls, so continuous values (s_measure, mae, f_mean) can differ in
    the last float32 bit even though the integer threshold counts match."""
    assert set(ref) == set(got)
    for k in ref:
        if k.endswith("_index"):
            np.testing.assert_array_equal(
                np.asarray(ref[k]), np.asarray(got[k]), err_msg=k)
        else:
            np.testing.assert_allclose(
                np.asarray(ref[k]), np.asarray(got[k]),
                rtol=2e-6, atol=1e-7, err_msg=k)


@pytest.mark.parametrize("cost_type", ["iou", "f_measure", "f_max", "mae"])
def test_lowres_metrics_equal_materializing_pipeline(cost_type):
    low, obj, gt, sizes = _case(seed=3)
    H, W = gt.shape[-2:]
    up = interpolate_bilinear(low, H, W)
    ref = eval_batch_metrics(up, obj, gt, sizes, cost_type=cost_type)
    got = eval_batch_metrics_lowres(low, obj, gt, sizes,
                                    cost_type=cost_type)
    _assert_metrics_equal(ref, got)


def test_lowres_metrics_nonsquare_and_full_rect():
    """Non-square canvas, every image at full canvas size (valid rect ==
    canvas) — the masking layer must be a no-op, not a corruption."""
    low, obj, gt, sizes = _case(b=2, q=3, h0=9, w0=17, seed=7)
    sizes = jnp.asarray(np.array([[36, 68], [36, 68]], np.int32))
    up = interpolate_bilinear(low, gt.shape[-2], gt.shape[-1])
    ref = eval_batch_metrics(up, obj, gt, sizes)
    got = eval_batch_metrics_lowres(low, obj, gt, sizes)
    _assert_metrics_equal(ref, got)
