"""Batched canvas metrics vs the single-image reference implementations:
rect_metrics on a full-size rect must equal f_measure_all / s_measure /
simple metrics exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from sod_tpu.metrics import (
    compute_iou,
    compute_mae,
    compute_pixel_accuracy,
    f_measure_all,
    s_measure,
)
from sod_tpu.metrics.batched import eval_batch_metrics, rect_metrics, upper_bound_index


def _pair(rng, h=37, w=45):
    pred = rng.rand(h, w).astype(np.float32)
    gt = np.zeros((h, w), np.float32)
    gt[8:25, 10:35] = 1.0
    return pred, gt


def test_rect_metrics_full_rect_parity(rng):
    for _ in range(3):
        pred, gt = _pair(rng)
        h, w = pred.shape
        out = jax.jit(rect_metrics, static_argnames=())(
            jnp.asarray(pred), jnp.asarray(gt), h, w)
        f = f_measure_all(jnp.asarray(pred), jnp.asarray(gt))
        np.testing.assert_allclose(float(out["f_measure"]),
                                   float(f["f_measure"]), rtol=1e-5)
        np.testing.assert_allclose(float(out["f_max"]), float(f["f_max"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(out["f_mean"]), float(f["f_mean"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(out["iou"]),
                                   float(compute_iou(jnp.asarray(pred),
                                                     jnp.asarray(gt))),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(out["mae"]),
                                   float(compute_mae(jnp.asarray(pred),
                                                     jnp.asarray(gt))),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            float(out["pixel_acc"]),
            float(compute_pixel_accuracy(jnp.asarray(pred),
                                         jnp.asarray(gt))), rtol=1e-5)
        np.testing.assert_allclose(float(out["s_measure"]),
                                   float(s_measure(jnp.asarray(pred),
                                                   jnp.asarray(gt))),
                                   rtol=1e-4)


def test_rect_metrics_sub_rect_equals_cropped(rng):
    """Metrics on a (h, w) sub-rect of a canvas == metrics on the crop."""
    pred, gt = _pair(rng, 40, 48)
    canvas_p = np.zeros((64, 64), np.float32)
    canvas_g = np.zeros((64, 64), np.float32)
    canvas_p[:40, :48] = pred
    canvas_g[:40, :48] = gt
    # garbage outside the valid rect must not matter
    canvas_p[40:, :] = 0.9
    canvas_p[:, 48:] = 0.7

    sub = rect_metrics(jnp.asarray(canvas_p), jnp.asarray(canvas_g), 40, 48)
    ref = rect_metrics(jnp.asarray(pred), jnp.asarray(gt), 40, 48)
    for k in sub:
        np.testing.assert_allclose(float(sub[k]), float(ref[k]), rtol=1e-5,
                                   err_msg=k)


def test_upper_bound_index_quantities(rng):
    pred = rng.rand(5, 20, 20).astype(np.float32)
    gt = np.zeros((20, 20), np.float32)
    gt[5:15, 5:15] = 1.0
    pred[3, 5:15, 5:15] = 0.95   # best IoU query
    pred[3, :5, :] = 0.01
    idx = int(upper_bound_index(jnp.asarray(pred), jnp.asarray(gt), 20, 20,
                                "iou"))
    assert idx == 3
    for q in ("f_measure", "mae"):
        i = int(upper_bound_index(jnp.asarray(pred), jnp.asarray(gt), 20, 20,
                                  q))
        assert 0 <= i < 5


def test_eval_batch_metrics_shapes(rng):
    B, Q, H, W = 3, 4, 32, 32
    pred = jnp.asarray(rng.rand(B, Q, H, W).astype(np.float32))
    obj = jnp.asarray(rng.rand(B, Q).astype(np.float32))
    gt = jnp.asarray((rng.rand(B, H, W) > 0.5).astype(np.float32))
    sizes = jnp.asarray(np.tile([28, 30], (B, 1)).astype(np.int32))
    out = eval_batch_metrics(pred, obj, gt, sizes)
    assert out["iou"].shape == (B,)
    assert out["f_max_ub"].shape == (B,)
    # UB >= selected on the UB criterion
    assert (np.asarray(out["iou_ub"]) >= np.asarray(out["iou"]) - 1e-6).all()


def test_fsweep_kernel_matches_dense(rng):
    """ops.fsweep (interpret-mode Pallas + XLA twin) vs the dense
    rect_metrics sweep: integer-exact tp/cnt and bit-equal f_max."""
    from sod_tpu.ops.fsweep import fmax_tp_cnt

    B, M, H, W = 2, 2, 40, 48
    masks = rng.rand(B, M, H, W).astype(np.float32)
    gt = (rng.rand(B, H, W) > 0.6).astype(np.float32)
    sizes = np.asarray([[33, 41], [40, 48]], np.int32)
    rowv = np.arange(H)[None, :] < sizes[:, :1]
    colv = np.arange(W)[None, :] < sizes[:, 1:2]

    for interpret in (True, False):   # Pallas interpret vs XLA twin
        tp, cnt = fmax_tp_cnt(jnp.asarray(masks), jnp.asarray(gt),
                              jnp.asarray(rowv), jnp.asarray(colv),
                              interpret=interpret)
        assert tp.shape == cnt.shape == (B, M, 255)
        # dense reference counts per image/mask
        thr = np.arange(255, dtype=np.float32) / 255
        for b in range(B):
            h, w = sizes[b]
            valid = np.zeros((H, W), bool)
            valid[:h, :w] = True
            gtb = (gt[b] > 0) & valid
            for m in range(M):
                pv = np.where(valid, masks[b, m], 0.0)
                binary = (pv[None] > thr[:, None, None]) & valid[None]
                ref_tp = (binary & gtb[None]).sum((1, 2))
                ref_cnt = binary.sum((1, 2))
                np.testing.assert_array_equal(np.asarray(tp[b, m]), ref_tp)
                np.testing.assert_array_equal(np.asarray(cnt[b, m]), ref_cnt)


def test_eval_batch_metrics_fmax_bitequal_to_rect_metrics(rng):
    """The restructured eval_batch_metrics (fsweep path) must be
    BIT-equal to per-image rect_metrics with the dense sweep
    (VERDICT r3 next-round item 2's acceptance)."""
    B, Q, H, W = 3, 5, 40, 40
    pred = jnp.asarray(rng.rand(B, Q, H, W).astype(np.float32))
    obj = jnp.asarray(rng.rand(B, Q).astype(np.float32))
    gt = jnp.asarray((rng.rand(B, H, W) > 0.6).astype(np.float32))
    sizes = jnp.asarray(np.asarray([[30, 35], [40, 40], [21, 33]], np.int32))
    out = eval_batch_metrics(pred, obj, gt, sizes)
    for b in range(B):
        h, w = int(sizes[b, 0]), int(sizes[b, 1])
        sel = int(out["selected_index"][b])
        ub = int(out["ub_index"][b])
        ref_sel = rect_metrics(pred[b, sel], gt[b], h, w)
        ref_ub = rect_metrics(pred[b, ub], gt[b], h, w)
        for k, v in ref_sel.items():
            assert float(out[k][b]) == float(v), (k, b)
        for k, v in ref_ub.items():
            assert float(out[f"{k}_ub"][b]) == float(v), (k, b)
