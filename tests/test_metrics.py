"""Metric parity vs torch transcriptions of the reference formulas
(metrics/f_measure.py, metrics/s_measure.py, iou/mae/pixel_acc)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sod_tpu.metrics import (  # noqa: E402
    AverageMeter,
    compute_iou,
    compute_mae,
    compute_pixel_accuracy,
    f_measure_all,
    s_measure,
)


# ----- torch reference transcriptions (standard published formulas) --------

def torch_f_all(pred, gt, beta_square=0.3, n_bins=255, eps=1e-7):
    pred_t, gt_t = torch.from_numpy(pred), torch.from_numpy(gt)
    b2 = beta_square ** 2

    def pr(binary):
        tp = torch.logical_and(binary, gt_t).sum(dim=(-1, -2))
        prec = tp / (binary.sum(dim=(-1, -2)) + eps)
        rec = tp / (gt_t.sum(dim=(-1, -2)) + eps)
        return prec, rec

    def f(prec, rec):
        return ((1 + b2) * prec * rec) / (b2 * prec + rec + eps)

    out = {}
    out["f_measure"] = f(*pr(pred_t > 0.5)).item()
    preds = pred_t.unsqueeze(0).repeat(n_bins, 1, 1)
    gts = gt_t.unsqueeze(0).repeat(n_bins, 1, 1)
    thresholds = torch.arange(0, 1, 1 / n_bins).view(n_bins, 1, 1)
    tp = torch.logical_and(preds > thresholds, gts).sum(dim=(-1, -2))
    prec = tp / ((preds > thresholds).sum(dim=(-1, -2)) + eps)
    rec = tp / (gts.sum(dim=(-1, -2)) + eps)
    out["f_max"] = f(prec, rec).max().item()
    adaptive = 2 * pred_t.mean(dim=(-1, -2), keepdim=True)
    out["f_mean"] = f(*pr(pred_t > adaptive)).item()
    return out


def torch_s_measure(pred, gt, alpha=0.5):
    pred = torch.from_numpy(pred)
    gt = torch.from_numpy(gt).float()

    def ssim(p, g):
        g = g.float()
        h, w = p.size()[-2:]
        N = h * w
        if N == 0:
            return torch.tensor(0.0)
        x, y = p.mean(), g.mean()
        sx = ((p - x) ** 2).sum() / (N - 1 + 1e-20)
        sy = ((g - y) ** 2).sum() / (N - 1 + 1e-20)
        sxy = ((p - x) * (g - y)).sum() / (N - 1 + 1e-20)
        aplha = 4 * x * y * sxy
        beta = (x * x + y * y) * (sx + sy)
        if aplha != 0:
            return aplha / (beta + 1e-20)
        elif aplha == 0 and beta == 0:
            return torch.tensor(1.0)
        return torch.tensor(0.0)

    def obj(p, g):
        temp = p[g == 1]
        if temp.numel() == 0:
            return torch.tensor(0.0)
        x = temp.mean()
        sigma = temp.std() if temp.numel() > 1 else torch.tensor(0.0)
        return 2.0 * x / (x * x + 1.0 + sigma + 1e-20)

    def s_object(p, g):
        fg = torch.where(g == 0, torch.zeros_like(p), p)
        bg = torch.where(g == 1, torch.zeros_like(p), 1 - p)
        u = g.mean()
        return u * obj(fg, g) + (1 - u) * obj(bg, 1 - g)

    def centroid(g):
        rows, cols = g.shape
        if g.sum() == 0:
            return round(cols / 2), round(rows / 2)
        total = g.sum()
        i = torch.arange(cols).float()
        j = torch.arange(rows).float()
        X = torch.round((g.sum(dim=0) * i).sum() / total)
        Y = torch.round((g.sum(dim=1) * j).sum() / total)
        return int(X), int(Y)

    def s_region(p, g):
        X, Y = centroid(g)
        h, w = g.shape
        area = h * w
        gs = [g[:Y, :X], g[:Y, X:], g[Y:, :X], g[Y:, X:]]
        ps = [p[:Y, :X], p[:Y, X:], p[Y:, :X], p[Y:, X:]]
        w1 = X * Y / area
        w2 = (w - X) * Y / area
        w3 = X * (h - Y) / area
        w4 = 1 - w1 - w2 - w3
        ws = [w1, w2, w3, w4]
        return sum(wt * ssim(pp, gg) for wt, pp, gg in zip(ws, ps, gs))

    y = gt.mean()
    if y == 0:
        return (1 - pred.mean()).item()
    if y == 1:
        return pred.mean().item()
    g = (gt >= 0.5).float()
    q = alpha * s_object(pred, g) + (1 - alpha) * s_region(pred, g)
    return max(float(q), 0.0)


# ----- tests ----------------------------------------------------------------

def _random_pair(rng, h=33, w=41):
    pred = rng.rand(h, w).astype(np.float32)
    gt = np.zeros((h, w), np.float32)
    # a random blob
    cy, cx = rng.randint(5, h - 5), rng.randint(5, w - 5)
    ry, rx = rng.randint(3, 8), rng.randint(3, 10)
    gt[max(0, cy - ry):cy + ry, max(0, cx - rx):cx + rx] = 1.0
    return pred, gt


def test_iou_mae_pixel_acc(rng):
    pred, gt = _random_pair(rng)
    iou = float(compute_iou(jnp.asarray(pred), jnp.asarray(gt)))
    inter = np.logical_and(pred > 0.5, gt).sum()
    union = np.logical_or(pred > 0.5, gt).sum()
    np.testing.assert_allclose(iou, inter / (union + 1e-7), rtol=1e-6)

    mae = float(compute_mae(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(mae, np.abs(pred - gt).mean(), rtol=1e-6)

    acc = float(compute_pixel_accuracy(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(acc, ((pred > 0.5) == gt).mean(), rtol=1e-6)


def test_f_measure_parity(rng):
    for _ in range(3):
        pred, gt = _random_pair(rng)
        ours = jax.jit(f_measure_all)(jnp.asarray(pred), jnp.asarray(gt))
        theirs = torch_f_all(pred, gt)
        for k in ("f_measure", "f_max", "f_mean"):
            np.testing.assert_allclose(float(ours[k]), theirs[k], rtol=1e-4,
                                       err_msg=k)


def test_s_measure_parity(rng):
    for _ in range(5):
        pred, gt = _random_pair(rng)
        ours = float(jax.jit(s_measure)(jnp.asarray(pred), jnp.asarray(gt)))
        theirs = torch_s_measure(pred, gt)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_s_measure_degenerate():
    pred = jnp.full((16, 16), 0.3)
    empty = jnp.zeros((16, 16))
    full = jnp.ones((16, 16))
    np.testing.assert_allclose(float(s_measure(pred, empty)), 0.7, rtol=1e-6)
    np.testing.assert_allclose(float(s_measure(pred, full)), 0.3, rtol=1e-6)


def test_f_measure_vmap(rng):
    preds = np.stack([_random_pair(rng)[0] for _ in range(4)])
    gts = np.stack([_random_pair(rng)[1] for _ in range(4)])
    batched = jax.vmap(f_measure_all)(jnp.asarray(preds), jnp.asarray(gts))
    assert batched["f_max"].shape == (4,)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, 2)
    m.update(4.0, 1)
    np.testing.assert_allclose(m.avg, 2.0)
    np.testing.assert_allclose(m.sum, 6.0)
    assert m.count == 3
