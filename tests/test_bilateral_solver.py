"""Bilateral solver: matrix-free device solve vs a dense NumPy construction
of the same linear system, plus behavioural checks."""
import numpy as np
import pytest

from sod_tpu.postprocess.bilateral_solver import (
    BilateralGrid,
    _solve_device,
    bilateral_solver_output,
    fill_holes_and_select,
)

import jax.numpy as jnp


def _make_image(rng, h=24, w=30):
    img = np.full((h, w, 3), 40, np.uint8)
    img[6:18, 8:24] = 200                     # bright object
    img = img + rng.randint(0, 8, img.shape).astype(np.uint8)
    return img


def test_grid_construction(rng):
    img = _make_image(rng)
    grid = BilateralGrid(img, sigma_spatial=8, sigma_luma=8, sigma_chroma=8)
    assert grid.pixel_to_vertex.shape == (24 * 30,)
    assert grid.pixel_to_vertex.max() == grid.nvertices - 1
    # neighbour tables are symmetric: if a has +1 neighbour b, b has -1 a
    for d in range(5):
        fwd = grid.neighbors[d, 1]
        bwd = grid.neighbors[d, 0]
        for v in range(grid.nvertices):
            if fwd[v] >= 0:
                assert bwd[fwd[v]] == v


def test_solver_matches_dense_solve(rng):
    """The matrix-free CG must solve the same A y = b as an explicitly
    constructed dense system."""
    img = _make_image(rng)
    h, w = img.shape[:2]
    target = (np.asarray(img[..., 0]) > 100).astype(np.float64)
    conf = np.full((h, w), 0.999)
    lam = 256.0

    grid = BilateralGrid(img, sigma_spatial=8, sigma_luma=8, sigma_chroma=8)
    V = grid.nvertices
    idx = grid.pixel_to_vertex

    # dense splat & blur
    S = np.zeros((V, h * w))
    S[idx, np.arange(h * w)] = 1.0
    blur_mat = 2 * 5 * np.eye(V)
    for d in range(5):
        for oi in range(2):
            nb = grid.neighbors[d, oi]
            for v in range(V):
                if nb[v] >= 0:
                    blur_mat[v, nb[v]] += 1.0

    m = S @ np.ones(h * w)
    n = np.ones(V)
    for _ in range(10):
        n = np.sqrt(n * m / (blur_mat @ n))
    m_corr = n * (blur_mat @ n)
    Dn = np.diag(n)
    A_smooth = np.diag(m_corr) - Dn @ blur_mat @ Dn
    w_splat = S @ conf.reshape(-1)
    A = lam * A_smooth + np.diag(w_splat)
    b = S @ (target.reshape(-1) * conf.reshape(-1))
    y_dense = np.linalg.solve(A, b)
    expected = y_dense[idx].reshape(h, w)

    got = np.asarray(_solve_device(
        jnp.asarray(target, jnp.float32), jnp.asarray(conf, jnp.float32),
        jnp.asarray(idx), jnp.asarray(grid.neighbors),
        nvertices=V, lam=lam, cg_maxiter=200, cg_tol=1e-10)).reshape(h, w)

    np.testing.assert_allclose(got, expected, atol=5e-3, rtol=1e-2)


def test_output_shapes_and_edge_snap(rng):
    img = _make_image(rng)
    # noisy target roughly over the bright object
    target = np.zeros(img.shape[:2])
    target[5:19, 7:25] = 1.0
    soft, binary = bilateral_solver_output(img, target, sigma_spatial=4,
                                           sigma_luma=8, sigma_chroma=8)
    assert soft.shape == img.shape[:2]
    assert binary.shape == img.shape[:2]
    assert binary.dtype == bool
    # the solver keeps mass on the object
    assert soft[10, 15] > 0.5
    assert soft[1, 1] < 0.5


def test_fill_holes_and_select():
    m = np.zeros((20, 20), bool)
    m[4:16, 4:16] = True
    m[8:10, 8:10] = False       # hole -> filled
    out = fill_holes_and_select(m)
    assert out[9, 9]
    assert out.sum() == 12 * 12
