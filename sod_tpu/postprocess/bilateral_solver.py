"""Fast bilateral solver (Barron & Poole) — ref ``bilateral_solver.py``.

Same algorithm, TPU-native execution:

* the data-dependent bilateral-grid construction (5-D XYLUV coordinate
  hashing -> unique vertices, ref ``bilateral_solver.py:40-104``) runs once
  per image on the host in NumPy, producing a pixel->vertex index map and
  per-dimension neighbour tables;
* everything numeric runs on device as ONE jit region: splat is a
  ``segment_sum``, the [1 0 1] blur is a masked neighbour gather-add,
  bistochastization (10 fixed Jacobi iterations, ref ``:107-118``) and the
  Jacobi-preconditioned conjugate-gradient solve (25 iters, tol 1e-5, ref
  ``:121-149``) use ``jax.scipy.sparse.linalg.cg`` over the matrix-free
  operator ``A = lam * (Dm - Dn blur Dn) + diag(splat(w))`` — no sparse
  matrices materialised;
* the binary post-step (fill holes -> connected components -> keep the
  second-largest region, background being the largest, ref ``:184-193``)
  runs in scipy.ndimage on host (with the C++ native CCL fast path when
  built).

Defaults mirror ``bilateral_solver_output`` (ref ``:152-193``): confidence
0.999, lam 256, sigmas (spatial 16, luma 16, chroma 8).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

RGB_TO_YUV = np.array([
    [0.299, 0.587, 0.114],
    [-0.168736, -0.331264, 0.5],
    [0.5, -0.418688, -0.081312]])
YUV_OFFSET = np.array([0, 128.0, 128.0]).reshape(1, 1, -1)
MAX_VAL = 255.0


def rgb2yuv(im: np.ndarray) -> np.ndarray:
    return np.tensordot(im, RGB_TO_YUV, ([2], [1])) + YUV_OFFSET


class BilateralGrid:
    """Host-side grid construction: pixel->vertex map + neighbour tables."""

    def __init__(self, im: np.ndarray, sigma_spatial: int = 32,
                 sigma_luma: int = 8, sigma_chroma: int = 8):
        im_yuv = rgb2yuv(im.astype(np.float64))
        Iy, Ix = np.mgrid[:im.shape[0], :im.shape[1]]
        coords = np.dstack([
            (Ix / sigma_spatial).astype(int),
            (Iy / sigma_spatial).astype(int),
            (im_yuv[..., 0] / sigma_luma).astype(int),
            (im_yuv[..., 1] / sigma_chroma).astype(int),
            (im_yuv[..., 2] / sigma_chroma).astype(int),
        ]).reshape(-1, 5)
        self.npixels, self.dim = coords.shape
        # mixed-radix hash over the ACTUAL per-dim coordinate ranges — the
        # reference's fixed base-255 hash (bilateral_solver.py:55) silently
        # collides once any grid coordinate exceeds 255 (e.g. a >8160px-
        # wide upload at sigma_spatial=32), fusing unrelated vertices
        coords -= coords.min(axis=0)
        # radix = max coord + 2, so the +-1 neighbour probes (digits -1 and
        # max+1) can never alias a real vertex via digit carry/borrow
        extents = coords.max(axis=0).astype(np.int64) + 2
        hash_vec = np.concatenate([[1], np.cumprod(extents[:-1])])
        hashed = coords.astype(np.int64) @ hash_vec
        uniq, uniq_idx, self.pixel_to_vertex = np.unique(
            hashed, return_index=True, return_inverse=True)
        self.nvertices = len(uniq)
        uniq_coords = coords[uniq_idx]

        # neighbour tables: for each dim and offset +-1, the neighbouring
        # vertex index or -1 (ref blur matrices, :72-84)
        nbrs = np.full((self.dim, 2, self.nvertices), -1, np.int64)
        for d in range(self.dim):
            for oi, off in enumerate((-1, 1)):
                shifted = uniq_coords.copy()
                shifted[:, d] += off
                nh = shifted @ hash_vec
                locs = np.searchsorted(uniq, nh)
                locs = np.clip(locs, 0, self.nvertices - 1)
                hit = uniq[locs] == nh
                nbrs[d, oi, hit] = locs[hit]
        self.neighbors = nbrs


@partial(jax.jit, static_argnames=("nvertices", "lam", "cg_maxiter",
                                   "cg_tol", "bs_maxiter"))
def _solve_device(target, confidence, pixel_to_vertex, neighbors,
                  nvertices: int, lam: float = 256.0,
                  cg_maxiter: int = 25, cg_tol: float = 1e-5,
                  bs_maxiter: int = 10):
    """Bistochastize + PCG solve, fully on device."""
    t = target.astype(jnp.float32).reshape(-1)
    c = confidence.astype(jnp.float32).reshape(-1)
    idx = pixel_to_vertex
    dim = neighbors.shape[0]

    def splat(x):
        return jax.ops.segment_sum(x, idx, num_segments=nvertices)

    def blur(y):
        out = 2.0 * dim * y
        for d in range(dim):
            for oi in range(2):
                nb = neighbors[d, oi]
                contrib = jnp.where(nb >= 0, y[jnp.clip(nb, 0)], 0.0)
                out = out + contrib
        return out

    # bistochastization (ref :107-118)
    m = splat(jnp.ones_like(t))
    n = jnp.ones(nvertices, jnp.float32)

    def bs_step(_, n):
        return jnp.sqrt(jnp.maximum(n * m / jnp.maximum(blur(n), 1e-20), 0.0))

    n = jax.lax.fori_loop(0, bs_maxiter, bs_step, n)
    m_corr = n * blur(n)

    w_splat = splat(c)
    b = splat(t * c)
    y0 = b / jnp.maximum(w_splat, 1e-10)

    def A(y):
        smooth = m_corr * y - n * blur(n * y)
        return lam * smooth + w_splat * y

    a_diag = lam * (m_corr - n * n * (2.0 * dim)) + w_splat
    a_diag = jnp.maximum(a_diag, 1e-5)      # A_diag_min (ref :144)

    def precond(y):
        return y / a_diag

    y, _ = jax.scipy.sparse.linalg.cg(A, b, x0=y0, M=precond,
                                      maxiter=cg_maxiter, tol=cg_tol)
    return y[idx]


def fill_holes_and_select(binary: np.ndarray) -> np.ndarray:
    """fill holes -> CCL -> second-largest region (ref :184-193).

    Uses the C++ native kernels (sod_tpu/native) when built; scipy.ndimage
    otherwise — both 4-connectivity, identical results."""
    from sod_tpu import native as _native

    if _native.available():
        filled = _native.fill_holes(binary.astype(np.uint8))
        labeled, nr = _native.label(filled.astype(np.uint8))
    else:
        from scipy import ndimage

        filled = ndimage.binary_fill_holes(binary)
        labeled, nr = ndimage.label(filled)
    counts = np.bincount(labeled.reshape(-1), minlength=nr + 1)
    order = np.argsort(counts)
    if len(order) >= 2:
        return labeled == order[-2]
    return np.ones(binary.shape, bool)


def _bucket(n: int, floor: int) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


def bilateral_solver_output(
    img, target: np.ndarray, sigma_spatial: int = 16, sigma_luma: int = 16,
    sigma_chroma: int = 8, lam: float = 256.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """ref ``bilateral_solver_output`` (:152-193): returns (soft, binary).

    Vertex and pixel counts are padded to power-of-two buckets before the
    jitted solve: nvertices is content-dependent (the occupied-cell count)
    and npixels is size-dependent, so without bucketing EVERY distinct
    image triggers a fresh XLA compile (30s-to-minutes through a remote-
    compile tunnel).  Padded pixels carry zero target/confidence and point
    at a disconnected dummy vertex, so real-vertex results are identical.
    """
    reference = np.asarray(img)
    h, w = target.shape

    grid = BilateralGrid(reference, sigma_spatial=sigma_spatial,
                         sigma_luma=sigma_luma, sigma_chroma=sigma_chroma)

    nv = grid.nvertices
    nv_pad = _bucket(nv + 1, 512)          # +1: the dummy vertex must exist
    nbrs = np.full((grid.neighbors.shape[0], 2, nv_pad), -1, np.int64)
    nbrs[:, :, :nv] = grid.neighbors

    npix = h * w
    np_pad = _bucket(npix, 1 << 16)
    t = np.zeros(np_pad, np.float32)
    t[:npix] = np.asarray(target, np.float32).reshape(-1)
    c = np.zeros(np_pad, np.float32)
    c[:npix] = 0.999                        # ref confidence (:173)
    idx = np.full(np_pad, nv_pad - 1, np.int64)
    idx[:npix] = grid.pixel_to_vertex

    soft = np.asarray(_solve_device(
        jnp.asarray(t), jnp.asarray(c), jnp.asarray(idx), jnp.asarray(nbrs),
        nvertices=nv_pad, lam=lam))[:npix].reshape(h, w)

    binary = fill_holes_and_select(soft > 0.5)
    return soft, binary
