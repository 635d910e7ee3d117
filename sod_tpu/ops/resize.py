"""Image resize kernels with torch ``F.interpolate`` parity.

The reference relies on torch's resize semantics in accuracy-critical spots:
bicubic pos-embed interpolation (``networks/vision_transformer.py:392-397``),
bilinear pixel-decoder upsampling (``networks/maskformer/maskformer.py:161``),
the evaluator's ×4 bilinear upsample (``evaluator.py`` pyc 209-211) and the
mask-generator's nearest upsample.  ``jax.image.resize`` uses a different
bicubic kernel (A=-0.5 vs torch's A=-0.75), so we build the interpolation as
explicit separable weight matrices: for static shapes the (out, in) matrices
are computed in NumPy at trace time and become constants, and the resize is
two dense matmuls — exact torch parity *and* MXU-friendly.

All functions take NHWC or [..., H, W] layouts as documented per function.
torch semantics reproduced: ``align_corners=False`` half-pixel sampling with
edge clamping, no antialiasing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch's bicubic convolution kernel (Keys, A=-0.75)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """Dense (out_size, in_size) interpolation matrix, torch-compatible."""
    if in_size == out_size and mode in ("bilinear", "bicubic"):
        return np.eye(out_size, dtype=np.float32)
    scale = in_size / out_size
    # half-pixel source coordinates (align_corners=False)
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "bilinear":
        # torch clamps the source coordinate at 0 before splitting into
        # floor + frac (see upsample_bilinear2d's area_pixel_compute_source_index)
        src_c = np.clip(src, 0.0, None)
        i0 = np.floor(src_c).astype(np.int64)
        frac = src_c - i0
        i0 = np.clip(i0, 0, in_size - 1)
        i1 = np.clip(i0 + 1, 0, in_size - 1)
        for o in range(out_size):
            mat[o, i0[o]] += 1.0 - frac[o]
            mat[o, i1[o]] += frac[o]
    elif mode == "bicubic":
        # torch does NOT clamp src before the kernel; taps are edge-clamped
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        for o in range(out_size):
            for t in range(-1, 3):
                w = _cubic_kernel(np.array(t - frac[o]))
                idx = int(np.clip(i0[o] + t, 0, in_size - 1))
                mat[o, idx] += float(w)
    elif mode == "nearest":
        # torch 'nearest': src = floor(out * scale)
        idx = np.minimum((np.arange(out_size) * scale).astype(np.int64), in_size - 1)
        for o in range(out_size):
            mat[o, idx[o]] = 1.0
    else:
        raise ValueError(mode)
    return mat.astype(np.float32)


def _apply_separable(x: jax.Array, out_h: int, out_w: int, mode: str) -> jax.Array:
    """Resize the last two axes of ``x`` ([..., H, W]) to (out_h, out_w)."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    wh = jnp.asarray(_resize_matrix(in_h, out_h, mode))
    ww = jnp.asarray(_resize_matrix(in_w, out_w, mode))
    xf = x.astype(jnp.float32)
    # [..., H, W] @ (W, out_w) -> [..., H, out_w]
    y = jnp.einsum("...hw,wW->...hW", xf, ww.T,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("...hW,hH->...HW", y, wh.T,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def interpolate_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch ``F.interpolate(mode='bilinear', align_corners=False)`` over the
    trailing two axes of ``x``."""
    return _apply_separable(x, out_h, out_w, "bilinear")


def interpolate_bicubic(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch ``F.interpolate(mode='bicubic', align_corners=False)``."""
    return _apply_separable(x, out_h, out_w, "bicubic")


def interpolate_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch ``F.interpolate(mode='nearest')``."""
    return _apply_separable(x, out_h, out_w, "nearest")


def resize_shorter_edge(size_hw, target: int):
    """Compute the torchvision ``Resize(int)``-style output size: scale so the
    shorter edge equals ``target`` (ref
    ``datasets/augmentations/geometric_transforms.py`` resize(edge='shorter'))."""
    h, w = size_hw
    # int() truncation, not round(): ref compute_size uses
    # ``int(float(w) / h * output_size)`` (geometric_transforms.py:54-67)
    if h <= w:
        return target, max(1, int(float(w) / h * target))
    return max(1, int(float(h) / w * target)), target
