"""ctypes bindings for the C++ host kernels (``sodnative.cc``).

``lib()`` returns the loaded library, building it with ``make`` on first
use if a toolchain is available; returns None when unavailable — callers
fall back to their NumPy paths.  High-level wrappers mirror the NumPy
fallbacks' signatures.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libsodnative.so")
_lib = None
_tried = False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        l = ctypes.CDLL(_SO)
    except OSError:
        return None

    i64 = ctypes.c_int64
    l.rle_counts_from_mask.restype = i64
    l.rle_counts_from_mask.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), i64, i64,
        ctypes.POINTER(i64), i64]
    l.rle_mask_from_counts.restype = ctypes.c_int
    l.rle_mask_from_counts.argtypes = [
        ctypes.POINTER(i64), i64, ctypes.POINTER(ctypes.c_uint8), i64, i64]
    l.rle_string_from_counts.restype = i64
    l.rle_string_from_counts.argtypes = [
        ctypes.POINTER(i64), i64, ctypes.c_char_p, i64]
    l.rle_counts_from_string.restype = i64
    l.rle_counts_from_string.argtypes = [
        ctypes.c_char_p, i64, ctypes.POINTER(i64), i64]
    l.hungarian_solve.restype = None
    l.hungarian_solve.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    l.label_components.restype = ctypes.c_int
    l.label_components.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), i64, i64,
        ctypes.POINTER(ctypes.c_int32)]
    l.fill_holes.restype = None
    l.fill_holes.argtypes = [ctypes.POINTER(ctypes.c_uint8), i64, i64]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    l.png_encode.restype = i64
    l.png_encode.argtypes = [u8p, i64, i64, i64, ctypes.c_int, u8p, i64]
    l.resample_u8.restype = ctypes.c_int
    l.resample_u8.argtypes = [u8p, i64, i64, i64, u8p, i64, i64,
                              ctypes.c_int]
    l.jet_blend.restype = None
    l.jet_blend.argtypes = [u8p, u8p, u8p, u8p, i64]
    l.blur_mirror_f32.restype = None
    l.blur_mirror_f32.argtypes = [f32p, f32p, i64, i64, i64, f32p,
                                  ctypes.c_int]
    l.affine_clip_f32.restype = None
    l.affine_clip_f32.argtypes = [f32p, i64, ctypes.c_float, ctypes.c_float]
    l.saturate_clip_f32.restype = None
    l.saturate_clip_f32.argtypes = [f32p, i64, ctypes.c_float]
    l.gray_mean_f32.restype = ctypes.c_double
    l.gray_mean_f32.argtypes = [f32p, i64]
    l.hue_shift_u8.restype = None
    l.hue_shift_u8.argtypes = [u8p, u8p, i64, ctypes.c_int]
    l.hue_shift_f32.restype = None
    l.hue_shift_f32.argtypes = [f32p, f32p, i64, ctypes.c_int]
    l.grayscale3_f32.restype = None
    l.grayscale3_f32.argtypes = [f32p, f32p, i64]
    l.resize_nearest_u8.restype = None
    l.resize_nearest_u8.argtypes = [u8p, i64, i64, i64, u8p, i64, i64]
    l.channel_mean3_f32.restype = None
    l.channel_mean3_f32.argtypes = [f32p, i64,
                                    ctypes.POINTER(ctypes.c_double)]
    l.quantize_u8.restype = None
    l.quantize_u8.argtypes = [f32p, u8p, i64]
    _lib = l
    return _lib


def available() -> bool:
    return lib() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


# ---------------------------------------------------------------------------
# High-level wrappers
# ---------------------------------------------------------------------------

def counts_from_mask(mask: np.ndarray) -> Optional[np.ndarray]:
    l = lib()
    if l is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    buf = np.empty(h * w + 2, np.int64)
    n = l.rle_counts_from_mask(_u8p(mask), h, w, _i64p(buf), buf.size)
    if n < 0:
        return None
    return buf[:n].copy()


def mask_from_counts(counts: np.ndarray, h: int, w: int) -> Optional[np.ndarray]:
    l = lib()
    if l is None:
        return None
    counts = np.ascontiguousarray(counts, np.int64)
    out = np.empty((h, w), np.uint8)
    if l.rle_mask_from_counts(_i64p(counts), len(counts), _u8p(out), h, w):
        raise ValueError("RLE counts do not sum to h*w")
    return out


def string_from_counts(counts: np.ndarray) -> Optional[str]:
    l = lib()
    if l is None:
        return None
    counts = np.ascontiguousarray(counts, np.int64)
    buf = ctypes.create_string_buffer(16 * len(counts) + 16)
    n = l.rle_string_from_counts(_i64p(counts), len(counts), buf,
                                 len(buf))
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")


def counts_from_string(s: str) -> Optional[np.ndarray]:
    l = lib()
    if l is None:
        return None
    raw = s.encode("ascii")
    buf = np.empty(len(raw) + 2, np.int64)
    n = l.rle_counts_from_string(raw, len(raw), _i64p(buf), buf.size)
    if n < 0:
        return None
    return buf[:n].copy()


def hungarian(cost: np.ndarray) -> Optional[np.ndarray]:
    l = lib()
    if l is None:
        return None
    cost = np.ascontiguousarray(cost, np.float64)
    nr, nc = cost.shape
    out = np.empty(nr, np.int32)
    l.hungarian_solve(cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                      nr, nc, out.ctypes.data_as(
                          ctypes.POINTER(ctypes.c_int)))
    return out


def label(binary: np.ndarray):
    l = lib()
    if l is None:
        return None
    binary = np.ascontiguousarray(binary, np.uint8)
    h, w = binary.shape
    out = np.empty((h, w), np.int32)
    n = l.label_components(_u8p(binary), h, w,
                           out.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_int32)))
    return out, n


def fill_holes(binary: np.ndarray) -> Optional[np.ndarray]:
    l = lib()
    if l is None:
        return None
    out = np.ascontiguousarray(binary, np.uint8).copy()
    l.fill_holes(_u8p(out), out.shape[0], out.shape[1])
    return out.astype(bool)


# ---------------------------------------------------------------------------
# Image kernels (sodimage.cc) — the /predict and loader hot stages
# ---------------------------------------------------------------------------

def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def png_encode(img: np.ndarray, filter_sub: bool = True) -> Optional[bytes]:
    """[H, W] or [H, W, 3] uint8 -> PNG bytes (fast fixed-Huffman
    deflate; lossless — any decoder round-trips the pixels).  None when
    the lib is unavailable (callers fall back to PIL)."""
    l = lib()
    if l is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    if c not in (1, 3):
        return None
    cap = h * (w * c + 1) * 9 // 8 + 4096
    out = np.empty(cap, np.uint8)
    n = l.png_encode(_u8p(img), h, w, c, 1 if filter_sub else 0,
                     _u8p(out), cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def resize_u8(img: np.ndarray, size_hw, mode: str = "bilinear"
              ) -> Optional[np.ndarray]:
    """PIL-exact (bit-identical) uint8 resize, [H, W] or [H, W, 3];
    ``mode`` in {'bilinear', 'lanczos'}."""
    l = lib()
    if l is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    if c not in (1, 3):
        return None
    oh, ow = size_hw
    out = np.empty((oh, ow) if img.ndim == 2 else (oh, ow, c), np.uint8)
    fid = {"bilinear": 0, "lanczos": 1}[mode]
    if l.resample_u8(_u8p(img), h, w, c, _u8p(out), oh, ow, fid):
        return None
    return out


def jet_blend(rgb: np.ndarray, mask: np.ndarray,
              lut: np.ndarray) -> Optional[np.ndarray]:
    """(rgb + lut[mask]) >> 1 in one pass; rgb [H, W, 3] u8, mask [H, W]
    u8, lut [256, 3] u8 — bit-identical to the NumPy LUT path."""
    l = lib()
    if l is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    mask = np.ascontiguousarray(mask, np.uint8)
    lut = np.ascontiguousarray(lut, np.uint8)
    out = np.empty_like(rgb)
    l.jet_blend(_u8p(rgb), _u8p(mask), _u8p(lut), _u8p(out),
                mask.shape[0] * mask.shape[1])
    return out


def blur_mirror(img: np.ndarray, kernel: np.ndarray) -> Optional[np.ndarray]:
    """Separable blur with reflect-101 border + [0, 255] clip on float32
    [H, W, C] (the scipy.correlate1d twin in augment.gaussian_blur)."""
    l = lib()
    if l is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    kernel = np.ascontiguousarray(kernel, np.float32)
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    out = np.empty_like(img)
    l.blur_mirror_f32(_f32p(img), _f32p(out), h, w, c, _f32p(kernel),
                      len(kernel))
    return out


def affine_clip_(img: np.ndarray, a: float, b: float) -> bool:
    """In-place clip(img * a + b, 0, 255) on contiguous float32."""
    l = lib()
    if l is None or img.dtype != np.float32 or not img.flags.c_contiguous:
        return False
    l.affine_clip_f32(_f32p(img), img.size, a, b)
    return True


def saturate_clip_(img: np.ndarray, f: float) -> bool:
    """In-place torchvision-saturation on contiguous float32 [H, W, 3]."""
    l = lib()
    if l is None or img.dtype != np.float32 or not img.flags.c_contiguous:
        return False
    l.saturate_clip_f32(_f32p(img), img.shape[0] * img.shape[1], f)
    return True


def gray_mean(img: np.ndarray) -> Optional[float]:
    l = lib()
    if l is None or img.dtype != np.float32 or not img.flags.c_contiguous:
        return None
    return float(l.gray_mean_f32(_f32p(img), img.shape[0] * img.shape[1]))


def resize_nearest(masks: np.ndarray, size_hw) -> Optional[np.ndarray]:
    """Nearest resize of a uint8 [M, H, W] mask stack (torch 'nearest'
    convention src = floor(dst * in/out) — the resize_mask_nearest
    twin, bit-identical)."""
    l = lib()
    if l is None or masks.dtype != np.uint8 or masks.ndim != 3:
        return None
    masks = np.ascontiguousarray(masks)
    m, h, w = masks.shape
    oh, ow = size_hw
    out = np.empty((m, oh, ow), np.uint8)
    l.resize_nearest_u8(_u8p(masks), m, h, w, _u8p(out), oh, ow)
    return out


def channel_mean3(img: np.ndarray) -> Optional[np.ndarray]:
    """Per-channel mean of float32 [H, W, 3] (double accumulation)."""
    l = lib()
    if l is None or img.dtype != np.float32 or not img.flags.c_contiguous:
        return None
    out = np.empty(3, np.float64)
    l.channel_mean3_f32(_f32p(img), img.shape[0] * img.shape[1],
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def quantize_u8(img: np.ndarray) -> Optional[np.ndarray]:
    """clip(round(img), 0, 255).astype(uint8) in one pass (np.round
    semantics: round-half-to-even)."""
    l = lib()
    if l is None or img.dtype != np.float32 or not img.flags.c_contiguous:
        return None
    out = np.empty(img.shape, np.uint8)
    l.quantize_u8(_f32p(img), _u8p(out), img.size)
    return out


def hue_shift(rgb_u8: np.ndarray, delta: int) -> Optional[np.ndarray]:
    """PIL-exact hue rotation via the uint8 HSV round-trip: rgb ->
    convert('HSV') -> H = (H + delta) % 256 -> convert('RGB').
    Bit-identical to PIL over the full 256^3 RGB cube (test-locked)."""
    l = lib()
    if l is None:
        return None
    rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
    out = np.empty_like(rgb_u8)
    l.hue_shift_u8(_u8p(rgb_u8), _u8p(out),
                   rgb_u8.shape[0] * rgb_u8.shape[1], int(delta) % 256)
    return out


def grayscale3(img_f32: np.ndarray) -> Optional[np.ndarray]:
    """round(ITU-R 601-2 luma) on all three channels (np.round
    half-to-even), the augment.to_grayscale twin."""
    l = lib()
    if (l is None or img_f32.dtype != np.float32
            or not img_f32.flags.c_contiguous):
        return None
    out = np.empty_like(img_f32)
    l.grayscale3_f32(_f32p(img_f32), _f32p(out),
                     img_f32.shape[0] * img_f32.shape[1])
    return out


def hue_shift_f32(rgb_f32: np.ndarray, delta: int) -> Optional[np.ndarray]:
    """``hue_shift`` with the float32->uint8->float32 casts fused in
    (the augment pipeline's dtype; values must be in [0, 255])."""
    l = lib()
    if (l is None or rgb_f32.dtype != np.float32
            or not rgb_f32.flags.c_contiguous):
        return None
    out = np.empty_like(rgb_f32)
    l.hue_shift_f32(_f32p(rgb_f32), _f32p(out),
                    rgb_f32.shape[0] * rgb_f32.shape[1], int(delta) % 256)
    return out
