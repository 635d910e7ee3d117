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
