"""Utility helpers (ref ``utils/misc.py``), NumPy/JAX versions."""
from __future__ import annotations

import random
import re
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

import numpy as np


def set_seeds(seed: int) -> None:
    """ref ``utils/misc.py:39-40`` (random / numpy; JAX uses explicit keys)."""
    random.seed(seed)
    np.random.seed(seed)


def to_one_hot(mask: np.ndarray, k: Optional[int] = None) -> np.ndarray:
    """Index mask -> one-hot stack (ref ``utils/misc.py:10-36``).

    [H, W] -> [k, H, W];  [B, H, W] -> [B, k, H, W]  (float32).
    """
    mask = np.asarray(mask)
    if k is None:
        k = len(np.unique(mask))
    flat = mask.astype(np.int64)
    eye = np.eye(k, dtype=np.float32)
    if mask.ndim == 2:
        return eye[flat].transpose(2, 0, 1)
    if mask.ndim == 3:
        return eye[flat].transpose(0, 3, 1, 2)
    raise ValueError(mask.ndim)


def mask_to_bbox(mask: np.ndarray) -> Dict[int, Tuple[int, int, int, int]]:
    """Binary mask(s) -> {index: (ymin, ymax, xmin, xmax)} (ref
    ``utils/misc.py:269-282``); empty masks are skipped.

    Row/col ``any`` reductions over the whole stack instead of a
    per-mask ``np.where`` (which materializes every nonzero index):
    identical bboxes, ~5x less host time on the 27-candidate maskgen
    stacks this feeds."""
    if mask.ndim == 2:
        mask = mask[None]
    nz = mask != 0
    h, w = nz.shape[1:]
    rows = nz.any(axis=2)                       # [n, H]
    cols = nz.any(axis=1)                       # [n, W]
    out = {}
    for i in range(len(nz)):
        r, c = rows[i], cols[i]
        if not r.any():
            continue
        out[i] = (int(r.argmax()), h - 1 - int(r[::-1].argmax()),
                  int(c.argmax()), w - 1 - int(c[::-1].argmax()))
    return out


def filter_masks(
    dt_masks: np.ndarray,
    remove_long_masks: bool = True,
    remove_small_large_masks: bool = False,
) -> Tuple[np.ndarray, Dict[int, int]]:
    """Drop degenerate candidate masks (ref ``utils/misc.py:285-315``):

    * ``remove_long_masks``: masks whose bbox spans a full image edge
      (ymin == 0 and ymax+1 == H, or xmin == 0 and xmax+1 == W);
    * ``remove_small_large_masks``: area < 5% of the image or bbox > 95%.

    Returns (filtered stack, new_index -> original_index).  If everything
    is filtered, returns the input unchanged (ref RuntimeError fallback).
    """
    h, w = dt_masks.shape[-2:]
    kept = []
    mapping: Dict[int, int] = {}
    bboxes = mask_to_bbox(dt_masks)
    for idx, (ymin, ymax, xmin, xmax) in bboxes.items():
        if remove_long_masks:
            if ymin == 0 and ymax + 1 == h:
                continue
            if xmin == 0 and xmax + 1 == w:
                continue
        if remove_small_large_masks:
            if dt_masks[idx].sum() < 0.05 * h * w:
                continue
            if (xmax - xmin) * (ymax - ymin) > 0.95 * h * w:
                continue
        mapping[len(kept)] = idx
        kept.append(dt_masks[idx])
    if not kept:
        return dt_masks, {i: i for i in range(len(dt_masks))}
    return np.stack(kept, 0), mapping


def get_image_paths(pattern: Union[str, "re.Pattern"], dir_base: str = ".",
                    ext: str = "png"):
    """Regex-filtered recursive file walk (ref ``utils/misc.py:249-266``)."""
    if isinstance(pattern, str):
        pattern = re.compile(pattern)
    candidates = list(Path(dir_base).rglob(f"*.{ext}"))
    assert candidates, f"No candidate files found under {dir_base}"

    def natural_key(s: str):
        # the reference natsort-orders its walk (utils/misc.py:256:
        # ``natsorted``) — img2 before img10; digit runs compare
        # numerically, text case-insensitively
        return [int(t) if t.isdigit() else t.lower()
                for t in re.split(r"(\d+)", s)]

    p_imgs = sorted(
        (str(p.resolve()) for p in candidates
         if pattern.match(str(p.resolve())) is not None),
        key=natural_key)
    if not p_imgs:
        raise FileNotFoundError(f"no files matching {pattern.pattern}")
    return p_imgs
