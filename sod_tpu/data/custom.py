"""Path-list dataset for feature extraction / pseudo-mask generation
(ref ``datasets/custom_dataset.py:7-32``): resize + ImageNet normalize."""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
from PIL import Image

from sod_tpu.data.augment import normalize, resize_pil


class CustomDataset:
    def __init__(self, image_paths: List[str],
                 image_size: Optional[int] = None, square: bool = False,
                 raw_uint8: bool = False):
        """:param square: resize to exactly (image_size, image_size) instead
        of shorter-edge (needed for fixed-shape batched feature extraction;
        the DUTS pseudo-masks are stored at the square train resolution,
        ref ``datasets/duts.py:117-119``).
        :param raw_uint8: additionally return the resized image as uint8
        under ``image_u8`` (the mask generator ships uint8 and normalizes
        on device — 4x less host->device traffic)."""
        assert len(image_paths) > 0, "No image paths are given."
        self.image_paths = image_paths
        self.image_size = image_size
        self.square = square
        self.raw_uint8 = raw_uint8

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, index: int) -> dict:
        p = self.image_paths[index]
        img = Image.open(p).convert("RGB")
        if self.image_size is not None:
            if self.square:
                img = resize_pil(img, (self.image_size, self.image_size),
                                 "bilinear")
            else:
                # torchvision Resize(int): shorter edge -> image_size,
                # long edge TRUNCATED like the reference (int(), not
                # round() — ops/resize.resize_shorter_edge doc)
                from sod_tpu.ops.resize import resize_shorter_edge

                w, h = img.size
                img = resize_pil(img, resize_shorter_edge((h, w),
                                                          self.image_size),
                                 "bilinear")
        if self.raw_uint8:
            return {"image_u8": np.asarray(img, np.uint8),
                    "filename": os.path.basename(p), "p_img": p}
        return {"image": normalize(np.asarray(img, np.float32)),
                "filename": os.path.basename(p), "p_img": p}
