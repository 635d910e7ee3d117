"""Shared synthetic-dataset builders (deduplicates the DUTS-shaped
fixture that several test modules used to copy-paste, with drifted
sizes/counts)."""
import json

import numpy as np
from PIL import Image


def make_duts(root, rng, n_test=5, test_hw=(40, 48), variable_test=False,
              n_train=0, train_hw=(64, 64)):
    """Create a DUTS-shaped dataset under ``root`` (a pathlib dir).

    :param n_test: DUTS-TE image/mask pairs (always created).
    :param variable_test: per-image test sizes (canvas-eval coverage).
    :param n_train: DUTS-TR images with RLE pseudo-masks; when > 0 a
        ``pseudo.json`` is written next to the DUTS dir.
    :returns: (duts_dir, pseudo_masks_fp_or_None)
    """
    duts = root / "DUTS"
    for sub in ("DUTS-TE-Image", "DUTS-TE-Mask") + (
            ("DUTS-TR-Image",) if n_train else ()):
        (duts / sub).mkdir(parents=True, exist_ok=True)

    for i in range(n_test):
        h, w = test_hw
        if variable_test:
            h, w = h + 6 * i, w + 4 * i
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(duts / "DUTS-TE-Image" / f"te_{i}.jpg")
        gt = np.zeros((h, w), np.uint8)
        gt[h // 5: (4 * h) // 5, w // 5: (4 * w) // 5] = 255
        Image.fromarray(gt).save(duts / "DUTS-TE-Mask" / f"te_{i}.png")

    fp = None
    if n_train:
        from sod_tpu.ops import rle as rle_codec

        h, w = train_hw
        pseudo = {}
        for i in range(n_train):
            name = f"tr_{i:03d}.jpg"
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(duts / "DUTS-TR-Image" / name)
            mask = np.zeros((h, w), np.uint8)
            mask[min(10 + i, h - 8):(4 * h) // 5, w // 5:(4 * w) // 5] = 1
            pseudo[name] = rle_codec.encode(mask)
        fp = root / "pseudo.json"
        with open(fp, "w") as f:
            json.dump(pseudo, f)
    return duts, fp
