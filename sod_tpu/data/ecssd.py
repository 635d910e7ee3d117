"""ECSSD test dataset (ref ``datasets/ecssd.py:7-31``): ``images/*.jpg`` +
``ground_truth_mask/*.png``, test-only."""
from __future__ import annotations

from glob import glob
from os.path import join

from sod_tpu.data.base import BaseDataset


class ECSSDDataset(BaseDataset):
    def __init__(self, dir_dataset: str, img_size: int = 128):
        super().__init__()
        self.p_test_imgs = sorted(glob(join(dir_dataset, "images", "*.jpg")))
        self.p_test_gts = sorted(glob(join(dir_dataset, "ground_truth_mask",
                                           "*.png")))
        assert len(self.p_test_imgs) == len(self.p_test_gts), (
            f"{len(self.p_test_imgs)} != {len(self.p_test_gts)}")
        self.img_size = (img_size, img_size)
        self.name = "ecssd"
