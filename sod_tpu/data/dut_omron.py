"""DUT-OMRON test dataset (ref ``datasets/dut_omron.py:7-31``):
``DUT-OMRON-image/*.jpg`` + ``pixelwiseGT-new-PNG/*.png``, test-only."""
from __future__ import annotations

from glob import glob
from os.path import join

from sod_tpu.data.base import BaseDataset


class DUTOMRONDataset(BaseDataset):
    def __init__(self, dir_dataset: str, img_size: int = 128):
        super().__init__()
        self.p_test_imgs = sorted(glob(join(dir_dataset, "DUT-OMRON-image",
                                            "*.jpg")))
        self.p_test_gts = sorted(glob(join(dir_dataset, "pixelwiseGT-new-PNG",
                                           "*.png")))
        assert len(self.p_test_imgs) == len(self.p_test_gts), (
            f"{len(self.p_test_imgs)} != {len(self.p_test_gts)}")
        self.img_size = (img_size, img_size)
        self.name = "dut-omron"
