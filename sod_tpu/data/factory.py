"""Dataset factory (ref ``utils/misc.py:43-151`` ``get_dataset``).

Only duts / dut_omron / ecssd / custom are importable in the reference
(``datasets/__init__.py:1-5``); the cub2011 / flowers102 / hku_is / sod /
imagenet1k names its factory mentions have no classes in the repo and raise
here with the same directory conventions documented.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple


def get_dataset(
    dir_dataset: str,
    dataset_name: str,
    mode: str,
    train_img_size: Optional[int] = None,
    eval_img_size: Optional[int] = None,
    scale_range: Tuple[float, float] = (0.8, 1.2),
    use_pseudo_masks: bool = False,
    pseudo_masks_fp: Optional[str] = None,
    use_copy_paste: bool = False,
    **_ignored,
):
    from sod_tpu.data.dut_omron import DUTOMRONDataset
    from sod_tpu.data.duts import DUTSDataset
    from sod_tpu.data.ecssd import ECSSDDataset

    if dataset_name == "duts":
        assert mode in ("train", "test")
        ds = DUTSDataset(
            dir_dataset=f"{dir_dataset}/DUTS",
            img_size=train_img_size or 224,
            scale_range=scale_range,
            use_pseudo_masks=use_pseudo_masks,
            pseudo_masks_fp=pseudo_masks_fp,
            use_copy_paste=use_copy_paste,
        )
    elif dataset_name == "ecssd":
        assert mode == "test", "ecssd dataset is only for test."
        ds = ECSSDDataset(f"{dir_dataset}/ECSSD", img_size=eval_img_size or 128)
    elif dataset_name == "dut_omron":
        assert mode == "test", "dut_omron dataset is only for test."
        # reference quirk: its factory points at "DUTS-OMRON" (sic —
        # ``utils/misc.py:104``), not the dataset's official "DUT-OMRON"
        # name.  We keep the quirk path first for parity and fall back to
        # the official layout so a standard unpack isn't silently skipped.
        quirk = f"{dir_dataset}/DUTS-OMRON"
        official = f"{dir_dataset}/DUT-OMRON"
        root = quirk if os.path.isdir(quirk) or not os.path.isdir(official) \
            else official
        ds = DUTOMRONDataset(root, img_size=eval_img_size or 128)
    elif dataset_name in ("cub2011", "flowers102", "hku_is", "sod",
                          "imagenet1k"):
        raise NotImplementedError(
            f"{dataset_name}: named by the reference factory "
            "(utils/misc.py:58-145) but its dataset class is absent from the "
            "reference repo")
    else:
        raise ValueError(f"Invalid dataset_name {dataset_name}.")
    ds.set_mode(mode)
    return ds
