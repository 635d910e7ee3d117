"""Data layer: RLE codec, datasets over synthetic fixtures, augmentations,
loader/collate static shapes."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from sod_tpu.data import DataLoader, DUTSDataset, ECSSDDataset, get_dataset
from sod_tpu.data.augment import (
    denormalize,
    gaussian_blur,
    geometric_augmentations,
    normalize,
    photometric_augmentations,
)
from sod_tpu.data.loader import collate_train, stable_label
from sod_tpu.ops import rle as rle_codec


# --------------------------- RLE codec --------------------------------------

def test_rle_roundtrip(rng):
    for _ in range(20):
        h, w = rng.randint(1, 50, 2)
        m = (rng.rand(h, w) > rng.rand()).astype(np.uint8)
        assert (rle_codec.decode(rle_codec.encode(m)) == m).all()


def test_rle_known_value():
    # hand-derived from the COCO varint spec: F-order [1,0,0,1] ->
    # counts [0,1,2,1] -> delta i>2: 1-1=0 -> chars "0120"
    m = np.array([[1, 0], [0, 1]], np.uint8)
    e = rle_codec.encode(m)
    assert e == {"size": [2, 2], "counts": "0120"}
    assert (rle_codec.decode(e) == m).all()


def test_rle_uncompressed_counts():
    out = rle_codec.decode({"size": [2, 2], "counts": [0, 1, 2, 1]})
    assert (out == np.array([[1, 0], [0, 1]], np.uint8)).all()


def test_rle_stack_and_area(rng):
    m = (rng.rand(9, 7, 3) > 0.5).astype(np.uint8)
    rles = rle_codec.encode(m)
    assert (rle_codec.decode(rles) == m).all()
    assert rle_codec.area(rles[0]) == int(m[..., 0].sum())


# --------------------------- fixtures ---------------------------------------

@pytest.fixture(scope="module")
def duts_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    duts = root / "DUTS"
    rng = np.random.RandomState(0)
    for sub in ("DUTS-TR-Image", "DUTS-TE-Image", "DUTS-TE-Mask"):
        (duts / sub).mkdir(parents=True)
    pseudo = {}
    for i in range(6):
        name = f"train_{i:03d}.jpg"
        img = (rng.rand(224, 224, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(duts / "DUTS-TR-Image" / name)
        mask = np.zeros((224, 224), np.uint8)
        mask[40 + i:150, 60:200 - i] = 1
        pseudo[name] = rle_codec.encode(mask)
    for i in range(4):
        img = (rng.rand(100 + 7 * i, 120 + 5 * i, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(duts / "DUTS-TE-Image" / f"te_{i}.jpg")
        gt = np.zeros(img.shape[:2], np.uint8)
        gt[10:60, 20:80] = 255
        Image.fromarray(gt).save(duts / "DUTS-TE-Mask" / f"te_{i}.png")
    fp = root / "pseudo.json"
    with open(fp, "w") as f:
        json.dump(pseudo, f)
    # ECSSD
    ecssd = root / "ECSSD"
    (ecssd / "images").mkdir(parents=True)
    (ecssd / "ground_truth_mask").mkdir()
    for i in range(3):
        img = (rng.rand(80, 90, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(ecssd / "images" / f"{i}.jpg")
        gt = np.zeros((80, 90), np.uint8)
        gt[20:50, 30:70] = 255
        Image.fromarray(gt).save(ecssd / "ground_truth_mask" / f"{i}.png")
    return root, str(fp)


# --------------------------- datasets ---------------------------------------

def test_duts_train(duts_root):
    root, fp = duts_root
    ds = DUTSDataset(str(root / "DUTS"), img_size=224, use_pseudo_masks=True,
                     pseudo_masks_fp=fp, scale_range=(0.9, 1.1))
    ds.set_mode("train")
    assert len(ds) == 6
    s = ds[0]
    assert s["image"].shape == (224, 224, 3)
    assert s["masks"].ndim == 3
    assert s["masks"].shape[-2:] == (224, 224)


def test_duts_test_original_resolution(duts_root):
    root, fp = duts_root
    ds = DUTSDataset(str(root / "DUTS"), use_pseudo_masks=True,
                     pseudo_masks_fp=fp)
    ds.set_mode("test")
    s = ds[1]
    assert s["image"].shape == (107, 125, 3)   # original size kept
    assert set(np.unique(s["masks"])) <= {0, 1}


def test_ecssd_factory(duts_root):
    root, _ = duts_root
    ds = get_dataset(str(root), "ecssd", mode="test", eval_img_size=224)
    assert len(ds) == 3
    assert ds[0]["image"].shape == (80, 90, 3)


def test_factory_rejects_unknown(duts_root):
    root, _ = duts_root
    with pytest.raises(NotImplementedError):
        get_dataset(str(root), "hku_is", mode="test")
    with pytest.raises(ValueError):
        get_dataset(str(root), "nope", mode="test")


# --------------------------- augmentations ----------------------------------

def test_geometric_augmentations_shapes(rng):
    img = Image.fromarray((rng.rand(100, 140, 3) * 255).astype(np.uint8))
    mask = (rng.rand(2, 100, 140) > 0.6).astype(np.int64)
    g = np.random.default_rng(0)
    arr, m = geometric_augmentations(g, img, mask, scale_range=(0.5, 2.0),
                                     crop_size=96, ignore_index=0)
    assert arr.shape == (96, 96, 3)
    assert m.shape == (2, 96, 96)


def test_augmentation_determinism(duts_root):
    root, fp = duts_root
    ds = DUTSDataset(str(root / "DUTS"), img_size=224, use_pseudo_masks=True,
                     pseudo_masks_fp=fp)
    ds.set_mode("train")
    a = ds[2]
    b = ds[2]
    np.testing.assert_array_equal(a["image"], b["image"])
    ds.epoch = 1
    c = ds[2]
    assert not np.array_equal(a["image"], c["image"])


def test_photometric_preserves_shape(rng):
    img = (rng.rand(64, 64, 3) * 255).astype(np.float32)
    out = photometric_augmentations(np.random.default_rng(1), img)
    assert out.shape == (64, 64, 3)
    assert out.min() >= 0 and out.max() <= 255


def test_gaussian_blur_matches_scipy(rng):
    from scipy.ndimage import gaussian_filter

    img = (rng.rand(40, 40, 3) * 255).astype(np.float32)

    class FixedRng:
        def random(self):
            return 0.5  # sigma = (2-0.1)*0.5+0.1 = 1.05

    out = gaussian_blur(FixedRng(), img, kernel_size=9)
    ref = gaussian_filter(img, sigma=(1.05, 1.05, 0), mode="mirror",
                          truncate=4 / 1.05)
    # same family of blur; interior pixels agree closely
    np.testing.assert_allclose(out[5:-5, 5:-5], ref[5:-5, 5:-5], atol=1.0)


def test_normalize_denormalize_roundtrip(rng):
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    back = denormalize(normalize(img))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


# --------------------------- loader / collate -------------------------------

def test_collate_shapes_and_padding(duts_root):
    root, fp = duts_root
    ds = DUTSDataset(str(root / "DUTS"), img_size=224, use_pseudo_masks=True,
                     pseudo_masks_fp=fp)
    ds.set_mode("train")
    samples = [ds[i] for i in range(3)]
    # one sample with empty masks -> must be flagged invalid, not dropped
    samples[1] = dict(samples[1], masks=np.zeros((1, 224, 224), np.uint8))
    batch = collate_train(samples, max_gt_masks=4, batch_size=4)
    assert batch["image"].shape == (4, 224, 224, 3)
    assert batch["gt_masks"].shape == (4, 4, 224, 224)
    assert batch["gt_valid"].shape == (4, 4)
    assert batch["gt_valid"][0].any()
    assert not batch["gt_valid"][1].any()    # empty-mask sample
    assert not batch["gt_valid"][3].any()    # batch padding
    assert batch["labels"][0] == stable_label(samples[0]["filename"])


def test_loader_iteration(duts_root):
    root, fp = duts_root
    ds = DUTSDataset(str(root / "DUTS"), img_size=224, use_pseudo_masks=True,
                     pseudo_masks_fp=fp)
    ds.set_mode("train")
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                        collate_fn=lambda s: collate_train(s, 4, 4))
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b["image"].shape == (4, 224, 224, 3)

    # shuffling differs across epochs but is reproducible per epoch
    loader.set_epoch(0)
    names0 = [n for b in loader for n in b["filename"]]
    loader.set_epoch(0)
    names0b = [n for b in loader for n in b["filename"]]
    loader.set_epoch(1)
    names1 = [n for b in loader for n in b["filename"]]
    assert names0 == names0b
    assert names0 != names1


def test_loader_process_workers_match_thread_workers(duts_root):
    """use_processes=True (fork pool, dataset shipped once per worker via
    the initializer — never per sample) yields the same batches as the
    thread path."""
    root, fp = duts_root
    ds = DUTSDataset(str(root / "DUTS"), img_size=224, use_pseudo_masks=True,
                     pseudo_masks_fp=fp)
    ds.set_mode("train")
    mk = lambda procs: DataLoader(
        ds, batch_size=4, shuffle=True, num_workers=2, use_processes=procs,
        collate_fn=lambda s: collate_train(s, 4, 4))
    lt, lp = mk(False), mk(True)
    lt.set_epoch(0)
    lp.set_epoch(0)
    bt, bp = list(lt), list(lp)
    assert len(bt) == len(bp) == 2
    for a, b in zip(bt, bp):
        assert list(a["filename"]) == list(b["filename"])
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["gt_masks"], b["gt_masks"])
