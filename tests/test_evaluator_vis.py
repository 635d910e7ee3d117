"""Evaluator in-loop visualization (ref evaluator pyc 240-269: grids every
250 batches, incl. the non-bc einsum argmax composition)."""
import os

import jax
import numpy as np
import pytest
from PIL import Image

from sod_tpu.config import Config
from sod_tpu.models.maskformer import MaskFormerConfig, maskformer_init
from sod_tpu.models.vit import ViTConfig
from sod_tpu.train.evaluator import Evaluator
from sod_tpu.utils.visualizer import Visualizer, compose_argmax_map


def _make_duts(tmp_path, rng, n=5):
    from tests._fixtures import make_duts

    make_duts(tmp_path, rng, n_test=n, test_hw=(40, 48))


def test_evaluator_writes_visualization_grids(tmp_path, rng):
    """__call__ invokes the visualizer every ``vis_every`` batches and the
    grid PNG lands on disk (VERDICT r2 missing item 3)."""
    _make_duts(tmp_path, rng)
    cfg = Config(dir_dataset=str(tmp_path), compute_dtype="float32",
                 use_pallas_attention=False, num_workers=2)
    mcfg = MaskFormerConfig(
        n_queries=4, n_decoder_layers=2,
        vit=ViTConfig(patch_size=8, embed_dim=32, depth=2, n_heads=2,
                      pos_grid=8))
    params = maskformer_init(jax.random.key(0), mcfg)
    vis_dir = tmp_path / "vis"
    ev = Evaluator(params, cfg, mcfg, batch_size=2,
                   visualizer=Visualizer(str(vis_dir)), vis_every=2)
    out = ev("duts")
    assert 0.0 <= out["iou"] <= 1.0
    # 5 images / batch 2 -> 3 batches -> vis at bi = 0 and 2
    got = sorted(os.listdir(vis_dir / "duts"))
    assert got == ["00000.png", "00002.png"]
    assert (vis_dir / "duts" / "00000.png").stat().st_size > 0


def test_compose_argmax_map():
    """Non-bc composition: per-pixel argmax one-hot times palette via
    einsum('qhw,qc->chw') (ref evaluator pyc 240-269)."""
    masks = np.zeros((3, 4, 4), np.float32)
    masks[0, :2] = 1.0          # top half -> query 0
    masks[1, 2:] = 0.9          # bottom half -> query 1
    out = compose_argmax_map(masks)
    assert out.shape == (4, 4, 3)
    # every pixel in a region carries exactly its query's palette color
    assert np.all(out[0, 0] == out[1, 3])
    assert np.all(out[2, 0] == out[3, 3])
    assert np.any(out[0, 0] != out[2, 0])
    # explicit palette passes through exactly
    pal = np.eye(3, dtype=np.float32)
    out2 = compose_argmax_map(masks, palette=pal)
    np.testing.assert_allclose(out2[0, 0], [1, 0, 0])
    np.testing.assert_allclose(out2[3, 0], [0, 1, 0])


def test_eval_grid_non_bc(tmp_path):
    """objectness=None routes through the composed-panel branch."""
    vis = Visualizer(str(tmp_path))
    img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    gt = np.zeros((16, 16), np.uint8)
    preds = np.random.RandomState(1).rand(4, 8, 8).astype(np.float32)
    fp = vis.eval_grid(img, gt, preds, None, "nonbc.png")
    assert os.path.getsize(fp) > 0
