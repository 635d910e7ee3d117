"""Compat shims: BaseStructure, get_lr_scheduler, PositionEmbeddingSine
parity, process-sharded loader."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sod_tpu.config import Config
from sod_tpu.models.maskformer import (
    MaskFormerConfig,
    maskformer_init,
    position_embedding_sine,
)
from sod_tpu.models.vit import ViTConfig
from sod_tpu.train.base_structure import BaseStructure
from sod_tpu.train.optim import get_lr_scheduler


def _tiny():
    cfg = Config(compute_dtype="float32", use_pallas_attention=False)
    mcfg = MaskFormerConfig(
        n_queries=4, n_decoder_layers=2,
        vit=ViTConfig(patch_size=8, embed_dim=32, depth=2, n_heads=2,
                      pos_grid=4))
    params = maskformer_init(jax.random.key(0), mcfg)
    return cfg, mcfg, params


def test_base_structure_forward_nhwc_and_nchw(rng):
    cfg, mcfg, params = _tiny()
    bs = BaseStructure(params, cfg, mcfg)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    out = bs._forward({"x": x})
    assert out["mask_pred"].shape == (1, 2, 4, 8, 8)
    # NCHW like the reference's torch tensors (base_structure.py:18-24)
    out2 = bs._forward({"x": x.transpose(0, 3, 1, 2)}, skip_decoder=True)
    np.testing.assert_allclose(np.asarray(out["mask_pred"]),
                               np.asarray(out2["mask_pred"]), atol=1e-5)
    # encoder_only path
    enc = bs._forward({"x": x}, encoder_only=True)
    assert enc["patch_tokens"].shape == (1, 4, 4, 32)


def test_base_structure_extract_selected(rng):
    cfg, mcfg, params = _tiny()
    bs = BaseStructure(params, cfg, mcfg)
    preds = rng.rand(2, 4, 8, 8).astype(np.float32)
    sel = bs._extract_selected_predictions(preds, [1, 3])
    np.testing.assert_array_equal(sel[0], preds[0, 1])
    np.testing.assert_array_equal(sel[1], preds[1, 3])


def test_get_lr_scheduler_factory():
    cfg = Config(lr=1.0, n_epochs=2, lr_warmup_duration=0)
    sched = get_lr_scheduler(cfg, n_iters_per_epoch=50)
    assert abs(float(sched(0)) - 1.0) < 1e-6
    assert float(sched(99)) < 0.1
    with pytest.raises(ValueError):
        get_lr_scheduler(cfg, 50, mode="cosine")


def test_position_embedding_sine_torch_parity(rng):
    torch = pytest.importorskip("torch")

    def torch_ref(b, h, w, npf, normalize):
        mask = torch.zeros((b, h, w), dtype=torch.bool)
        not_mask = ~mask
        y = not_mask.cumsum(1, dtype=torch.float32)
        x = not_mask.cumsum(2, dtype=torch.float32)
        if normalize:
            eps = 1e-6
            scale = 2 * math.pi
            y = y / (y[:, -1:, :] + eps) * scale
            x = x / (x[:, :, -1:] + eps) * scale
        dim_t = torch.arange(npf, dtype=torch.float32)
        dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / npf)
        px = x[..., None] / dim_t
        py = y[..., None] / dim_t
        px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()),
                         dim=4).flatten(3)
        py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()),
                         dim=4).flatten(3)
        return torch.cat((py, px), dim=3).permute(0, 3, 1, 2)

    for norm in (False, True):
        ours = np.asarray(position_embedding_sine((2, 5, 7), 8,
                                                  normalize=norm))
        ref = torch_ref(2, 5, 7, 8, norm).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_loader_process_sharding_single_process(tmp_path, rng):
    """With one JAX process, shard_by_process must be a no-op."""
    from sod_tpu.data.loader import DataLoader

    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"i": i}

    a = [s["i"] for b in DataLoader(Toy(), batch_size=3) for s in b]
    b = [s["i"] for bt in DataLoader(Toy(), batch_size=3,
                                     shard_by_process=True) for s in bt]
    assert a == b == list(range(10))
