"""The reference evaluator's ``scale_factor`` parameter for real
(VERDICT r4 missing item 3; ref evaluator pyc 164 call surface +
``forward_pixel_decoder``'s ``scale_factor: 2`` yaml key,
``configs/...yaml``): the model's pixel decoder upsamples patch tokens by
``scale_factor`` and the eval pipeline returns masks to canvas resolution
with the complementary ``patch_size // scale_factor`` factor.  Torch is
the interpolation oracle at every value.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sod_tpu.config import Config
from sod_tpu.models.maskformer import (
    MaskFormerConfig,
    forward_pixel_decoder,
    maskformer_apply,
    maskformer_init,
)
from sod_tpu.models.vit import ViTConfig
from sod_tpu.ops.resize import interpolate_bilinear
from sod_tpu.train.evaluator import Evaluator

SCALE_FACTORS = [1, 2, 4]


def _small_mcfg(**kw):
    return MaskFormerConfig(
        n_queries=4, n_decoder_layers=2,
        vit=ViTConfig(patch_size=8, embed_dim=32, depth=2, n_heads=2,
                      pos_grid=8), **kw)


@pytest.mark.parametrize("sf", SCALE_FACTORS)
def test_pixel_decoder_torch_parity(sf, rng):
    """forward_pixel_decoder at each scale_factor == torch
    F.interpolate(scale_factor=sf, mode='bilinear') (ref
    maskformer.py:144-162)."""
    mcfg = dataclasses.replace(_small_mcfg(), scale_factor=sf)
    b, h, w, d = 2, 5, 7, 16
    tokens = rng.randn(b, h * w, d).astype(np.float32)
    got = np.asarray(forward_pixel_decoder(jnp.asarray(tokens), (h, w),
                                           mcfg))               # [B,H,W,D]
    ref = F.interpolate(
        torch.from_numpy(tokens).reshape(b, h, w, d).permute(0, 3, 1, 2),
        scale_factor=sf, mode="bilinear", align_corners=False)
    np.testing.assert_allclose(got, ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("sf", SCALE_FACTORS)
def test_mask_to_canvas_upsample_torch_parity(sf, rng):
    """The eval-side return-to-canvas resize (factor = p // sf) == torch
    F.interpolate at that factor (ref evaluator pyc 209-211; x4 at the
    shipped sf=2)."""
    p = 8
    up = p // sf
    b, q, h0, w0 = 2, 4, 6 * sf, 5 * sf     # mask res = sf * grid
    masks = rng.rand(b, q, h0, w0).astype(np.float32)
    got = np.asarray(interpolate_bilinear(jnp.asarray(masks),
                                          h0 * up, w0 * up))
    ref = F.interpolate(torch.from_numpy(masks), scale_factor=up,
                        mode="bilinear", align_corners=False)
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-5, rtol=1e-5)
    assert got.shape[-2:] == (6 * p, 5 * p)  # canvas resolution, any sf


@pytest.mark.parametrize("sf", SCALE_FACTORS)
def test_model_mask_resolution_tracks_scale_factor(sf, rng):
    """mask_pred leaves the model at [B, L, Q, sf*gh, sf*gw]; since the
    live pixel decoder is weight-free, the SAME params serve every sf."""
    mcfg = _small_mcfg()
    params = maskformer_init(jax.random.key(0), mcfg)
    x = jnp.asarray(rng.randn(1, 40, 48, 3).astype(np.float32))
    out = maskformer_apply(params, x,
                           dataclasses.replace(mcfg, scale_factor=sf))
    gh, gw = 40 // 8, 48 // 8
    assert out["mask_pred"].shape == (1, 2, 4, sf * gh, sf * gw)


@pytest.mark.parametrize("sf", SCALE_FACTORS)
@pytest.mark.parametrize("fused_eval", [False, True])
def test_evaluator_runs_at_scale_factor(tmp_path, rng, sf, fused_eval):
    """Full Evaluator pass at each scale_factor on both eval compute
    paths (dense upsample + fused UB selection), finite metrics."""
    from tests._fixtures import make_duts

    make_duts(tmp_path, rng, n_test=4, test_hw=(40, 48))
    cfg = Config(dir_dataset=str(tmp_path), compute_dtype="float32",
                 use_pallas_attention=False, use_fused_eval=fused_eval,
                 num_workers=2)
    mcfg = _small_mcfg()
    params = maskformer_init(jax.random.key(0), mcfg)
    ev = Evaluator(params, cfg, mcfg, batch_size=2)
    out = ev("duts", scale_factor=sf)
    for k in ("iou", "f_score", "mae"):
        assert 0.0 <= out[k] <= 1.0, (k, out[k])
    assert out["iou_ub"] >= out["iou"] - 1e-6


def test_evaluator_dense_vs_fused_agree_at_sf4(tmp_path, rng):
    """The fused-UB path's metric suite matches the dense path at a
    non-default scale_factor too (its resize matrices are derived from
    the actual mask/canvas shapes, not a hardcoded x4)."""
    from tests._fixtures import make_duts

    make_duts(tmp_path, rng, n_test=4, test_hw=(40, 48))
    mcfg = _small_mcfg()
    params = maskformer_init(jax.random.key(0), mcfg)
    outs = {}
    for fused in (False, True):
        cfg = Config(dir_dataset=str(tmp_path), compute_dtype="float32",
                     use_pallas_attention=False, use_fused_eval=fused,
                     num_workers=2)
        ev = Evaluator(params, cfg, mcfg, batch_size=2)
        outs[fused] = ev("duts", scale_factor=4)
    for k in ("iou", "iou_ub", "f_score", "mae", "pixel_accuarcy"):
        np.testing.assert_allclose(outs[False][k], outs[True][k],
                                   atol=1e-5, err_msg=k)


def test_evaluator_rejects_non_divisor_scale_factor(tmp_path, rng):
    from tests._fixtures import make_duts

    make_duts(tmp_path, rng, n_test=2, test_hw=(40, 48))
    cfg = Config(dir_dataset=str(tmp_path), compute_dtype="float32",
                 use_pallas_attention=False, num_workers=2)
    mcfg = _small_mcfg()
    params = maskformer_init(jax.random.key(0), mcfg)
    ev = Evaluator(params, cfg, mcfg, batch_size=2)
    with pytest.raises(ValueError, match="divide the patch size"):
        ev("duts", scale_factor=3)
