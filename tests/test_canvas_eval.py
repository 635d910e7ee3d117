"""Fixed-canvas variable-resolution evaluation must EXACTLY reproduce the
per-image computation (the reference's batch-1 original-resolution
protocol)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sod_tpu.models.maskformer import (
    MaskFormerConfig,
    maskformer_apply,
    maskformer_apply_canvas,
    maskformer_init,
)
from sod_tpu.models.vit import ViTConfig
from sod_tpu.ops.resize import interpolate_bilinear
from sod_tpu.train.evaluator import host_pos_embed


@pytest.fixture(scope="module")
def model():
    vit = ViTConfig(patch_size=8, embed_dim=48, depth=2, n_heads=2, pos_grid=8)
    mcfg = MaskFormerConfig(n_queries=5, n_decoder_layers=2, vit=vit)
    params = maskformer_init(jax.random.key(0), mcfg)
    return mcfg, params


def _canvas_inputs(mcfg, params, images):
    """Build canvas batch inputs for a list of [h, w, 3] numpy images."""
    p = mcfg.vit.patch_size
    pad = lambda v: -(-v // p) * p
    ch = max(pad(im.shape[0]) for im in images)
    cw = max(pad(im.shape[1]) for im in images)
    gh_c, gw_c = ch // p, cw // p
    n_tok = gh_c * gw_c + 1
    d = mcfg.embed_dim
    b = len(images)

    table = np.asarray(params["encoder"]["pos_embed"], np.float32)
    x = np.zeros((b, ch, cw, 3), np.float32)
    tok = np.zeros((b, n_tok), bool)
    pe = np.zeros((b, n_tok, d), np.float32)
    grids = np.zeros((b, 2), np.int32)
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        x[i, :h, :w] = im
        gh, gw = pad(h) // p, pad(w) // p
        grids[i] = (gh, gw)
        valid = np.zeros((gh_c, gw_c), bool)
        valid[:gh, :gw] = True
        tok[i, 0] = True
        tok[i, 1:] = valid.reshape(-1)
        pevals = host_pos_embed(table, gh, gw, mcfg.vit.pos_grid)
        pe[i, 0] = pevals[0]
        gp = np.zeros((gh_c, gw_c, d), np.float32)
        gp[:gh, :gw] = pevals[1:].reshape(gh, gw, d)
        pe[i, 1:] = gp.reshape(-1, d)
    return x, tok, pe, grids, (gh_c, gw_c)


def test_canvas_matches_per_image(model, rng):
    mcfg, params = model
    images = [rng.randn(45, 62, 3).astype(np.float32),
              rng.randn(64, 40, 3).astype(np.float32)]
    x, tok, pe, grids, (gh_c, gw_c) = _canvas_inputs(mcfg, params, images)

    out = maskformer_apply_canvas(
        params, jnp.asarray(x), mcfg, jnp.asarray(tok), jnp.asarray(pe),
        jnp.asarray(grids))
    canvas_masks = np.asarray(out["mask_pred"][:, -1])      # [B,Q,2G,2G]
    canvas_masks4 = np.asarray(interpolate_bilinear(
        jnp.asarray(canvas_masks), gh_c * 8, gw_c * 8))
    canvas_obj = np.asarray(out["objectness"][:, -1, :, 0])

    for i, im in enumerate(images):
        ref = maskformer_apply(params, jnp.asarray(im)[None], mcfg)
        ref_mask = np.asarray(ref["mask_pred"][0, -1])       # [Q, 2gh, 2gw]
        gh, gw = grids[i]
        got = canvas_masks[i][:, :2 * gh, :2 * gw]
        np.testing.assert_allclose(got, ref_mask, atol=2e-5, rtol=1e-4)

        # x4 upsample parity inside the valid region
        ref4 = np.asarray(interpolate_bilinear(
            jnp.asarray(ref_mask)[None], gh * 8, gw * 8))[0]
        got4 = canvas_masks4[i][:, :gh * 8, :gw * 8]
        np.testing.assert_allclose(got4, ref4, atol=2e-5, rtol=1e-4)

        ref_obj = np.asarray(ref["objectness"][0, -1, :, 0])
        np.testing.assert_allclose(canvas_obj[i], ref_obj, atol=2e-5)


def test_canvas_native_grid_image(model, rng):
    """An image exactly matching the canvas needs no masking/replication."""
    mcfg, params = model
    im = rng.randn(64, 64, 3).astype(np.float32)
    x, tok, pe, grids, _ = _canvas_inputs(mcfg, params, [im])
    assert tok.all()
    out = maskformer_apply_canvas(params, jnp.asarray(x), mcfg,
                                  jnp.asarray(tok), jnp.asarray(pe),
                                  jnp.asarray(grids))
    ref = maskformer_apply(params, jnp.asarray(im)[None], mcfg)
    np.testing.assert_allclose(np.asarray(out["mask_pred"]),
                               np.asarray(ref["mask_pred"]),
                               atol=2e-5, rtol=1e-4)


def test_evaluator_rejects_non_bc_config(tmp_path):
    """Objectness-based evaluation of non-bc models is unsupported in the
    reference itself (its forward omits the key, maskformer.py:245-250;
    evaluator pyc 199-205 reads it unconditionally) — the Evaluator must
    raise a clear error at construction, not a KeyError at trace time
    (ADVICE r3)."""
    from sod_tpu.config import Config
    from sod_tpu.models.maskformer import maskformer_init
    from sod_tpu.train.evaluator import Evaluator

    mcfg = MaskFormerConfig(n_queries=5, n_decoder_layers=2,
                            use_binary_classifier=False,
                            vit=ViTConfig(patch_size=8, embed_dim=64,
                                          depth=2, n_heads=2, pos_grid=28))
    params = maskformer_init(jax.random.key(0), mcfg)
    cfg = Config(dir_dataset=str(tmp_path), use_binary_classifier=False)
    with pytest.raises(ValueError, match="objectness"):
        Evaluator(params, cfg, mcfg)
