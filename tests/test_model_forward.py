"""Shape/dtype property tests for the model forward under jit (SURVEY §4(b))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sod_tpu.config import Config
from sod_tpu.models.maskformer import (
    MaskFormerConfig,
    config_from,
    maskformer_apply,
    maskformer_init,
)
from sod_tpu.models.vit import ViTConfig, vit_apply, vit_init, vit_small


def tiny_vit(patch_size=8):
    # small depth/dim for fast CPU tests
    return ViTConfig(patch_size=patch_size, embed_dim=64, depth=3, n_heads=2,
                     pos_grid=224 // patch_size)


def test_vit_shapes():
    cfg = tiny_vit(patch_size=8)
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.zeros((2, 64, 64, 3))
    out = jax.jit(lambda p, x: vit_apply(p, x, cfg, all_layers=True))(params, x)
    n = (64 // 8) ** 2
    assert out.shape == (3, 2, n + 1, 64)
    last = vit_apply(params, x, cfg, all_layers=False)
    assert last.shape == (2, n + 1, 64)
    np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(last),
                               rtol=1e-5, atol=1e-5)


def test_vit_pos_embed_interpolation_identity():
    cfg = tiny_vit(patch_size=8)
    params = vit_init(jax.random.key(1), cfg)
    # 224 input hits the native pos grid; 96 requires bicubic interpolation
    for size in (224, 96):
        x = jnp.ones((1, size, size, 3))
        out = vit_apply(params, x, cfg, all_layers=False)
        assert out.shape[1] == (size // 8) ** 2 + 1


def test_vit_input_padding():
    cfg = tiny_vit(patch_size=8)
    params = vit_init(jax.random.key(2), cfg)
    # 65 -> padded to 72 (ref make_input_divisible)
    x = jnp.ones((1, 65, 67, 3))
    out = vit_apply(params, x, cfg, all_layers=False)
    assert out.shape[1] == (72 // 8) * (72 // 8) + 1


def test_vit_get_tokens_norm_and_raw():
    """ref ``get_tokens`` (vision_transformer.py:316-357): norm=True
    applies the final LayerNorm to every collected layer; norm=False
    returns the raw block outputs (VERDICT r3 missing item 2 — this was a
    NotImplementedError)."""
    from sod_tpu.models.vit import vit_get_tokens
    from sod_tpu.ops.layers import layer_norm

    cfg = tiny_vit(patch_size=8)
    params = vit_init(jax.random.key(3), cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    n = (64 // 8) ** 2
    normed = vit_get_tokens(params, x, cfg, patch_tokens=True)
    raw = vit_get_tokens(params, x, cfg, patch_tokens=True, norm=False)
    assert normed.shape == raw.shape == (2, cfg.depth, n + 1, 64)
    # norm(raw layer) == normed layer, every layer
    renormed = layer_norm(params["norm"], raw, cfg.ln_eps)
    np.testing.assert_allclose(np.asarray(renormed), np.asarray(normed),
                               rtol=1e-5, atol=1e-5)
    # raw differs from normed (the hole was real)
    assert not np.allclose(np.asarray(raw), np.asarray(normed), atol=1e-3)
    # CLS-only + layer selection on the raw path
    cls_raw = vit_get_tokens(params, x, cfg, layers=[0, 2], norm=False)
    assert cls_raw.shape == (2, 2, 64)
    np.testing.assert_allclose(np.asarray(cls_raw[:, 1]),
                               np.asarray(raw[:, 2, 0, :]), rtol=1e-6)


@pytest.fixture(scope="module")
def mf():
    mcfg = MaskFormerConfig(n_queries=5, n_decoder_layers=2, vit=tiny_vit())
    params = maskformer_init(jax.random.key(0), mcfg)
    return mcfg, params


def test_maskformer_forward_shapes(mf):
    mcfg, params = mf
    x = jnp.zeros((2, 64, 64, 3))
    out = jax.jit(lambda p, x: maskformer_apply(p, x, mcfg))(params, x)
    gh = 64 // 8
    s = mcfg.scale_factor
    assert out["mask_pred"].shape == (2, 2, 5, gh * s, gh * s)
    assert out["objectness"].shape == (2, 2, 5, 1)
    assert out["features"].shape == (2, 64)
    assert np.all(np.asarray(out["mask_pred"]) >= 0)
    assert np.all(np.asarray(out["mask_pred"]) <= 1)
    assert np.all(np.asarray(out["objectness"]) >= 0)
    assert np.all(np.asarray(out["objectness"]) <= 1)


def test_maskformer_encoder_only(mf):
    mcfg, params = mf
    x = jnp.zeros((1, 64, 64, 3))
    out = maskformer_apply(params, x, mcfg, encoder_only=True)
    assert out["patch_tokens"].shape == (1, 8, 8, 64)


def test_maskformer_non_binary_classifier():
    mcfg = MaskFormerConfig(n_queries=4, n_decoder_layers=2,
                            use_binary_classifier=False, vit=tiny_vit())
    params = maskformer_init(jax.random.key(3), mcfg)
    out = maskformer_apply(params, jnp.zeros((1, 32, 32, 3)), mcfg)
    assert "objectness" not in out
    assert out["mask_pred"].shape == (1, 2, 4, 8, 8)


def test_config_from_flat():
    cfg = Config(patch_size=16, use_pallas_attention=False)
    mcfg = config_from(cfg)
    assert mcfg.vit.patch_size == 16
    assert mcfg.vit.pos_grid == 14
    assert mcfg.n_queries == 20
