"""MaskFormer with the ResNet-50 encoder arch (ref maskformer.py:36-41,
114-116: res5 features + 1x1 channel adapter feed the decoder)."""
import jax
import jax.numpy as jnp
import numpy as np

from sod_tpu.models.maskformer import (
    MaskFormerConfig,
    maskformer_apply,
    maskformer_init,
)
from sod_tpu.models.vit import ViTConfig, vit_n_last_cls, vit_n_last_patch_emb, vit_init, vit_last_selfattention


def test_maskformer_resnet50_forward():
    mcfg = MaskFormerConfig(n_queries=4, n_decoder_layers=2, arch="resnet50")
    params = maskformer_init(jax.random.key(0), mcfg)
    x = jnp.zeros((1, 64, 64, 3))
    out = maskformer_apply(params, x, mcfg)
    # dilated-8 resnet: 64/8 = 8 grid; x2 pixel decoder -> 16
    assert out["mask_pred"].shape == (1, 2, 4, 16, 16)
    assert out["objectness"].shape == (1, 2, 4, 1)
    assert out["features"].shape == (1, 384)
    assert np.isfinite(np.asarray(out["mask_pred"])).all()


def test_vit_aux_apis():
    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=3, n_heads=2, pos_grid=4)
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.zeros((2, 32, 32, 3))

    cls2 = vit_n_last_cls(params, x, cfg, n=2)
    assert cls2.shape == (2, 64)
    cls2p = vit_n_last_cls(params, x, cfg, n=2, return_patch_avgpool=True)
    assert cls2p.shape == (2, 96)

    pe = vit_n_last_patch_emb(params, x, cfg, n=2)
    assert pe.shape == (2, 16, 32, 2)

    attn = vit_last_selfattention(params, x, cfg)
    assert attn.shape == (2, 2, 17, 17)
    probs = np.asarray(attn).sum(-1)
    np.testing.assert_allclose(probs, 1.0, atol=1e-5)


def test_salient_mask_vote_selection(rng):
    from sod_tpu.train.evaluator import salient_mask_index

    masks = np.zeros((4, 20, 20), np.float32)
    masks[0, 5:15, 5:15] = 0.9
    masks[1, 5:16, 5:15] = 0.9     # consensus pair
    masks[2, :, 8:10] = 0.9        # full-height -> filtered
    masks[3, 1:3, 1:3] = 0.9       # outlier
    idx = salient_mask_index(masks)
    assert idx in (0, 1)
