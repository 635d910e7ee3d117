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


# ---------------------------------------------------------------------------
# train-mode BatchNorm (VERDICT r1 item 4; ref networks/module_helper.py
# BN under model.train() + utils/misc.py:187-188 encoder fine-tuning)
# ---------------------------------------------------------------------------

def test_batch_norm_train_matches_torch_over_3_steps():
    """Forward values AND running-stat evolution match torch
    ``BatchNorm2d(training=True)`` across 3 successive steps."""
    import torch

    from sod_tpu.models.resnet import batch_norm_train, bn_init

    torch.manual_seed(0)
    c = 6
    tbn = torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    tbn.train()
    with torch.no_grad():
        tbn.weight.copy_(torch.rand(c) + 0.5)
        tbn.bias.copy_(torch.rand(c) - 0.5)

    p = bn_init(c)
    p = {**p, "scale": jnp.asarray(tbn.weight.detach().numpy()),
         "bias": jnp.asarray(tbn.bias.detach().numpy())}

    rng = np.random.RandomState(1)
    for step in range(3):
        x = rng.randn(4, 5, 7, c).astype(np.float32)
        with torch.no_grad():
            ty = tbn(torch.from_numpy(x).permute(0, 3, 1, 2))
        y, new = batch_norm_train(p, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y),
                                   ty.permute(0, 2, 3, 1).numpy(),
                                   atol=2e-5, rtol=1e-5, err_msg=f"s{step}")
        p = {**p, **new}
        np.testing.assert_allclose(np.asarray(p["mean"]),
                                   tbn.running_mean.numpy(),
                                   atol=1e-6, err_msg=f"mean s{step}")
        np.testing.assert_allclose(np.asarray(p["var"]),
                                   tbn.running_var.numpy(),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"var s{step}")


def test_frozen_bn_stops_gradients_to_buffers():
    from sod_tpu.models.resnet import batch_norm, bn_init

    p = bn_init(4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 3, 4),
                    jnp.float32)
    grads = jax.grad(lambda p: batch_norm(p, x).sum())(p)
    assert float(jnp.abs(grads["mean"]).max()) == 0.0
    assert float(jnp.abs(grads["var"]).max()) == 0.0
    assert float(jnp.abs(grads["scale"]).max()) > 0.0


def test_resnet_maskformer_train_step_updates_bn_buffers():
    """End-to-end: a train step on the resnet50-encoder MaskFormer
    (a) EMA-updates every BN buffer, (b) never lets AdamW weight-decay
    them, (c) trains the conv weights."""
    from sod_tpu.config import Config
    from sod_tpu.train.optim import build_optimizer
    from sod_tpu.train.step import make_train_step

    cfg = Config(batch_size=2, compute_dtype="float32",
                 use_pallas_attention=False, max_gt_masks=1)
    mcfg = MaskFormerConfig(n_queries=4, n_decoder_layers=2, arch="resnet50")
    params = maskformer_init(jax.random.key(0), mcfg)
    tx = build_optimizer(cfg, n_iters_per_epoch=10)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, mcfg)

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32),
        "gt_masks": jnp.asarray((rng.rand(2, 1, 64, 64) > 0.5), jnp.float32),
        "gt_valid": jnp.ones((2, 1), bool),
        "labels": jnp.asarray([0, 1]),
    }
    bn0 = params["encoder"]["prefix"]["bn1"]
    p1, opt_state, metrics = step(params, opt_state, batch)
    bn1 = p1["encoder"]["prefix"]["bn1"]

    # (a) buffers moved by the batch-stats EMA
    assert float(jnp.abs(bn1["mean"] - bn0["mean"]).max()) > 0
    assert float(jnp.abs(bn1["var"] - bn0["var"]).max()) > 0
    # (b) the post-step buffers EXACTLY equal the forward's EMA-updated
    # batch stats — i.e. merge_bn_stats wrote them and AdamW/weight-decay
    # never touched them (a previous version of this assertion was a
    # tautology; this one fails if the optimizer path perturbs buffers)
    from sod_tpu.models.maskformer import maskformer_apply

    out = maskformer_apply(params, batch["image"], mcfg, train=True)
    expect = out["batch_stats"]["encoder"]["prefix"]["bn1"]
    np.testing.assert_allclose(np.asarray(bn1["mean"]),
                               np.asarray(expect["mean"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bn1["var"]),
                               np.asarray(expect["var"]), rtol=1e-6)
    # (c) conv weights trained
    w0 = params["encoder"]["prefix"]["conv1"]
    w1 = p1["encoder"]["prefix"]["conv1"]
    assert float(jnp.abs(w1 - w0).max()) > 0
    assert np.isfinite(float(metrics["loss"]))

    # a second step keeps updating buffers (EMA continues)
    p2, _, _ = step(p1, opt_state, batch)
    bn2 = p2["encoder"]["prefix"]["bn1"]
    assert float(jnp.abs(bn2["mean"] - bn1["mean"]).max()) > 0


def test_bn_buffers_masked_from_optimizer():
    """AdamW (incl. weight decay) must not touch mean/var buffers: with
    zero-like grads the buffers stay bit-identical through tx.update."""
    from sod_tpu.config import Config
    from sod_tpu.models.resnet import resnet_init
    from sod_tpu.train.optim import build_optimizer

    import optax

    cfg = Config()
    params = {"encoder": resnet_init(jax.random.key(0), "resnet18")}
    tx = build_optimizer(cfg, n_iters_per_epoch=10)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    bn_old = params["encoder"]["prefix"]["bn1"]
    bn_new = new["encoder"]["prefix"]["bn1"]
    np.testing.assert_array_equal(np.asarray(bn_old["mean"]),
                                  np.asarray(bn_new["mean"]))
    np.testing.assert_array_equal(np.asarray(bn_old["var"]),
                                  np.asarray(bn_new["var"]))
    # scale/bias ARE trainable
    assert float(jnp.abs(bn_new["scale"] - bn_old["scale"]).max()) > 0


def test_vit_selfattention_all_blocks():
    """ref forward_selfattention (vision_transformer.py:403-446): per-block
    attention stack; last entry equals get_last_selfattention."""
    from sod_tpu.models.vit import vit_selfattention

    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=3, n_heads=2,
                    pos_grid=4)
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    attns = vit_selfattention(params, x, cfg, all_blocks=True)
    n = 1 + 16
    assert attns.shape == (3, 2, 2, n, n)
    # rows are probability distributions
    np.testing.assert_allclose(np.asarray(attns.sum(-1)), 1.0, atol=1e-5)
    last = vit_selfattention(params, x, cfg)
    np.testing.assert_allclose(np.asarray(last), np.asarray(attns[-1]),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vit_last_selfattention(params, x, cfg)),
        np.asarray(last), atol=1e-5)
