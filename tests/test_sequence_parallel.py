"""Sequence-parallel (ring attention over the token axis, ``(data, seq)``
mesh) path on the 8-device virtual CPU mesh: the ring stage program
(parallel/sp.py) equals the single-device dense softmax up to float
reassociation — forward (including the pad-to-ring-multiple path: 17
tokens never divide the ring), canvas-style key masks, gradients, the
full train step, and a real Trainer epoch — while every activation is
genuinely token-sharded."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sod_tpu.config import Config
from sod_tpu.models.maskformer import (
    MaskFormerConfig,
    maskformer_apply,
    maskformer_init,
)
from sod_tpu.models.vit import ViTConfig, vit_apply, vit_init
from sod_tpu.parallel import (
    assert_sp_compatible,
    make_mesh_sp,
    make_sp_apply,
    shard_batch,
    shard_opt_state,
    shard_params,
    sp_vit_apply,
)
from sod_tpu.train.optim import build_optimizer
from sod_tpu.train.step import make_train_step

DEPTH = 4


def _vit_cfg(**kw):
    return ViTConfig(patch_size=8, embed_dim=32, depth=DEPTH, n_heads=2,
                     pos_grid=4, **kw)


def _setup(batch):
    cfg = Config(batch_size=batch, compute_dtype="float32",
                 use_pallas_attention=False, max_gt_masks=2)
    mcfg = MaskFormerConfig(n_queries=4, n_decoder_layers=2, vit=_vit_cfg())
    params = maskformer_init(jax.random.key(0), mcfg)
    tx = build_optimizer(cfg, n_iters_per_epoch=10)
    return cfg, mcfg, params, tx


def _batch(rng, b):
    return {
        "image": jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32),
        "gt_masks": jnp.asarray((rng.rand(b, 2, 32, 32) > 0.5), jnp.float32),
        "gt_valid": jnp.ones((b, 2), bool),
        "labels": jnp.asarray(rng.randint(0, 5, size=(b,))),
    }


def test_mesh_sp_construction():
    mesh = make_mesh_sp(2, 4)
    assert mesh.axis_names == ("data", "seq")
    assert mesh.shape["data"] == 2 and mesh.shape["seq"] == 4
    assert make_mesh_sp(n_seq=4).shape["data"] == 2   # 8 devices / 4
    with pytest.raises(ValueError):
        make_mesh_sp(8, 4)
    with pytest.raises(ValueError):
        make_mesh_sp(n_seq=999)        # 0-device mesh must raise


@pytest.mark.parametrize("n_data,n_seq", [(1, 8), (2, 4), (4, 2), (2, 2)])
def test_sp_vit_forward_matches_single_device(rng, n_data, n_seq):
    """17 tokens (4x4 grid + CLS) never divide any ring size — every case
    exercises the pad-and-mask path."""
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    ref = vit_apply(params, x, cfg, all_layers=True)

    mesh = make_mesh_sp(n_data, n_seq)
    out = jax.jit(lambda p_, x_: sp_vit_apply(
        p_, x_, cfg, mesh, all_layers=True))(params, x)
    assert out.shape == ref.shape          # ring pads sliced back off
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # all_layers=False == the last normed layer
    last = jax.jit(lambda p_, x_: sp_vit_apply(
        p_, x_, cfg, mesh, all_layers=False))(params, x)
    np.testing.assert_allclose(np.asarray(last),
                               np.asarray(vit_apply(params, x, cfg,
                                                    all_layers=False)),
                               rtol=1e-4, atol=1e-5)


def test_sp_vit_forward_with_token_mask(rng):
    """Canvas-style key masking composes with the ring's own pad masks."""
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    n_tok = (32 // cfg.patch_size) ** 2 + 1
    mask = jnp.asarray(rng.rand(4, n_tok) > 0.3)
    mask = mask.at[:, 0].set(True)
    ref = vit_apply(params, x, cfg, all_layers=True, token_mask=mask)
    mesh = make_mesh_sp(2, 4)
    out = jax.jit(lambda p_, x_, m_: sp_vit_apply(
        p_, x_, cfg, mesh, all_layers=True, token_mask=m_))(params, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_sp_gradients_match_single_device(rng):
    """Gradients flow through the ring (ppermute transpose + online
    softmax) and equal the dense-attention gradients."""
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    mesh = make_mesh_sp(2, 4)

    def loss_ref(p_):
        return jnp.mean(vit_apply(p_, x, cfg, all_layers=True) ** 2)

    def loss_sp(p_):
        return jnp.mean(sp_vit_apply(p_, x, cfg, mesh,
                                     all_layers=True) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_sp = jax.jit(jax.grad(loss_sp))(params)
    flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_s = jax.tree_util.tree_flatten_with_path(g_sp)[0]
    for (ka, a), (_, b) in zip(flat_r, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6, err_msg=str(ka))


def test_sp_activations_genuinely_token_sharded(rng):
    """The encoder's per-layer stack really lands token-sharded over
    ``seq`` (each device holds T_pad/S tokens) before the pad slice."""
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    mesh = make_mesh_sp(1, 8)

    out = jax.jit(lambda p_, x_: sp_vit_apply(
        p_, x_, cfg, mesh, all_layers=True))(params, x)
    # 17 tokens pad to 24 -> sliced back to 17; the value still matches
    # (asserted elsewhere); here check the SHARDED intermediate: jit the
    # un-sliced ring program directly
    from sod_tpu.parallel.sp import _ring_blocks
    from sod_tpu.models.vit import prepare_tokens

    def raw(p_, x_):
        toks, _ = prepare_tokens(p_, x_, cfg)
        b, t, _ = toks.shape
        pad = -(-t // 8) * 8 - t
        toks = jnp.pad(toks, ((0, 0), (0, pad), (0, 0)))
        m = jnp.pad(jnp.ones((b, t), bool), ((0, 0), (0, pad)))
        return _ring_blocks(p_["blocks"], p_["norm"], toks, m, cfg, mesh)

    stack = jax.jit(raw)(params, x)
    assert stack.shape[2] == 24            # padded to the ring multiple
    spec = stack.sharding.spec
    assert spec[2] == "seq", spec          # token axis genuinely sharded
    assert out.shape[2] == 17


def test_sp_maskformer_forward_matches(rng):
    b = 8
    _, mcfg, params, _ = _setup(b)
    x = jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32)
    ref = maskformer_apply(params, x, mcfg)
    mesh = make_mesh_sp(2, 4)
    apply_sp = make_sp_apply(mesh)
    out = jax.jit(lambda p_, x_: apply_sp(p_, x_, mcfg))(
        params, shard_batch({"image": x}, mesh)["image"])
    for k in ("mask_pred", "objectness", "features"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_sp_train_step_matches_single_device(rng):
    b = 8
    cfg, mcfg, params, tx = _setup(b)
    batch = _batch(rng, b)
    step_ref = make_train_step(cfg, tx, mcfg)
    p1, o1, m1 = step_ref(params, tx.init(params), batch)
    p1, o1, m1 = step_ref(p1, o1, batch)

    mesh = make_mesh_sp(2, 4)
    step_sp = make_train_step(cfg, tx, mcfg, apply_fn=make_sp_apply(mesh))
    p2 = shard_params(params, mesh)        # SP replicates weights
    o2 = shard_opt_state(tx, p2)
    with jax.set_mesh(mesh):
        for _ in range(2):
            p2, o2, m2 = step_sp(p2, o2, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-4)


def test_sp_validation_errors(rng):
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    mesh = make_mesh_sp(1, 4)
    with pytest.raises(ValueError, match="use_fused_mlp"):
        assert_sp_compatible(Config(use_fused_mlp=True), mesh)
    assert_sp_compatible(Config(use_fused_train=True),
                         make_mesh_sp(8, 1))   # seq=1: no constraint
    bad = _vit_cfg(use_flash=True)
    with pytest.raises(ValueError, match="XLA block path"):
        sp_vit_apply(params, x, bad, mesh)
    with pytest.raises(ValueError, match="batch 8 not divisible"):
        jax.jit(lambda p_, x_: sp_vit_apply(
            p_, x_, cfg, make_mesh_sp(3, 2)))(params, x)


def test_sp_evaluator_matches_single_device(tmp_path, rng):
    """The REAL Evaluator canvas path with the encoder token-sharded over
    a (data, seq) mesh — the canvas is the long-token case SP exists for
    — equals the single-device Evaluator on a real on-disk dataset."""
    from tests._fixtures import make_duts

    from sod_tpu.train.evaluator import Evaluator

    make_duts(tmp_path, rng, n_test=8, test_hw=(48, 56))
    cfg = Config(dir_dataset=str(tmp_path), compute_dtype="float32",
                 use_pallas_attention=False, num_workers=2)
    mcfg = MaskFormerConfig(
        n_queries=4, n_decoder_layers=2,
        vit=ViTConfig(patch_size=8, embed_dim=32, depth=2, n_heads=2,
                      pos_grid=8))
    params = maskformer_init(jax.random.key(1), mcfg)

    single = Evaluator(params, cfg, mcfg, batch_size=8)("duts")
    mesh = make_mesh_sp(2, 2)
    multi = Evaluator(params, cfg, mcfg, batch_size=8, mesh=mesh)("duts")
    for k in single:
        np.testing.assert_allclose(single[k], multi[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)


def test_sp_trainer_end_to_end(tmp_path, rng):
    """A real Trainer epoch on a 2x2 (data, seq) mesh built from
    Config.mesh_seq_axis (the product path) equals the single-device
    epoch."""
    from tests._fixtures import make_duts

    from sod_tpu.train.trainer import Trainer

    make_duts(tmp_path, rng, n_test=0, n_train=8, train_hw=(64, 64))

    def make_cfg(**kw):
        return Config(dir_dataset=str(tmp_path),
                      pseudo_masks_fp=str(tmp_path / "pseudo.json"),
                      train_image_size=64, batch_size=4,
                      compute_dtype="float32", use_pallas_attention=False,
                      max_gt_masks=2, num_workers=0,
                      dir_ckpt=str(tmp_path / "ckpt"), n_epochs=1, **kw)

    mcfg = MaskFormerConfig(n_queries=4, n_decoder_layers=2, vit=_vit_cfg())
    params = maskformer_init(jax.random.key(0), mcfg)

    t1 = Trainer(make_cfg(), mcfg=mcfg, params=params)
    t1._train_epoch(1)

    t2 = Trainer(make_cfg(suffix="sp", mesh_data_axis=2, mesh_seq_axis=2),
                 mcfg=mcfg, params=params)
    assert t2.mesh is not None and t2.mesh.shape == {"data": 2, "seq": 2}
    t2._train_epoch(1)

    for a, b_ in zip(jax.tree.leaves(jax.device_get(t1.params)),
                     jax.tree.leaves(jax.device_get(t2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-4)
