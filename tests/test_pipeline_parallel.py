"""Pipeline-parallel (GPipe over the ViT block stack, ``(data, pipe)``
mesh) path on the 8-device virtual CPU mesh: the stage program
(parallel/pp.py) is identical math to the single-device scan — forward,
gradients, the full train step, and a real Trainer epoch all equal the
single-device run while the block stacks are genuinely layer-sharded."""
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
    assert_pp_compatible,
    make_mesh_pp,
    make_pp_apply,
    pp_specs,
    pp_vit_apply,
    shard_batch,
    shard_opt_state,
    shard_params_pp,
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


def test_mesh_pp_construction():
    mesh = make_mesh_pp(2, 4)
    assert mesh.axis_names == ("data", "pipe")
    assert mesh.shape["data"] == 2 and mesh.shape["pipe"] == 4
    assert make_mesh_pp(n_pipe=4).shape["data"] == 2   # 8 devices / 4
    with pytest.raises(ValueError):
        make_mesh_pp(8, 4)
    with pytest.raises(ValueError):
        make_mesh_pp(n_pipe=999)       # 0-device mesh must raise


def test_pp_spec_rules():
    _, _, params, _ = _setup(4)
    specs = pp_specs(params, 4, DEPTH)
    blocks = specs["encoder"]["blocks"]
    # every stacked block leaf shards its LAYER axis
    for leaf in jax.tree.leaves(blocks, is_leaf=lambda x: isinstance(x, P)):
        assert leaf == P("pipe"), leaf
    # everything else replicates: final norm, embeddings, decoder, heads
    assert specs["encoder"]["norm"]["scale"] == P()
    assert specs["encoder"]["patch_embed"]["w"] == P()
    assert specs["query_embed"] == P()
    for sub in ("decoder", "ffn"):
        assert all(s == P() for s in jax.tree.leaves(
            specs[sub], is_leaf=lambda x: isinstance(x, P)))
    # identity at n_pipe=1; replicated fallback when depth doesn't divide
    assert all(s == P() for s in jax.tree.leaves(
        pp_specs(params, 1, DEPTH), is_leaf=lambda x: isinstance(x, P)))
    assert all(s == P() for s in jax.tree.leaves(
        pp_specs(params, 3, DEPTH), is_leaf=lambda x: isinstance(x, P)))


@pytest.mark.parametrize("n_data,n_pipe,n_micro",
                         [(1, 4, 4), (2, 2, 2), (2, 4, 4), (4, 2, 2)])
def test_pp_vit_forward_matches_single_device(rng, n_data, n_pipe, n_micro):
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    ref = vit_apply(params, x, cfg, all_layers=True)

    mesh = make_mesh_pp(n_data, n_pipe)
    p = shard_params_pp(params, mesh, cfg.depth)
    # the block stack is REALLY layer-sharded: one stage holds L/S layers
    qkv = p["blocks"]["attn"]["qkv"]["w"]
    assert qkv.sharding.shard_shape(qkv.shape)[0] == cfg.depth // n_pipe
    out = jax.jit(lambda p_, x_: pp_vit_apply(
        p_, x_, cfg, mesh, n_micro=n_micro, all_layers=True))(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # all_layers=False == the last normed layer
    last = jax.jit(lambda p_, x_: pp_vit_apply(
        p_, x_, cfg, mesh, n_micro=n_micro, all_layers=False))(p, x)
    np.testing.assert_allclose(np.asarray(last),
                               np.asarray(vit_apply(params, x, cfg,
                                                    all_layers=False)),
                               rtol=1e-5, atol=1e-5)


def test_pp_vit_forward_with_token_mask(rng):
    """Canvas-style key masking flows through the pipeline unchanged."""
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    n_tok = (32 // cfg.patch_size) ** 2 + 1
    mask = jnp.asarray(rng.rand(4, n_tok) > 0.3)
    mask = mask.at[:, 0].set(True)
    ref = vit_apply(params, x, cfg, all_layers=True, token_mask=mask)
    mesh = make_mesh_pp(1, 4)
    p = shard_params_pp(params, mesh, cfg.depth)
    out = jax.jit(lambda p_, x_, m_: pp_vit_apply(
        p_, x_, cfg, mesh, n_micro=2, all_layers=True, token_mask=m_))(
            p, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_gradients_match_single_device(rng):
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    mesh = make_mesh_pp(2, 2)
    p = shard_params_pp(params, mesh, cfg.depth)

    def loss_ref(p_):
        return jnp.mean(vit_apply(p_, x, cfg, all_layers=True) ** 2)

    def loss_pp(p_):
        return jnp.mean(pp_vit_apply(p_, x, cfg, mesh,
                                     all_layers=True) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(p)
    flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(g_pp)[0]
    for (ka, a), (_, b) in zip(flat_r, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6, err_msg=str(ka))


def test_pp_maskformer_forward_matches(rng):
    b = 8
    _, mcfg, params, _ = _setup(b)
    x = jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32)
    ref = maskformer_apply(params, x, mcfg)
    mesh = make_mesh_pp(2, 4)
    apply_pp = make_pp_apply(mesh)
    p = shard_params_pp(params, mesh, DEPTH)
    out = jax.jit(lambda p_, x_: apply_pp(p_, x_, mcfg))(
        p, shard_batch({"image": x}, mesh)["image"])
    for k in ("mask_pred", "objectness", "features"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_pp_train_step_matches_single_device(rng):
    b = 8
    cfg, mcfg, params, tx = _setup(b)
    batch = _batch(rng, b)
    step_ref = make_train_step(cfg, tx, mcfg)
    p1, o1, m1 = step_ref(params, tx.init(params), batch)
    p1, o1, m1 = step_ref(p1, o1, batch)

    mesh = make_mesh_pp(2, 4)
    step_pp = make_train_step(cfg, tx, mcfg, apply_fn=make_pp_apply(mesh))
    p2 = shard_params_pp(params, mesh, DEPTH)
    o2 = shard_opt_state(tx, p2)
    # moments mirror the layer-sharded layout from initialisation
    assert any(not leaf.sharding.is_fully_replicated
               for leaf in jax.tree.leaves(o2) if leaf.ndim > 0)
    with jax.set_mesh(mesh):
        for _ in range(2):
            p2, o2, m2 = step_pp(p2, o2, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-4)
    # updated block stacks keep their pipe layout
    assert (p2["encoder"]["blocks"]["attn"]["qkv"]["w"].sharding.spec
            == P("pipe"))


def test_pp_validation_errors(rng):
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(8, 32, 32, 3), jnp.float32)
    mesh = make_mesh_pp(1, 4)
    with pytest.raises(ValueError, match="not divisible by n_micro"):
        pp_vit_apply(params, x, cfg, mesh, n_micro=3)
    with pytest.raises(ValueError, match="use_fused_mlp"):
        assert_pp_compatible(Config(use_fused_mlp=True), mesh, 4)
    assert_pp_compatible(Config(use_fused_train=True),
                         make_mesh_pp(8, 1), 4)  # pipe=1: no constraint
    bad = _vit_cfg(use_flash=True)
    with pytest.raises(ValueError, match="XLA block path"):
        pp_vit_apply(params, x, bad, mesh)
    deep = ViTConfig(patch_size=8, embed_dim=32, depth=3, n_heads=2,
                     pos_grid=4)
    with pytest.raises(ValueError, match="depth 3 not divisible"):
        pp_vit_apply(vit_init(jax.random.key(0), deep), x, deep, mesh)
    with pytest.raises(ValueError, match="micro-batch"):
        pp_vit_apply(params, x, cfg, make_mesh_pp(4, 2), n_micro=4)


def test_pp_trainer_end_to_end(tmp_path, rng):
    """A real Trainer epoch on a 2x2 (data, pipe) mesh built from
    Config.mesh_pipe_axis (the product path) equals the single-device
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

    t2 = Trainer(make_cfg(suffix="pp", mesh_data_axis=2, mesh_pipe_axis=2),
                 mcfg=mcfg, params=params)
    assert t2.mesh is not None and t2.mesh.shape == {"data": 2, "pipe": 2}
    # the Trainer really laid the blocks out layer-sharded
    qkv = t2.params["encoder"]["blocks"]["attn"]["qkv"]["w"]
    assert qkv.sharding.shard_shape(qkv.shape)[0] == DEPTH // 2
    t2._train_epoch(1)

    for a, b_ in zip(jax.tree.leaves(jax.device_get(t1.params)),
                     jax.tree.leaves(jax.device_get(t2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-4)


def test_pp_trainer_vis_step_uses_stage_forward(tmp_path, rng):
    """The in-loop visualization step under a stage-program mesh routes
    through the train step's own apply_fn on the FULL batch (regression:
    it used to run the single-shard fused forward on [:1] of
    mesh-sharded params — the GPipe micro-batching cannot even accept a
    1-image batch)."""
    from tests._fixtures import make_duts

    from sod_tpu.train.trainer import Trainer
    from sod_tpu.utils.visualizer import Visualizer

    make_duts(tmp_path, rng, n_test=0, n_train=4, train_hw=(64, 64))
    cfg = Config(dir_dataset=str(tmp_path),
                 pseudo_masks_fp=str(tmp_path / "pseudo.json"),
                 train_image_size=64, batch_size=4,
                 compute_dtype="float32", use_pallas_attention=False,
                 max_gt_masks=2, num_workers=0,
                 dir_ckpt=str(tmp_path / "ckpt"), n_epochs=1,
                 mesh_data_axis=2, mesh_pipe_axis=2)
    mcfg = MaskFormerConfig(n_queries=4, n_decoder_layers=2, vit=_vit_cfg())
    t = Trainer(cfg, mcfg=mcfg,
                params=maskformer_init(jax.random.key(0), mcfg),
                visualizer=Visualizer(str(tmp_path / "vis")))
    assert t._apply_fn is not None
    t._train_epoch(1)
    import glob as _glob
    import os as _os

    assert _glob.glob(_os.path.join(str(tmp_path / "vis"), "**", "*.png"),
                      recursive=True), "vis step wrote no grids"
