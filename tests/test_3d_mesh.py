"""3-D ``(data, pipe, model)`` mesh (parallel/p3.py) on the 8-device
virtual CPU mesh: GPipe stages of Megatron tensor-parallel groups —
forward, gradients, the full train step, ZeRO-1 composition and a real
Trainer epoch all equal the single-device run while the block stacks are
genuinely sharded over BOTH the layer (pipe) and feature (model) axes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sod_tpu.config import Config
from sod_tpu.models.maskformer import (
    MaskFormerConfig,
    maskformer_apply,
    maskformer_init,
)
from sod_tpu.models.vit import ViTConfig, vit_apply, vit_init
from sod_tpu.parallel import (
    assert_p3_compatible,
    make_mesh_3d,
    make_p3_apply,
    opt_state_shardings,
    p3_host_params,
    p3_merge_blocks,
    p3_split_blocks,
    p3_vit_apply,
    shard_batch,
    shard_opt_state,
    shard_params_p3,
    zero1_moment_shardings,
)
from sod_tpu.train.optim import build_optimizer
from sod_tpu.train.step import make_train_step

DEPTH = 4


def _vit_cfg(**kw):
    return ViTConfig(patch_size=8, embed_dim=32, depth=DEPTH, n_heads=4,
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


def _assert_trees_close(a_tree, b_tree, atol=1e-5, rtol=1e-4):
    flat_a = jax.tree_util.tree_flatten_with_path(a_tree)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(b_tree)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (k, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=atol, rtol=rtol, err_msg=str(k))


# --------------------------------------------------------------- layout

def test_mesh_3d_construction():
    mesh = make_mesh_3d(2, 2, 2)
    assert mesh.axis_names == ("data", "pipe", "model")
    assert dict(mesh.shape) == {"data": 2, "pipe": 2, "model": 2}
    assert make_mesh_3d(n_pipe=2, n_model=2).shape["data"] == 2  # 8//4
    with pytest.raises(ValueError):
        make_mesh_3d(4, 2, 2)          # 16 > 8 devices
    with pytest.raises(ValueError):
        make_mesh_3d(n_pipe=0)


def test_split_merge_roundtrip():
    cfg = _vit_cfg()
    blocks = vit_init(jax.random.key(0), cfg)["blocks"]
    split = p3_split_blocks(blocks)
    assert set(split["attn"]) == {"q", "k", "v", "proj"}
    d = cfg.embed_dim
    assert split["attn"]["q"]["w"].shape == (DEPTH, d, d)
    assert split["attn"]["q"]["b"].shape == (DEPTH, d)
    back = p3_merge_blocks(split)
    for (k, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(blocks)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(k))


def test_p3_sharding_rules():
    """Column-parallel leaves shard output features over model,
    row-parallel leaves shard input features, norms replicate over model
    — and every block leaf layer-shards over pipe."""
    _, _, params, _ = _setup(4)
    mesh = make_mesh_3d(2, 2, 2)
    p = shard_params_p3(params, mesh, DEPTH)
    blocks = p["encoder"]["blocks"]
    assert blocks["attn"]["q"]["w"].sharding.spec == P("pipe", None, "model")
    assert blocks["attn"]["q"]["b"].sharding.spec == P("pipe", "model")
    assert blocks["attn"]["proj"]["w"].sharding.spec == P("pipe", "model",
                                                          None)
    assert blocks["attn"]["proj"]["b"].sharding.spec == P("pipe", None)
    assert blocks["mlp"]["fc0"]["w"].sharding.spec == P("pipe", None, "model")
    assert blocks["mlp"]["fc1"]["w"].sharding.spec == P("pipe", "model", None)
    assert blocks["norm1"]["scale"].sharding.spec == P("pipe", None)
    # one device holds depth/pipe layers x features/model columns
    qw = blocks["attn"]["q"]["w"]
    assert qw.sharding.shard_shape(qw.shape) == (DEPTH // 2, 32, 16)
    # everything outside the encoder blocks replicates
    assert p["encoder"]["norm"]["scale"].sharding.is_fully_replicated
    assert p["query_embed"].sharding.is_fully_replicated


@pytest.mark.parametrize("n_data,n_pipe,n_model",
                         [(2, 2, 2), (1, 4, 2), (1, 2, 4)])
def test_p3_vit_forward_matches_single_device(rng, n_data, n_pipe, n_model):
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    ref = vit_apply(params, x, cfg, all_layers=True)

    mesh = make_mesh_3d(n_data, n_pipe, n_model)
    p = shard_params_p3({"encoder": params}, mesh, cfg.depth)["encoder"]
    out = jax.jit(lambda p_, x_: p3_vit_apply(
        p_, x_, cfg, mesh, all_layers=True))(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    last = jax.jit(lambda p_, x_: p3_vit_apply(
        p_, x_, cfg, mesh, all_layers=False))(p, x)
    np.testing.assert_allclose(
        np.asarray(last), np.asarray(vit_apply(params, x, cfg,
                                               all_layers=False)),
        rtol=1e-5, atol=1e-5)


def test_p3_vit_forward_with_token_mask(rng):
    """Canvas-style key masking flows through the TP stage program —
    the local-head _sdpa applies the same key mask every rank."""
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    n_tok = (32 // cfg.patch_size) ** 2 + 1
    mask = jnp.asarray(rng.rand(4, n_tok) > 0.3)
    mask = mask.at[:, 0].set(True)
    ref = vit_apply(params, x, cfg, all_layers=True, token_mask=mask)
    mesh = make_mesh_3d(1, 2, 2)
    p = shard_params_p3({"encoder": params}, mesh, cfg.depth)["encoder"]
    out = jax.jit(lambda p_, x_, m_: p3_vit_apply(
        p_, x_, cfg, mesh, all_layers=True, token_mask=m_))(p, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_p3_bias_free_qkv_forward_matches(rng):
    """qkv_bias=False configs (split layout has no 'b' leaves) shard and
    run — regression: a fixed spec template used to structure-mismatch."""
    cfg = _vit_cfg(qkv_bias=False)
    params = vit_init(jax.random.key(0), cfg)
    assert "b" not in p3_split_blocks(params["blocks"])["attn"]["q"]
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    ref = vit_apply(params, x, cfg, all_layers=True)
    mesh = make_mesh_3d(1, 2, 2)
    p = shard_params_p3({"encoder": params}, mesh, cfg.depth)["encoder"]
    out = jax.jit(lambda p_, x_: p3_vit_apply(
        p_, x_, cfg, mesh, all_layers=True))(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_p3_gradients_match_single_device(rng):
    """Gradients flow through psum (model) AND ppermute (pipe); merged
    back to the packed layout they equal the dense gradients."""
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    mesh = make_mesh_3d(2, 2, 2)
    p = shard_params_p3({"encoder": params}, mesh, cfg.depth)["encoder"]

    def loss_ref(p_):
        return jnp.mean(vit_apply(p_, x, cfg, all_layers=True) ** 2)

    def loss_p3(p_):
        return jnp.mean(p3_vit_apply(p_, x, cfg, mesh,
                                     all_layers=True) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_p3 = jax.device_get(jax.jit(jax.grad(loss_p3))(p))
    g_p3 = {**g_p3, "blocks": p3_merge_blocks(g_p3["blocks"])}
    _assert_trees_close(g_ref, g_p3, atol=1e-6, rtol=1e-3)


def test_p3_train_step_matches_and_zero1_composes(rng):
    """Two full train steps on the 2x2x2 mesh with ZeRO-1 on top: loss
    and merged params equal single-device; the AdamW moments are sharded
    over data AND model (and pipe on the block stacks)."""
    b = 8
    cfg, mcfg, params, tx = _setup(b)
    batch = _batch(rng, b)
    step_ref = make_train_step(cfg, tx, mcfg)
    p1, o1, m1 = step_ref(params, tx.init(params), batch)
    p1, o1, m1 = step_ref(p1, o1, batch)

    mesh = make_mesh_3d(2, 2, 2)
    p2 = shard_params_p3(params, mesh, DEPTH)
    z = zero1_moment_shardings(p2, mesh, min_size=1024)
    opt_sh = opt_state_shardings(tx, p2, param_shardings=z)
    o2 = shard_opt_state(tx, p2, shardings=opt_sh)
    step = make_train_step(cfg, tx, mcfg, apply_fn=make_p3_apply(mesh),
                           out_shardings=(
                               jax.tree.map(lambda l: l.sharding, p2),
                               opt_sh, NamedSharding(mesh, P())))
    with jax.set_mesh(mesh):
        for _ in range(2):
            p2, o2, m2 = step(p2, o2, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    merged = p3_host_params(p2)
    _assert_trees_close(jax.device_get(p1), merged, atol=1e-5, rtol=1e-4)
    # the updated blocks KEPT the dual-axis layout through the jitted step
    assert (p2["encoder"]["blocks"]["attn"]["q"]["w"].sharding.spec
            == P("pipe", None, "model"))
    both = [l for l in jax.tree.leaves(o2)
            if hasattr(l, "sharding")
            and {"data", "model"} <= {e for e in l.sharding.spec
                                      if isinstance(e, str)}]
    assert both, "expected ZeRO-1 moments sharded over data AND model"


def test_p3_maskformer_forward_matches(rng):
    b = 4
    _, mcfg, params, _ = _setup(b)
    x = jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32)
    ref = maskformer_apply(params, x, mcfg)
    mesh = make_mesh_3d(2, 2, 2)
    apply_p3 = make_p3_apply(mesh)
    p = shard_params_p3(params, mesh, DEPTH)
    out = jax.jit(lambda p_, x_: apply_p3(p_, x_, mcfg))(
        p, shard_batch({"image": x}, mesh)["image"])
    for k in ("mask_pred", "objectness", "features"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_p3_validation_errors(rng):
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    mesh = make_mesh_3d(2, 2, 2)
    with pytest.raises(ValueError, match="TP-split"):
        p3_vit_apply(params, x, cfg, mesh)        # packed layout rejected
    with pytest.raises(ValueError, match="use_fused_mlp"):
        assert_p3_compatible(Config(use_fused_mlp=True), mesh, cfg)
    xla = Config(use_pallas_attention=False)
    with pytest.raises(ValueError, match="n_heads 6 not divisible"):
        assert_p3_compatible(
            xla, make_mesh_3d(1, 2, 4),
            ViTConfig(patch_size=8, embed_dim=24, depth=4, n_heads=6,
                      pos_grid=4, mlp_ratio=2))
    with pytest.raises(ValueError, match="depth 3 not divisible"):
        assert_p3_compatible(
            xla, mesh,
            ViTConfig(patch_size=8, embed_dim=32, depth=3, n_heads=4,
                      pos_grid=4))
    # model axis of 1 -> no TP constraints (plain pp mesh shape)
    assert_p3_compatible(Config(use_fused_train=True),
                         make_mesh_3d(4, 2, 1), cfg)
    bad = _vit_cfg(use_flash=True)
    with pytest.raises(ValueError, match="XLA block path"):
        p3_vit_apply(params, x, bad, mesh)


# --------------------------------------------------------- product path

def test_p3_trainer_end_to_end(tmp_path, rng):
    """A real Trainer epoch on the 2x2x2 (data, pipe, model) mesh built
    from Config.mesh_data/pipe/model_axis (the product path) equals the
    single-device epoch, with the blocks genuinely dual-axis sharded and
    ``_export_params`` handing the standard packed layout to consumers
    outside the mesh."""
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

    t2 = Trainer(make_cfg(suffix="p3", mesh_data_axis=2, mesh_pipe_axis=2,
                          mesh_model_axis=2),
                 mcfg=mcfg, params=params)
    assert t2.mesh is not None
    assert dict(t2.mesh.shape) == {"data": 2, "pipe": 2, "model": 2}
    qw = t2.params["encoder"]["blocks"]["attn"]["q"]["w"]
    assert qw.sharding.shard_shape(qw.shape) == (DEPTH // 2, 32, 16)
    t2._train_epoch(1)

    exported = t2._export_params()
    assert "qkv" in exported["encoder"]["blocks"]["attn"]  # standard layout
    _assert_trees_close(jax.device_get(t1.params), exported)


def test_p3_trainer_resume_relayout(tmp_path, rng):
    """latest_model under the 3-D mesh stores the split layout verbatim;
    a fresh Trainer with the same config resumes onto the same dual-axis
    sharding and continues identically."""
    from tests._fixtures import make_duts

    from sod_tpu.train.trainer import Trainer

    make_duts(tmp_path, rng, n_test=0, n_train=4, train_hw=(64, 64))

    def make_cfg():
        return Config(dir_dataset=str(tmp_path),
                      pseudo_masks_fp=str(tmp_path / "pseudo.json"),
                      train_image_size=64, batch_size=4,
                      compute_dtype="float32", use_pallas_attention=False,
                      max_gt_masks=2, num_workers=0, suffix="p3r",
                      dir_ckpt=str(tmp_path / "ckpt"), n_epochs=2,
                      mesh_data_axis=2, mesh_pipe_axis=2, mesh_model_axis=2)

    mcfg = MaskFormerConfig(n_queries=4, n_decoder_layers=2, vit=_vit_cfg())
    params = maskformer_init(jax.random.key(0), mcfg)

    t1 = Trainer(make_cfg(), mcfg=mcfg, params=params)
    t1._train_epoch(1)
    t1._train_epoch(2)

    t2 = Trainer(make_cfg(), mcfg=mcfg, params=params)
    t2._train_epoch(1)
    t3 = Trainer(make_cfg(), mcfg=mcfg, params=params)
    assert t3.resume() == 2
    qw = t3.params["encoder"]["blocks"]["attn"]["q"]["w"]
    assert qw.sharding.shard_shape(qw.shape) == (DEPTH // 2, 32, 16)
    t3._train_epoch(2)

    _assert_trees_close(p3_host_params(t1.params), p3_host_params(t3.params))
