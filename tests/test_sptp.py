"""Sequence x tensor parallelism (``(data, seq, model)`` mesh,
parallel/sptp.py) on the 8-device virtual CPU mesh: ring attention runs
inside Megatron TP groups — forward (including the pad-to-ring path: 17
tokens never divide any ring), gradients, the full train step with
ZeRO-1, and a real Trainer epoch all equal the single-device run while
the activations are genuinely token-sharded AND the weights
feature-sharded."""
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
    assert_sptp_compatible,
    make_mesh_sptp,
    make_sptp_apply,
    opt_state_shardings,
    p3_host_params,
    p3_merge_blocks,
    shard_batch,
    shard_opt_state,
    shard_params_sptp,
    sptp_vit_apply,
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


def test_mesh_sptp_construction():
    mesh = make_mesh_sptp(2, 2, 2)
    assert mesh.axis_names == ("data", "seq", "model")
    assert dict(mesh.shape) == {"data": 2, "seq": 2, "model": 2}
    assert make_mesh_sptp(n_seq=2, n_model=2).shape["data"] == 2  # 8//4
    with pytest.raises(ValueError):
        make_mesh_sptp(4, 2, 2)        # 16 > 8 devices
    with pytest.raises(ValueError):
        make_mesh_sptp(n_seq=0)


def test_sptp_sharding_rules():
    """Column-parallel leaves shard output features over model,
    row-parallel input features; the layer axis is UNSHARDED (no pipe);
    seq shards activations only, so every weight's seq entry is None."""
    _, _, params, _ = _setup(4)
    mesh = make_mesh_sptp(2, 2, 2)
    p = shard_params_sptp(params, mesh)
    blocks = p["encoder"]["blocks"]
    assert blocks["attn"]["q"]["w"].sharding.spec == P(None, None, "model")
    assert blocks["attn"]["q"]["b"].sharding.spec == P(None, "model")
    assert blocks["attn"]["proj"]["w"].sharding.spec == P(None, "model",
                                                          None)
    assert blocks["mlp"]["fc0"]["w"].sharding.spec == P(None, None, "model")
    assert blocks["mlp"]["fc1"]["w"].sharding.spec == P(None, "model", None)
    qw = blocks["attn"]["q"]["w"]
    assert qw.sharding.shard_shape(qw.shape) == (DEPTH, 32, 16)
    assert p["encoder"]["norm"]["scale"].sharding.is_fully_replicated
    assert p["query_embed"].sharding.is_fully_replicated


@pytest.mark.parametrize("n_data,n_seq,n_model",
                         [(2, 2, 2), (1, 4, 2), (1, 2, 4)])
def test_sptp_vit_forward_matches_single_device(rng, n_data, n_seq,
                                                n_model):
    """17 tokens (4x4 grid + CLS) never divide any ring size — every
    case exercises the pad-and-mask path THROUGH the TP head split."""
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    ref = vit_apply(params, x, cfg, all_layers=True)

    mesh = make_mesh_sptp(n_data, n_seq, n_model)
    p = shard_params_sptp({"encoder": params}, mesh)["encoder"]
    out = jax.jit(lambda p_, x_: sptp_vit_apply(
        p_, x_, cfg, mesh, all_layers=True))(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    last = jax.jit(lambda p_, x_: sptp_vit_apply(
        p_, x_, cfg, mesh, all_layers=False))(p, x)
    np.testing.assert_allclose(
        np.asarray(last), np.asarray(vit_apply(params, x, cfg,
                                               all_layers=False)),
        rtol=1e-5, atol=1e-5)


def test_sptp_vit_forward_with_token_mask(rng):
    """Canvas-style key masking circulates the ring AND reaches every
    head shard."""
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    n_tok = (32 // cfg.patch_size) ** 2 + 1
    mask = jnp.asarray(rng.rand(4, n_tok) > 0.3)
    mask = mask.at[:, 0].set(True)
    ref = vit_apply(params, x, cfg, all_layers=True, token_mask=mask)
    mesh = make_mesh_sptp(1, 2, 2)
    p = shard_params_sptp({"encoder": params}, mesh)["encoder"]
    out = jax.jit(lambda p_, x_, m_: sptp_vit_apply(
        p_, x_, cfg, mesh, all_layers=True, token_mask=m_))(p, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sptp_activations_genuinely_sharded(rng):
    """The encoder output really is token-sharded over seq (and batch
    over data) — S x dp shards, each holding T_pad/S tokens."""
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    mesh = make_mesh_sptp(2, 2, 2)
    p = shard_params_sptp({"encoder": params}, mesh)["encoder"]

    from sod_tpu.models.vit import prepare_tokens
    from sod_tpu.parallel.sptp import _ring_tp_blocks

    tokens, _ = prepare_tokens(params, x, cfg)
    B, T, _ = tokens.shape
    t_pad = -(-T // 2) * 2
    tokens = jnp.pad(tokens, ((0, 0), (0, t_pad - T), (0, 0)))
    mask = jnp.pad(jnp.ones((B, T), bool), ((0, 0), (0, t_pad - T)))
    out = jax.jit(lambda p_, t_, m_: _ring_tp_blocks(
        p_["blocks"], p_["norm"], t_, m_, cfg, mesh,
        all_layers=False))(p, tokens, mask)
    assert tuple(out.sharding.spec)[:2] == ("data", "seq")
    assert out.sharding.shard_shape(out.shape) == (B // 2, t_pad // 2, 32)


def test_sptp_gradients_match_single_device(rng):
    """Gradients flow through the ring's ppermute (seq) AND the psums
    (model); merged back to packed they equal the dense gradients."""
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    mesh = make_mesh_sptp(2, 2, 2)
    p = shard_params_sptp({"encoder": params}, mesh)["encoder"]

    def loss_ref(p_):
        return jnp.mean(vit_apply(p_, x, cfg, all_layers=True) ** 2)

    def loss_sptp(p_):
        return jnp.mean(sptp_vit_apply(p_, x, cfg, mesh,
                                       all_layers=True) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g = jax.device_get(jax.jit(jax.grad(loss_sptp))(p))
    g = {**g, "blocks": p3_merge_blocks(g["blocks"])}
    _assert_trees_close(g_ref, g, atol=1e-6, rtol=1e-3)


def test_sptp_train_step_matches_and_zero1_composes(rng):
    """Two full train steps on the 2x2x2 (data, seq, model) mesh with
    ZeRO-1 on top: loss and merged params equal single-device; the AdamW
    moments are sharded over data AND model."""
    b = 8
    cfg, mcfg, params, tx = _setup(b)
    batch = _batch(rng, b)
    step_ref = make_train_step(cfg, tx, mcfg)
    p1, o1, m1 = step_ref(params, tx.init(params), batch)
    p1, o1, m1 = step_ref(p1, o1, batch)

    mesh = make_mesh_sptp(2, 2, 2)
    p2 = shard_params_sptp(params, mesh)
    z = zero1_moment_shardings(p2, mesh, min_size=1024)
    opt_sh = opt_state_shardings(tx, p2, param_shardings=z)
    o2 = shard_opt_state(tx, p2, shardings=opt_sh)
    step = make_train_step(cfg, tx, mcfg, apply_fn=make_sptp_apply(mesh),
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
    # the updated blocks KEPT the TP layout through the jitted step
    assert (p2["encoder"]["blocks"]["attn"]["q"]["w"].sharding.spec
            == P(None, None, "model"))
    both = [l for l in jax.tree.leaves(o2)
            if hasattr(l, "sharding")
            and {"data", "model"} <= {e for e in l.sharding.spec
                                      if isinstance(e, str)}]
    assert both, "expected ZeRO-1 moments sharded over data AND model"


def test_sptp_maskformer_forward_matches(rng):
    b = 4
    _, mcfg, params, _ = _setup(b)
    x = jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32)
    ref = maskformer_apply(params, x, mcfg)
    mesh = make_mesh_sptp(2, 2, 2)
    apply_sptp = make_sptp_apply(mesh)
    p = shard_params_sptp(params, mesh)
    out = jax.jit(lambda p_, x_: apply_sptp(p_, x_, mcfg))(
        p, shard_batch({"image": x}, mesh)["image"])
    for k in ("mask_pred", "objectness", "features"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_sptp_validation_errors(rng):
    cfg = _vit_cfg()
    params = vit_init(jax.random.key(0), cfg)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    mesh = make_mesh_sptp(2, 2, 2)
    with pytest.raises(ValueError, match="TP-split"):
        sptp_vit_apply(params, x, cfg, mesh)      # packed layout rejected
    with pytest.raises(ValueError, match="use_fused_mlp"):
        assert_sptp_compatible(Config(use_fused_mlp=True), mesh, cfg)
    xla = Config(use_pallas_attention=False)
    with pytest.raises(ValueError, match="n_heads 6 not divisible"):
        assert_sptp_compatible(
            xla, make_mesh_sptp(1, 2, 4),
            ViTConfig(patch_size=8, embed_dim=24, depth=4, n_heads=6,
                      pos_grid=4, mlp_ratio=2))
    # model axis of 1 -> plain sp shape, no TP constraints
    assert_sptp_compatible(Config(use_fused_train=True),
                           make_mesh_sptp(4, 2, 1), cfg)
    bad = _vit_cfg(use_flash=True)
    with pytest.raises(ValueError, match="XLA block path"):
        sptp_vit_apply(params, x, bad, mesh)


def test_sptp_trainer_resume_relayout(tmp_path, rng):
    """latest_model under the (data, seq, model) mesh stores the split
    layout verbatim; a fresh Trainer with the same config resumes onto
    the same model-sharded layout and continues identically."""
    from tests._fixtures import make_duts

    from sod_tpu.train.trainer import Trainer

    make_duts(tmp_path, rng, n_test=0, n_train=4, train_hw=(64, 64))

    def make_cfg():
        return Config(dir_dataset=str(tmp_path),
                      pseudo_masks_fp=str(tmp_path / "pseudo.json"),
                      train_image_size=64, batch_size=4,
                      compute_dtype="float32", use_pallas_attention=False,
                      max_gt_masks=2, num_workers=0, suffix="sptpr",
                      dir_ckpt=str(tmp_path / "ckpt"), n_epochs=2,
                      mesh_data_axis=2, mesh_seq_axis=2, mesh_model_axis=2)

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
    assert qw.sharding.shard_shape(qw.shape) == (DEPTH, 32, 16)
    t3._train_epoch(2)

    _assert_trees_close(p3_host_params(t1.params), p3_host_params(t3.params))


def test_sptp_evaluator_matches_single_device(tmp_path, rng):
    """The REAL Evaluator canvas path with the encoder token-sharded AND
    tensor-parallel over a (data, seq, model) mesh equals the
    single-device Evaluator on a real on-disk dataset."""
    from tests._fixtures import make_duts

    from sod_tpu.train.evaluator import Evaluator

    make_duts(tmp_path, rng, n_test=8, test_hw=(48, 56))
    cfg = Config(dir_dataset=str(tmp_path), compute_dtype="float32",
                 use_pallas_attention=False, num_workers=2)
    mcfg = MaskFormerConfig(
        n_queries=4, n_decoder_layers=2,
        vit=ViTConfig(patch_size=8, embed_dim=32, depth=2, n_heads=4,
                      pos_grid=8))
    params = maskformer_init(jax.random.key(1), mcfg)

    single = Evaluator(params, cfg, mcfg, batch_size=8)("duts")
    mesh = make_mesh_sptp(2, 2, 2)
    multi = Evaluator(params, cfg, mcfg, batch_size=8, mesh=mesh)("duts")
    for k in single:
        np.testing.assert_allclose(single[k], multi[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)


def test_sptp_trainer_end_to_end(tmp_path, rng):
    """A real Trainer epoch on the 2x2x2 (data, seq, model) mesh built
    from Config.mesh_data/seq/model_axis (the product path) equals the
    single-device epoch, with ``_export_params`` handing back the
    standard packed layout."""
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

    t2 = Trainer(make_cfg(suffix="sptp", mesh_data_axis=2, mesh_seq_axis=2,
                          mesh_model_axis=2),
                 mcfg=mcfg, params=params)
    assert t2.mesh is not None
    assert dict(t2.mesh.shape) == {"data": 2, "seq": 2, "model": 2}
    qw = t2.params["encoder"]["blocks"]["attn"]["q"]["w"]
    assert qw.sharding.shard_shape(qw.shape) == (DEPTH, 32, 16)
    t2._train_epoch(1)

    exported = t2._export_params()
    assert "qkv" in exported["encoder"]["blocks"]["attn"]  # packed layout
    _assert_trees_close(jax.device_get(t1.params), exported)
