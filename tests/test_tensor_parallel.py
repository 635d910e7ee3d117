"""Tensor-parallel (2-D ``data x model`` mesh) path over the 8-device
virtual CPU mesh: Megatron-style sharding rules (parallel/tp.py) leave
the math unchanged — forward, train step, and Evaluator all equal the
single-device run while the weights are genuinely sharded."""
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
from sod_tpu.models.vit import ViTConfig
from sod_tpu.parallel import (
    assert_tp_compatible,
    make_mesh_2d,
    shard_batch,
    shard_opt_state,
    shard_params,
    tp_specs,
)
from sod_tpu.train.optim import build_optimizer
from sod_tpu.train.step import make_train_step


def _setup(batch):
    cfg = Config(batch_size=batch, compute_dtype="float32",
                 use_pallas_attention=False, max_gt_masks=2)
    mcfg = MaskFormerConfig(
        n_queries=4, n_decoder_layers=2,
        vit=ViTConfig(patch_size=8, embed_dim=32, depth=2, n_heads=2,
                      pos_grid=4))
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


def test_mesh_2d_construction():
    mesh = make_mesh_2d(2, 4)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 2 and mesh.shape["model"] == 4
    assert make_mesh_2d(n_model=4).shape["data"] == 2   # 8 devices / 4
    with pytest.raises(ValueError):
        make_mesh_2d(8, 4)
    # n_model > device count must raise, not build a silent 0-device mesh
    # (len(devices) // n_model == 0)
    with pytest.raises(ValueError):
        make_mesh_2d(n_model=999)


def test_opt_state_shardings_mirror_params(rng):
    """Adam moments must carry the mirrored param's TP sharding FROM
    INITIALISATION (jit(tx.init) without out_shardings would commit the
    full fp32 moment buffers to one device — the OOM TP exists to
    avoid); scalars replicate."""
    cfg, mcfg, params, tx = _setup(8)
    mesh = make_mesh_2d(2, 4)
    p_tp = shard_params(params, mesh)
    opt = shard_opt_state(tx, p_tp)

    flat_p = {tuple(str(getattr(e, "key", e)) for e in path): leaf
              for path, leaf in
              jax.tree_util.tree_flatten_with_path(p_tp)[0]}
    n_sharded = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(opt)[0]:
        if leaf.ndim == 0:
            assert leaf.sharding.is_fully_replicated, path
            continue
        # moment leaves mirror a param: same trailing path + sharding
        p = tuple(str(getattr(e, "key", getattr(e, "idx", e)))
                  for e in path)
        for k in range(len(p), 0, -1):
            if p[-k:] in flat_p:
                ref = flat_p[p[-k:]]
                assert leaf.sharding == ref.sharding, path
                n_sharded += not ref.sharding.is_fully_replicated
                break
    assert n_sharded > 0, "no moment leaf is actually TP-sharded"
    # a restored (host) opt state lands on the same layout
    host = jax.device_get(opt)
    opt2 = shard_opt_state(tx, p_tp, opt_state=host)
    for a, b_ in zip(jax.tree.leaves(opt), jax.tree.leaves(opt2)):
        assert a.sharding == b_.sharding
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_tp_spec_rules():
    _, _, params, _ = _setup(4)
    specs = tp_specs(params, 4)
    blocks = specs["encoder"]["blocks"]
    # column-parallel: output features shard (stacked leaves: [L, in, out])
    assert blocks["attn"]["qkv"]["w"] == P(None, None, "model")
    assert blocks["attn"]["qkv"]["b"] == P(None, "model")
    assert blocks["mlp"]["fc0"]["w"] == P(None, None, "model")
    # row-parallel: input features shard, bias replicated
    assert blocks["attn"]["proj"]["w"] == P(None, "model", None)
    assert blocks["attn"]["proj"]["b"] == P()
    assert blocks["mlp"]["fc1"]["w"] == P(None, "model", None)
    # norms / embeddings / small heads replicated
    assert blocks["norm1"]["scale"] == P()
    assert specs["encoder"]["patch_embed"]["w"] == P()
    assert specs["query_embed"] == P()
    assert all(s == P() for s in jax.tree.leaves(
        specs["ffn"], is_leaf=lambda x: isinstance(x, P)))
    # decoder MHA + FFN
    layers = specs["decoder"]["layers"]
    assert layers["self_attn"]["in_proj"]["w"] == P(None, None, "model")
    assert layers["cross_attn"]["out_proj"]["w"] == P(None, "model", None)
    assert layers["linear1"]["w"] == P(None, None, "model")
    assert layers["linear2"]["w"] == P(None, "model", None)
    # identity at n_model=1
    assert all(s == P() for s in jax.tree.leaves(
        tp_specs(params, 1), is_leaf=lambda x: isinstance(x, P)))


def test_tp_non_divisible_axis_falls_back_replicated():
    _, _, params, _ = _setup(4)
    specs = tp_specs(params, 5)          # 96 % 5 != 0 etc.
    assert all(s == P() for s in jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, P)))


def test_tp_forward_matches_single_device(rng):
    b = 8
    _, mcfg, params, _ = _setup(b)
    x = jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32)

    @jax.jit
    def fwd(p, img):
        out = maskformer_apply(p, img, mcfg)
        return out["mask_pred"], out["objectness"]

    ref_m, ref_o = fwd(params, x)

    mesh = make_mesh_2d(2, 4)
    p_tp = shard_params(params, mesh)
    # the weights are REALLY sharded: a qkv shard holds 1/4 of the columns
    qkv = p_tp["encoder"]["blocks"]["attn"]["qkv"]["w"]
    assert qkv.sharding.spec == P(None, None, "model")
    shard_shape = qkv.sharding.shard_shape(qkv.shape)
    assert shard_shape[-1] == qkv.shape[-1] // 4
    xb = shard_batch({"image": x}, mesh)["image"]
    tp_m, tp_o = fwd(p_tp, xb)
    np.testing.assert_allclose(np.asarray(ref_m), np.asarray(tp_m),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ref_o), np.asarray(tp_o),
                               atol=1e-5, rtol=1e-5)


def test_tp_train_step_matches_single_device(rng):
    b = 8
    cfg, mcfg, params, tx = _setup(b)
    step = make_train_step(cfg, tx, mcfg)
    batch = _batch(rng, b)

    p1, o1, m1 = step(params, tx.init(params), batch)

    mesh = make_mesh_2d(2, 4)
    p_tp = shard_params(params, mesh)
    o_tp = shard_opt_state(tx, p_tp)
    p2, o2, m2 = step(p_tp, o_tp, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-4)
    # updated params keep their TP layout (no silent gather-to-replicated)
    assert (p2["encoder"]["blocks"]["attn"]["qkv"]["w"].sharding.spec
            == P(None, None, "model"))


def test_tp_evaluator_matches_single_device(tmp_path, rng):
    from sod_tpu.train.evaluator import Evaluator

    from tests._fixtures import make_duts

    make_duts(tmp_path, rng, n_test=8, test_hw=(48, 56))
    cfg = Config(dir_dataset=str(tmp_path), compute_dtype="float32",
                 use_pallas_attention=False, num_workers=2)
    mcfg = MaskFormerConfig(
        n_queries=4, n_decoder_layers=2,
        vit=ViTConfig(patch_size=8, embed_dim=32, depth=2, n_heads=2,
                      pos_grid=8))
    params = maskformer_init(jax.random.key(1), mcfg)

    single = Evaluator(params, cfg, mcfg, batch_size=8)("duts")
    mesh = make_mesh_2d(2, 2)
    multi = Evaluator(params, cfg, mcfg, batch_size=8, mesh=mesh)("duts")
    for k in single:
        np.testing.assert_allclose(single[k], multi[k], rtol=1e-4,
                                    atol=1e-5, err_msg=k)


def test_tp_rejects_pallas_paths():
    cfg = Config(use_fused_train=True)
    mesh = make_mesh_2d(2, 4)
    with pytest.raises(ValueError, match="use_fused_train"):
        assert_tp_compatible(cfg, mesh)
    # 1-D / model=1 meshes: no constraint
    assert_tp_compatible(cfg, make_mesh_2d(8, 1))


def test_tp_trainer_end_to_end(tmp_path, rng):
    """A real Trainer epoch on a 2x2 mesh (built from Config.mesh_model_axis,
    the product path) equals the single-device epoch."""
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

    mcfg = MaskFormerConfig(
        n_queries=4, n_decoder_layers=2,
        vit=ViTConfig(patch_size=8, embed_dim=32, depth=2, n_heads=2,
                      pos_grid=8))
    params = maskformer_init(jax.random.key(0), mcfg)

    t1 = Trainer(make_cfg(), mcfg=mcfg, params=params)
    t1._train_epoch(1)

    t2 = Trainer(make_cfg(suffix="tp", mesh_data_axis=2, mesh_model_axis=2),
                 mcfg=mcfg, params=params)
    assert t2.mesh is not None and t2.mesh.shape == {"data": 2, "model": 2}
    t2._train_epoch(1)

    for a, b_ in zip(jax.tree.leaves(jax.device_get(t1.params)),
                     jax.tree.leaves(jax.device_get(t2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-4)
