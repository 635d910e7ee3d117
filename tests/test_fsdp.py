"""ZeRO/FSDP state sharding over the data axis (parallel/fsdp.py) on the
8-device virtual CPU mesh: training with sharded optimizer moments
(zero1) or sharded stored weights (full) equals the single-device step
bit-for-bit in semantics, while the state is GENUINELY sharded — each
device holds a 1/n slice, pinned across steps by the train step's
out_shardings (the memory saving would silently evaporate if GSPMD's
layout solver chose replicated outputs)."""
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
    assert_fsdp_compatible,
    fsdp_param_shardings,
    fsdp_specs,
    make_mesh,
    make_mesh_2d,
    shard_batch,
    shard_opt_state,
    shard_params,
    shard_params_fsdp,
)
from sod_tpu.train.optim import build_optimizer
from sod_tpu.train.step import make_train_step


def _vit_cfg(**kw):
    return ViTConfig(patch_size=8, embed_dim=32, depth=4, n_heads=2,
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


def _n_shards(leaf):
    return len({s.index for s in leaf.addressable_shards})


# ---------------------------------------------------------------- specs

def test_fsdp_specs_pick_largest_divisible_axis():
    mesh = make_mesh(8)
    params = {
        "big": jnp.zeros((12, 384, 1152)),    # 1152 % 8 == 0, largest
        "pos": jnp.zeros((1, 785, 384)),      # 785 % 8 != 0 -> dim 2
        "ln": jnp.zeros((384,)),              # < min_size -> replicated
        "odd": jnp.zeros((255, 255)),         # nothing divisible
    }
    specs = fsdp_specs(params, mesh)
    assert specs["big"] == P(None, None, "data")
    assert specs["pos"] == P(None, None, "data")
    assert specs["ln"] == P()
    assert specs["odd"] == P()


def test_fsdp_specs_identity_on_single_device_axis():
    mesh = make_mesh(1)
    params = {"w": jnp.zeros((64, 512))}
    assert fsdp_specs(params, mesh)["w"] == P()


def test_shard_params_fsdp_genuinely_shards():
    mesh = make_mesh(8)
    params = {"w": jnp.zeros((64, 512)), "b": jnp.zeros((8,))}
    sharded = shard_params_fsdp(params, mesh)
    assert _n_shards(sharded["w"]) == 8
    assert sharded["w"].addressable_shards[0].data.shape == (64, 64)
    assert _n_shards(sharded["b"]) == 1          # tiny -> replicated


# ----------------------------------------------------------- guardrails

def test_assert_fsdp_compatible():
    cfg = Config(fsdp="zero1")
    with pytest.raises(ValueError, match="data mesh axis"):
        assert_fsdp_compatible(cfg, None)
    with pytest.raises(ValueError, match="data mesh axis"):
        assert_fsdp_compatible(cfg, make_mesh(1))
    # zero1 composes with TP/PP/SP meshes (moments add "data" on top of
    # the param's own layout); full does not — the weights are already
    # stored sharded on the other axis
    assert_fsdp_compatible(cfg, make_mesh_2d(4, 2))
    with pytest.raises(ValueError, match="mutually exclusive"):
        assert_fsdp_compatible(Config(fsdp="full"), make_mesh_2d(4, 2))
    assert_fsdp_compatible(cfg, make_mesh(8))  # ok
    bad = Config(fsdp="full", use_fused_train=True)
    with pytest.raises(ValueError, match="XLA compute path"):
        assert_fsdp_compatible(bad, make_mesh(8))
    # zero1 composes with the Pallas paths — params stay replicated
    assert_fsdp_compatible(Config(fsdp="zero1", use_fused_train=True),
                           make_mesh(8))
    with pytest.raises(ValueError, match="must be one of"):
        assert_fsdp_compatible(Config(fsdp="zero3"), make_mesh(8))


# ------------------------------------------------------------ train step

def _reference_step(cfg, mcfg, params, tx, batches):
    step = make_train_step(cfg, tx, mcfg)
    opt = tx.init(params)
    for b in batches:
        params, opt, m = step(params, opt, b)
    return params, opt, m


def _fsdp_step(cfg, mcfg, params, tx, batches, mesh, level):
    from jax.sharding import NamedSharding

    cfg = Config(**{**cfg.__dict__, "fsdp": level})
    if level == "full":
        p = shard_params_fsdp(params, mesh)
        override = None
    else:
        p = shard_params(params, mesh)           # replicated
        override = fsdp_param_shardings(p, mesh)
    opt = shard_opt_state(tx, p, param_shardings=override)
    param_sh = jax.tree.map(lambda l: l.sharding, p)
    from sod_tpu.parallel import opt_state_shardings

    opt_sh = opt_state_shardings(tx, p, param_shardings=override)
    step = make_train_step(cfg, tx, mcfg, out_shardings=(
        param_sh, opt_sh, NamedSharding(mesh, P())))
    with jax.set_mesh(mesh):
        for b in batches:
            p, opt, m = step(p, opt, shard_batch(b, mesh))
    return p, opt, m


def _assert_state_close(a, b, atol=1e-5, rtol=1e-4):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=atol, rtol=rtol)


@pytest.mark.parametrize("level", ["zero1", "full"])
def test_fsdp_train_matches_single_device(level, rng):
    cfg, mcfg, params, tx = _setup(batch=8)
    batches = [_batch(rng, 8) for _ in range(2)]
    p_ref, o_ref, m_ref = _reference_step(cfg, mcfg, params, tx, batches)
    mesh = make_mesh(8)
    p, o, m = _fsdp_step(cfg, mcfg, params, tx, batches, mesh, level)

    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)
    _assert_state_close(p_ref, p)
    _assert_state_close(o_ref, o, atol=1e-5)

    # the moments are GENUINELY sharded, and STAY sharded after the step
    mu_big = [l for l in jax.tree.leaves(o)
              if getattr(l, "ndim", 0) >= 2 and l.size >= 16384]
    assert mu_big, "expected shardable moment leaves"
    assert all(_n_shards(l) == 8 for l in mu_big)
    if level == "full":
        w_big = [l for l in jax.tree.leaves(p) if l.size >= 16384]
        assert w_big and all(_n_shards(l) == 8 for l in w_big)
    else:
        assert all(_n_shards(l) == 1 for l in jax.tree.leaves(p))


def test_zero1_with_grad_accum_matches(rng):
    cfg, mcfg, params, tx = _setup(batch=8)
    batches = [_batch(rng, 8)]
    step_ref = make_train_step(cfg, tx, mcfg, accum_steps=2)
    o_ref = tx.init(params)
    p_ref, o_ref, m_ref = step_ref(params, o_ref, batches[0])

    from jax.sharding import NamedSharding

    mesh = make_mesh(4)
    p = shard_params(params, mesh)
    override = fsdp_param_shardings(p, mesh)
    opt = shard_opt_state(tx, p, param_shardings=override)
    from sod_tpu.parallel import opt_state_shardings

    out_sh = (jax.tree.map(lambda l: l.sharding, p),
              opt_state_shardings(tx, p, param_shardings=override),
              NamedSharding(mesh, P()))
    step = make_train_step(cfg, tx, mcfg, accum_steps=2,
                           out_shardings=out_sh)
    with jax.set_mesh(mesh):
        p, opt, m = step(p, opt, shard_batch(batches[0], mesh))
    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)
    _assert_state_close(p_ref, p)


def test_zero1_with_exact_accum_matches(rng):
    """ZeRO-1 composes with the GradCache exact (full-batch-equivalent)
    accumulation mode: sharded moments, exact gradients."""
    cfg, mcfg, params, tx = _setup(batch=8)
    batch = _batch(rng, 8)
    step_ref = make_train_step(cfg, tx, mcfg)          # no accumulation
    p_ref, o_ref, m_ref = step_ref(params, tx.init(params), batch)

    from jax.sharding import NamedSharding

    from sod_tpu.parallel import opt_state_shardings

    mesh = make_mesh(4)
    p = shard_params(params, mesh)
    override = fsdp_param_shardings(p, mesh)
    opt_sh = opt_state_shardings(tx, p, param_shardings=override)
    opt = shard_opt_state(tx, p, shardings=opt_sh)
    step = make_train_step(cfg, tx, mcfg, accum_steps=2, mode="exact",
                           out_shardings=(
                               jax.tree.map(lambda l: l.sharding, p),
                               opt_sh, NamedSharding(mesh, P())))
    with jax.set_mesh(mesh):
        p, opt, m = step(p, opt, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)
    _assert_state_close(p_ref, p)
    mu_big = [l for l in jax.tree.leaves(opt)
              if getattr(l, "ndim", 0) >= 2 and l.size >= 16384]
    assert mu_big and all(_n_shards(l) == 4 for l in mu_big)


# --------------------------------------------------------- product path

def test_fsdp_trainer_end_to_end(tmp_path, rng):
    """A real Trainer epoch with Config.fsdp (the product path) equals
    the single-device epoch, with the moments genuinely sharded."""
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

    t2 = Trainer(make_cfg(suffix="fsdp", mesh_data_axis=4, fsdp="full"),
                 mcfg=mcfg, params=params)
    assert t2.mesh is not None
    big = [l for l in jax.tree.leaves(t2.opt_state)
           if getattr(l, "size", 0) >= 16384]
    assert big and all(_n_shards(l) == 4 for l in big)
    t2._train_epoch(1)
    big = [l for l in jax.tree.leaves(t2.opt_state)
           if getattr(l, "size", 0) >= 16384]
    assert all(_n_shards(l) == 4 for l in big)   # layout survived the jit

    _assert_state_close(jax.device_get(t1.params), jax.device_get(t2.params))


def test_fsdp_trainer_resume_relayout(tmp_path, rng):
    """resume() re-lays restored params AND moments onto the FSDP layout."""
    from tests._fixtures import make_duts

    from sod_tpu.train.trainer import Trainer

    make_duts(tmp_path, rng, n_test=0, n_train=8, train_hw=(64, 64))
    cfg = Config(dir_dataset=str(tmp_path),
                 pseudo_masks_fp=str(tmp_path / "pseudo.json"),
                 train_image_size=64, batch_size=4,
                 compute_dtype="float32", use_pallas_attention=False,
                 max_gt_masks=2, num_workers=0,
                 dir_ckpt=str(tmp_path / "ckpt"), n_epochs=1,
                 mesh_data_axis=4, fsdp="zero1")
    mcfg = MaskFormerConfig(n_queries=4, n_decoder_layers=2, vit=_vit_cfg())
    t1 = Trainer(cfg, mcfg=mcfg,
                 params=maskformer_init(jax.random.key(0), mcfg))
    t1._train_epoch(1)

    t2 = Trainer(cfg, mcfg=mcfg,
                 params=maskformer_init(jax.random.key(1), mcfg))
    nxt = t2.resume()
    assert nxt == 2
    _assert_state_close(jax.device_get(t1.params), jax.device_get(t2.params))
    big = [l for l in jax.tree.leaves(t2.opt_state)
           if getattr(l, "size", 0) >= 16384]
    assert big and all(_n_shards(l) == 4 for l in big)
    assert all(_n_shards(l) == 1 for l in jax.tree.leaves(t2.params))
    t2._train_epoch(nxt)                          # and it still trains


def test_fsdp_without_mesh_raises(tmp_path, rng):
    """Config.fsdp with no mesh must fail loudly, not train unsharded."""
    from tests._fixtures import make_duts

    from sod_tpu.train.trainer import Trainer

    make_duts(tmp_path, rng, n_test=0, n_train=4, train_hw=(64, 64))
    cfg = Config(dir_dataset=str(tmp_path),
                 pseudo_masks_fp=str(tmp_path / "pseudo.json"),
                 train_image_size=64, batch_size=4,
                 compute_dtype="float32", use_pallas_attention=False,
                 max_gt_masks=2, num_workers=0,
                 dir_ckpt=str(tmp_path / "ckpt"), fsdp="zero1")
    mcfg = MaskFormerConfig(n_queries=4, n_decoder_layers=2, vit=_vit_cfg())
    with pytest.raises(ValueError, match="data mesh axis"):
        Trainer(cfg, mcfg=mcfg,
                params=maskformer_init(jax.random.key(0), mcfg))


def test_fsdp_forward_unchanged(rng):
    """A forward pass on FSDP-sharded params equals the replicated one
    (GSPMD all-gathers each weight where it is used)."""
    cfg, mcfg, params, tx = _setup(batch=4)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    ref = maskformer_apply(params, x, mcfg)
    mesh = make_mesh(8)
    p = shard_params_fsdp(params, mesh)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda pp, xx: maskformer_apply(pp, xx, mcfg))(p, x)
    np.testing.assert_allclose(np.asarray(out["mask_pred"]),
                               np.asarray(ref["mask_pred"]),
                               atol=1e-5, rtol=1e-4)


# ----------------------------------------- zero1 x TP/PP/SP composition

def test_zero1_moment_shardings_merge_tp_layout():
    """Moments keep the TP sharding of the param they mirror and ADD
    "data" on the largest still-unsharded divisible axis."""
    from sod_tpu.parallel import zero1_moment_shardings

    mesh = make_mesh_2d(4, 2)
    params = {
        # stacked column-parallel linear: model on the last axis -> data
        # goes to the largest remaining one (dim 1)
        "qkv": {"w": jax.device_put(
            jnp.zeros((4, 64, 128)),
            jax.sharding.NamedSharding(mesh, P(None, None, "model")))},
        # replicated param large enough to shard -> data on largest axis
        "pos": jax.device_put(
            jnp.zeros((1, 64, 384)),
            jax.sharding.NamedSharding(mesh, P())),
        # tiny -> untouched
        "ln": jax.device_put(jnp.zeros((64,)),
                             jax.sharding.NamedSharding(mesh, P())),
    }
    sh = zero1_moment_shardings(params, mesh)
    assert sh["qkv"]["w"].spec == P(None, "data", "model")
    assert sh["pos"].spec == P(None, None, "data")
    assert sh["ln"].spec == P()


def test_zero1_tp_train_matches_single_device(rng):
    """ZeRO-1 on a (data, model) mesh — the Megatron+ZeRO-1 recipe: the
    weights carry the TP layout, the moments shard over BOTH axes, and
    the training math equals single-device."""
    from jax.sharding import NamedSharding

    from sod_tpu.parallel import opt_state_shardings, zero1_moment_shardings

    cfg, mcfg, params, tx = _setup(batch=8)
    batches = [_batch(rng, 8) for _ in range(2)]
    p_ref, o_ref, m_ref = _reference_step(cfg, mcfg, params, tx, batches)

    mesh = make_mesh_2d(4, 2)
    p = shard_params(params, mesh)               # Megatron TP layout
    override = zero1_moment_shardings(p, mesh)
    opt_sh = opt_state_shardings(tx, p, param_shardings=override)
    opt = shard_opt_state(tx, p, shardings=opt_sh)
    step = make_train_step(cfg, tx, mcfg, out_shardings=(
        jax.tree.map(lambda l: l.sharding, p), opt_sh,
        NamedSharding(mesh, P())))
    with jax.set_mesh(mesh):
        for b in batches:
            p, opt, m = step(p, opt, shard_batch(b, mesh))

    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)
    _assert_state_close(p_ref, p)
    _assert_state_close(o_ref, opt, atol=1e-5)

    # at least one moment leaf is sharded over BOTH mesh axes, and the
    # layout survived the jitted steps
    both = [l for l in jax.tree.leaves(opt)
            if hasattr(l, "sharding")
            and {"data", "model"} <= {e for e in l.sharding.spec
                                      if isinstance(e, str)}]
    assert both, "expected moments sharded over data AND model"
    assert all(_n_shards(l) == 8 for l in both)


def test_zero1_trainer_tp_mesh_end_to_end(tmp_path, rng):
    """A real Trainer epoch with fsdp=zero1 on a (data, model) mesh
    equals the single-device epoch, with TP-sharded weights and
    dual-axis-sharded moments."""
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

    t2 = Trainer(make_cfg(suffix="z1tp", mesh_data_axis=4,
                          mesh_model_axis=2, fsdp="zero1"),
                 mcfg=mcfg, params=params)
    assert t2.mesh is not None and t2.mesh.shape["model"] == 2
    t2._train_epoch(1)

    both = [l for l in jax.tree.leaves(t2.opt_state)
            if hasattr(l, "sharding")
            and {"data", "model"} <= {e for e in l.sharding.spec
                                      if isinstance(e, str)}]
    assert both and all(_n_shards(l) == 8 for l in both)
    _assert_state_close(jax.device_get(t1.params), jax.device_get(t2.params))


def test_fsdp_full_on_pipe_mesh_raises(tmp_path, rng):
    """fsdp='full' on a pipe mesh must raise, not silently train with the
    weights only layer-sharded (regression: the pipe branch used to
    return before the FSDP guardrail ran)."""
    from tests._fixtures import make_duts

    from sod_tpu.train.trainer import Trainer

    make_duts(tmp_path, rng, n_test=0, n_train=4, train_hw=(64, 64))
    cfg = Config(dir_dataset=str(tmp_path),
                 pseudo_masks_fp=str(tmp_path / "pseudo.json"),
                 train_image_size=64, batch_size=4,
                 compute_dtype="float32", use_pallas_attention=False,
                 max_gt_masks=2, num_workers=0,
                 dir_ckpt=str(tmp_path / "ckpt"),
                 mesh_data_axis=4, mesh_pipe_axis=2, fsdp="full")
    mcfg = MaskFormerConfig(n_queries=4, n_decoder_layers=2, vit=_vit_cfg())
    with pytest.raises(ValueError, match="mutually exclusive"):
        Trainer(cfg, mcfg=mcfg,
                params=maskformer_init(jax.random.key(0), mcfg))


def test_zero1_trainer_pp_mesh_end_to_end(tmp_path, rng):
    """fsdp=zero1 composes with pipeline parallelism: the block stacks
    stay layer-sharded over 'pipe' while their moments add 'data'."""
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

    # data=2 keeps the GPipe micro-batch (batch 4 / n_micro 2 = 2)
    # divisible by the data axis
    t2 = Trainer(make_cfg(suffix="z1pp", mesh_data_axis=2,
                          mesh_pipe_axis=2, fsdp="zero1"),
                 mcfg=mcfg, params=params)
    t2._train_epoch(1)

    both = [l for l in jax.tree.leaves(t2.opt_state)
            if hasattr(l, "sharding")
            and {"data", "pipe"} <= {e for e in l.sharding.spec
                                     if isinstance(e, str)}]
    assert both and all(_n_shards(l) == 4 for l in both)
    _assert_state_close(jax.device_get(t1.params), jax.device_get(t2.params))


def test_zero1_trainer_sp_mesh_end_to_end(tmp_path, rng):
    """fsdp=zero1 composes with sequence parallelism: SP shards
    activations (params stay replicated on a (data, seq) mesh), so the
    moments shard over 'data' exactly as under plain DP — and the ring
    attention math is unchanged."""
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

    t2 = Trainer(make_cfg(suffix="z1sp", mesh_data_axis=2,
                          mesh_seq_axis=2, fsdp="zero1"),
                 mcfg=mcfg, params=params)
    assert t2.mesh is not None and t2.mesh.shape == {"data": 2, "seq": 2}
    t2._train_epoch(1)

    sharded = [l for l in jax.tree.leaves(t2.opt_state)
               if hasattr(l, "sharding")
               and "data" in {e for e in l.sharding.spec
                              if isinstance(e, str)}]
    assert sharded and all(_n_shards(l) == 2 for l in sharded)
    _assert_state_close(jax.device_get(t1.params), jax.device_get(t2.params))


def test_opt_state_shardings_structure_mismatch_raises():
    """A param_shardings override built from a DIFFERENT tree must fail
    loudly, not positionally mispair onto replicated."""
    from sod_tpu.parallel import fsdp_param_shardings, opt_state_shardings

    cfg, mcfg, params, tx = _setup(batch=4)
    mesh = make_mesh(4)
    p = shard_params(params, mesh)
    bad = fsdp_param_shardings({"other": jnp.zeros((64, 512))}, mesh)
    with pytest.raises((ValueError, TypeError)):
        opt_state_shardings(tx, p, param_shardings=bad)
