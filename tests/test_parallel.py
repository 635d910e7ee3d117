"""Data-parallel mesh path over the 8-device virtual CPU mesh
(SURVEY §4(d)): sharded training step equals the single-device step, and
the Evaluator runs sharded."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sod_tpu.config import Config
from sod_tpu.models.maskformer import MaskFormerConfig, maskformer_init
from sod_tpu.models.vit import ViTConfig
from sod_tpu.parallel import batch_sharding, make_mesh, replicated, shard_batch
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


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)
    with pytest.raises(ValueError):
        make_mesh(999)


def test_sharded_train_step_matches_single_device(rng):
    b = 8
    cfg, mcfg, params, tx = _setup(b)
    step = make_train_step(cfg, tx, mcfg)
    batch = _batch(rng, b)

    # single device
    opt1 = tx.init(params)
    p1, o1, m1 = step(params, opt1, batch)

    # 8-device data-parallel
    mesh = make_mesh(8)
    with jax.set_mesh(mesh):
        rep = replicated(mesh)
        p = jax.device_put(params, rep)
        opt = jax.device_put(tx.init(params), rep)
        sbatch = shard_batch(batch, mesh)
        p2, o2, m2 = step(p, opt, sbatch)
        loss2 = float(m2["loss"])

    np.testing.assert_allclose(float(m1["loss"]), loss2, rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-4)


def test_batch_sharding_layout(rng):
    mesh = make_mesh(4)
    x = jnp.asarray(rng.rand(8, 3))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 4
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))


def test_evaluator_with_mesh(tmp_path, rng):
    """Evaluator produces identical metrics with and without a mesh."""
    import json

    from PIL import Image

    from sod_tpu.ops import rle as rle_codec
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
    mesh = make_mesh(4)
    with jax.set_mesh(mesh):
        multi = Evaluator(params, cfg, mcfg, batch_size=8,
                          mesh=mesh)("duts")
    for k in single:
        np.testing.assert_allclose(single[k], multi[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)


def test_evaluator_canvas_size_cached(tmp_path, rng, monkeypatch):
    """The per-dataset canvas scan runs once: the 2nd call (and a fresh
    Evaluator reading the persisted cache) does ZERO image-header reads
    (VERDICT r1 weak item 4)."""
    import PIL.Image

    from sod_tpu.data.factory import get_dataset
    from sod_tpu.train.evaluator import Evaluator

    from tests._fixtures import make_duts

    make_duts(tmp_path, rng, n_test=4, test_hw=(40, 48))

    cfg = Config(dir_dataset=str(tmp_path), compute_dtype="float32",
                 use_pallas_attention=False)
    mcfg = MaskFormerConfig(
        n_queries=4, n_decoder_layers=2,
        vit=ViTConfig(patch_size=8, embed_dim=32, depth=2, n_heads=2,
                      pos_grid=8))
    ev = Evaluator(maskformer_init(jax.random.key(0), mcfg), cfg, mcfg)
    ds = get_dataset(str(tmp_path), "duts", mode="test")

    calls = []
    real_open = PIL.Image.open
    monkeypatch.setattr(PIL.Image, "open",
                        lambda *a, **k: calls.append(a) or real_open(*a, **k))

    assert ev._max_image_size(ds, "duts", None) == (40, 48)
    assert len(calls) == 4                      # one header read per image
    assert ev._max_image_size(ds, "duts", None) == (40, 48)
    assert len(calls) == 4                      # in-memory cache hit

    # a FRESH evaluator in the same (or a new) process reads the
    # persisted .sod_canvas_cache.json instead of rescanning
    ev2 = Evaluator(maskformer_init(jax.random.key(0), mcfg), cfg, mcfg)
    assert ev2._max_image_size(ds, "duts", None) == (40, 48)
    assert len(calls) == 4
