"""Aux components: DeiT distilled, DINOHead, 2-D pos encoding, upsample
block, model factory, visualizer, config system, LR schedule."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sod_tpu.config import Config, define_experim_name, load_config
from sod_tpu.models.deit import DeiTConfig, deit_apply, deit_init
from sod_tpu.models.factory import get_model
from sod_tpu.models.maskformer import positional_encoding_2d
from sod_tpu.models.vit import ViTConfig, dino_head_apply, dino_head_init
from sod_tpu.train.lr_schedule import poly_schedule


def test_experim_name_matches_reference():
    # the shipped checkpoint dir is nq20_ndl6_bc_sr10100_duts_pm_seed0...
    # (ref app.py:350)
    cfg = Config()
    assert define_experim_name(cfg) == "nq20_ndl6_bc_sr10100_duts_pm_seed0"
    cfg2 = cfg.replace(suffix="contrastive")
    assert define_experim_name(cfg2) == \
        "nq20_ndl6_bc_sr10100_duts_pm_seed0_contrastive"


def test_load_reference_yaml(tmp_path):
    # reference config keys load unchanged
    yaml_text = """
scale_range: [ 0.1, 1.0 ]
k: [2, 3, 4]
dataset_name: "duts"
batch_size: 8
n_decoder_layers: 6
n_queries: 20
patch_size: 8
use_binary_classifier: true
weight_dice_loss: 1.0
lr: 0.000006
n_epochs: 12
benchmarks: null
unknown_future_key: 42
"""
    fp = tmp_path / "c.yaml"
    fp.write_text(yaml_text)
    with pytest.warns(UserWarning):
        cfg = load_config(str(fp))
    assert cfg.n_queries == 20
    assert cfg.scale_range == (0.1, 1.0)
    assert cfg.lr == 6e-6


def test_poly_schedule():
    s = poly_schedule(1.0, total_iters=100, warmup_iters=10)
    assert float(s(0)) == 0.0
    assert abs(float(s(5)) - 0.5) < 1e-6            # warmup
    assert abs(float(s(10)) - 0.9 ** 0.9) < 1e-6
    assert float(s(99)) < 0.05
    # reference per-epoch wrap quirk — exact T sequence of the torch Poly
    # (utils/lr_scheduler.py:26-41: factor from cur_iter, THEN
    # ``cur_iter %= n; cur_iter += 1`` → 0, 1..n, 1..n, ...)
    cycle, total = 10, 100
    sq = poly_schedule(1.0, total_iters=total, cycle_iters=cycle)
    cur = 0
    for step in range(35):
        ref_factor = (1.0 - cur / total) ** 0.9
        assert abs(float(sq(step)) - ref_factor) < 1e-6, step
        cur = cur % cycle + 1
    # NOT a plain mod: T revisits 0 only at the very first step
    assert float(sq(10)) != float(sq(0))
    assert abs(float(sq(15)) - float(sq(5))) < 1e-6


def test_deit_distilled():
    cfg = DeiTConfig(vit=ViTConfig(patch_size=8, embed_dim=32, depth=2,
                                   n_heads=2, pos_grid=4), num_classes=10)
    params = deit_init(jax.random.key(0), cfg)
    logits = deit_apply(params, jnp.ones((2, 32, 32, 3)), cfg)
    assert logits.shape == (2, 10)
    # pos-embed interpolation path (different input size)
    logits2 = deit_apply(params, jnp.ones((1, 48, 48, 3)), cfg)
    assert logits2.shape == (1, 10)


def test_dino_head():
    p = dino_head_init(jax.random.key(0), 32, 64, nlayers=3, hidden_dim=48,
                       bottleneck_dim=16)
    out = dino_head_apply(p, jnp.ones((2, 32)))
    assert out.shape == (2, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_positional_encoding_2d_structure():
    pe = np.asarray(positional_encoding_2d(8, 5, 7))
    assert pe.shape == (8, 5, 7)
    # first half encodes width: constant along H
    assert np.allclose(pe[0, 0, :], pe[0, -1, :])
    # second half encodes height: constant along W
    assert np.allclose(pe[4, :, 0], pe[4, :, -1])
    with pytest.raises(ValueError):
        positional_encoding_2d(6, 4, 4)


def test_model_factory():
    cfg = Config(use_pallas_attention=False)
    mcfg, params, apply_fn = get_model("maskformer", configs=cfg)
    assert mcfg.n_queries == 20
    vcfg, vparams, vapply = get_model("vit_small", patch_size=16,
                                      training_method="dino")
    assert vcfg.patch_size == 16
    _, rparams, rapply = get_model("resnet50", training_method="mocov2")
    assert "layer4" in rparams
    with pytest.raises(ValueError):
        get_model("nope")


def test_visualizer(tmp_path, rng):
    from sod_tpu.utils.visualizer import Visualizer, extract_selected_predictions

    viz = Visualizer(str(tmp_path))
    image = rng.randn(32, 32, 3).astype(np.float32)
    preds = rng.rand(5, 16, 16).astype(np.float32)
    obj = rng.rand(5).astype(np.float32)
    out = viz.grid(image, (preds[0] > 0.5), preds, int(obj.argmax()), obj,
                   "test.png")
    assert os.path.exists(out)

    sel = extract_selected_predictions(preds[None], [2])
    np.testing.assert_array_equal(sel[0], preds[2])


def test_cli_argparsers():
    from sod_tpu.cli.evaluate import build_argparser as eva
    from sod_tpu.cli.generate_masks import build_argparser as gen
    from sod_tpu.cli.train import build_argparser as tr

    a = tr().parse_args(["--config", "x.yaml", "--debug", "--seed", "1"])
    assert a.debug and a.seed == 1
    a = eva().parse_args(["--config", "x.yaml", "-dn", "ecssd"])
    assert a.dataset_name == "ecssd"
    a = gen().parse_args(["--p_images", "a.jpg", "b.jpg", "-cs", "2", "3"])
    assert a.cluster_sizes == [2, 3]


def test_compilation_cache_helper(tmp_path, monkeypatch):
    """enable_compilation_cache must configure jax.config (the env var is
    too late on hosts that pre-import jax) AND export the env var for
    fresh subprocess interpreters; explicit dir > env > default."""
    import jax

    from sod_tpu.utils.compcache import enable_compilation_cache

    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.delenv("SOD_COMPILATION_CACHE_DIR", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        d = str(tmp_path / "xla_cache")
        assert enable_compilation_cache(d) == d
        assert jax.config.jax_compilation_cache_dir == d
        assert os.path.isdir(d)
        assert os.environ["JAX_COMPILATION_CACHE_DIR"] == d
        # env-var route (SOD_ var wins over the exported JAX_ one)
        d2 = str(tmp_path / "other")
        monkeypatch.setenv("SOD_COMPILATION_CACHE_DIR", d2)
        assert enable_compilation_cache() == d2
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
