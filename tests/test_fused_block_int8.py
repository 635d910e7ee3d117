"""Int8 (W8A8) fused-block kernel: quantizer properties, kernel-vs-XLA-twin
parity (interpret mode), accuracy vs the exact f32 block, vit_apply routing,
and the serving plumbing (Config.quantize="int8")."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sod_tpu.models.vit import ViTConfig, _block_apply, vit_init
from sod_tpu.ops.fused_block_int8 import (
    _HAS_PLTPU,
    fused_vit_block_int8,
    quantize_vit_blocks,
    vit_quantize_int8,
    xla_int8_block,
)


@pytest.fixture()
def small_cfg():
    return ViTConfig(patch_size=8, embed_dim=128, depth=2, n_heads=2,
                     pos_grid=4)


@pytest.fixture()
def quantized(small_cfg):
    params = vit_init(jax.random.key(0), small_cfg)
    bq_stacked = quantize_vit_blocks(params["blocks"])
    bp = jax.tree.map(lambda a: a[0], params["blocks"])
    bq = jax.tree.map(lambda a: a[0], bq_stacked)
    return params, bp, bq, bq_stacked


def test_quantizer_roundtrip(quantized):
    """q*s reconstructs every weight within half an int8 LSB of its
    column's scale, q stays in [-127, 127], scales are positive f32."""
    _, bp, bq, _ = quantized
    for name, mat in (("qkv", bp["attn"]["qkv"]), ("proj", bp["attn"]["proj"]),
                      ("fc0", bp["mlp"]["fc0"]), ("fc1", bp["mlp"]["fc1"])):
        q, s = np.asarray(bq[name]["q"]), np.asarray(bq[name]["s"])
        w = np.asarray(mat["w"], np.float32)
        assert q.dtype == np.int8
        assert s.dtype == np.float32 and (s > 0).all()
        assert np.abs(q).max() <= 127
        # <= (not <): round-half-to-even ties land exactly on s/2
        assert (np.abs(q * s - w) <= s * (0.5 + 1e-5)).all()
        # per-channel: at least one weight per column hits +-127
        assert (np.abs(q).max(axis=0) == 127).all()


@pytest.mark.skipif(not _HAS_PLTPU, reason="pallas tpu backend unavailable")
def test_kernel_matches_xla_twin(rng, quantized, small_cfg):
    """The Pallas kernel computes the SAME quantized math as the pure-XLA
    twin (differences only from bf16 attention intermediate ordering)."""
    _, _, bq, _ = quantized
    n_real, n_pad = 100, 128
    x = jnp.asarray(rng.randn(2, n_real, 128).astype(np.float32))
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n_real), (0, 0))).astype(jnp.bfloat16)
    out_k = fused_vit_block_int8(xp, bq, small_cfg.n_heads, n_real=n_real,
                                 eps=small_cfg.ln_eps, interpret=True)
    out_x = xla_int8_block(xp, bq, small_cfg.n_heads, n_real=n_real,
                           eps=small_cfg.ln_eps)
    gk = np.asarray(out_k[:, :n_real].astype(jnp.float32))
    gx = np.asarray(out_x[:, :n_real].astype(jnp.float32))
    # bf16 output + bf16 attention intermediates: one output ULP of slack
    np.testing.assert_allclose(gk, gx, atol=2e-2, rtol=1e-2)


@pytest.mark.skipif(not _HAS_PLTPU, reason="pallas tpu backend unavailable")
def test_int8_block_tracks_f32_block(rng, quantized, small_cfg):
    """W8A8 quantization noise stays small: corr > 0.999 and max error
    ~1e-2 against the exact f32 block on unit-scale activations."""
    _, bp, bq, _ = quantized
    n_real, n_pad = 100, 128
    x = jnp.asarray(rng.randn(2, n_real, 128).astype(np.float32))
    ref = np.asarray(_block_apply(bp, x, small_cfg))
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n_real), (0, 0))).astype(jnp.bfloat16)
    out = fused_vit_block_int8(xp, bq, small_cfg.n_heads, n_real=n_real,
                               eps=small_cfg.ln_eps, interpret=True)
    got = np.asarray(out[:, :n_real].astype(jnp.float32))
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999
    np.testing.assert_allclose(got, ref, atol=0.08, rtol=0.05)


@pytest.mark.skipif(not _HAS_PLTPU, reason="pallas tpu backend unavailable")
def test_masked_kernel_matches_twin(rng, quantized, small_cfg):
    _, _, bq, _ = quantized
    n = 128
    x = jnp.asarray(rng.randn(2, n, 128).astype(np.float32)).astype(jnp.bfloat16)
    mask = jnp.asarray(rng.rand(2, n) > 0.4)
    mask = mask.at[:, 0].set(True)
    out_k = fused_vit_block_int8(x, bq, small_cfg.n_heads, n_real=n,
                                 eps=small_cfg.ln_eps, interpret=True,
                                 key_mask=mask)
    out_x = xla_int8_block(x, bq, small_cfg.n_heads, n_real=n,
                           eps=small_cfg.ln_eps, key_mask=mask)
    valid = np.asarray(mask)
    gk = np.asarray(out_k.astype(jnp.float32))[valid]
    gx = np.asarray(out_x.astype(jnp.float32))[valid]
    np.testing.assert_allclose(gk, gx, atol=2e-2, rtol=1e-2)


@pytest.mark.skipif(not _HAS_PLTPU, reason="pallas tpu backend unavailable")
def test_vit_apply_routes_blocks_q(rng, small_cfg, monkeypatch):
    """vit_apply(fused=True) takes the int8 scan when blocks_q is present,
    and its output tracks the float forward."""
    import sod_tpu.ops.fused_block as fb
    import sod_tpu.ops.fused_block_int8 as fbq
    from sod_tpu.models.vit import vit_apply

    monkeypatch.setattr(fb, "fused_available", lambda: True)
    calls = []
    real = fbq.fused_vit_block_int8

    def interp(*a, **kw):
        calls.append(1)
        kw["interpret"] = True
        return real(*a, **kw)

    monkeypatch.setattr(fbq, "fused_vit_block_int8", interp)

    params = vit_quantize_int8(vit_init(jax.random.key(0), small_cfg))
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    ref = vit_apply(params, x, small_cfg, all_layers=False)
    got = vit_apply(params, x.astype(jnp.bfloat16), small_cfg,
                    all_layers=False, fused=True)
    assert calls, "int8 kernel was not routed"
    g = np.asarray(got.astype(jnp.float32))
    r = np.asarray(ref)
    assert np.corrcoef(g.ravel(), r.ravel())[0, 1] > 0.995
    np.testing.assert_allclose(g, r, atol=0.25, rtol=0.1)


def test_serving_quantize_plumbing(tmp_path):
    """Config.quantize='int8' attaches int8 blocks_q at load; CPU serving
    (unfused fallback) still produces masks equal to the unquantized
    service (blocks_q is ignored off-TPU)."""
    from sod_tpu.config import Config
    from sod_tpu.serving.inference import SelfMaskInference

    cfg = Config(eval_image_size=64, micro_batch=False)
    svc = SelfMaskInference(cfg=cfg.replace(quantize="int8"), warmup=False)
    bq = svc.params["encoder"]["blocks_q"]
    assert bq["qkv"]["q"].dtype == jnp.int8
    assert bq["qkv"]["s"].dtype == jnp.float32
    # same RNG init -> identical float params; CPU forward ignores blocks_q
    ref = SelfMaskInference(cfg=cfg, warmup=False)
    x = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    m1, o1 = svc._forward(svc.params, svc._prep(x))
    m2, o2 = ref._forward(ref.params, ref._prep(x))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))

    with pytest.raises(ValueError, match="resnet50"):
        SelfMaskInference(cfg=cfg.replace(quantize="int8", arch="resnet50"),
                          warmup=False)


@pytest.mark.skipif(not _HAS_PLTPU, reason="pallas tpu backend unavailable")
def test_vitb_width_routes_and_matches(rng):
    """d=768 (ViT-B) is locked out of the bf16 whole-block kernel by VMEM
    but fits the int8 kernel (weights halve); the routing guard admits it
    only when blocks_q is present, and the kernel matches the XLA twin."""
    from sod_tpu.models.vit import ViTConfig, vit_init

    cfg = ViTConfig(patch_size=8, embed_dim=768, depth=1, n_heads=12,
                    pos_grid=2)
    params = vit_init(jax.random.key(0), cfg)
    bq = jax.tree.map(lambda a: a[0], quantize_vit_blocks(params["blocks"]))
    n = 128
    x = jnp.asarray(rng.randn(1, n, 768).astype(np.float32)).astype(jnp.bfloat16)
    out_k = fused_vit_block_int8(x, bq, cfg.n_heads, n_real=100,
                                 eps=cfg.ln_eps, interpret=True)
    out_x = xla_int8_block(x, bq, cfg.n_heads, n_real=100, eps=cfg.ln_eps)
    gk = np.asarray(out_k[:, :100].astype(jnp.float32))
    gx = np.asarray(out_x[:, :100].astype(jnp.float32))
    np.testing.assert_allclose(gk, gx, atol=2e-2, rtol=1e-2)

    # the bf16 guard stays at d<=512: without blocks_q a d=768 fused call
    # must NOT enter the whole-block path (it takes the gridded pipeline)
    import sod_tpu.ops.fused_block_int8 as fbq
    import sod_tpu.ops.fused_block as fb
    from sod_tpu.models.vit import vit_apply
    called = []
    orig = fbq.fused_vit_block_int8

    def spy(*a, **kw):
        called.append(1)
        kw["interpret"] = True
        return orig(*a, **kw)

    import unittest.mock as mock
    with mock.patch.object(fb, "fused_available", lambda: True), \
         mock.patch.object(fbq, "fused_vit_block_int8", spy):
        from sod_tpu.ops.fused_block_int8 import vit_quantize_int8
        pq = vit_quantize_int8(params)
        img = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
        got = vit_apply(pq, img.astype(jnp.bfloat16), cfg, fused=True)
        assert called, "d=768 with blocks_q did not route to the int8 kernel"
        ref = vit_apply(params, img, cfg, fused=False)
        g, r = np.asarray(got.astype(jnp.float32)), np.asarray(ref)
        assert np.corrcoef(g.ravel(), r.ravel())[0, 1] > 0.995
