"""Flash-attention kernel logic (interpret mode on CPU) + VJP correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sod_tpu.ops.flash_attention import (
    _HAS_PLTPU,
    _flash_forward,
    _xla_attention,
    flash_attention,
)


@pytest.mark.skipif(not _HAS_PLTPU, reason="pallas tpu backend unavailable")
@pytest.mark.parametrize("n", [64, 100, 785])
def test_kernel_interpret_matches_xla(rng, n):
    b, h, d = 2, 3, 32
    q, k, v = [jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
               for _ in range(3)]
    scale = d ** -0.5
    ours = _flash_forward(q, k, v, scale, interpret=True)
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_vjp_matches_xla_grads(rng):
    b, h, n, d = 1, 2, 17, 16
    q, k, v = [jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
               for _ in range(3)]
    scale = d ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3)


@pytest.mark.skipif(not _HAS_PLTPU, reason="pallas tpu backend unavailable")
def test_masked_kernel_interpret_matches_xla(rng):
    b, h, n, d = 2, 2, 100, 32
    q, k, v = [jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
               for _ in range(3)]
    mask = jnp.asarray(rng.rand(b, n) > 0.3)
    mask = mask.at[:, 0].set(True)      # at least one valid key
    scale = d ** -0.5
    ours = _flash_forward(q, k, v, scale, key_mask=mask, interpret=True)
    ref = _xla_attention(q, k, v, scale, key_mask=mask)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.skipif(not _HAS_PLTPU, reason="pallas tpu backend unavailable")
def test_fused_block_interpret_matches_unfused(rng):
    import jax.numpy as jnp

    from sod_tpu.models.vit import ViTConfig, _block_apply, vit_init
    from sod_tpu.ops.fused_block import fused_vit_block

    cfg = ViTConfig(patch_size=8, embed_dim=128, depth=1, n_heads=2,
                    pos_grid=4)
    params = vit_init(jax.random.key(0), cfg)
    bp = jax.tree.map(lambda a: a[0], params["blocks"])

    n_real, n_pad = 100, 128
    x = jnp.asarray(rng.randn(2, n_real, 128).astype(np.float32))
    ref = _block_apply(bp, x, cfg)

    xp = jnp.pad(x, ((0, 0), (0, n_pad - n_real), (0, 0))).astype(jnp.bfloat16)
    bp16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), bp)
    out = fused_vit_block(xp, bp16, cfg.n_heads, n_real=n_real,
                          eps=cfg.ln_eps, interpret=True)
    got = np.asarray(out[:, :n_real].astype(jnp.float32))
    np.testing.assert_allclose(got, np.asarray(ref), atol=0.15, rtol=0.1)
    # tighter check on correlation (bf16 noise dominates atol)
    c = np.corrcoef(got.ravel(), np.asarray(ref).ravel())[0, 1]
    assert c > 0.999


@pytest.mark.skipif(not _HAS_PLTPU, reason="pallas tpu backend unavailable")
def test_fused_block_masked_interpret(rng):
    import jax.numpy as jnp

    from sod_tpu.models.vit import ViTConfig, _block_apply, vit_init
    from sod_tpu.ops.fused_block import fused_vit_block

    cfg = ViTConfig(patch_size=8, embed_dim=128, depth=1, n_heads=2,
                    pos_grid=4)
    params = vit_init(jax.random.key(0), cfg)
    bp = jax.tree.map(lambda a: a[0], params["blocks"])

    n = 128
    x = jnp.asarray(rng.randn(2, n, 128).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, n) > 0.4)
    mask = mask.at[:, 0].set(True)
    ref = _block_apply(bp, x, cfg, key_mask=mask)

    bp16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), bp)
    out = fused_vit_block(x.astype(jnp.bfloat16), bp16, cfg.n_heads,
                          n_real=n, eps=cfg.ln_eps, interpret=True,
                          key_mask=mask)
    got = np.asarray(out.astype(jnp.float32))
    refn = np.asarray(ref)
    valid = np.asarray(mask)
    # compare only valid tokens (masked tokens are garbage in both paths
    # but not identically so)
    c = np.corrcoef(got[valid].ravel(), refn[valid].ravel())[0, 1]
    assert c > 0.999
    np.testing.assert_allclose(got[valid], refn[valid], atol=0.15, rtol=0.1)


def test_backward_kernel_interpret_matches_xla_grads(rng):
    """The Pallas whole-N backward == autodiff of XLA attention (bf16
    tolerance), including non-128-multiple N (padded rows/cols)."""
    from sod_tpu.ops.flash_attention import _flash_backward, _xla_attention

    for n in (64, 130):
        b, h, d = 2, 3, 32
        scale = d ** -0.5
        mk = lambda s: jnp.asarray(
            np.random.RandomState(s + n).randn(b, h, n, d) * 0.5,
            jnp.bfloat16)
        q, k, v, do = mk(0), mk(1), mk(2), mk(3)

        def ref(q, k, v):
            return (_xla_attention(q.astype(jnp.float32),
                                   k.astype(jnp.float32),
                                   v.astype(jnp.float32), scale)
                    .astype(jnp.float32) * do.astype(jnp.float32)).sum()

        gq, gk, gv = jax.grad(ref, argnums=(0, 1, 2))(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32))
        dq, dk, dv = _flash_backward(q, k, v, do, scale, interpret=True)
        for ours, theirs, name in ((dq, gq, "dq"), (dk, gk, "dk"),
                                   (dv, gv, "dv")):
            np.testing.assert_allclose(
                np.asarray(ours, np.float32), np.asarray(theirs),
                atol=0.05, rtol=0.05, err_msg=f"{name} n={n}")
