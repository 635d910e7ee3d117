"""Fused LN+MLP+residual kernel (ops/fused_mlp.py): value parity with the
unfused block path (tanh-GELU tolerance) and hand-written VJP parity with
autodiff.  On CPU the op runs its XLA twin (same math as the kernel)."""
import jax
import jax.numpy as jnp
import numpy as np

from sod_tpu.models.vit import ViTConfig, _block_apply, vit_init
from sod_tpu.ops.fused_mlp import _reference_forward, fused_ln_mlp
from sod_tpu.ops.layers import layer_norm, mlp_apply


def _params(rng, d=64, hidden=256):
    r = np.random.RandomState(rng)
    t = lambda *s: jnp.asarray(r.randn(*s) * 0.05, jnp.float32)
    mlp = {"fc0": {"w": t(d, hidden), "b": t(hidden)},
           "fc1": {"w": t(hidden, d), "b": t(d)}}
    ln = {"scale": 1.0 + t(d), "bias": t(d)}
    return mlp, ln


def test_value_matches_unfused_within_gelu_tolerance(rng):
    mlp, ln = _params(0)
    x = jnp.asarray(rng.randn(2, 40, 64), jnp.float32)
    fused = fused_ln_mlp(x, mlp, ln)
    unfused = x + mlp_apply(mlp, layer_norm(ln, x, 1e-6), activation="gelu")
    # tanh-GELU vs erf-GELU plus bf16 matmuls: loose-ish tolerance
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=2e-2, rtol=2e-2)


def test_vjp_matches_autodiff_of_reference(rng):
    """The hand-written backward == jax.grad of the (same-math) XLA twin."""
    from sod_tpu.ops.fused_mlp import _prep_weights

    mlp, ln = _params(1, d=32, hidden=64)
    x = jnp.asarray(rng.randn(24, 32), jnp.float32)
    weights = _prep_weights(mlp, ln)

    def via_fused(x, *w):
        return (fused_ln_mlp(x, mlp, ln) ** 2).sum()

    def via_ref(x, *w):
        return (_reference_forward(x, *w, 1e-6).astype(jnp.float32) ** 2).sum()

    g_fused = jax.grad(lambda x: (fused_ln_mlp(x, mlp, ln) ** 2).sum())(x)
    g_ref = jax.grad(lambda x: (_reference_forward(
        x, *weights, 1e-6).astype(jnp.float32) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=2e-2, rtol=2e-2)

    # weight grads through the params dict
    def loss_params(mlp_p):
        return (fused_ln_mlp(x, mlp_p, ln) ** 2).sum()

    def loss_params_ref(mlp_p):
        w = _prep_weights(mlp_p, ln)
        return (_reference_forward(x, *w, 1e-6).astype(jnp.float32)
                ** 2).sum()

    ga = jax.grad(loss_params)(mlp)
    gb = jax.grad(loss_params_ref)(mlp)
    for pa, pb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=2e-2, rtol=2e-2)


def test_block_apply_fused_mlp_route(rng):
    """_block_apply(fused_mlp=True) stays close to the exact block."""
    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=1, n_heads=2,
                    pos_grid=4)
    cfg_f = ViTConfig(patch_size=8, embed_dim=32, depth=1, n_heads=2,
                      pos_grid=4, fused_mlp=True)
    params = vit_init(jax.random.key(0), cfg)
    bp = jax.tree.map(lambda a: a[0], params["blocks"])
    x = jnp.asarray(rng.randn(2, 17, 32), jnp.float32)
    base = _block_apply(bp, x, cfg)
    fused = _block_apply(bp, x, cfg_f)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=2e-2, rtol=2e-2)


def test_fused_mlp_any_token_count(rng):
    """Rows beyond one chunk (and non-multiples of the chunk) work."""
    mlp, ln = _params(2, d=32, hidden=64)
    for n in (3, 512, 700, 1300):
        x = jnp.asarray(np.random.RandomState(n).randn(1, n, 32),
                        jnp.float32)
        fused = fused_ln_mlp(x, mlp, ln, chunk=256)
        unfused = x + mlp_apply(mlp, layer_norm(ln, x, 1e-6),
                                activation="gelu")
        np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                                   atol=2e-2, rtol=2e-2, err_msg=str(n))


def test_bwd_pallas_interpret_matches_xla_backward(rng):
    """The Pallas MLP backward (grid-accumulated weight grads) equals the
    XLA recompute backward in interpret mode, incl. padded rows."""
    from sod_tpu.ops.fused_mlp import _bwd, _bwd_pallas, _prep_weights

    mlp, ln = _params(3, d=32, hidden=64)
    ln_s, ln_b, w1, b1, w2, b2 = _prep_weights(mlp, ln)
    for n in (64, 70):              # 70: padding rows in the last chunk
        x = jnp.asarray(np.random.RandomState(n).randn(n, 32), jnp.float32)
        dy = jnp.asarray(np.random.RandomState(n + 1).randn(n, 32),
                         jnp.float32)
        ref = _bwd(1e-6, 64, False, (x, ln_s, ln_b, w1, b1, w2, b2, None),
                   dy)
        got = _bwd_pallas(x, dy, ln_s, ln_b, w1, b1, w2, 1e-6, 64,
                          interpret=True)
        names = ("dx", "dls", "dlb", "dw1", "db1", "dw2", "db2")
        for o, r, name in zip(got, ref, names):
            np.testing.assert_allclose(
                np.asarray(o, np.float32), np.asarray(r, np.float32),
                atol=3e-2, rtol=3e-2, err_msg=f"{name} n={n}")


def test_saved_hidden_bwd_interpret_matches_recompute(rng):
    """save_acts variant: the forward's streamed pre-GELU hidden feeds a
    backward that skips the recompute matmul — gradients match the
    recompute backward (bf16-rounding of the saved hidden only)."""
    from sod_tpu.ops.fused_mlp import _bwd_pallas, _prep_weights, _rows_pallas

    mlp, ln = _params(5, d=32, hidden=64)
    ln_s, ln_b, w1, b1, w2, b2 = _prep_weights(mlp, ln)
    n = 70                               # padding rows in the last chunk
    x = jnp.asarray(np.random.RandomState(7).randn(n, 32), jnp.float32)
    dy = jnp.asarray(np.random.RandomState(8).randn(n, 32), jnp.float32)

    out_save, a = _rows_pallas(x, (ln_s, ln_b, w1, b1, w2, b2), 1e-6,
                               interpret=True, chunk=64, want_hidden=True)
    out_plain = _rows_pallas(x, (ln_s, ln_b, w1, b1, w2, b2), 1e-6,
                             interpret=True, chunk=64)
    np.testing.assert_array_equal(np.asarray(out_save, np.float32),
                                  np.asarray(out_plain, np.float32))
    assert a.shape == (128, 64) and a.dtype == jnp.bfloat16  # row-padded

    got = _bwd_pallas(x, dy, ln_s, ln_b, w1, b1, w2, 1e-6, 64,
                      interpret=True, a_saved=a)
    ref = _bwd_pallas(x, dy, ln_s, ln_b, w1, b1, w2, 1e-6, 64,
                      interpret=True)
    names = ("dx", "dls", "dlb", "dw1", "db1", "dw2", "db2")
    for o, r, name in zip(got, ref, names):
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32),
            atol=3e-2, rtol=3e-2, err_msg=name)


def test_fused_block_train_cpu_fallback_and_grads(rng):
    """fused_block_train: CPU fallback equals the exact block; gradients
    flow through the custom VJP and match autodiff of the block at
    tanh-GELU tolerance."""
    from sod_tpu.models.vit import fused_block_train

    cfg = ViTConfig(patch_size=8, embed_dim=32, depth=1, n_heads=2,
                    pos_grid=4)
    params = vit_init(jax.random.key(0), cfg)
    bp = jax.tree.map(lambda a: a[0], params["blocks"])
    x = jnp.asarray(rng.randn(2, 17, 32), jnp.float32)

    import dataclasses as dc

    # the fallback forward is the tanh-GELU block — the exact function
    # the VJP differentiates (primal/grad consistency)
    out = fused_block_train(bp, x, cfg)
    ref_tanh = _block_apply(bp, x, dc.replace(cfg, fused_mlp=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_tanh),
                               atol=1e-6)
    ref = _block_apply(bp, x, cfg)   # erf block: close, not identical

    g_fused = jax.grad(lambda x: (fused_block_train(bp, x, cfg) ** 2).sum())(x)
    g_ref = jax.grad(lambda x: (_block_apply(bp, x, cfg) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=3e-2, rtol=3e-2)
    gw = jax.grad(lambda bp: (fused_block_train(bp, x, cfg) ** 2).sum())(bp)
    gw_ref = jax.grad(lambda bp: (_block_apply(bp, x, cfg) ** 2).sum())(bp)
    for a, b in zip(jax.tree.leaves(gw), jax.tree.leaves(gw_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-2, rtol=3e-2)
