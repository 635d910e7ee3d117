"""Fused LN+MHSA+proj+residual kernel (ops/fused_attn.py): forward parity
with the unfused attention half, and hand-written Pallas backward parity
with autodiff of the XLA twin (interpret mode), incl. padded rows/keys."""
import jax
import jax.numpy as jnp
import numpy as np

from sod_tpu.ops.attention import self_attention_qkv
from sod_tpu.ops.fused_attn import (
    _bwd_pallas,
    _fwd_pallas,
    _prep_weights,
    _reference_forward,
    fused_ln_attn,
)
from sod_tpu.ops.layers import layer_norm


def _params(seed, d=32, n_heads=2):
    r = np.random.RandomState(seed)
    t = lambda *s: jnp.asarray(r.randn(*s) * 0.05, jnp.float32)
    attn = {"qkv": {"w": t(d, 3 * d), "b": t(3 * d)},
            "proj": {"w": t(d, d), "b": t(d)}}
    ln = {"scale": 1.0 + t(d), "bias": t(d)}
    return attn, ln


def _unfused(x, attn, ln, n_heads, eps=1e-6):
    return x + self_attention_qkv(attn, layer_norm(ln, x, eps), n_heads)


def test_value_matches_unfused(rng):
    """CPU path (XLA twin, f32) == the unfused attention half."""
    attn, ln = _params(0)
    x = jnp.asarray(rng.randn(2, 24, 32), jnp.float32)
    fused = fused_ln_attn(x, attn, ln, n_heads=2)
    ref = _unfused(x, attn, ln, 2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fwd_kernel_interpret_matches_twin(rng):
    """The Pallas forward (interpret mode) == the XLA twin at bf16
    tolerance, including masked padding keys."""
    attn, ln = _params(1)
    n_real, n_pad = 20, 128
    x = jnp.asarray(rng.randn(2, n_real, 32), jnp.bfloat16)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n_real), (0, 0)))
    weights = [w.astype(jnp.bfloat16)
               for w in _prep_weights(attn, ln)]
    got = _fwd_pallas(xp, weights, 2, n_real, 1e-6, (32 // 2) ** -0.5,
                      interpret=True)[:, :n_real]
    ref = _reference_forward(x, *weights, 2, 1e-6)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_bwd_kernel_interpret_matches_autodiff(rng):
    """The Pallas backward (grid-accumulated weight grads, padded rows with
    zero upstream grad) == jax.vjp of the twin."""
    d, n_heads = 32, 2
    attn, ln = _params(2, d=d, n_heads=n_heads)
    weights = tuple(_prep_weights(attn, ln))
    eps, scale = 1e-6, (d // n_heads) ** -0.5

    for n_real in (128, 100):            # 100 -> padded rows in the kernel
        n_pad = 128
        x = jnp.asarray(np.random.RandomState(n_real).randn(2, n_real, d),
                        jnp.float32)
        g = jnp.asarray(np.random.RandomState(n_real + 1).randn(2, n_real, d),
                        jnp.float32)
        xp = jnp.pad(x, ((0, 0), (0, n_pad - n_real), (0, 0)))
        gp = jnp.pad(g, ((0, 0), (0, n_pad - n_real), (0, 0)))

        got = _bwd_pallas(xp, gp, weights, n_heads, n_real, eps, scale,
                          interpret=True)
        dx = got[0][:, :n_real]

        ref_out, vjp = jax.vjp(
            lambda x_, a, b, c, dd, e, f: _reference_forward(
                x_, a, b, c, dd, e, f, n_heads, eps),
            x, *weights)
        ref = vjp(g)
        names = ("dx", "dls", "dlb", "dwqkv", "dbqkv", "dwproj", "dbproj")
        ref_by_name = dict(zip(names, ref))
        np.testing.assert_allclose(np.asarray(dx), np.asarray(ref[0]),
                                   atol=3e-2, rtol=3e-2,
                                   err_msg=f"dx n={n_real}")
        for o, name in zip(got[1:], names[1:]):
            np.testing.assert_allclose(
                np.asarray(o, np.float32),
                np.asarray(ref_by_name[name], np.float32),
                atol=3e-2, rtol=3e-2, err_msg=f"{name} n={n_real}")


def test_saved_qkv_bwd_interpret_matches_autodiff(rng):
    """The save_acts variant (forward streams qkv, backward consumes it
    instead of recomputing) produces the same gradients as autodiff of
    the twin — and the streamed qkv itself matches the recompute."""
    d, n_heads = 32, 2
    attn, ln = _params(7, d=d, n_heads=n_heads)
    weights = tuple(_prep_weights(attn, ln))
    eps, scale = 1e-6, (d // n_heads) ** -0.5

    n_real, n_pad = 100, 128
    x = jnp.asarray(rng.randn(2, n_real, d), jnp.float32)
    g = jnp.asarray(rng.randn(2, n_real, d), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n_real), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, n_pad - n_real), (0, 0)))

    bf_weights = [w.astype(jnp.bfloat16) for w in weights]
    out_save, qkv = _fwd_pallas(xp.astype(jnp.bfloat16), bf_weights,
                                n_heads, n_real, eps, scale,
                                interpret=True, want="qkv")
    out_plain = _fwd_pallas(xp.astype(jnp.bfloat16), bf_weights, n_heads,
                            n_real, eps, scale, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_save, np.float32),
                                  np.asarray(out_plain, np.float32))
    assert qkv.shape == (2, n_pad, 3 * d) and qkv.dtype == jnp.bfloat16

    got = _bwd_pallas(xp, gp, weights, n_heads, n_real, eps, scale,
                      interpret=True, qkv_saved=qkv)
    ref_out, vjp = jax.vjp(
        lambda x_, a, b, c, dd, e, f: _reference_forward(
            x_, a, b, c, dd, e, f, n_heads, eps),
        x, *weights)
    ref = vjp(g)
    names = ("dx", "dls", "dlb", "dwqkv", "dbqkv", "dwproj", "dbproj")
    np.testing.assert_allclose(np.asarray(got[0][:, :n_real]),
                               np.asarray(ref[0]), atol=3e-2, rtol=3e-2,
                               err_msg="dx")
    for o, r, name in zip(got[1:], ref[1:], names[1:]):
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32),
            atol=3e-2, rtol=3e-2, err_msg=name)


def test_saved_attn_bwd_interpret_matches_autodiff(rng):
    """The round-4 save-attn variant (forward streams the pre-projection
    attention output, backward skips the p@v recompute) produces the same
    gradients as autodiff of the twin, and the streamed slab matches the
    no-save kernel's recompute exactly."""
    d, n_heads = 32, 2
    attn, ln = _params(11, d=d, n_heads=n_heads)
    weights = tuple(_prep_weights(attn, ln))
    eps, scale = 1e-6, (d // n_heads) ** -0.5

    n_real, n_pad = 100, 128
    x = jnp.asarray(rng.randn(2, n_real, d), jnp.float32)
    g = jnp.asarray(rng.randn(2, n_real, d), jnp.float32)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n_real), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, n_pad - n_real), (0, 0)))

    bf_weights = [w.astype(jnp.bfloat16) for w in weights]
    out_save, attn_slab = _fwd_pallas(xp.astype(jnp.bfloat16), bf_weights,
                                      n_heads, n_real, eps, scale,
                                      interpret=True, want="attn")
    out_plain = _fwd_pallas(xp.astype(jnp.bfloat16), bf_weights, n_heads,
                            n_real, eps, scale, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_save, np.float32),
                                  np.asarray(out_plain, np.float32))
    assert attn_slab.shape == (2, n_pad, d)
    assert attn_slab.dtype == jnp.bfloat16

    # saved-slab backward == no-save backward (bit-wise: the slab holds
    # exactly what the backward would recompute — both start from the
    # same bf16 x, as in the real train path) == autodiff of the twin
    xb, gb = xp.astype(jnp.bfloat16), gp.astype(jnp.bfloat16)
    got = _bwd_pallas(xb, gb, weights, n_heads, n_real, eps, scale,
                      interpret=True, attn_saved=attn_slab)
    got_plain = _bwd_pallas(xb, gb, weights, n_heads, n_real, eps, scale,
                            interpret=True)
    names = ("dx", "dls", "dlb", "dwqkv", "dbqkv", "dwproj", "dbproj")
    for o, o2, name in zip(got, got_plain, names):
        np.testing.assert_array_equal(np.asarray(o, np.float32),
                                      np.asarray(o2, np.float32),
                                      err_msg=name)
    ref_out, vjp = jax.vjp(
        lambda x_, a, b, c, dd, e, f: _reference_forward(
            x_, a, b, c, dd, e, f, n_heads, eps),
        x, *weights)
    ref = vjp(g)
    np.testing.assert_allclose(np.asarray(got[0][:, :n_real]),
                               np.asarray(ref[0]), atol=3e-2, rtol=3e-2,
                               err_msg="dx")
    for o, r, name in zip(got[1:], ref[1:], names[1:]):
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32),
            atol=3e-2, rtol=3e-2, err_msg=name)


def test_large_grid_pipeline_interpret_matches_unfused(rng):
    """The gridded large-N pipeline (LN+QKV kernel -> chunk-gridded
    attention+proj kernel) equals the unfused attention half at bf16
    tolerance, across chunk boundaries and with a canvas key mask
    (VERDICT r2 item 2)."""
    from sod_tpu.ops.fused_attn import _fwd_pallas_large, _prep_weights

    d, n_heads = 32, 2
    attn, ln = _params(4, d=d)
    weights = tuple(_prep_weights(attn, ln))
    scale = (d // n_heads) ** -0.5

    n = 512                               # 2 chunks of _LARGE_CHUNK=256
    x = jnp.asarray(rng.randn(2, n, d), jnp.bfloat16)
    got = _fwd_pallas_large(x, weights, n_heads, n, 1e-6, scale,
                            interpret=True)
    ref = _unfused(x.astype(jnp.float32), attn, ln, n_heads)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)

    # canvas-style key mask: per-image valid prefixes
    mask = np.zeros((2, n), bool)
    mask[0, :300] = True
    mask[1, :450] = True
    got_m = _fwd_pallas_large(x, weights, n_heads, n, 1e-6, scale,
                              key_mask=jnp.asarray(mask), interpret=True)
    from sod_tpu.ops.attention import self_attention_qkv
    from sod_tpu.ops.layers import layer_norm

    xf = x.astype(jnp.float32)
    ref_m = xf + self_attention_qkv(attn, layer_norm(ln, xf, 1e-6),
                                    n_heads, key_mask=jnp.asarray(mask))
    for i, nv in enumerate((300, 450)):   # compare valid rows only
        np.testing.assert_allclose(
            np.asarray(got_m, np.float32)[i, :nv],
            np.asarray(ref_m, np.float32)[i, :nv],
            atol=3e-2, rtol=3e-2, err_msg=f"image {i}")


def test_fused_ln_attn_infer_cpu_fallback(rng):
    """Off-TPU the infer entry routes to the exact unfused math, incl.
    key-mask handling and non-chunk-multiple token counts."""
    from sod_tpu.ops.fused_attn import fused_ln_attn_infer

    attn, ln = _params(5)
    x = jnp.asarray(rng.randn(2, 37, 32), jnp.float32)
    got = fused_ln_attn_infer(x, attn, ln, n_heads=2)
    ref = _unfused(x, attn, ln, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_custom_vjp_grads_match_autodiff_of_unfused(rng):
    """End-to-end grads through fused_ln_attn (CPU twin path) == autodiff
    of the unfused attention half, for x AND the weight tree."""
    attn, ln = _params(3)
    x = jnp.asarray(rng.randn(2, 17, 32), jnp.float32)

    gx = jax.grad(lambda x: (fused_ln_attn(x, attn, ln, 2) ** 2).sum())(x)
    gx_ref = jax.grad(lambda x: (_unfused(x, attn, ln, 2) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=1e-4, rtol=1e-4)

    gw = jax.grad(lambda p: (fused_ln_attn(x, p, ln, 2) ** 2).sum())(attn)
    gw_ref = jax.grad(lambda p: (_unfused(x, p, ln, 2) ** 2).sum())(attn)
    for a, b in zip(jax.tree.leaves(gw), jax.tree.leaves(gw_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)

    gl = jax.grad(lambda p: (fused_ln_attn(x, attn, p, 2) ** 2).sum())(ln)
    gl_ref = jax.grad(lambda p: (_unfused(x, attn, p, 2) ** 2).sum())(ln)
    for a, b in zip(jax.tree.leaves(gl), jax.tree.leaves(gl_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
