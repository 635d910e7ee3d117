#!/usr/bin/env python
"""On-chip numerical parity probe for the fused attention-half kernels:
compiled Pallas fwd/bwd vs the XLA twin's autodiff at real train shapes.
Prints per-leaf max abs/rel errors — isolates which gradient is wrong if
the learning check regresses."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sod_tpu.ops.fused_attn import (
    _bwd_pallas,
    _fwd_pallas,
    _prep_weights,
    _reference_forward,
)


def main():
    d, n_heads, b = 384, 6, 4
    n_real, n_pad = 785, 896
    r = np.random.RandomState(0)
    attn = {"qkv": {"w": jnp.asarray(r.randn(d, 3 * d) * 0.05, jnp.float32),
                    "b": jnp.asarray(r.randn(3 * d) * 0.05, jnp.float32)},
            "proj": {"w": jnp.asarray(r.randn(d, d) * 0.05, jnp.float32),
                     "b": jnp.asarray(r.randn(d) * 0.05, jnp.float32)}}
    ln = {"scale": jnp.asarray(1 + r.randn(d) * 0.05, jnp.float32),
          "bias": jnp.asarray(r.randn(d) * 0.05, jnp.float32)}
    weights = tuple(_prep_weights(attn, ln))
    scale = (d // n_heads) ** -0.5

    x = jnp.asarray(r.randn(b, n_real, d) * 0.5, jnp.bfloat16)
    g = jnp.asarray(r.randn(b, n_real, d) * 0.1, jnp.bfloat16)
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n_real), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, n_pad - n_real), (0, 0)))

    # forward parity
    got_f = jax.jit(lambda xp: _fwd_pallas(
        xp, weights, n_heads, n_real, 1e-6, scale))(xp)[:, :n_real]
    ref_f = _reference_forward(x, *weights, n_heads, 1e-6)
    fe = np.abs(np.asarray(got_f, np.float32) - np.asarray(ref_f, np.float32))
    print(f"fwd: max abs err {fe.max():.5f} mean {fe.mean():.6f}")

    # backward parity
    bwd = jax.jit(lambda xp, gp: _bwd_pallas(
        xp, gp, weights, n_heads, n_real, 1e-6, scale))
    got = bwd(xp, gp)

    def twin(x_, *w):
        return _reference_forward(x_, *w, n_heads, 1e-6)

    _, vjp = jax.vjp(twin, x, *weights)
    ref = vjp(g)
    names = ("dx", "dls", "dlb", "dwqkv", "dbqkv", "dwproj", "dbproj")
    got = list(got)
    got[0] = got[0][:, :n_real]
    ok = True
    for o, rf, name in zip(got, ref, names):
        o = np.asarray(o, np.float32)
        rf = np.asarray(rf, np.float32)
        err = np.abs(o - rf)
        den = np.maximum(np.abs(rf), 1e-3)
        rel = (err / den).max()
        print(f"{name:7s} max abs {err.max():10.5f}  max rel {rel:8.4f}  "
              f"ref scale {np.abs(rf).max():10.4f}")
        if rel > 0.2 and err.max() > 0.05:
            ok = False
    print("PARITY OK" if ok else "PARITY BROKEN")


if __name__ == "__main__":
    main()
