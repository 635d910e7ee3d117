"""Microbench: int8 weight-grad (dW) contractions vs bf16 — the ceiling
check for "int8 backward matmuls" (docs/ROUND4.md round-5 candidate #3).

The fused train backward's weight-grad work per ViT block is
  dW_qkv = x1^T dqkv   [B,896,384]x[B,896,1152]  -> [384,1152]
  dW_proj = a^T dh     [B,896,384]x[B,896,384]   -> [384,384]
  dW_fc0 = x2^T dg     [B,896,384]x[B,896,1536]  -> [384,1536]
  dW_fc1 = h^T dy      [B,896,1536]x[B,896,384]  -> [1536,384]
(contraction over B*896 tokens — the int8-friendliest shape in the step:
huge K amortizes the dynamic-quant epilogue that capped inference int8
at +9 %, docs/PERFORMANCE.md).

This measures, at the XLA level on the real chip, the full int8 recipe a
kernel would have to run: per-channel dynamic amax -> scale -> round/clip
to int8 for BOTH operands, int8xint8->int32 dot, rescale — against the
bf16 einsum the kernel runs today.  If the int8 chain is not clearly
faster HERE (no Pallas overheads, perfect fusion left to XLA), in-kernel
int8 dW cannot win and the candidate is a measured rejection.

Run: python scripts/bench_int8_dw.py [--batch 32] [--iters 50]
One jitted program per process rule does not bite: both variants are
small programs; still measured in separate jits with scalar-fetch sync.
"""
import argparse
import time

import jax
import jax.numpy as jnp


def _quant_rows(x):
    """Per-output-channel dynamic int8 quantization over the token axis.

    x: [T, C] bf16 -> (int8 [T, C], scale [C] f32): symmetric, amax/127.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=0)                  # [C]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def make_dw_bf16(shapes):
    def f(ops):
        out = 0.0
        for (x, dy) in ops:
            dw = jax.lax.dot_general(
                x, dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out = out + jnp.sum(dw)
        return out
    return jax.jit(f)


def make_dw_int8(shapes):
    def f(ops):
        out = 0.0
        for (x, dy) in ops:
            qx, sx = _quant_rows(x)
            qy, sy = _quant_rows(dy)
            acc = jax.lax.dot_general(
                qx, qy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            dw = acc.astype(jnp.float32) * sx[:, None] * sy[None, :]
            out = out + jnp.sum(dw)
        return out
    return jax.jit(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--only", choices=["bf16", "int8"], default=None,
                    help="measure one variant (clean-process timing: the "
                         "tunnel degrades dispatch when several jitted "
                         "programs share a process)")
    args = ap.parse_args()

    t = args.batch * 896                                  # tokens
    d, h = 384, 1536
    shapes = [((t, d), (t, 3 * d)),                       # dW_qkv
              ((t, d), (t, d)),                           # dW_proj
              ((t, d), (t, h)),                           # dW_fc0
              ((t, h), (t, d))]                           # dW_fc1
    rng = jax.random.key(0)
    ops = []
    for (sa, sb) in shapes:
        rng, k1, k2 = jax.random.split(rng, 3)
        ops.append((jax.random.normal(k1, sa, jnp.bfloat16),
                    jax.random.normal(k2, sb, jnp.bfloat16) * 0.02))

    flops = sum(2 * a[0] * a[1] * b[1] for a, b in shapes)
    print(f"B={args.batch}: {flops/1e9:.1f} GFLOP of dW per block-stack "
          f"(x12 layers in the real step)")

    variants = (("bf16", make_dw_bf16), ("int8", make_dw_int8))
    if args.only:
        variants = tuple(v for v in variants if v[0] == args.only)
    for name, mk in variants:
        f = mk(shapes)
        v = float(f(ops))                                 # compile + sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(ops)
        _ = float(r)                                      # tunnel-safe sync
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt*1e3:8.3f} ms  ({flops/dt/1e12:6.1f} TF/s)  "
              f"checksum {v:.1f}")


if __name__ == "__main__":
    main()
