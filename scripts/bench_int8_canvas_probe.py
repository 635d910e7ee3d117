#!/usr/bin/env python
"""Measure the W8A8 ceiling for the CANVAS eval ViT (VERDICT r4 item 3).

The canvas Evaluator runs the gridded fused pipeline at ~2.5k tokens
(400 px / patch 8), where the attention score/PV einsums are ~52 % of
the ViT FLOPs (4N²D vs 24ND² — the share GROWS with N) and must stay
bf16 (softmax dynamic range; the int8 whole-block kernel keeps them
bf16 too, ops/fused_block_int8.py).  int8 can only help the four
projection matmuls, so the end-to-end ceiling is

    t_int8 / t_bf16 = attn_share + proj_share / S_proj

with ``S_proj`` the MEASURED projection-bundle speedup INCLUDING the
dynamic row-quantize epilogues.  This probe times the projection bundle
(qkv + out-proj + fc0/GELU/fc1 at the exact canvas shapes) in bf16 and
W8A8-via-XLA and prints the implied eval-step ceiling — the
build-the-kernels / reject decision number.

One mode per process (docs/PERFORMANCE.md methodology): run with
``--mode bf16`` then ``--mode int8``, or no flag for the orchestrated
pair (two subprocesses).
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 16
N = 2501          # 400px canvas / patch 8 + CLS
D = 384           # ViT-S
HID = 4 * D
ITERS = 30


def run_mode(mode: str) -> float:
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    m = B * N
    x = jax.random.normal(rng, (m, D), jnp.bfloat16)
    wqkv = jax.random.normal(rng, (D, 3 * D), jnp.bfloat16) * 0.02
    wproj = jax.random.normal(rng, (D, D), jnp.bfloat16) * 0.02
    w0 = jax.random.normal(rng, (D, HID), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(rng, (HID, D), jnp.bfloat16) * 0.02

    if mode == "bf16":
        def bundle(h):
            qkv = jnp.dot(h, wqkv, preferred_element_type=jnp.float32)
            o = jnp.dot(qkv[:, :D].astype(jnp.bfloat16), wproj,
                        preferred_element_type=jnp.float32)
            u = jax.nn.gelu(jnp.dot(o.astype(jnp.bfloat16), w0,
                                    preferred_element_type=jnp.float32))
            y = jnp.dot(u.astype(jnp.bfloat16), w1,
                        preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16)
    else:
        def q8(w):
            s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0,
                        keepdims=True) / 127.0
            return (jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8),
                    s)

        qkv8, sqkv = q8(wqkv)
        proj8, sproj = q8(wproj)
        w08, s0 = q8(w0)
        w18, s1 = q8(w1)

        def qact(h):
            s = jnp.max(jnp.abs(h.astype(jnp.float32)), axis=1,
                        keepdims=True) / 127.0
            s = jnp.maximum(s, 1e-12)
            return (jnp.clip(jnp.round(h / s), -127,
                             127).astype(jnp.int8), s)

        def qdot(h, w8, sw):
            h8, sh = qact(h)
            acc = jax.lax.dot_general(
                h8, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * sh * sw

        def bundle(h):
            qkv = qdot(h, qkv8, sqkv)
            o = qdot(qkv[:, :D].astype(jnp.bfloat16), proj8, sproj)
            u = jax.nn.gelu(qdot(o.astype(jnp.bfloat16), w08, s0))
            y = qdot(u.astype(jnp.bfloat16), w18, s1)
            return y.astype(jnp.bfloat16)

    @jax.jit
    def chain(h):
        def body(c, _):
            y = bundle(c)
            # thread the output back through to defeat CSE; keep shape
            return (c + y * 1e-6).astype(jnp.bfloat16), ()

        out, _ = jax.lax.scan(body, h, None, length=12)   # 12 "blocks"
        return out

    out = chain(x)
    float(jnp.sum(out.astype(jnp.float32)))              # sync compile
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = chain(out)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"mode": mode, "ms_12block_bundle": dt * 1e3}),
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["bf16", "int8"], default=None)
    args = ap.parse_args()
    if args.mode:
        return run_mode(args.mode)

    res = {}
    for mode in ("bf16", "int8"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", mode],
            capture_output=True, text=True, timeout=3600)
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            raise RuntimeError(f"{mode} probe failed\n{r.stderr[-3000:]}")
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
                res[rec["mode"]] = rec["ms_12block_bundle"]

    s_proj = res["bf16"] / res["int8"]
    # FLOPs split at these shapes: projections 24*N*D^2, attention 4*N^2*D
    proj = 24 * N * D * D
    attn = 4 * N * N * D
    proj_share = proj / (proj + attn)
    ceiling = 1.0 / ((1 - proj_share) + proj_share / max(s_proj, 1e-9))
    print(json.dumps({
        "bf16_ms": res["bf16"], "int8_ms": res["int8"],
        "proj_speedup_measured": round(s_proj, 3),
        "proj_flop_share": round(proj_share, 3),
        "vit_ceiling": round(ceiling, 3),
        "note": "eval step also has decoder+metrics outside the ViT; "
                "step-level gain <= vit_ceiling",
    }), flush=True)


if __name__ == "__main__":
    main()
