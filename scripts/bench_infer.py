#!/usr/bin/env python
"""Inference throughput sweep (fused-block path) over batch sizes.

One config per subprocess (see bench_train.py: multiple large jitted
programs per process degrade tunnel dispatch ~40x).
"""
import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch: int, iters: int = 20, arch: str = "vit_small",
            int8: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    from sod_tpu.config import Config
    from sod_tpu.models.maskformer import (
        config_from,
        maskformer_init,
    )

    cfg = Config()
    mcfg = config_from(cfg)
    if arch == "vit_base":
        # d=768 constructor (ref vision_transformer.py:524-532) — takes the
        # gridded fused pipeline (the whole-block kernel is ViT-S-only)
        import dataclasses

        from sod_tpu.models.vit import vit_base

        mcfg = dataclasses.replace(mcfg, vit=vit_base(patch_size=16))
    params = maskformer_init(jax.random.key(0), mcfg)
    if int8:
        # quantize from the f32 init (f32 scales survive the bf16 cast)
        from sod_tpu.ops.fused_block_int8 import quantize_vit_blocks

        blocks_q = quantize_vit_blocks(params["encoder"]["blocks"])
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, params)
    if int8:
        enc = dict(params["encoder"])
        enc["blocks_q"] = blocks_q
        params = dict(params)
        params["encoder"] = enc

    # the ONE shared benchmark program (bench.py) — the sweep must measure
    # exactly what the headline bench reports
    from bench import make_forward_chain

    chain = make_forward_chain(mcfg, iters)
    x = jnp.zeros((batch, 224, 224, 3), jnp.bfloat16)
    float(chain(params, x))
    t0 = time.perf_counter()
    float(chain(params, x))
    return batch * iters / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[16, 32, 48, 64, 96])
    ap.add_argument("--one", type=int, default=None)
    ap.add_argument("--arch", default="vit_small",
                    choices=["vit_small", "vit_base"])
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 quantized encoder (ops/fused_block_int8)")
    args = ap.parse_args()

    if args.one is not None:
        ips = measure(args.one, arch=args.arch, int8=args.int8)
        print(f"B={args.one:3d} arch={args.arch}"
              f"{' int8' if args.int8 else ''}  {ips:8.1f} img/s",
              flush=True)
        return
    for b in args.batches:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(b),
             "--arch", args.arch] + (["--int8"] if args.int8 else []),
            capture_output=True, text=True)
        out = [ln for ln in r.stdout.splitlines() if "img/s" in ln]
        print(out[-1] if out else
              f"B={b:3d} FAILED: {(r.stderr or '').strip().splitlines()[-1:]}",
              flush=True)


if __name__ == "__main__":
    main()
