#!/usr/bin/env python
"""Canvas-scale eval-step benchmark (VERDICT r1 weak item 2).

Times the Evaluator's fused eval program (canvas forward + x4 upsample +
ALL metrics on device) at B=16 on a 400px canvas — round 1 measured
~73 ms/batch with per-op flash attention.  ``--fused-mlp`` routes the MLP
half of every encoder block through the chunked Pallas LN+MLP kernel
(compiles as one small program at any token count, unlike the whole-block
kernel whose chunk unrolls blow up Mosaic past 1024 tokens).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sod_tpu.config import Config
from sod_tpu.models.maskformer import config_from, maskformer_init


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--canvas", type=int, default=400)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--fused-mlp", action="store_true")
    ap.add_argument("--fused-eval", action="store_true",
                    help="gridded fused pipeline (LN+QKV -> chunked "
                         "attention+proj -> fused MLP kernels)")
    args = ap.parse_args()

    import tempfile

    from PIL import Image

    from sod_tpu.train.evaluator import Evaluator

    cfg = Config(use_fused_mlp=args.fused_mlp,
                 use_fused_eval=args.fused_eval)
    mcfg = config_from(cfg)
    params = maskformer_init(jax.random.key(0), mcfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x, params)

    with tempfile.TemporaryDirectory() as td:
        duts = os.path.join(td, "DUTS")
        for sub in ("DUTS-TE-Image", "DUTS-TE-Mask"):
            os.makedirs(os.path.join(duts, sub))
        Image.new("RGB", (64, 64)).save(
            os.path.join(duts, "DUTS-TE-Image", "x.jpg"))
        Image.new("L", (64, 64)).save(
            os.path.join(duts, "DUTS-TE-Mask", "x.png"))
        cfg.dir_dataset = td
        ev = Evaluator(params, cfg, mcfg)
        step = ev._eval_fn((args.canvas, args.canvas), "iou")

    b, c = args.batch, args.canvas
    p = mcfg.vit.patch_size
    rng = np.random.RandomState(0)
    image = jnp.asarray((rng.rand(b, c, c, 3) * 255).astype(np.uint8))
    gt = jnp.asarray((rng.rand(b, c, c) > 0.7).astype(np.uint8))
    # mixed true sizes, like a real dataset batch
    hs = rng.randint(c // 2, c + 1, size=b)
    ws = rng.randint(c // 2, c + 1, size=b)
    grid = jnp.asarray(np.stack([-(-hs // p), -(-ws // p)], 1), jnp.int32)
    sizes = jnp.asarray(np.stack([hs, ws], 1), jnp.int32)

    out, _vis = step(params, image, gt, grid, sizes)  # compile
    _ = float(jnp.sum(out["iou"]))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out, _vis = step(params, image, gt, grid, sizes)
    _ = float(jnp.sum(out["iou"]))                    # sync via scalar
    dt = (time.perf_counter() - t0) / args.iters
    print(f"canvas={c} B={b} fused_mlp={int(args.fused_mlp)} "
          f"fused_eval={int(args.fused_eval)} "
          f"{dt * 1e3:8.2f} ms/batch  {b / dt:8.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
