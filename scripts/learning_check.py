#!/usr/bin/env python
"""End-to-end learning check on the real chip: flagship model (ViT-S/8 +
nq20 decoder), live loss (dice + ranking + InfoNCE), synthetic saliency.

Round 1 measured eval IoU 0.076 -> 0.944 in 150 steps with the per-op
path; this validates the fast paths (Pallas flash fwd+bwd kernels, fused
LN/MLP, fused-train whole-block) preserve training dynamics.

The convergence knee depends on the warmup/poly schedule (warmup =
steps/5): a round-3 bisection showed EVERY code path — current kernels,
XLA backward, and the unmodified round-2 tree — produces a bit-identical
loss trajectory that sits at IoU ~0.15 at step 150 and reaches ~0.977 by
step 400 (loss curves agree to 3 decimals across paths, so gradients are
consistent everywhere).  Default is therefore 400 steps; don't lower it
below ~300 and read a failure as a kernel bug.
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
from sod_tpu.models.maskformer import config_from, maskformer_apply, maskformer_init
from sod_tpu.train.optim import build_optimizer
from sod_tpu.train.step import make_train_step


def synth_batch(rng, b, img=224, m=4):
    """Bright rectangle on dark noisy background + its mask."""
    images = rng.rand(b, img, img, 3).astype(np.float32) * 0.2
    gts = np.zeros((b, m, img, img), np.float32)
    valid = np.zeros((b, m), bool)
    for i in range(b):
        h0, w0 = rng.randint(20, img // 2, size=2)
        hh, ww = rng.randint(img // 4, img // 2, size=2)
        images[i, h0:h0 + hh, w0:w0 + ww] += 0.7
        gts[i, 0, h0:h0 + hh, w0:w0 + ww] = 1.0
        valid[i, 0] = True
    return {"image": jnp.asarray(images.clip(0, 1)),
            "gt_masks": jnp.asarray(gts),
            "gt_valid": jnp.asarray(valid),
            "labels": jnp.asarray(rng.randint(0, 10000, size=(b,)))}


def eval_iou(params, mcfg, batch, fused=False, return_pred=False):
    out = maskformer_apply(params, batch["image"].astype(jnp.bfloat16), mcfg,
                           fused=fused)
    obj = out["objectness"][:, -1, :, 0]
    best = jnp.argmax(obj, axis=-1)
    pred = jnp.take_along_axis(out["mask_pred"][:, -1],
                               best[:, None, None, None], axis=1)[:, 0]
    b = pred.shape[0]
    gt = jax.image.resize(batch["gt_masks"][:, 0],
                          (b,) + pred.shape[-2:], "nearest") > 0.5
    p = pred > 0.5
    inter = (p & gt).sum((-1, -2)).astype(jnp.float32)
    union = (p | gt).sum((-1, -2)).astype(jnp.float32)
    iou = float(jnp.mean(inter / (union + 1e-7)))
    if return_pred:
        return iou, np.asarray(p)
    return iou


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--fused-mlp", action="store_true")
    ap.add_argument("--fused-train", action="store_true",
                    help="fully-fused train blocks (Pallas fwd+bwd attn "
                         "and MLP kernels, ops/fused_attn + ops/fused_mlp)")
    ap.add_argument("--no-flash", action="store_true",
                    help="pure-XLA attention (no Pallas fwd/bwd kernels)")
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--int8-eval", action="store_true",
                    help="after training, evaluate the trained weights "
                         "through the W8A8 fused path "
                         "(ops/fused_block_int8) and report its IoU and "
                         "its mask agreement with the bf16 fused path")
    args = ap.parse_args()

    # lr: 1e-4 collapses the all-queries dice into sigmoid saturation
    # (loss pinned at ~120, zero grads) on ANY path incl. pure XLA —
    # 2e-5 with a short warmup converges
    cfg = Config(batch_size=args.batch, lr=args.lr, lr_warmup_duration=1,
                 n_epochs=10,
                 use_fused_mlp=args.fused_mlp,
                 use_fused_train=args.fused_train,
                 use_pallas_attention=not args.no_flash)
    mcfg = config_from(cfg)
    params = maskformer_init(jax.random.key(0), mcfg)
    # warmup = 1 "epoch" = steps/5 iters; monotonic poly decay
    tx = build_optimizer(cfg, n_iters_per_epoch=max(1, args.steps // 5),
                         faithful_lr_cycle=False)
    opt = tx.init(params)
    step = make_train_step(cfg, tx, mcfg)

    rng = np.random.RandomState(0)
    eval_batch = synth_batch(np.random.RandomState(999), args.batch)
    iou0 = eval_iou(params, mcfg, eval_batch)
    print(f"step 0: eval IoU {iou0:.3f}", flush=True)

    t0 = time.perf_counter()
    p, o = params, opt
    for i in range(1, args.steps + 1):
        batch = synth_batch(rng, args.batch)
        p, o, m = step(p, o, batch)
        if i % 50 == 0:
            loss = float(m["loss"])
            print(f"step {i}: loss {loss:.4f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
    iou1 = eval_iou(p, mcfg, eval_batch)
    dt = time.perf_counter() - t0
    print(f"final: eval IoU {iou0:.3f} -> {iou1:.3f} in {args.steps} steps "
          f"/ {dt:.1f}s  (fused_mlp={int(args.fused_mlp)} "
          f"fused_train={int(args.fused_train)})", flush=True)
    assert iou1 > 0.8, f"learning check failed: IoU {iou1}"

    if args.int8_eval:
        # accuracy of the quantized serving path on REAL trained weights:
        # IoU vs ground truth AND mask agreement vs the bf16 fused path
        from sod_tpu.ops.fused_block_int8 import quantize_vit_blocks

        enc = dict(p["encoder"])
        enc["blocks_q"] = quantize_vit_blocks(p["encoder"]["blocks"])
        pq = dict(p)
        pq["encoder"] = enc
        iou_bf, m_bf = eval_iou(p, mcfg, eval_batch, fused=True,
                                return_pred=True)
        iou_q, m_q = eval_iou(pq, mcfg, eval_batch, fused=True,
                              return_pred=True)
        inter = (m_bf & m_q).sum()
        union = (m_bf | m_q).sum()
        agree = inter / max(union, 1)
        print(f"int8 eval: bf16-fused IoU {iou_bf:.4f}, int8-fused IoU "
              f"{iou_q:.4f}, mask agreement IoU {agree:.4f}", flush=True)
        assert iou_q > 0.8, f"int8 eval IoU collapsed: {iou_q}"
        assert agree > 0.95, f"int8/bf16 mask agreement low: {agree}"


if __name__ == "__main__":
    main()
