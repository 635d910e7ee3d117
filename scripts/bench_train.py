#!/usr/bin/env python
"""Train-step throughput sweep on the real chip (VERDICT r1 item 3).

Times the FULL train step (fwd + criterion + bwd + AdamW in one jit) for a
matrix of {batch size} x {remat policy} on the flagship config
(ViT-S/8 @ 224 px, nq20/ndl6, bf16, flash attention).

Through the axon tunnel ``block_until_ready`` does not wait, so steps are
chained inside one jit via ``lax.scan`` and synced by fetching a scalar
(CLAUDE.md environment quirks).
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
from sod_tpu.train.optim import build_optimizer
from sod_tpu.train.step import make_train_step


def bench_step(batch_size: int, steps: int = 20, remat: str = "none",
               warmup: int = 3, mode: str = "full",
               fused_mlp: bool = False, fused_train: bool = False,
               accum: int = 1, accum_mode: str = "averaged") -> float:
    """mode: full = fwd+criterion+bwd+AdamW; fwd = model fwd only;
    fwdloss = fwd+criterion (no grad); enc = encoder grad only."""
    cfg = Config(batch_size=batch_size, remat=(remat != "none"),
                 use_fused_mlp=fused_mlp, use_fused_train=fused_train)
    mcfg = config_from(cfg)
    params = maskformer_init(jax.random.key(0), mcfg)
    tx = build_optimizer(cfg, n_iters_per_epoch=100)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, mcfg, accum_steps=accum, mode=accum_mode)

    rng = np.random.RandomState(0)
    b = batch_size
    batch = {
        "image": jnp.asarray(rng.rand(b, 224, 224, 3), jnp.float32),
        "gt_masks": jnp.asarray((rng.rand(b, cfg.max_gt_masks, 224, 224)
                                 > 0.5), jnp.float32),
        "gt_valid": jnp.ones((b, cfg.max_gt_masks), bool),
        "labels": jnp.asarray(rng.randint(0, 10000, size=(b,))),
    }

    if mode == "full":
        # NOTE: wrapping the step in a lax.scan over steps (carrying the
        # whole param/opt pytree) measured 17x slower than the step itself
        # — a Python loop of async dispatches with ONE scalar fetch at the
        # end measures the true step time (data dependence via p, o
        # serializes the steps on device).
        def run_n(params, opt_state, batch, n):
            p, o = params, opt_state
            for _ in range(n):
                p, o, m = step(p, o, batch)
            return p, o, m["loss"]
    else:
        from sod_tpu.losses.criterion import criterion_forward
        from sod_tpu.models.maskformer import maskformer_apply

        compute_dtype = jnp.bfloat16

        def loss_of(p, batch):
            out = maskformer_apply(
                p, batch["image"].astype(compute_dtype), mcfg, train=True)
            if mode == "fwd":
                return out["mask_pred"].astype(jnp.float32).sum()
            res = criterion_forward(
                out["mask_pred"].astype(jnp.float32),
                batch["gt_masks"].astype(jnp.float32), batch["gt_valid"],
                out.get("objectness"), use_classification_loss=False,
                features=out["features"].astype(jnp.float32),
                feature_labels=batch["labels"],
                weight_contrastive_loss=cfg.weight_contrastive_loss,
                temperature=cfg.temperature)
            return res["loss"]

        # same methodology as mode=full: a Python loop of async dispatches
        # serialized by a data dependence (scalar folded into the image),
        # ONE trailing scalar fetch.  A lax.scan over iterations measured
        # up to 5x slower than the underlying computation — unusable as a
        # proxy (CLAUDE.md tunnel rules).
        @jax.jit
        def one(params, batch, carry):
            bt = {**batch, "image": batch["image"] + carry * 1e-20}
            if mode in ("fwd", "fwdloss"):
                v = loss_of(params, bt)
            elif mode == "enc":              # grad wrt encoder only
                v = jax.grad(lambda e: loss_of(
                    {**params, "encoder": e}, bt))(
                    params["encoder"])["cls_token"].sum()
            else:                            # grad: full-params grad, no opt
                v = jax.grad(loss_of)(params, bt)["query_embed"].sum()
            return v.astype(jnp.float32)

        def run_n(params, opt_state, batch, n):
            v = jnp.float32(0)
            for _ in range(n):
                v = one(params, batch, v)
            return params, opt_state, v

    # warmup / compile
    p, o, loss = run_n(params, opt_state, batch, warmup)
    _ = float(jnp.sum(loss))
    t0 = time.perf_counter()
    p, o, loss = run_n(p, o, batch, steps)
    _ = float(jnp.sum(loss))           # sync through the tunnel
    dt = (time.perf_counter() - t0) / steps
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--remat", nargs="+", default=["none"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--modes", nargs="+", default=["full"])
    ap.add_argument("--fused-mlp", action="store_true")
    ap.add_argument("--fused-train", action="store_true")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation micro-steps")
    ap.add_argument("--accum-mode", default="averaged",
                    choices=["averaged", "exact"])
    ap.add_argument("--one", action="store_true",
                    help="run exactly one config in THIS process")
    args = ap.parse_args()

    if args.one:
        b, mode, remat = args.batches[0], args.modes[0], args.remat[0]
        dt = bench_step(b, steps=args.steps, remat=remat, mode=mode,
                        fused_mlp=args.fused_mlp,
                        fused_train=args.fused_train, accum=args.accum,
                        accum_mode=args.accum_mode)
        acc = (f" accum={args.accum}({args.accum_mode})"
               if args.accum > 1 else "")
        print(f"B={b:3d} mode={mode:8s} remat={remat:6s} "
              f"fmlp={int(args.fused_mlp)} ftrain={int(args.fused_train)}"
              f"{acc} "
              f"{dt * 1e3:8.2f} ms/step  {b / dt:8.1f} img/s", flush=True)
        return

    # One subprocess per config: running several large jitted programs in
    # one process degrades dispatch through the axon tunnel by ~40x
    # (measured — fresh-process numbers match bench.py, in-process ones
    # do not), so each measurement gets its own interpreter.
    import subprocess

    print(f"devices: {jax.devices()}")
    for mode in args.modes:
        for remat in args.remat:
            for b in args.batches:
                cmd = [sys.executable, os.path.abspath(__file__), "--one",
                       "--batches", str(b), "--modes", mode,
                       "--remat", remat, "--steps", str(args.steps),
                       "--accum", str(args.accum),
                       "--accum-mode", args.accum_mode]
                if args.fused_mlp:
                    cmd.append("--fused-mlp")
                if args.fused_train:
                    cmd.append("--fused-train")
                r = subprocess.run(cmd, capture_output=True, text=True)
                out = [ln for ln in r.stdout.splitlines() if "ms/step" in ln]
                if out:
                    print(out[-1], flush=True)
                else:
                    tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
                    print(f"B={b:3d} mode={mode:8s} remat={remat:6s} "
                          f"FAILED: {' | '.join(tail)}", flush=True)


if __name__ == "__main__":
    main()
