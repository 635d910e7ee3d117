#!/usr/bin/env python
"""Full-recipe dress rehearsal (VERDICT r3 item 5).

Runs the REFERENCE'S actual training recipe end-to-end on the chip, on a
synthetic corpus whose assets the environment can actually produce (the
real weights/datasets are Google-Drive placeholders in the reference):

  1. build a DUTS-shaped corpus on disk: DUTS-TR images + all THREE
     benchmark layouts (DUTS-TE / ECSSD / DUT-OMRON, each with GT masks);
  2. generate pseudo-masks with the REAL MaskGenerator (3 backbones x
     k in {2,3,4} spectral clustering -> filter -> vote -> RLE), exactly
     the reference's offline stage (SURVEY §3.4);
  3. train the recipe: 12 epochs, batch 8, AdamW + per-iter poly LR,
     contrastive loss on, per-epoch eval on all three benchmarks with
     per-benchmark best checkpoints (trainer pyc 190-228,
     ``configs/duts-dino-k234-nq20-224-swav-mocov2-klmax-sr10100.yaml:51-56``)
     — run A, uninterrupted;
  4. run B: identical, but SIGKILLed mid-epoch (default epoch 6, 3 steps
     in), then resumed from ``latest_model`` and run to completion;
  5. compare: run-B final params/opt-state must be BIT-EQUAL to run A's,
     and the post-resume epoch losses must match run A's epoch for epoch.

The one deliberate deviation from the recipe: lr 6e-6 -> 2e-5.  The
reference's LR is tuned for ~15k steps (12 epochs x ~10k images); this
corpus gives 12 x 32 = 384 steps, and the synthetic learning check
(``scripts/learning_check.py``) established 2e-5 as the LR that converges
in that budget.  Everything else (epochs, batch, schedule shape, losses,
eval cadence, checkpointing) is the recipe's.

Each phase runs in a FRESH subprocess: only one process may hold the TPU
through the tunnel, and one big jitted program per process keeps dispatch
fast (docs/PERFORMANCE.md methodology).  The parent never imports jax.

Writes ``docs/DRESS_REHEARSAL.md`` with the per-epoch curves, the kill /
resume transcript and the equality verdict.
"""
import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TRAIN = int(os.environ.get("DRESS_N_TRAIN", 256))
                       # 32 iters/epoch at batch 8 -> 384 recipe steps
N_BENCH = int(os.environ.get("DRESS_N_BENCH", 16))
EPOCHS = int(os.environ.get("DRESS_EPOCHS", 12))
                       # the recipe (configs yaml:51-56; trainer pyc 231)
KILL_EPOCH = int(os.environ.get("DRESS_KILL_EPOCH", 6))
LR = float(os.environ.get("DRESS_LR", 2e-5))
                       # documented deviation, see module docstring; the
                       # reference-scale run (scripts/scale_rehearsal.py)
                       # overrides back to the reference's 6e-6
SMOKE = os.environ.get("DRESS_SMOKE") == "1"   # CPU smoke: tiny model,
                                               # doc goes to the corpus dir


# ---------------------------------------------------------------------------
# corpus
# ---------------------------------------------------------------------------

def _sample(seed: int, h: int, w: int):
    import numpy as np

    r = np.random.RandomState(seed)
    im = (r.rand(h, w, 3) * 60).astype("uint8")
    h0 = r.randint(5, max(6, h // 2))
    w0 = r.randint(5, max(6, w // 2))
    hh = r.randint(h // 4, h // 2)
    ww = r.randint(w // 4, w // 2)
    im[h0:h0 + hh, w0:w0 + ww] += 160
    gt = np.zeros((h, w), "uint8")
    gt[h0:h0 + hh, w0:w0 + ww] = 255
    return im, gt


def build_corpus(root: str) -> None:
    from PIL import Image

    layouts = {
        "DUTS": ("DUTS-TE-Image", "DUTS-TE-Mask"),
        "ECSSD": ("images", "ground_truth_mask"),
        "DUT-OMRON": ("DUT-OMRON-image", "pixelwiseGT-new-PNG"),
    }
    tr = os.path.join(root, "DUTS", "DUTS-TR-Image")
    os.makedirs(tr, exist_ok=True)
    for i in range(N_TRAIN):
        fp = os.path.join(tr, f"tr_{i:04d}.jpg")
        if not os.path.isfile(fp):
            import numpy as np

            r = np.random.RandomState(i)
            im, _ = _sample(1000 + i, int(r.randint(240, 420)),
                            int(r.randint(300, 500)))
            Image.fromarray(im).save(fp, quality=92)
    for b, (dimg, dgt) in enumerate(layouts.items()):
        di = os.path.join(root, dimg, layouts[dimg][0])
        dg = os.path.join(root, dimg, layouts[dimg][1])
        os.makedirs(di, exist_ok=True)
        os.makedirs(dg, exist_ok=True)
        for i in range(N_BENCH):
            fi = os.path.join(di, f"te_{i:03d}.jpg")
            fg = os.path.join(dg, f"te_{i:03d}.png")
            if os.path.isfile(fi) and os.path.isfile(fg):
                continue
            import numpy as np

            r = np.random.RandomState(50_000 + 1000 * b + i)
            # image 0 of every benchmark pins the max size, so all three
            # benchmarks share ONE canvas (= one eval compile, ~3-5 min
            # through the tunnel instead of three); the rest vary freely
            # below it, exercising the variable-resolution path
            h, w = ((416, 496) if i == 0 else
                    (int(r.randint(240, 417)), int(r.randint(300, 497))))
            im, gt = _sample(60_000 + 1000 * b + i, h, w)
            Image.fromarray(im).save(fi, quality=92)
            Image.fromarray(gt).save(fg)
    print(f"corpus: {N_TRAIN} train + 3x{N_BENCH} benchmark images under "
          f"{root}", flush=True)


# ---------------------------------------------------------------------------
# phases (each runs in its own interpreter)
# ---------------------------------------------------------------------------

def phase_masks(root: str) -> None:
    """The reference's offline pseudo-mask stage, real pipeline."""
    from glob import glob

    if SMOKE:
        # orchestration smoke exercises kill/resume/compare, not maskgen
        # (which has its own chip bench + parity tests) — synthesize
        # the winner masks directly at the train resolution
        import numpy as np
        from PIL import Image

        from sod_tpu.ops import rle as rle_codec

        size = 64
        masks = {}
        for fp in sorted(glob(os.path.join(root, "DUTS", "DUTS-TR-Image",
                                           "*.jpg"))):
            im = np.asarray(Image.open(fp).convert("L").resize((size, size)))
            masks[os.path.basename(fp)] = rle_codec.encode(
                (im > 128).astype(np.uint8))
        with open(os.path.join(root, "pseudo.json"), "w") as f:
            json.dump(masks, f)
        print(f"pseudo-masks (smoke): {len(masks)}", flush=True)
        return

    from sod_tpu.data.mask_generator import MaskGenerator

    paths = sorted(glob(os.path.join(root, "DUTS", "DUTS-TR-Image", "*.jpg")))
    gen = MaskGenerator(cluster_sizes=[2, 3, 4], cluster_type="spectral",
                        feature_types=["dino", "mocov2", "swav"],
                        patch_size=16, batch_size=16)
    t0 = time.perf_counter()
    masks = gen(paths)
    with open(os.path.join(root, "pseudo.json"), "w") as f:
        json.dump(masks, f)
    print(f"pseudo-masks: {len(masks)} in {time.perf_counter() - t0:.1f}s",
          flush=True)


def _make_cfg(root: str, run: str):
    from sod_tpu.config import Config

    over = {}
    if SMOKE:
        over = dict(train_image_size=64, eval_image_size=64, batch_size=4,
                    num_workers=2, max_gt_masks=2, compute_dtype="float32",
                    use_pallas_attention=False, use_fused_mlp=False,
                    use_fused_train=False)
    return Config(
        dir_ckpt=os.path.join(root, f"ckpt_{run}"),
        dir_dataset=root,
        pseudo_masks_fp=os.path.join(root, "pseudo.json"),
        # the recipe: 12 epochs, batch 8, AdamW wd 0.01, poly 0.9,
        # grad-clip 1.0, contrastive on — all Config defaults except the
        # documented LR scale-down for the 384-step corpus
        # production fast path: both block halves Pallas fwd+bwd
        # (ops/fused_attn + ops/fused_mlp) — convergence-validated on
        # chip by scripts/learning_check.py --fused-train --fused-mlp
        # (IoU 0.095 -> 0.977 in 400 steps, r4 restructured backward)
        **dict(dict(batch_size=8, num_workers=4, use_fused_mlp=True,
                    use_fused_train=True),
               **over),
        n_epochs=EPOCHS, lr=LR,
    )


def _make_mcfg(cfg):
    if not SMOKE:
        from sod_tpu.models.maskformer import config_from

        return config_from(cfg)
    from sod_tpu.models.maskformer import MaskFormerConfig
    from sod_tpu.models.vit import ViTConfig

    return MaskFormerConfig(
        n_queries=4, n_decoder_layers=2,
        use_binary_classifier=cfg.use_binary_classifier,
        vit=ViTConfig(patch_size=8, embed_dim=32, depth=2, n_heads=2,
                      pos_grid=8))


def phase_train(root: str, run: str, resume: bool, kill_at: int) -> None:
    from sod_tpu.train.trainer import Trainer
    from sod_tpu.utils.misc import set_seeds

    cfg = _make_cfg(root, run)
    set_seeds(cfg.seed)
    trainer = Trainer(cfg, mcfg=_make_mcfg(cfg))
    start = 1
    if resume:
        start = trainer.resume()
        print(f"resumed run {run} -> continuing from epoch {start}",
              flush=True)

    if kill_at:
        # SIGKILL mid-epoch: after 3 steps of epoch `kill_at` have been
        # dispatched, die the hard way (no atexit, no flushes) — the
        # resume must work from exactly what the per-epoch checkpoint
        # left on disk
        orig = trainer.train_step
        kill_after = (kill_at - 1) * trainer.n_iters_per_epoch + 3

        def step(p, o, b):
            out = orig(p, o, b)
            if trainer.n_iters_done + 1 >= kill_after:
                print(f"KILLING run {run} mid-epoch {kill_at} "
                      f"(after step {trainer.n_iters_done + 1})", flush=True)
                os.kill(os.getpid(), signal.SIGKILL)
            return out

        trainer.train_step = step

    t0 = time.perf_counter()
    for epoch in range(start, EPOCHS + 1):
        em = trainer._train_epoch(epoch)
        trainer._evaluate(epoch)
        print(f"run {run} epoch {epoch}: loss {em['avg_loss']:.4f} "
              f"{em['images_per_second']:.1f} img/s  best={trainer.best_scores}",
              flush=True)
    print(f"run {run} epochs {start}..{EPOCHS} in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)


def phase_compare(root: str) -> None:
    """Bit-equality of run A vs run B final states (CPU, no chip)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from sod_tpu.train.checkpoints import restore_checkpoint

    def load(run):
        base = os.path.join(root, f"ckpt_{run}")
        (exp,) = [d for d in os.listdir(base)
                  if os.path.isdir(os.path.join(base, d))]
        return restore_checkpoint(os.path.join(base, exp, "latest_model"))

    a, b = load("A"), load("B")
    report = {"epoch_a": a.get("epoch"), "epoch_b": b.get("epoch"),
              "n_iters_a": a.get("n_iters"), "n_iters_b": b.get("n_iters")}
    for key in ("params", "opt_state"):
        la = jax.tree.leaves(a[key])
        lb = jax.tree.leaves(b[key])
        eq = (len(la) == len(lb) and all(
            np.array_equal(np.asarray(x), np.asarray(y))
            for x, y in zip(la, lb)))
        report[f"{key}_bit_equal"] = bool(eq)
        if not eq:
            diffs = [i for i, (x, y) in enumerate(zip(la, lb))
                     if not np.array_equal(np.asarray(x), np.asarray(y))]
            report[f"{key}_diff_leaves"] = diffs[:10]
    print("COMPARE " + json.dumps(report), flush=True)


# ---------------------------------------------------------------------------
# orchestration (never touches jax; chip phases run serialized)
# ---------------------------------------------------------------------------

def _sub(args, tag, timeout=7200, expect_signal=None):
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, os.path.abspath(__file__)] + args,
                       capture_output=True, text=True, timeout=timeout)
    dt = time.perf_counter() - t0
    sys.stdout.write(r.stdout)
    sys.stdout.flush()
    if expect_signal is not None:
        assert r.returncode == -expect_signal, (
            f"{tag}: expected signal {expect_signal}, rc={r.returncode}\n"
            f"{r.stderr[-3000:]}")
    elif r.returncode != 0:
        raise RuntimeError(f"{tag} failed rc={r.returncode}\n"
                           f"{r.stderr[-5000:]}")
    print(f"[{tag}] done in {dt:.0f}s", flush=True)
    return r.stdout, dt


def _epoch_rows(root, run):
    base = os.path.join(root, f"ckpt_{run}")
    (exp,) = [d for d in os.listdir(base)
              if os.path.isdir(os.path.join(base, d))]
    rows = {}
    with open(os.path.join(base, exp, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "avg_loss" in rec:
                e = int(rec["epoch"])
                rows.setdefault(e, {}).update(
                    loss=rec["avg_loss"], ips=rec["images_per_second"])
                rows[e]["step"] = rec.get("step")
            elif any(k.startswith("iou (") for k in rec):
                # benchmark metrics land on the same step as the epoch row
                for e, row in rows.items():
                    if row.get("step") == rec.get("step"):
                        for pretty in ("DUTS", "ECSSD", "DUT-OMRON"):
                            k = f"iou ({pretty})"
                            if k in rec:
                                row[pretty] = rec[k]
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/sod_dress")
    ap.add_argument("--phase", choices=["masks", "train", "compare"],
                    default=None)
    ap.add_argument("--run", default="A")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--kill-at-epoch", type=int, default=0)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_sod_bench"))

    if args.phase == "masks":
        return phase_masks(args.root)
    if args.phase == "train":
        return phase_train(args.root, args.run, args.resume,
                           args.kill_at_epoch)
    if args.phase == "compare":
        return phase_compare(args.root)

    # ---- orchestrate ----
    root = args.root
    build_corpus(root)
    timings = {}
    if not os.path.isfile(os.path.join(root, "pseudo.json")):
        _, timings["maskgen"] = _sub(["--phase", "masks", "--root", root],
                                     "maskgen")
    _, timings["run_A"] = _sub(
        ["--phase", "train", "--root", root, "--run", "A"], "run A")
    _, timings["run_B_killed"] = _sub(
        ["--phase", "train", "--root", root, "--run", "B",
         "--kill-at-epoch", str(KILL_EPOCH)],
        "run B (killed)", expect_signal=signal.SIGKILL)
    _, timings["run_B_resumed"] = _sub(
        ["--phase", "train", "--root", root, "--run", "B", "--resume"],
        "run B (resumed)")
    cmp_out, _ = _sub(["--phase", "compare", "--root", root], "compare")
    report = json.loads(cmp_out.split("COMPARE ", 1)[1].splitlines()[0])

    rows_a = _epoch_rows(root, "A")
    rows_b = _epoch_rows(root, "B")
    write_doc(root, rows_a, rows_b, report, timings)
    ok = report["params_bit_equal"] and report["opt_state_bit_equal"]
    print(f"DRESS REHEARSAL {'OK' if ok else 'FAILED'}", flush=True)
    sys.exit(0 if ok else 1)


def write_doc(root, rows_a, rows_b, report, timings):
    doc = (os.path.join(root, "DRESS_REHEARSAL.md") if SMOKE
           else os.path.join(REPO, "docs", "DRESS_REHEARSAL.md"))
    lines = [
        "# Full-recipe dress rehearsal (round 4)",
        "",
        "The reference's training recipe, end-to-end on one v5e chip "
        "(VERDICT r3 item 5): generated pseudo-masks -> 12 epochs, batch 8, "
        "AdamW + per-iter poly LR, contrastive loss on, per-epoch eval on "
        "all three benchmarks, per-benchmark best checkpoints "
        "(trainer pyc 190-228; `configs/...yaml:51-56`), plus a mid-run "
        "SIGKILL + resume the reference cannot do (save-only checkpoints).",
        "",
        f"Corpus: {N_TRAIN} synthetic DUTS-TR images (pseudo-masks from the "
        f"REAL 3-backbone spectral pipeline), {N_BENCH}-image synthetic "
        "DUTS-TE / ECSSD / DUT-OMRON benchmarks in their reference disk "
        "layouts. LR 6e-6 -> 2e-5 is the one recipe deviation (the "
        "reference tunes for ~15k steps; this corpus gives 384 — "
        "`scripts/learning_check.py` calibration), everything else is the "
        "recipe. All numbers below were produced by "
        "`python scripts/dress_rehearsal.py` on the real chip.",
        "",
        "## Run A (uninterrupted) — per-epoch recipe metrics",
        "",
        "| epoch | train loss | img/s | IoU DUTS | IoU ECSSD | IoU DUT-OMRON |",
        "|---|---|---|---|---|---|",
    ]
    for e in sorted(rows_a):
        r = rows_a[e]
        lines.append(
            f"| {e} | {r.get('loss', float('nan')):.4f} "
            f"| {r.get('ips', 0):.0f} "
            f"| {r.get('DUTS', float('nan')):.4f} "
            f"| {r.get('ECSSD', float('nan')):.4f} "
            f"| {r.get('DUT-OMRON', float('nan')):.4f} |")
    lines += [
        "",
        f"## Run B: SIGKILL mid-epoch {KILL_EPOCH} (3 steps in), resume, "
        "complete",
        "",
        "| epoch | B loss | A loss | equal |",
        "|---|---|---|---|",
    ]
    for e in sorted(rows_b):
        la = rows_a.get(e, {}).get("loss")
        lb = rows_b[e].get("loss")
        eq = "bit-equal" if la == lb else f"DIFFERS ({la} vs {lb})"
        lines.append(f"| {e} | {lb:.6f} | {la:.6f} | {eq} |")
    lines += [
        "",
        "## Final-state equality (run B vs run A, `--phase compare`)",
        "",
        f"- params bit-equal: **{report['params_bit_equal']}**",
        f"- optimizer state bit-equal: **{report['opt_state_bit_equal']}**",
        f"- final epoch: A={report['epoch_a']} B={report['epoch_b']}, "
        f"n_iters: A={report['n_iters_a']} B={report['n_iters_b']}",
        "",
        "Determinism stack that makes this possible: per-(seed, epoch, "
        "index) augmentation keys (`data/base.py`), seeded per-epoch "
        "shuffles, the optimizer step count inside the restored opt_state "
        "driving the poly LR, and the post-eval `best_scores.json` sidecar "
        "(`train/trainer.py`) so the resumed run's best-IoU trackers match "
        "the uninterrupted run's.",
        "",
        "## Wall clock",
        "",
    ] + [f"- {k}: {v:.0f}s" for k, v in timings.items()] + [""]
    with open(doc, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {doc}", flush=True)


if __name__ == "__main__":
    main()
