"""Offline batch prediction: run the saliency model over a folder of
images and write mask PNGs.

The reference offers only two inference surfaces — the Flask app's
per-request ``/predict`` (ref ``app.py:241-347``) and the GT-requiring
``Evaluator`` — so "predict every image in this directory" has no entry
point at all.  This CLI closes that gap with the serving stack's exact
model path (same fused forward, same objectness argmax selection, same
LANCZOS restore to the original size, optional bilateral-solver
refinement), batched at ``--batch_size`` through one compiled program.

Usage::

    python -m sod_tpu.cli.predict --p_images 'photos/*.jpg' \
        --p_state_dict selfmask_nq20.pt --out masks/ [--heatmap] [--refine]
"""
from __future__ import annotations

import argparse
import glob
import os
import time

from sod_tpu.utils.misc import set_seeds


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("sod-tpu predict")
    p.add_argument("--p_images", type=str, nargs="+", required=True,
                   help="image paths or glob patterns")
    p.add_argument("--out", type=str, default="predictions",
                   help="output directory for <stem>_mask.png files")
    p.add_argument("--config", "-c", type=str, default=None)
    p.add_argument("--p_state_dict", type=str, default=None,
                   help="torch checkpoint (.pt/.pth/.tar) or an orbax "
                        "checkpoint dir saved by the trainer")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--quantize", choices=["none", "int8"], default=None,
                   help="int8: W8A8 fused encoder (ops/fused_block_int8)")
    p.add_argument("--heatmap", action="store_true",
                   help="also write <stem>_heatmap.png (jet-LUT blend, "
                        "identical to the serving /predict heatmap)")
    p.add_argument("--refine", action="store_true",
                   help="also write <stem>_refined.png via the bilateral "
                        "solver (ref bilateral_solver.py:152-193)")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None) -> None:
    from sod_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()  # repeat runs skip tunnel recompiles
    args = build_argparser().parse_args(argv)
    set_seeds(args.seed)

    paths = []
    for pat in args.p_images:
        hits = sorted(glob.glob(pat))
        if not hits:
            # a miss must fail NOW, not as a FileNotFoundError on the
            # literal pattern string after earlier chunks already wrote
            raise SystemExit(f"--p_images pattern matched nothing: {pat}")
        paths.extend(hits)
    # overlapping patterns must not predict (and write) an image twice —
    # the second pass would emit a spurious "<stem>_1" duplicate file
    paths = list(dict.fromkeys(paths))
    os.makedirs(args.out, exist_ok=True)

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from sod_tpu.config import Config, load_config
    from sod_tpu.data.augment import resize_pil
    from sod_tpu.serving.inference import _JET_LUT, SelfMaskInference

    cfg = load_config(args.config) if args.config else Config()
    if args.quantize is not None:
        cfg = cfg.replace(quantize=args.quantize)
    if not args.p_state_dict:
        print("WARNING: no weights given — predicting with a randomly "
              "initialised model (smoke runs only).")

    # the serving stack's model path (weight loading — torch convert /
    # orbax restore / seeded init — plus the fused forward, objectness
    # argmax and optional int8), without its warmup buckets or
    # micro-batcher: this CLI drives full static batches itself
    svc = SelfMaskInference(model_path=args.p_state_dict, cfg=cfg,
                            warmup=False)
    size = cfg.eval_image_size
    b = max(1, args.batch_size)

    t0 = time.perf_counter()
    n_done = 0
    seen: dict = {}
    for lo in range(0, len(paths), b):
        chunk = paths[lo:lo + b]
        imgs, arrs = [], []
        for p in chunk:
            img = Image.open(p).convert("RGB")
            imgs.append(img)
            arrs.append(np.asarray(resize_pil(img, (size, size), "bilinear"),
                                   np.uint8))
        # pad to the static batch (one compiled program for every chunk)
        arr = np.stack(arrs + [arrs[-1]] * (b - len(arrs)))
        masks, _ = svc._forward(svc.params, svc._prep(jnp.asarray(arr)))
        masks = np.clip(np.asarray(masks), 0.0, 1.0)

        for i, (p, img) in enumerate(zip(chunk, imgs)):
            stem = os.path.splitext(os.path.basename(p))[0]
            # same stem from different directories: suffix instead of
            # silently overwriting the earlier mask.  The generated name
            # is itself reserved in `seen`, so a later REAL "<stem>_1"
            # input (or a second collision) can never clobber it.
            if stem in seen:
                n = 1
                while f"{stem}_{n}" in seen:
                    n += 1
                stem = f"{stem}_{n}"
            seen[stem] = True
            mask_img = Image.fromarray((masks[i] * 255).astype(np.uint8))
            mask_full = mask_img.resize(img.size, Image.LANCZOS)
            mask_full.convert("L").save(
                os.path.join(args.out, f"{stem}_mask.png"))
            if args.heatmap:
                heat = _JET_LUT[np.asarray(mask_full)]
                blended = ((np.asarray(img, np.uint16) + heat) >> 1
                           ).astype(np.uint8)
                Image.fromarray(blended).save(
                    os.path.join(args.out, f"{stem}_heatmap.png"))
            if args.refine:
                from sod_tpu.postprocess import bilateral_solver_output

                soft, _ = bilateral_solver_output(
                    img, np.asarray(mask_full, np.float32) / 255.0)
                Image.fromarray((np.clip(soft, 0, 1) * 255).astype(
                    np.uint8)).save(
                    os.path.join(args.out, f"{stem}_refined.png"))
            n_done += 1
    dt = time.perf_counter() - t0
    print(f"predicted {n_done} images -> {args.out} "
          f"({n_done / dt:.1f} img/s incl. IO)")


if __name__ == "__main__":
    main()
