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
        paths.extend(hits if hits else [pat])
    if not paths:
        raise SystemExit("no images matched --p_images")
    os.makedirs(args.out, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from sod_tpu.config import Config, load_config
    from sod_tpu.data.augment import resize_pil
    from sod_tpu.models.maskformer import config_from, maskformer_init
    from sod_tpu.serving.inference import _JET_LUT, SelfMaskInference

    cfg = load_config(args.config) if args.config else Config()
    if args.quantize is not None:
        cfg = cfg.replace(quantize=args.quantize)

    if args.p_state_dict and args.p_state_dict.endswith((".pt", ".pth",
                                                         ".tar")):
        from sod_tpu.models.convert import convert_maskformer, load_torch_state_dict

        sd = load_torch_state_dict(args.p_state_dict)
        params = jax.tree.map(jnp.asarray, convert_maskformer(
            sd, n_decoder_layers=cfg.n_decoder_layers,
            use_binary_classifier=cfg.use_binary_classifier))
        print(f"Pre-trained weights are loaded from {args.p_state_dict}")
    elif args.p_state_dict:
        from sod_tpu.train.checkpoints import restore_checkpoint

        params = restore_checkpoint(args.p_state_dict)["params"]
        print(f"Checkpoint restored from {args.p_state_dict}")
    else:
        print("WARNING: no weights given — predicting with a randomly "
              "initialised model (smoke runs only).")
        params = maskformer_init(jax.random.key(cfg.seed), config_from(cfg))

    # the serving stack's model path (fused forward + objectness argmax +
    # optional int8), without its warmup buckets or micro-batcher — this
    # CLI drives full static batches itself
    svc = SelfMaskInference(cfg=cfg, params=params, warmup=False)
    size = cfg.eval_image_size
    b = max(1, args.batch_size)

    t0 = time.perf_counter()
    n_done = 0
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
        masks, objs = svc._forward(svc.params, svc._prep(jnp.asarray(arr)))
        masks = np.clip(np.asarray(masks), 0.0, 1.0)
        objs = np.asarray(objs)

        for i, (p, img) in enumerate(zip(chunk, imgs)):
            stem = os.path.splitext(os.path.basename(p))[0]
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
