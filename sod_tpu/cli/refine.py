"""Bilateral-solver mask refinement CLI (the BASELINE.json
"bilateral-solver mask refinement post-processing" configuration; ref
``bilateral_solver.py``).

``python -m sod_tpu.cli.refine --image img.jpg --mask mask.png
[--out-soft soft.png] [--out-binary binary.png]``
"""
from __future__ import annotations

import argparse

import numpy as np
from PIL import Image


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("sod-tpu refine")
    p.add_argument("--image", required=True, help="RGB image")
    p.add_argument("--mask", required=True,
                   help="grayscale saliency mask (same size)")
    p.add_argument("--out-soft", default="refined_soft.png")
    p.add_argument("--out-binary", default="refined_binary.png")
    p.add_argument("--sigma-spatial", type=int, default=16)
    p.add_argument("--sigma-luma", type=int, default=16)
    p.add_argument("--sigma-chroma", type=int, default=8)
    return p


def main(argv=None) -> None:
    from sod_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()  # repeat runs skip tunnel recompiles
    args = build_argparser().parse_args(argv)
    from sod_tpu.postprocess import bilateral_solver_output

    img = Image.open(args.image).convert("RGB")
    mask = np.asarray(Image.open(args.mask).convert("L"), np.float32) / 255.0
    if mask.shape != (img.size[1], img.size[0]):
        raise SystemExit(f"size mismatch: image {img.size[::-1]} vs mask "
                         f"{mask.shape}")
    soft, binary = bilateral_solver_output(
        img, mask, sigma_spatial=args.sigma_spatial,
        sigma_luma=args.sigma_luma, sigma_chroma=args.sigma_chroma)
    Image.fromarray((np.clip(soft, 0, 1) * 255).astype(np.uint8)).save(
        args.out_soft)
    Image.fromarray((binary * 255).astype(np.uint8)).save(args.out_binary)
    print(f"wrote {args.out_soft} and {args.out_binary}")


if __name__ == "__main__":
    main()
