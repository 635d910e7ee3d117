"""Pseudo-mask generation entry point (ref ``datasets/mask_generator.py``
CLI, pyc consts; README.md:121-123: ``python mask_generator.py --p_images
... --fp out.json``)."""
from __future__ import annotations

import argparse
import glob
import json

from sod_tpu.utils.misc import set_seeds


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("sod-tpu generate-masks")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--p_images", type=str, nargs="+", required=True,
                   help="image paths or glob patterns")
    p.add_argument("--fp", type=str, default="your_pseudo_masks.json")
    p.add_argument("--cluster_type", "-ct", type=str, default="spectral",
                   choices=["spectral", "k-means"])
    p.add_argument("--cluster_sizes", "-cs", type=int, nargs="+",
                   default=[2, 3, 4])
    p.add_argument("--feature_types", "-ft", type=str, nargs="+",
                   default=["mocov2", "swav", "dino"],
                   choices=["mocov2", "swav", "dino"], metavar="FT")
    p.add_argument("--patch_size", "-ps", type=int, default=16)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--scale_factor", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--use_gpu", type=bool, default=True)   # parity; unused
    p.add_argument("--gpu_id", type=int, default=0)        # parity; unused
    p.add_argument("--n_devices", type=int, default=None,
                   help="data-parallel mesh size: shard each batch's "
                        "extract+cluster program over the mesh (default: "
                        "single device)")
    p.add_argument("--dino_ckpt", type=str, default=None)
    p.add_argument("--mocov2_ckpt", type=str, default=None)
    p.add_argument("--swav_ckpt", type=str, default=None)
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

    params = {}
    for ft, ckpt in (("dino", args.dino_ckpt), ("mocov2", args.mocov2_ckpt),
                     ("swav", args.swav_ckpt)):
        if ckpt:
            from sod_tpu.models.convert import (
                convert_resnet50,
                convert_vit,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(ckpt)
            params[ft] = (convert_vit(sd) if ft == "dino"
                          else convert_resnet50(sd))
            print(f"{ft} weights loaded from {ckpt}")

    from sod_tpu.data.mask_generator import MaskGenerator

    mesh = None
    if args.n_devices and args.n_devices > 1:
        from sod_tpu.parallel import make_mesh

        mesh = make_mesh(args.n_devices)

    gen = MaskGenerator(
        cluster_sizes=args.cluster_sizes, cluster_type=args.cluster_type,
        feature_types=args.feature_types, patch_size=args.patch_size,
        image_size=args.image_size, scale_factor=args.scale_factor,
        batch_size=args.batch_size, seed=args.seed, params=params,
        mesh=mesh)
    masks = gen(paths)
    with open(args.fp, "w") as f:
        json.dump(masks, f)
    print(f"wrote {len(masks)} pseudo-masks to {args.fp}")


if __name__ == "__main__":
    main()
