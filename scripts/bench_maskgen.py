#!/usr/bin/env python
"""Pseudo-mask generation throughput on the real chip (VERDICT r2 item 7).

Runs the REAL MaskGenerator pipeline — multi-backbone feature extraction
(DINO ViT-S + MoCo-v2/SwAV ResNet-50, random weights: identical FLOPs to
converted checkpoints) -> spectral clustering (dense eigh + k-means++ on
device, k in {2, 3, 4}) -> candidate filtering -> IoU voting -> RLE encode
— over a DUTS-like image directory, and prints end-to-end img/s plus the
per-stage split (extract+cluster on device vs filter/vote/RLE on host).

Reference workload: SURVEY §3.4 (mask_generator pyc) — ~10k DUTS images
x 3 backbones x 3 cluster sizes, an offline stage the reference runs on
one GPU with faiss.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def build_images(root: str, n: int) -> list:
    os.makedirs(root, exist_ok=True)
    paths = []
    for i in range(n):
        fp = os.path.join(root, f"img_{i:05d}.jpg")
        if not os.path.isfile(fp):
            r = np.random.RandomState(i)
            h, w = int(r.randint(240, 420)), int(r.randint(300, 500))
            im = (r.rand(h, w, 3) * 60).astype(np.uint8)
            h0, w0 = r.randint(5, h // 2), r.randint(5, w // 2)
            im[h0:h0 + h // 3, w0:w0 + w // 3] += 160
            Image.fromarray(im).save(fp, quality=90)
        paths.append(fp)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--feature-types", nargs="+",
                    default=["dino", "mocov2", "swav"])
    ap.add_argument("--cluster-sizes", type=int, nargs="+", default=[2, 3, 4])
    ap.add_argument("--patch-size", type=int, default=16)
    ap.add_argument("--root", default="/tmp/sod_maskgen_imgs")
    ap.add_argument("--fp", default="/tmp/maskgen_bench.json")
    ap.add_argument("--pipelined-only", action="store_true",
                    help="skip the staged split: running the staged pass "
                         "first leaves this process with extra large "
                         "jitted programs, which degrades tunnel dispatch "
                         "and contaminates the end-to-end number (this "
                         "was the r4 12.69 vs 23 discrepancy)")
    args = ap.parse_args()

    from sod_tpu.data.mask_generator import MaskGenerator, vote_mask
    from sod_tpu.ops import rle as rle_codec
    from sod_tpu.utils.misc import filter_masks

    paths = build_images(args.root, args.n)
    gen = MaskGenerator(cluster_sizes=args.cluster_sizes,
                        cluster_type="spectral",
                        feature_types=args.feature_types,
                        patch_size=args.patch_size,
                        batch_size=args.batch)

    # warmup: compile extract+cluster programs on a small slice
    t0 = time.perf_counter()
    gen.extract_candidate_masks(paths[: args.batch])
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s "
          f"({len(args.feature_types)} backbones, one program each)",
          flush=True)

    n = len(paths)
    out = None
    if not args.pipelined_only:
        # stage split (unpipelined): candidate extraction, then vote/RLE.
        # NOTE: this leaves extra large programs in the process, which
        # degrades tunnel dispatch for the pipelined measurement below —
        # for the HONEST end-to-end number run with --pipelined-only.
        t0 = time.perf_counter()
        candidates = gen.extract_candidate_masks(paths)
        t_extract = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = {}
        for path, stack in candidates.items():
            filtered, _ = filter_masks(stack, remove_long_masks=True,
                                       remove_small_large_masks=True)
            winner = filtered[vote_mask(filtered)]
            out[os.path.basename(path)] = rle_codec.encode(
                winner.astype(np.uint8))
        t_vote = time.perf_counter() - t0

        total = t_extract + t_vote
        print(f"extract+cluster (device): {t_extract:7.1f}s  "
              f"{n / t_extract:6.2f} img/s", flush=True)
        print(f"filter+vote+RLE  (host):  {t_vote:7.1f}s  "
              f"{n / t_vote:6.2f} img/s", flush=True)
        print(f"staged total: {total:.1f}s  {n / total:6.2f} img/s",
              flush=True)

    # the REAL pipelined path: dump() overlaps host vote/RLE with the
    # next batch's device work (round 4) and includes the JSON write —
    # the same protocol bench.py reports as maskgen_images_per_sec
    import json

    t0 = time.perf_counter()
    gen.dump(paths, args.fp)
    t_pipe = time.perf_counter() - t0
    with open(args.fp) as f:
        out2 = json.load(f)
    assert len(out2) == n and (out is None or out2.keys() == out.keys())
    print(f"END-TO-END (pipelined dump incl. JSON write): {n} images, "
          f"{len(args.feature_types)} backbones, k={args.cluster_sizes}: "
          f"{t_pipe:.1f}s  {n / t_pipe:6.2f} img/s", flush=True)
    print(f"wrote {args.fp} ({len(out2)} masks)", flush=True)


if __name__ == "__main__":
    main()
