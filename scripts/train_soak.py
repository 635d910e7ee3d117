#!/usr/bin/env python
"""Full-Trainer soak on the real chip: synthetic DUTS-style dataset on
disk -> pseudo-mask JSON -> Trainer epochs (threaded loader + jitted
steps + canvas eval + checkpointing) -> resume.

Exercises the complete training product end-to-end at the flagship model
size — the step-level benches (`bench_train.py`) and in-memory learning
check (`learning_check.py`) don't cover host loading, the Trainer epoch
loop, eval-in-the-loop or checkpoint/resume on hardware.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def build_dataset(root: str, n_train: int = 96, n_test: int = 16,
                  img: int = 224):
    from sod_tpu.ops import rle as rle_codec

    rng = np.random.RandomState(0)
    duts = os.path.join(root, "DUTS")
    for sub in ("DUTS-TR-Image", "DUTS-TE-Image", "DUTS-TE-Mask"):
        os.makedirs(os.path.join(duts, sub), exist_ok=True)

    def sample(i, size):
        r = np.random.RandomState(1000 + i)
        im = (r.rand(size, size, 3) * 50).astype(np.uint8)
        h0, w0 = r.randint(10, size // 2, size=2)
        hh, ww = r.randint(size // 4, size // 2, size=2)
        im[h0:h0 + hh, w0:w0 + ww] += 170
        gt = np.zeros((size, size), np.uint8)
        gt[h0:h0 + hh, w0:w0 + ww] = 1
        return im, gt

    masks = {}
    for i in range(n_train):
        im, gt = sample(i, img)
        name = f"tr_{i:04d}.jpg"
        Image.fromarray(im).save(os.path.join(duts, "DUTS-TR-Image", name))
        masks[name] = rle_codec.encode(gt)
    pm_fp = os.path.join(root, "pseudo.json")
    with open(pm_fp, "w") as f:
        json.dump(masks, f)
    for i in range(n_test):
        im, gt = sample(10_000 + i, img)
        Image.fromarray(im).save(
            os.path.join(duts, "DUTS-TE-Image", f"te_{i:03d}.jpg"))
        Image.fromarray(gt * 255).save(
            os.path.join(duts, "DUTS-TE-Mask", f"te_{i:03d}.png"))
    return pm_fp


def main():
    import tempfile

    from sod_tpu.config import Config
    from sod_tpu.train.trainer import Trainer

    root = tempfile.mkdtemp(prefix="sod_soak_")
    pm_fp = build_dataset(root)
    ckpt = os.path.join(root, "ckpt")

    cfg = Config(
        dir_ckpt=ckpt, dir_dataset=root, pseudo_masks_fp=pm_fp,
        batch_size=8, num_workers=4, max_gt_masks=4,
        lr=2e-5, lr_warmup_duration=0, n_epochs=2,
        use_fused_mlp=True, benchmarks=["duts"],
    )
    trainer = Trainer(cfg)
    t0 = time.perf_counter()
    trainer(n_epochs=2)
    dt = time.perf_counter() - t0
    print(f"2 epochs (96 imgs, flagship ViT-S/8) in {dt:.1f}s "
          f"(incl. compiles + canvas eval)", flush=True)
    print(f"best scores: {trainer.best_scores}", flush=True)

    # resume into a fresh trainer and run one more epoch
    trainer2 = Trainer(cfg)
    nxt = trainer2.resume()
    print(f"resume -> next epoch {nxt}, best restored: "
          f"{trainer2.best_scores}", flush=True)
    em = trainer2._train_epoch(nxt)
    print(f"epoch {nxt}: loss {em['avg_loss']:.3f} "
          f"{em['images_per_second']:.1f} img/s", flush=True)
    assert np.isfinite(em["avg_loss"])
    print("SOAK OK", flush=True)


if __name__ == "__main__":
    main()
