"""Offline batch-prediction CLI (`sod_tpu.cli.predict`): folder in, mask
PNGs out, through the serving stack's exact model path — a surface the
reference lacks entirely (its only inference entries are the Flask
``/predict`` route and the GT-requiring Evaluator)."""
import os

import numpy as np
import yaml
from PIL import Image

from sod_tpu.cli.predict import build_argparser, main


def test_predict_cli_writes_masks(tmp_path, rng):
    sizes = [(40, 48), (64, 52), (33, 41)]
    for i, (h, w) in enumerate(sizes):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            tmp_path / f"img_{i}.jpg")

    # small-token config: patch 16 at a 32px eval canvas = 4+1 tokens, so
    # the full ViT-S width stays cheap on the CPU test platform
    cfg = {"patch_size": 16, "eval_image_size": 32,
           "compute_dtype": "float32", "use_pallas_attention": False,
           "n_queries": 4, "n_decoder_layers": 2}
    cfg_fp = tmp_path / "tiny.yaml"
    cfg_fp.write_text(yaml.safe_dump(cfg))

    out = tmp_path / "preds"
    main(["--p_images", str(tmp_path / "img_*.jpg"),
          "--out", str(out), "--config", str(cfg_fp),
          "--batch_size", "2", "--heatmap"])

    for i, (h, w) in enumerate(sizes):
        m = Image.open(out / f"img_{i}_mask.png")
        assert m.size == (w, h) and m.mode == "L"
        hm = Image.open(out / f"img_{i}_heatmap.png")
        assert hm.size == (w, h) and hm.mode == "RGB"
    # batch padding must not bleed: re-run single-image, masks identical
    out2 = tmp_path / "preds_b1"
    main(["--p_images", str(tmp_path / "img_0.jpg"),
          "--out", str(out2), "--config", str(cfg_fp),
          "--batch_size", "1"])
    a = np.asarray(Image.open(out / "img_0_mask.png"))
    b = np.asarray(Image.open(out2 / "img_0_mask.png"))
    np.testing.assert_array_equal(a, b)


def test_predict_cli_argparser():
    a = build_argparser().parse_args(
        ["--p_images", "x.jpg", "--quantize", "int8", "--refine"])
    assert a.quantize == "int8" and a.refine and a.out == "predictions"
