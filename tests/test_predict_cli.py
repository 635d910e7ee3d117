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


def test_predict_cli_dedup_and_collision_safe_stems(tmp_path, rng):
    """Overlapping patterns predict each image once, and the duplicate-
    stem suffix can never clobber a REAL <stem>_1 input (regression:
    the generated name was not reserved against later inputs)."""
    import yaml as _yaml

    for sub in ("a", "b"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    rnd = lambda: (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    Image.fromarray(rnd()).save(tmp_path / "a" / "cat.jpg")
    Image.fromarray(rnd()).save(tmp_path / "b" / "cat.jpg")
    Image.fromarray(rnd()).save(tmp_path / "b" / "cat_1.jpg")

    cfg = {"patch_size": 16, "eval_image_size": 32,
           "compute_dtype": "float32", "use_pallas_attention": False,
           "n_queries": 4, "n_decoder_layers": 2}
    cfg_fp = tmp_path / "tiny.yaml"
    cfg_fp.write_text(_yaml.safe_dump(cfg))

    out = tmp_path / "preds"
    # the duplicate literal path + overlapping glob must not double-run
    main(["--p_images", str(tmp_path / "a" / "*.jpg"),
          str(tmp_path / "a" / "cat.jpg"), str(tmp_path / "b" / "*.jpg"),
          "--out", str(out), "--config", str(cfg_fp), "--batch_size", "2"])

    names = sorted(os.listdir(out))
    # three distinct inputs -> exactly three masks, none overwritten:
    # a/cat -> cat, b/cat -> collision suffix, b/cat_1 -> its own name
    assert len(names) == 3, names
    assert "cat_mask.png" in names and "cat_1_mask.png" in names
    assert any(n not in ("cat_mask.png", "cat_1_mask.png")
               for n in names)
