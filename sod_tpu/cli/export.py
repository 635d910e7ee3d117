"""Export a trained sod-tpu checkpoint to the reference's torch layout.

``python -m sod_tpu.cli.export --ckpt ckpt/<experiment>/best_model_duts \
    --out selfmask_export.pt``

Writes ``{'model': state_dict}`` exactly as the reference's consumers
load it (``/root/reference/app.py:185-187`` pops ``['model']``;
``evaluator.py --p_state_dict`` per README.md:105-108) — key names,
shapes and the (out, in) torch linear layout all match the
``selfmask_nq20.pt`` family, so weights trained on TPU here drop into
the torch stack there.  The reference has no interop story in either
direction; the torch->JAX converter (``models/convert.py``) covers
import, this CLI covers export — asserted mutually inverse in
``tests/test_convert.py``.

``--ckpt`` accepts an orbax checkpoint directory (``latest_model`` /
``best_model_*``; a 3-D-mesh ``latest_model``'s TP-split qkv layout is
merged back automatically) or a torch ``.pt`` (re-wrapped, useful to
normalize a ``{'model': ...}``-less state dict).
"""
from __future__ import annotations

import argparse
import os


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("sod-tpu export")
    p.add_argument("--ckpt", required=True,
                   help="orbax checkpoint dir (latest_model/best_model_*) "
                        "or a torch .pt to re-wrap")
    p.add_argument("--out", required=True, help="output .pt path")
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    from sod_tpu.models.convert import save_torch_checkpoint

    extra = {}
    if os.path.isdir(args.ckpt):
        from sod_tpu.train.checkpoints import restore_checkpoint

        state = restore_checkpoint(args.ckpt)
        params = state["params"]
        extra = {"n_epochs": int(state.get("epoch", 0)),
                 "n_iters": int(state.get("n_iters", 0))}
    else:
        from sod_tpu.models.convert import (
            convert_maskformer,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(args.ckpt)
        params = convert_maskformer(
            sd,
            n_decoder_layers=len({k.split(".")[2] for k in sd
                                  if k.startswith("decoder.layers.")}),
            depth=len({k.split(".")[2] for k in sd
                       if k.startswith("encoder.blocks.")}),
            use_binary_classifier="linear_classifier.weight" not in sd)
    save_torch_checkpoint(args.out, params, extra=extra)
    n = os.path.getsize(args.out)
    print(f"wrote {args.out} ({n / 1e6:.1f} MB, reference 'model' layout)")


if __name__ == "__main__":
    main()
