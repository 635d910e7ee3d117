"""Installation smoke test (ref ``test_model.py``: imports check, config/
checkpoint presence, model build + forward).

``python -m sod_tpu.cli.smoke [--config cfg.yaml] [--p_state_dict ckpt]``
"""
from __future__ import annotations

import argparse
import sys
import traceback


def main(argv=None) -> int:
    p = argparse.ArgumentParser("sod-tpu smoke")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--p_state_dict", type=str, default=None)
    args = p.parse_args(argv)
    passed, failed = [], []

    def phase(name, fn):
        try:
            fn()
            passed.append(name)
            print(f"[PASS] {name}")
        except Exception as e:  # noqa: BLE001
            failed.append((name, e))
            print(f"[FAIL] {name}: {e}")
            traceback.print_exc()

    def _imports():
        import jax  # noqa: F401

        import sod_tpu  # noqa: F401
        from sod_tpu import data, losses, metrics, models, train  # noqa: F401

    phase("imports", _imports)

    def _devices():
        import jax

        print(f"       devices: {jax.devices()}")

    phase("devices", _devices)

    def _model():
        import jax
        import jax.numpy as jnp

        from sod_tpu.config import Config, load_config
        from sod_tpu.models.maskformer import (
            config_from,
            maskformer_apply,
            maskformer_init,
        )

        cfg = load_config(args.config) if args.config else Config()
        mcfg = config_from(cfg)
        if args.p_state_dict:
            from sod_tpu.models.convert import (
                convert_maskformer,
                load_torch_state_dict,
            )

            params = jax.tree.map(jnp.asarray, convert_maskformer(
                load_torch_state_dict(args.p_state_dict),
                n_decoder_layers=cfg.n_decoder_layers,
                use_binary_classifier=cfg.use_binary_classifier))
            print(f"       weights: {args.p_state_dict}")
        else:
            params = maskformer_init(jax.random.key(0), mcfg)
        out = maskformer_apply(params, jnp.zeros((1, 224, 224, 3)), mcfg)
        print(f"       mask_pred {out['mask_pred'].shape} "
              f"objectness {out['objectness'].shape}")

    phase("model build + forward", _model)

    print(f"\n{len(passed)} passed, {len(failed)} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
