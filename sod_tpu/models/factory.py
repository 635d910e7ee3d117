"""Model factory (ref ``utils/misc.py:163-227`` ``get_model``).

Returns (config, init_fn, apply_fn) triples for the functional models; for
``maskformer`` it consumes the flat experiment Config exactly like the
reference's namespace plumbing.  Pretrained-weight loading goes through
``sod_tpu.models.convert`` from local checkpoint files (the reference
downloads DINO weights from the web at build time,
``utils/misc.py:230-246``; offline environments pass ``checkpoint=``).
"""
from __future__ import annotations

from typing import Optional

import jax

from sod_tpu.config import Config


def get_model(arch: str, patch_size: Optional[int] = None,
              training_method: Optional[str] = None,
              configs: Optional[Config] = None,
              checkpoint: Optional[str] = None,
              seed: int = 0):
    """Build (cfg_obj, params, apply_fn).

    arch: "maskformer" | "vit_small"/"vit_tiny"/"vit_base" | "resnet50" |
    "deit_small_distilled".
    """
    rng = jax.random.key(seed)

    if arch == "maskformer":
        assert configs is not None
        from sod_tpu.models.maskformer import (
            config_from,
            maskformer_apply,
            maskformer_init,
        )

        mcfg = config_from(configs)
        if checkpoint:
            from sod_tpu.models.convert import (
                convert_maskformer,
                load_torch_state_dict,
            )

            params = convert_maskformer(
                load_torch_state_dict(checkpoint),
                n_decoder_layers=configs.n_decoder_layers,
                use_binary_classifier=configs.use_binary_classifier)
            params = jax.tree.map(jax.numpy.asarray, params)
        else:
            params = maskformer_init(rng, mcfg)
        return mcfg, params, maskformer_apply

    if arch.startswith("vit") or arch.startswith("deit_small_p"):
        from sod_tpu.models.vit import (
            vit_apply,
            vit_base,
            vit_init,
            vit_small,
            vit_tiny,
        )

        builder = {"vit_small": vit_small, "vit_tiny": vit_tiny,
                   "vit_base": vit_base}[arch if arch in
                                         ("vit_small", "vit_tiny",
                                          "vit_base") else "vit_small"]
        vcfg = builder(patch_size=patch_size or 16)
        if training_method == "deit":
            raise ValueError(
                "training_method='deit' uses arch='deit_small_distilled' "
                "(the reference's timm path; its MaskFormer cannot consume "
                "it either — see sod_tpu/models/deit.py)")
        if checkpoint:
            from sod_tpu.models.convert import convert_vit, load_torch_state_dict

            params = jax.tree.map(
                jax.numpy.asarray,
                convert_vit(load_torch_state_dict(checkpoint),
                            depth=vcfg.depth))
        else:
            params = vit_init(rng, vcfg)
        return vcfg, params, vit_apply

    if arch == "deit_small_distilled":
        from sod_tpu.models.deit import (
            deit_apply,
            deit_init,
            deit_small_distilled_patch16_224,
        )

        dcfg = deit_small_distilled_patch16_224()
        return dcfg, deit_init(rng, dcfg), deit_apply

    if arch == "resnet50":
        assert training_method in ("mocov2", "swav", "supervised", None)
        from sod_tpu.models.resnet import resnet50_apply, resnet50_init

        if checkpoint:
            from sod_tpu.models.convert import (
                convert_resnet50,
                load_torch_state_dict,
            )

            params = jax.tree.map(
                jax.numpy.asarray,
                convert_resnet50(load_torch_state_dict(checkpoint)))
        else:
            params = resnet50_init(rng)
        return None, params, resnet50_apply

    raise ValueError(
        f"{arch} is not a supported arch. Choose from "
        "[maskformer, vit_small, vit_tiny, vit_base, resnet50, "
        "deit_small_distilled]")
