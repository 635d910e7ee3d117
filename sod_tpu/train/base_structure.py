"""BaseStructure — thin OO shim over the functional core (ref
``base_structure.py``).

The reference shares a model-holder base class between Trainer, Evaluator
and the app's inference service with ``_forward`` /
``_extract_selected_predictions`` / ``_visualize`` (``base_structure.py:
18-100``).  The functional redesign doesn't need it (pure ``apply``
functions + explicit params), but the same surface is provided for
API-compatible consumers.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sod_tpu.config import Config
from sod_tpu.models.maskformer import MaskFormerConfig, config_from, maskformer_apply


class BaseStructure:
    def __init__(self, model_params, cfg: Optional[Config] = None,
                 mcfg: Optional[MaskFormerConfig] = None, visualizer=None):
        self.params = model_params
        self.cfg = cfg or Config()
        self.mcfg = mcfg or config_from(self.cfg)
        self.visualizer = visualizer
        compute = (jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16"
                   else jnp.float32)
        mcfg_ = self.mcfg

        from functools import partial

        @partial(jax.jit, static_argnums=(2,))
        def fwd(params, x, encoder_only):
            return maskformer_apply(params, x.astype(compute), mcfg_,
                                    encoder_only=encoder_only)

        self._fwd = fwd

    def _forward(self, dict_data: Dict, encoder_only: bool = False,
                 skip_decoder: bool = False, device=None) -> Dict:
        """ref ``base_structure.py:18-24`` (``skip_decoder`` is accepted and
        ignored exactly like the reference decoder does; ``device`` mirrors
        the pyc-era kwarg, SURVEY §2.7 version-drift note)."""
        x = dict_data["x"] if "x" in dict_data else dict_data["image"]
        x = jnp.asarray(np.asarray(x))
        if x.ndim == 3:
            x = x[None]
        if x.shape[1] == 3 and x.shape[-1] != 3:     # NCHW -> NHWC
            x = jnp.transpose(x, (0, 2, 3, 1))
        return self._fwd(self.params, x, encoder_only)

    @staticmethod
    def _extract_selected_predictions(mask_pred, gt_to_query: Sequence[int]):
        """ref ``base_structure.py:26-53``: gather matched query masks."""
        from sod_tpu.utils.visualizer import extract_selected_predictions

        return extract_selected_predictions(np.asarray(mask_pred), gt_to_query)

    def _visualize(self, dict_data: Dict, outputs: Dict, fp: str):
        """ref ``base_structure.py:55-100``: objectness-ranked mask grid."""
        if self.visualizer is None:
            return None
        image = np.asarray(dict_data.get("image", dict_data.get("x")))
        if image.ndim == 4:
            image = image[0]
        if image.shape[0] == 3 and image.shape[-1] != 3:
            image = image.transpose(1, 2, 0)
        preds = np.asarray(outputs["mask_pred"])[0, -1]
        obj = (np.asarray(outputs["objectness"])[0, -1, :, 0]
               if "objectness" in outputs else None)
        sel = int(np.argmax(obj)) if obj is not None else None
        gt = dict_data.get("m")
        if gt is not None:
            gt = np.asarray(gt)
            gt = gt[0] if gt.ndim > 2 else gt
        return self.visualizer.grid(image, gt, preds, sel, obj, fp)
