"""Saliency inference service (ref ``SelfMaskInference``, ``app.py:161-347``).

Loads the flagship MaskFormer (from a torch ``.pt`` checkpoint via the
converter, or an orbax dir, or random weights for smoke serving), jit-
compiles the forward once with a warmup call at construction (the
reference instead pays model load at import and compiles nothing,
``app.py:349-376``), and serves single-image prediction:

preprocess 224x224 + ImageNet normalize (ref ``app.py:198-205``) ->
forward -> argmax last-layer objectness query (ref ``app.py:267-277``) ->
clip [0, 1] -> LANCZOS upsample to the original size -> jet-colormap
heatmap blended 50/50 with the input (ref ``app.py:297-311``) -> base64
PNGs {original, mask, heatmap} + objectness scores (ref ``app.py:329-334``).
"""
from __future__ import annotations

import base64
import io
from typing import Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from sod_tpu.config import Config
from sod_tpu.data.augment import normalize, resize_pil
from sod_tpu.models.maskformer import config_from, maskformer_apply, maskformer_init


def jet_colormap(x: np.ndarray) -> np.ndarray:
    """Classic jet colormap, [H, W] in [0,1] -> uint8 RGB (matplotlib's
    'jet' as used by the reference's heatmap, ``app.py:297-305``)."""
    x = np.clip(x, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4.0 * x - 3.0), 0, 1)
    g = np.clip(1.5 - np.abs(4.0 * x - 2.0), 0, 1)
    b = np.clip(1.5 - np.abs(4.0 * x - 1.0), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def _b64_png(img: Image.Image) -> str:
    buf = io.BytesIO()
    # low compression: PNG encode dominates end-to-end predict latency
    img.save(buf, format="PNG", compress_level=1)
    return base64.b64encode(buf.getvalue()).decode("ascii")


class SelfMaskInference:
    def __init__(self, model_path: Optional[str] = None,
                 config_path: Optional[str] = None,
                 cfg: Optional[Config] = None, params=None,
                 warmup: bool = True):
        if cfg is None:
            from sod_tpu.config import load_config

            cfg = load_config(config_path) if config_path else Config()
        self.cfg = cfg
        self.mcfg = config_from(cfg)

        if params is None:
            params = self._load_params(model_path)
        compute = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.params = jax.tree.map(
            lambda x: jnp.asarray(x, compute)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else jnp.asarray(x),
            params)

        mcfg = self.mcfg

        @jax.jit
        def forward(params, x):
            out = maskformer_apply(params, x, mcfg, fused=True)
            obj = out["objectness"][:, -1, :, 0]
            best = jnp.argmax(obj, axis=-1)
            sel = jnp.take_along_axis(out["mask_pred"][:, -1],
                                      best[:, None, None, None], axis=1)[:, 0]
            return sel.astype(jnp.float32), obj.astype(jnp.float32)

        self._forward = forward
        self._compute = compute
        if warmup:
            size = cfg.eval_image_size
            self._forward(self.params,
                          jnp.zeros((1, size, size, 3), compute))

    def _load_params(self, model_path: Optional[str]):
        if model_path is None:
            return maskformer_init(jax.random.key(self.cfg.seed), self.mcfg)
        if model_path.endswith((".pt", ".pth", ".tar")):
            from sod_tpu.models.convert import (
                convert_maskformer,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(model_path)
            return convert_maskformer(
                sd, n_decoder_layers=self.cfg.n_decoder_layers,
                use_binary_classifier=self.cfg.use_binary_classifier)
        from sod_tpu.train.checkpoints import restore_checkpoint

        return restore_checkpoint(model_path)["params"]

    # ------------------------------------------------------------------
    def predict(self, image: Union[Image.Image, bytes, io.BytesIO],
                refine: bool = False) -> Dict:
        """:param refine: additionally run the fast bilateral solver over
        the predicted mask (the BASELINE "bilateral-solver mask refinement"
        configuration; ref ``bilateral_solver.py:152-193``) and attach
        ``refined_mask`` (soft) + ``binary_mask`` PNGs."""
        if isinstance(image, bytes):
            image = Image.open(io.BytesIO(image))
        elif isinstance(image, io.BytesIO) or hasattr(image, "read"):
            image = Image.open(image)
        image = image.convert("RGB")
        orig_w, orig_h = image.size

        size = self.cfg.eval_image_size
        arr = normalize(np.asarray(
            resize_pil(image, (size, size), "bilinear"), np.float32))
        mask, obj = self._forward(
            self.params, jnp.asarray(arr, self._compute)[None])
        mask = np.clip(np.asarray(mask)[0], 0.0, 1.0)
        obj = np.asarray(obj)[0]

        # LANCZOS upsample to original size (ref app.py:286-296)
        mask_img = Image.fromarray((mask * 255).astype(np.uint8))
        mask_full = mask_img.resize((orig_w, orig_h), Image.LANCZOS)
        mask_arr = np.asarray(mask_full, np.float32) / 255.0

        heat = jet_colormap(mask_arr)
        blended = (0.5 * np.asarray(image, np.float32)
                   + 0.5 * heat.astype(np.float32)).astype(np.uint8)

        out = {
            "original": _b64_png(image),
            "mask": _b64_png(mask_full.convert("L")),
            "heatmap": _b64_png(Image.fromarray(blended)),
            "objectness_scores": [float(o) for o in obj],
        }
        if refine:
            from sod_tpu.postprocess import bilateral_solver_output

            soft, binary = bilateral_solver_output(image, mask_arr)
            out["refined_mask"] = _b64_png(Image.fromarray(
                (np.clip(soft, 0, 1) * 255).astype(np.uint8)))
            out["binary_mask"] = _b64_png(Image.fromarray(
                (binary.astype(np.uint8) * 255)))
        return out
