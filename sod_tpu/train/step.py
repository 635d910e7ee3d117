"""jit-able train / eval step factories.

One ``train_step`` = model forward + criterion + grad + clip + AdamW update
(ref ``trainer.py`` pyc 60-68 + 70-131) as a single XLA computation.  Under
a data-parallel mesh the batch arrives sharded on its leading axis and the
gradient all-reduce is inserted by XLA (``sod_tpu.parallel``).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from sod_tpu.config import Config
from sod_tpu.losses.criterion import criterion_forward
from sod_tpu.models.maskformer import MaskFormerConfig, config_from, maskformer_apply


def _jit_train(fn, micro_batch: int = 0):
    """jit; on TPU, big batches get a raised scoped-VMEM limit.

    XLA grants the B>=48 train program only 16.00 MB of scoped VMEM for
    Pallas stack allocations (vs 20.59 MB at B<=32 — the limit shrinks
    as more HBM buffers go live), which the round-4 backward's [N, 3D]
    weight-grad scratch exceeds by ~1-2 MB at any chunk size (17.88 MB
    at chunk 256, 16.48 even at 64).  Raising the per-compile limit to
    the ~20 MB the B=32 program already enjoys keeps ONE kernel shape
    for every batch size (B=64 measured 436 img/s vs r3's 400).  B<=32
    keeps the compiler default — its natural budget suffices.  Override
    or disable with SOD_SCOPED_VMEM_KIB (0 = compiler default).
    """
    import os

    kib = int(os.environ.get("SOD_SCOPED_VMEM_KIB",
                             20480 if micro_batch >= 48 else 0))
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        on_tpu = False
    if on_tpu and kib > 0:
        return jax.jit(fn, compiler_options={
            "xla_tpu_scoped_vmem_limit_kib": kib})
    return jax.jit(fn)


def make_train_step(cfg: Config, tx: optax.GradientTransformation,
                    mcfg: Optional[MaskFormerConfig] = None,
                    accum_steps: int = 1) -> Callable:
    """Build the jitted train step.

    batch: {"image": [B, H, W, 3], "gt_masks": [B, M, Hm, Wm] float,
            "gt_valid": [B, M] bool, "labels": [B] int}
    returns (params, opt_state, metrics-dict).

    :param accum_steps: gradient accumulation — B must be divisible by it;
        the batch is split into ``accum_steps`` micro-batches scanned
        inside the jit (grads averaged, ONE optimizer update), letting the
        effective batch exceed what fits in HBM at once.

        Semantics are deliberately *averaged-micro-loss*, not exact
        full-batch equivalence: the supervised-InfoNCE term sees only the
        micro-batch's negatives, and each micro loss is normalised by its
        own valid-image count.  ``tests/test_train_e2e.py`` asserts
        exactly this property (accum grads == mean of per-micro-batch
        grads); with ``weight_contrastive_loss=0`` and uniform valid
        counts it coincides with the full-batch loss.
    """
    if mcfg is None:
        mcfg = config_from(cfg)
    use_cls = not cfg.use_binary_classifier  # trainer pyc 113-117
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def loss_fn(params, batch):
        x = batch["image"]
        if x.dtype == jnp.uint8:
            # uint8-shipped batch (loader ``train_u8`` mode): ImageNet
            # normalization happens HERE on device — identical math to
            # the host ``augment.normalize``, 4x less transfer
            from sod_tpu.data.augment import normalize_device

            x = normalize_device(x)
        x = x.astype(compute_dtype)
        out = maskformer_apply(params, x, mcfg, train=True)
        # resnet encoder: EMA-updated BatchNorm buffers to merge back into
        # params after the optimizer step (ViT path: empty)
        bn_stats = out.get("batch_stats", {})
        res = criterion_forward(
            out["mask_pred"].astype(jnp.float32),
            batch["gt_masks"].astype(jnp.float32),
            batch["gt_valid"],
            out.get("objectness"),
            use_classification_loss=use_cls,
            features=out["features"].astype(jnp.float32),
            feature_labels=batch.get("labels"),
            weight_contrastive_loss=cfg.weight_contrastive_loss,
            temperature=cfg.temperature,
        )
        return res["loss"], (res, bn_stats)

    def _metrics(loss, res, grads):
        return {
            "loss": loss,
            "dice_loss": res["avg_dice_loss"],
            "ranking_loss": res["avg_ranking_loss"],
            "classification_loss": res["avg_classification_loss"],
            "contrastive_loss": res["avg_contrastive_loss"],
            "iou": res["avg_iou"],
            "grad_norm": optax.global_norm(grads),
        }

    from sod_tpu.models.resnet import merge_bn_stats

    micro_b = max(1, cfg.batch_size // max(1, accum_steps))
    if accum_steps <= 1:
        @functools.partial(_jit_train, micro_batch=micro_b)
        def train_step(params, opt_state, batch):
            (loss, (res, bn_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = merge_bn_stats(params, bn_stats)
            return params, opt_state, _metrics(loss, res, grads)

        return train_step

    @functools.partial(_jit_train, micro_batch=micro_b)
    def train_step_accum(params, opt_state, batch):
        def micro(b):
            return jax.tree.map(
                lambda x: x.reshape((accum_steps, -1) + x.shape[1:]), b)

        micro_batches = micro(batch)
        grads0 = jax.tree.map(jnp.zeros_like, params)

        def body(carry, mb):
            acc, loss_acc = carry
            (loss, (res, bn_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, mb)
            acc = jax.tree.map(jnp.add, acc, grads)
            return (acc, loss_acc + loss), (res, bn_stats)

        (grads, loss_sum), (all_res, all_stats) = jax.lax.scan(
            body, (grads0, jnp.float32(0.0)), micro_batches)
        grads = jax.tree.map(lambda g: g / accum_steps, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # BN buffers: one EMA update per optimizer step, using the mean of
        # the micro-batches' updated stats (torch under accumulation would
        # update sequentially per forward; documented averaged semantics,
        # same spirit as the averaged-micro-loss above)
        params = merge_bn_stats(
            params, jax.tree.map(lambda a: a.mean(axis=0), all_stats))
        res_mean = jax.tree.map(lambda a: a.mean(axis=0), all_res)
        return params, opt_state, _metrics(loss_sum / accum_steps,
                                           res_mean, grads)

    return train_step_accum


def make_eval_step(cfg: Config,
                   mcfg: Optional[MaskFormerConfig] = None) -> Callable:
    """Forward-only step returning last-layer masks + objectness
    (ref evaluator pyc 199-205 takes the last decoder layer)."""
    if mcfg is None:
        mcfg = config_from(cfg)
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    @jax.jit
    def eval_step(params, image):
        if image.dtype == jnp.uint8:
            # uint8-shipped batch (train_ship_uint8 / canvas shipping):
            # same device-side normalize as the train step — without it
            # the trainer's visualization path would run the model on
            # raw 0-255 pixels
            from sod_tpu.data.augment import normalize_device

            image = normalize_device(image)
        out = maskformer_apply(params, image.astype(compute_dtype), mcfg,
                               fused=True)
        mask_pred = out["mask_pred"][:, -1].astype(jnp.float32)   # [B, Q, h, w]
        objectness = out["objectness"][:, -1, :, 0].astype(jnp.float32)  # [B, Q]
        return {"mask_pred": mask_pred, "objectness": objectness}

    return eval_step
