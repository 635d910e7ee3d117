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


def _jit_train(fn, fused: bool = False, out_shardings=None):
    """jit; on TPU, fused-train programs get a raised scoped-VMEM limit.

    XLA's default scoped-VMEM budget (16.00-20.59 MB depending on live
    HBM buffers) is what forced the fused backward's score slabs into
    per-batch chunk sizes through round 4.  Raising the per-compile
    limit to 32 MB lets the backward run its score slab MONOLITHIC
    (``ops.fused_attn._BWD_CHUNK`` = the whole 896-token slab), which
    measured faster at EVERY batch size (456/450/447/416 img/s at
    B=32/48/64/128 vs 449/439/436/404 for the chunked per-batch policy;
    a 48 MB budget scheduled worse at B=48).  Applied only to
    fused-train jits — the plain-XLA step has no Pallas stack
    allocations to budget for.  Override or disable with
    SOD_SCOPED_VMEM_KIB (0 = compiler default).
    """
    import os

    kib = int(os.environ.get("SOD_SCOPED_VMEM_KIB",
                             32768 if fused else 0))
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        on_tpu = False
    # out_shardings pins the (params, opt_state, metrics) output layouts —
    # the FSDP/ZeRO path (parallel/fsdp.py) needs this: without the pin,
    # GSPMD's layout solver may return replicated moments and silently
    # un-do the sharding's memory saving
    kw = {} if out_shardings is None else {"out_shardings": out_shardings}
    if on_tpu and kib > 0:
        return jax.jit(fn, compiler_options={
            "xla_tpu_scoped_vmem_limit_kib": kib}, **kw)
    return jax.jit(fn, **kw)


def make_train_step(cfg: Config, tx: optax.GradientTransformation,
                    mcfg: Optional[MaskFormerConfig] = None,
                    accum_steps: int = 1, mode: str = "averaged",
                    apply_fn: Optional[Callable] = None,
                    out_shardings=None) -> Callable:
    """Build the jitted train step.

    batch: {"image": [B, H, W, 3], "gt_masks": [B, M, Hm, Wm] float,
            "gt_valid": [B, M] bool, "labels": [B] int}
    returns (params, opt_state, metrics-dict).

    :param accum_steps: gradient accumulation — B must be divisible by it;
        the batch is split into ``accum_steps`` micro-batches scanned
        inside the jit (ONE optimizer update), letting the effective
        batch exceed what fits in HBM at once.
    :param apply_fn: optional ``maskformer_apply``-compatible override
        ``(params, x, mcfg, train=...) -> out dict`` — the hook the
        pipeline-parallel path (``parallel/pp.py::make_pp_apply``) plugs
        a stage-sharded forward into; must be identical math.
    :param out_shardings: optional jit out_shardings for the
        ``(params, opt_state, metrics)`` return — the FSDP/ZeRO path
        (``parallel/fsdp.py``) pins the updated state back onto its
        sharded layout with this.
    :param mode: accumulation semantics (``Config.grad_accum_mode``):

        * ``"averaged"`` (default) — *averaged-micro-loss*: the
          supervised-InfoNCE term sees only the micro-batch's negatives,
          and each micro loss is normalised by its own valid-image
          count.  ``tests/test_train_e2e.py`` asserts exactly this
          property (accum grads == mean of per-micro-batch grads); with
          ``weight_contrastive_loss=0`` and uniform valid counts it
          coincides with the full-batch loss.
        * ``"exact"`` — full-batch-equivalent gradients via a
          GradCache-style two-pass (Gao et al. 2021, "Scaling Deep
          Contrastive Learning Batch Size under Memory Limited Setup"):
          pass 1 scans the micro-batches gradient-free to collect the
          pooled contrastive features of the WHOLE batch, differentiates
          the (cheap, [B, D]-sized) InfoNCE term against them, and pass
          2 re-runs each micro-batch under ``value_and_grad`` of
          ``main_loss_sum / n_valid_total + <features, cached_feature_grad>``
          — the accumulated gradient equals the accum_steps=1 gradient
          up to float reassociation (InfoNCE negatives span the full
          batch; ragged valid counts are normalised globally).  Costs
          one extra forward per micro-batch *only when the contrastive
          weight is non-zero*; with ``weight_contrastive_loss=0`` the
          feature pass is skipped and exact mode costs the same as
          averaged.  Asserted against the accum_steps=1 step in
          ``tests/test_train_e2e.py::test_exact_grad_accum...``.

        BN buffers (resnet arch) use averaged micro-batch statistics in
        BOTH modes (one EMA update per optimizer step).
    """
    if mode not in ("averaged", "exact"):
        raise ValueError(f"grad_accum mode must be 'averaged' or 'exact', "
                         f"got {mode!r}")
    if mcfg is None:
        mcfg = config_from(cfg)
    use_cls = not cfg.use_binary_classifier  # trainer pyc 113-117
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def forward(params, batch):
        x = batch["image"]
        if x.dtype == jnp.uint8:
            # uint8-shipped batch (loader ``train_u8`` mode): ImageNet
            # normalization happens HERE on device — identical math to
            # the host ``augment.normalize``, 4x less transfer
            from sod_tpu.data.augment import normalize_device

            x = normalize_device(x)
        x = x.astype(compute_dtype)
        if apply_fn is not None:
            return apply_fn(params, x, mcfg, train=True)
        return maskformer_apply(params, x, mcfg, train=True)

    def loss_fn(params, batch):
        out = forward(params, batch)
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
        @functools.partial(_jit_train, fused=cfg.use_fused_train,
                           out_shardings=out_shardings)
        def train_step(params, opt_state, batch):
            (loss, (res, bn_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = merge_bn_stats(params, bn_stats)
            return params, opt_state, _metrics(loss, res, grads)

        return train_step

    def micro(b):
        return jax.tree.map(
            lambda x: x.reshape((accum_steps, -1) + x.shape[1:]), b)

    if mode == "exact":
        return _make_exact_accum_step(cfg, tx, mcfg, accum_steps, micro_b,
                                      micro, forward, use_cls, _metrics,
                                      merge_bn_stats, out_shardings)

    @functools.partial(_jit_train,
                       fused=cfg.use_fused_train,
                       out_shardings=out_shardings)
    def train_step_accum(params, opt_state, batch):

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


def _make_exact_accum_step(cfg, tx, mcfg, accum_steps, micro_b, micro,
                           forward, use_cls, _metrics, merge_bn_stats,
                           out_shardings=None):
    """GradCache-style full-batch-equivalent gradient accumulation.

    The full-batch loss decomposes as
    ``(sum_k main_sum_k + w_c * InfoNCE(Z, y)) / n_valid_total`` where
    ``main_sum_k`` is micro-batch k's *unnormalised* per-image loss sum
    and the only cross-image coupling is the InfoNCE over the pooled
    features ``Z = concat(Z_k)``.  ``n_valid_total`` depends only on
    ``gt_valid`` (no forward needed), so:

    pass 1 (only if ``weight_contrastive_loss != 0``): scan the
    micro-batches without gradients, collect ``Z`` ([B, D], tiny), and
    take ``g_Z = d(w_c * InfoNCE(Z, y) / n_total) / dZ`` with one cheap
    backward over the loss head alone;

    pass 2: for each micro-batch, ``value_and_grad`` of the surrogate
    ``main_sum_k / n_total + <Z_k(params), g_Z_k>`` — by the chain rule
    the accumulated (summed, not averaged: the normalisation is already
    inside) gradients equal the accum_steps=1 gradient exactly, up to
    float reassociation.
    """
    from sod_tpu.losses.criterion import contrastive_loss

    use_con = cfg.weight_contrastive_loss != 0.0

    def micro_main(params, mb):
        out = forward(params, mb)
        bn_stats = out.get("batch_stats", {})
        res = criterion_forward(
            out["mask_pred"].astype(jnp.float32),
            mb["gt_masks"].astype(jnp.float32),
            mb["gt_valid"],
            out.get("objectness"),
            use_classification_loss=use_cls,
        )
        # criterion normalises by the MICRO valid count; recover the sum
        nk = jnp.maximum(mb["gt_valid"].any(axis=1).sum(), 1)
        main_sum = res["avg_loss"] * nk
        return main_sum, res, bn_stats, out

    @functools.partial(_jit_train,
                       fused=cfg.use_fused_train,
                       out_shardings=out_shardings)
    def train_step_exact(params, opt_state, batch):
        micro_batches = micro(batch)
        img_valid = batch["gt_valid"].any(axis=1)                  # [B]
        n_total = jnp.maximum(img_valid.sum(), 1).astype(jnp.float32)

        con_on = use_con and "labels" in batch
        if con_on:
            # ---- pass 1: features of the WHOLE batch, gradient-free ----
            def feat_body(_, mb):
                out = forward(params, mb)
                return None, out["features"].astype(jnp.float32)

            _, feats = jax.lax.scan(feat_body, None, micro_batches)
            z = feats.reshape(-1, feats.shape[-1])                  # [B, D]

            def con_term(zz):
                return (cfg.weight_contrastive_loss
                        * contrastive_loss(zz, batch["labels"],
                                           cfg.temperature, valid=img_valid)
                        / n_total)

            con_scaled, g_z = jax.value_and_grad(con_term)(z)
            con_raw = con_scaled * n_total / cfg.weight_contrastive_loss
            g_z_micro = g_z.reshape((accum_steps, micro_b) + g_z.shape[1:])
        else:
            con_scaled = jnp.float32(0.0)
            con_raw = jnp.float32(0.0)

        # ---- pass 2: main loss + cached-feature surrogate, with grad ----
        def surrogate(params, mb, gz):
            main_sum, res, bn_stats, out = micro_main(params, mb)
            s = main_sum / n_total
            if gz is not None:
                s = s + jnp.vdot(out["features"].astype(jnp.float32), gz)
            return s, (main_sum, res, bn_stats)

        grads0 = jax.tree.map(jnp.zeros_like, params)

        def body(carry, xs):
            acc, main_acc = carry
            mb, gz = xs if con_on else (xs, None)
            (_, (main_sum, res, bn_stats)), grads = jax.value_and_grad(
                surrogate, has_aux=True)(params, mb, gz)
            acc = jax.tree.map(jnp.add, acc, grads)
            # reweight the micro-normalised diagnostics back to sums
            nk = jnp.maximum(mb["gt_valid"].any(axis=1).sum(), 1)
            diag_sums = {k: res[k] * nk for k in
                         ("avg_dice_loss", "avg_ranking_loss",
                          "avg_classification_loss", "avg_iou")}
            return (acc, main_acc + main_sum), (diag_sums, bn_stats)

        xs = (micro_batches, g_z_micro) if con_on else micro_batches
        (grads, main_total), (diag, all_stats) = jax.lax.scan(
            body, (grads0, jnp.float32(0.0)), xs)

        loss = main_total / n_total + con_scaled
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = merge_bn_stats(
            params, jax.tree.map(lambda a: a.mean(axis=0), all_stats))
        res_full = {k: diag[k].sum(axis=0) / n_total for k in diag}
        res_full["avg_contrastive_loss"] = con_raw
        return params, opt_state, _metrics(loss, res_full, grads)

    return train_step_exact


def make_eval_step(cfg: Config,
                   mcfg: Optional[MaskFormerConfig] = None,
                   apply_fn: Optional[Callable] = None,
                   fused: bool = True) -> Callable:
    """Forward-only step returning last-layer masks + objectness
    (ref evaluator pyc 199-205 takes the last decoder layer).

    :param apply_fn: forward override for mesh configurations whose
        params the plain ``maskformer_apply`` cannot consume (the GPipe /
        ring-attention / 3-D-mesh stage programs, ``parallel/*.py``) —
        the Trainer passes the SAME apply_fn its train step uses.
    :param fused: route the encoder through the whole-block Pallas
        kernel.  Must be False whenever the params are sharded over a
        model axis or stored sharded (fsdp='full') — Pallas kernels are
        single-shard programs (``parallel/mesh.py::assert_xla_path``).
    """
    if mcfg is None:
        mcfg = config_from(cfg)
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    fwd = apply_fn or maskformer_apply

    @jax.jit
    def eval_step(params, image):
        if image.dtype == jnp.uint8:
            # uint8-shipped batch (train_ship_uint8 / canvas shipping):
            # same device-side normalize as the train step — without it
            # the trainer's visualization path would run the model on
            # raw 0-255 pixels
            from sod_tpu.data.augment import normalize_device

            image = normalize_device(image)
        kw = {} if apply_fn is not None else {"fused": fused}
        out = fwd(params, image.astype(compute_dtype), mcfg, **kw)
        mask_pred = out["mask_pred"][:, -1].astype(jnp.float32)   # [B, Q, h, w]
        objectness = out["objectness"][:, -1, :, 0].astype(jnp.float32)  # [B, Q]
        return {"mask_pred": mask_pred, "objectness": objectness}

    return eval_step
