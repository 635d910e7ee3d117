"""Optimizer assembly (ref: AdamW lr 6e-6 wd 0.01, grad-clip 1.0 — yaml
``configs/...yaml:51-56`` + trainer pyc 60-68 ``clip_grad_norm_(params, 1)``)."""
from __future__ import annotations

import jax
import optax

from sod_tpu.config import Config
from sod_tpu.train.lr_schedule import poly_schedule


def param_labels(params) -> object:
    """'train' for trainable leaves, 'freeze' for BatchNorm running-stat
    buffers (leaf keys ``mean``/``var``, only present in resnet BN dicts —
    torch registers them as buffers, so neither gradients nor weight decay
    may touch them; the train step updates them by EMA instead)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: ("freeze" if getattr(path[-1], "key", None)
                         in ("mean", "var") else "train"), params)


def build_optimizer(cfg: Config, n_iters_per_epoch: int,
                    faithful_lr_cycle: bool = True) -> optax.GradientTransformation:
    """AdamW + global-norm clip + per-iteration poly schedule.

    :param faithful_lr_cycle: reproduce the reference scheduler's per-epoch
        counter wrap (see ``lr_schedule.py``); True matches the shipped
        training run.
    """
    total = cfg.n_epochs * n_iters_per_epoch
    schedule = poly_schedule(
        cfg.lr,
        total_iters=total,
        warmup_iters=cfg.lr_warmup_duration * n_iters_per_epoch,
        cycle_iters=n_iters_per_epoch if faithful_lr_cycle else None,
    )
    if cfg.optimizer_type != "adamw":
        raise ValueError(f"unsupported optimizer_type {cfg.optimizer_type}")
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(
            {"train": optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                                  weight_decay=cfg.weight_decay),
             "freeze": optax.set_to_zero()},
            param_labels),
    )


def get_lr_scheduler(cfg: Config, n_iters_per_epoch: int, mode: str = "poly",
                     **kwargs):
    """Scheduler factory (ref ``utils/misc.py:154-160``; poly only)."""
    if mode != "poly":
        raise ValueError(
            f"Unsupported lr scheduler type: {mode} (currently [poly] "
            "supported)")
    from sod_tpu.train.lr_schedule import poly_schedule

    total = cfg.n_epochs * n_iters_per_epoch
    return poly_schedule(cfg.lr, total_iters=total,
                         warmup_iters=cfg.lr_warmup_duration
                         * n_iters_per_epoch, **kwargs)
