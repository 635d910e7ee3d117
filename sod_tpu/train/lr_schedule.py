"""Poly LR schedule with linear warmup (ref ``utils/lr_scheduler.py:4-41``).

The reference steps per iteration with factor ``(1 - T/total)^0.9`` after a
linear warmup.  Faithfully-reproducible quirk: the reference wraps its
iteration counter every epoch (``self.cur_iter %= self.n_iters_per_epoch``,
``utils/lr_scheduler.py:38``), so T never exceeds one epoch's iterations
and the decay effectively restarts each epoch — the shipped results were
trained with that behaviour.  ``cycle_iters`` reproduces it; leave ``None``
for the intended monotone decay.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def poly_schedule(base_lr: float, total_iters: int, warmup_iters: int = 0,
                  power: float = 0.9,
                  cycle_iters: Optional[int] = None) -> optax.Schedule:
    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        if cycle_iters:
            # reference wrap: ``get_lr`` computes the factor BEFORE
            # ``cur_iter %= n; cur_iter += 1`` (utils/lr_scheduler.py:38),
            # so T runs 0, 1..n, 1..n, ... — it revisits 0 only at the
            # very first step (a plain mod would produce a zero-LR
            # warmup step at the top of EVERY epoch)
            t = jnp.where(t <= cycle_iters, t,
                          jnp.mod(t - 1, cycle_iters) + 1)
        factor = jnp.where(
            (warmup_iters > 0) & (t < warmup_iters),
            t / max(warmup_iters, 1),
            jnp.maximum(1.0 - t / total_iters, 0.0) ** power,
        )
        return base_lr * factor

    return schedule
