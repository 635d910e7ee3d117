#!/usr/bin/env python
"""Measure the per-device training-state memory under Config.fsdp.

Runs the FLAGSHIP model (ViT-S/8 + nq20 decoder, the reference's
training target — /root/reference README.md:114-119 recipe) on the
8-device virtual CPU mesh and reports the bytes device 0 actually holds
for the stored params and the AdamW moments under fsdp = none / zero1 /
full.  This is the evidence behind docs/PARALLEL.md's "zero1 removes
~2/3 of the per-chip training-state memory" claim.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/measure_fsdp_memory.py
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sod_tpu.config import Config
from sod_tpu.models.maskformer import config_from, maskformer_init
from sod_tpu.parallel import (
    fsdp_param_shardings,
    make_mesh,
    opt_state_shardings,
    shard_opt_state,
    shard_params,
    shard_params_fsdp,
)
from sod_tpu.train.optim import build_optimizer


def per_device_bytes(tree, dev) -> int:
    total = 0
    for leaf in jax.tree.leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        for s in leaf.addressable_shards:
            if s.device == dev:
                total += s.data.nbytes
    return total


def main():
    n = len(jax.devices())
    if n < 2:
        raise SystemExit("need a multi-device mesh; set "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=8")
    cfg = Config()                     # flagship ViT-S/8 + nq20 decoder
    mcfg = config_from(cfg)
    params = maskformer_init(jax.random.key(0), mcfg)
    tx = build_optimizer(cfg, n_iters_per_epoch=100)
    mesh = make_mesh(n)
    dev = jax.devices()[0]
    mib = 1024 * 1024

    rows = []
    # none: everything replicated (the plain DP layout)
    p = shard_params(params, mesh)
    o = shard_opt_state(tx, p)
    rows.append(("none", per_device_bytes(p, dev), per_device_bytes(o, dev)))

    # zero1: params replicated, moments shard over data
    o = shard_opt_state(tx, p, param_shardings=fsdp_param_shardings(p, mesh))
    rows.append(("zero1", per_device_bytes(p, dev), per_device_bytes(o, dev)))

    # full: stored params shard too, moments mirror them
    p = shard_params_fsdp(params, mesh)
    o = shard_opt_state(tx, p,
                        shardings=opt_state_shardings(tx, p))
    rows.append(("full", per_device_bytes(p, dev), per_device_bytes(o, dev)))

    base = rows[0][1] + rows[0][2]
    print(f"{n}-device data mesh, flagship model "
          f"({sum(l.size for l in jax.tree.leaves(params)) / 1e6:.1f} M "
          "params)")
    print(f"{'fsdp':>6} | {'params/dev':>11} | {'moments/dev':>11} | "
          f"{'total/dev':>10} | vs none")
    for name, pb, ob in rows:
        tot = pb + ob
        print(f"{name:>6} | {pb / mib:>9.1f} MB | {ob / mib:>9.1f} MB | "
              f"{tot / mib:>8.1f} MB | {tot / base:.2f}x")


if __name__ == "__main__":
    main()
