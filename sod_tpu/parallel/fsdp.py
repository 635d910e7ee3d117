"""ZeRO / FSDP-style state sharding over the ``data`` mesh axis.

The reference is single-GPU torch (its AdamW state and fp32 weights live
whole on the one device, ``main.py`` pyc optimizer build; SURVEY §2
parallelism table) — it has no optimizer-state or parameter sharding of
any kind.  This module adds both, the TPU-native way: the SAME ``data``
axis the batch shards over also shards the *training state*, and XLA
GSPMD inserts the all-gathers / reduce-scatters over ICI.  No new mesh
shape is needed — this composes with the plain 1-D data mesh
(``parallel/mesh.py``).

Two levels (``Config.fsdp``):

* ``"zero1"`` — optimizer-moment sharding (ZeRO stage 1, Rajbhandari et
  al. 2020).  Params stay fully replicated, so **every compute path
  works unchanged — including the Pallas fused-train kernels** (they see
  replicated weights exactly as before).  Only AdamW's fp32 ``mu``/``nu``
  shard over ``data``; the update math is elementwise, so each device
  updates its moment shard and GSPMD all-gathers the (bf16-sized) weight
  delta.  For AdamW this removes ~2/3 of the training-state memory on
  each chip at 8-way data parallelism (moments are 2x fp32 vs the bf16
  params).
* ``"full"`` — parameters shard too (FSDP / ZeRO-3 storage).  Weights are
  *stored* sharded and GSPMD all-gathers each one where the forward uses
  it, then reduce-scatters its gradient — the classic
  weights-stationary-in-shards schedule, expressed purely as sharding
  annotations.  Requires the XLA compute path (Pallas kernels are
  single-shard programs and cannot consume sharded weight operands) —
  ``assert_fsdp_compatible`` enforces this loudly, mirroring
  ``tp.assert_tp_compatible``.

Sharding rule: each leaf shards its LARGEST axis divisible by the
``data`` size; leaves smaller than ``min_size`` elements (LayerNorms,
biases, the tiny heads) stay replicated — gathering a 384-float vector
costs more latency than the bytes are worth.  Non-divisible leaves fall
back to replicated per-leaf (correctness first), same policy as
``tp.tp_specs``.

The train step's *output* layouts are pinned via ``jit``'s
``out_shardings`` (threaded through ``train/step.py``): without the pin,
GSPMD's layout solver is free to return replicated moments and silently
un-do the memory saving.

Composability: ``zero1`` composes with every mesh shape — on a 2-D
``(data, model)`` / ``(data, pipe)`` / ``(data, seq)`` mesh the moments
keep the sharding of the param they mirror (Megatron TP rules, GPipe
layer sharding, replicated under SP) and ADD ``data`` on the largest
still-unsharded divisible axis (:func:`zero1_moment_shardings`) — the
standard Megatron+ZeRO-1 production recipe.  ``full`` remains exclusive
with TP/PP/SP: those already shard the stored weights on their own axes,
and double-sharding the storage buys nothing at this model scale
(``docs/PARALLEL.md``).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# leaves below this many elements stay replicated: at ViT-S scale this
# keeps LayerNorm scales/biases, the cls token and the tiny decoder query
# embeddings whole while sharding every matmul weight and pos embedding
MIN_SHARD_SIZE = 16384

_LEVELS = ("none", "zero1", "full")


def _data_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get("data", 1) if "data" in mesh.axis_names else 1


def _add_data_axis(base: P, shape, n: int, min_size: int) -> P:
    """``base`` with ``"data"`` added on the largest still-unsharded
    ``n``-divisible axis (``base`` unchanged if the leaf is too small or
    no axis qualifies)."""
    size = 1
    for s in shape:
        size *= s
    if n <= 1 or not shape or size < min_size:
        return base
    ent = tuple(base) + (None,) * (len(shape) - len(tuple(base)))
    for d in sorted(range(len(shape)), key=lambda i: shape[i],
                    reverse=True):
        if ent[d] is None and shape[d] % n == 0:
            return P(*[("data" if i == d else e)
                       for i, e in enumerate(ent)])
    return base


def fsdp_specs(params, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """PartitionSpec pytree sharding each large-enough leaf's largest
    ``data``-divisible axis (identity — all ``P()`` — on a 1-device data
    axis)."""
    n = _data_axis_size(mesh)
    return jax.tree.map(
        lambda leaf: _add_data_axis(P(), getattr(leaf, "shape", ()), n,
                                    min_size),
        params)


def zero1_moment_shardings(params_sharded, mesh: Mesh,
                           min_size: int = MIN_SHARD_SIZE):
    """The ZeRO-1 moment layout: each param's OWN sharding (TP/PP layouts
    pass through; replicated under plain DP and SP) with ``data`` added on
    the largest still-unsharded divisible axis.  This is what the fp32
    AdamW moments shard to while the params they mirror keep their
    compute layout — composes with every mesh shape."""
    n = _data_axis_size(mesh)

    def sh(leaf):
        base = getattr(leaf, "sharding", None)
        spec = base.spec if isinstance(base, NamedSharding) else P()
        return NamedSharding(
            mesh, _add_data_axis(spec, getattr(leaf, "shape", ()), n,
                                 min_size))

    return jax.tree.map(sh, params_sharded)


def fsdp_param_shardings(params, mesh: Mesh, min_size: int = MIN_SHARD_SIZE):
    """NamedSharding pytree for :func:`fsdp_specs`."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        fsdp_specs(params, mesh, min_size),
                        is_leaf=lambda x: isinstance(x, P))


def shard_params_fsdp(params, mesh: Mesh):
    """device_put the param tree stored-sharded over ``data`` (the
    ``"full"`` level)."""
    return jax.tree.map(jax.device_put, params,
                        fsdp_param_shardings(params, mesh))


def assert_fsdp_compatible(cfg, mesh: Mesh) -> None:
    """Fail loudly on configurations the FSDP path does not cover."""
    level = getattr(cfg, "fsdp", "none")
    if level not in _LEVELS:
        raise ValueError(f"Config.fsdp must be one of {_LEVELS}, "
                         f"got {level!r}")
    if level == "none":
        return
    if mesh is None or _data_axis_size(mesh) <= 1:
        raise ValueError(
            f"fsdp={level!r} needs a data mesh axis > 1 to shard over "
            "(Config.mesh_data_axis / --n_devices)")
    other = [a for a in ("model", "pipe", "seq")
             if a in mesh.axis_names and mesh.shape[a] > 1]
    if level == "full" and other:
        # zero1 composes (moments add "data" on top of the params' own
        # TP/PP layout, zero1_moment_shardings); full does not — TP/PP
        # already store the weights sharded on their own axes
        raise ValueError(
            f"fsdp='full' is mutually exclusive with the {other} mesh "
            "axes — TP/PP shard the stored weights on their own axes; "
            "use fsdp='zero1' to shard the moments on top (see "
            "parallel/fsdp.py docstring)")
    if level == "full":
        from sod_tpu.parallel.mesh import assert_xla_path

        assert_xla_path(
            cfg,
            "fsdp='full' stores the weights sharded, which requires "
            "the XLA compute path",
            "Pallas kernels are single-shard programs (zero1 composes "
            "with them; see parallel/fsdp.py)")
