"""Tensor parallelism: Megatron-style sharding rules over the functional
param pytrees, on a 2-D ``(data, model)`` device mesh.

The reference is single-GPU torch and has no model parallelism at all
(its ``DistributedSampler`` scaffolding, ``datasets/base_dataset.py:138-164``,
is dormant data-parallel prep).  This module is the TPU-native scaling
story beyond pure DP: weights carry ``PartitionSpec`` annotations and XLA
GSPMD inserts the all-gathers/reduce-scatters over ICI — no hand-written
collectives, exactly the "annotate shardings, let the compiler place
collectives" recipe.

Rules (classic tensor parallel for transformer blocks):

* **column-parallel** (output features sharded; no communication in, an
  activation all-gather deferred to where the compiler wants it):
  the fused-QKV projection (``attn.qkv``), the decoder MHA in-projection
  (``in_proj``), the first MLP linear (``mlp.fc0`` / decoder ``linear1``).
  ``w[..., in, out]`` shards its LAST axis; the bias shards with it.
* **row-parallel** (input features sharded; the matmul's contraction is
  partial-summed and GSPMD inserts the all-reduce): the attention output
  projection (``attn.proj`` / ``out_proj``), the second MLP linear
  (``mlp.fc<last>`` / decoder ``linear2``).  ``w[..., in, out]`` shards
  its SECOND-TO-LAST axis; the bias (full output width) is replicated.
* everything else — LayerNorms, pos/query embeddings, the patchify
  projection, the small objectness/classifier heads, ResNet encoders —
  is replicated.

Stacked per-layer params (leading ``L`` axis from the ``lax.scan``
stacking) just shift the sharded axis right; the rules index from the
end so both stacked and unstacked linears work.

Any axis not divisible by the ``model`` mesh size falls back to
replicated for that leaf (correctness first; GSPMD handles mixed
sharded/replicated operands).

Pallas kernels (flash attention, fused blocks) are single-shard
programs: under a ``model`` axis > 1 the XLA einsum path must be used
(``Config.use_pallas_attention=False``, no ``use_fused_train``) —
``assert_tp_compatible`` enforces this loudly.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# linear-param dict keys whose OUTPUT features shard over "model"
_COLUMN_KEYS = ("qkv", "in_proj", "linear1")
# linear-param dict keys whose INPUT features shard over "model"
_ROW_KEYS = ("proj", "out_proj", "linear2")


def make_mesh_2d(n_data: Optional[int] = None, n_model: int = 1,
                 devices=None) -> Mesh:
    """A ``(data, model)`` mesh.  ``n_data=None`` uses all remaining
    devices after the model axis."""
    if devices is None:
        devices = jax.devices()
    if n_model < 1:
        raise ValueError(f"n_model must be >= 1, got {n_model}")
    if n_data is None:
        n_data = len(devices) // n_model
    total = n_data * n_model
    if total > len(devices) or total < 1:
        # total < 1 covers n_model > len(devices): len//n_model == 0 would
        # otherwise build a silent ZERO-device mesh that crashes obscurely
        # at the first NamedSharding
        raise ValueError(
            f"requested {n_data}x{n_model} devices, have {len(devices)}")
    grid = np.asarray(devices[:total]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def _is_linear(d: dict) -> bool:
    return isinstance(d, dict) and "w" in d and set(d) <= {"w", "b"}


def _col_spec(leaf, n_model):
    if leaf.shape[-1] % n_model != 0:
        return P()
    return P(*([None] * (leaf.ndim - 1)), "model")


def _row_spec_w(leaf, n_model):
    if leaf.ndim < 2 or leaf.shape[-2] % n_model != 0:
        return P()
    return P(*([None] * (leaf.ndim - 2)), "model", None)


def _linear_specs(lin: dict, kind: str, n_model: int) -> dict:
    if kind == "column":
        return {k: _col_spec(v, n_model) for k, v in lin.items()}
    out = {"w": _row_spec_w(lin["w"], n_model)}
    if "b" in lin:
        out["b"] = P()                      # full output width
    return out


def tp_specs(params, n_model: int):
    """PartitionSpec pytree for a model param tree under ``n_model``-way
    tensor parallelism (identity — all ``P()`` — at ``n_model=1``)."""

    def walk(node, key):
        if isinstance(node, dict):
            if _is_linear(node):
                if key in _COLUMN_KEYS:
                    return _linear_specs(node, "column", n_model)
                if key in _ROW_KEYS:
                    return _linear_specs(node, "row", n_model)
                return {k: P() for k in node}
            if key == "mlp" and node and all(k.startswith("fc") for k in node):
                # ViT-block MLP: fc0..fc{n-2} column-parallel, the last
                # row-parallel.  (The objectness head sits under "ffn",
                # not "mlp", and stays replicated — its 1-wide output
                # could not shard anyway.)
                last = f"fc{len(node) - 1}"
                return {k: _linear_specs(v, "row" if k == last else "column",
                                         n_model)
                        for k, v in node.items()}
            return {k: walk(v, k) for k, v in node.items()}
        return P()

    if n_model <= 1:
        return jax.tree.map(lambda _: P(), params)
    return walk(params, None)


def _model_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get("model", 1) if "model" in mesh.axis_names else 1


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree: TP specs when the mesh has a ``model`` axis
    > 1, fully replicated otherwise (so 1-D data meshes behave exactly as
    before)."""
    specs = tp_specs(params, _model_axis_size(mesh))
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, mesh: Mesh):
    """device_put the param tree with its TP (or replicated) shardings."""
    sh = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)


def _path_str(entry) -> str:
    """Normalize a tree-path entry (DictKey/GetAttrKey/SequenceKey) to a
    comparable string."""
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)          # pragma: no cover - future key kinds


def opt_state_shardings(tx, params_sharded, param_shardings=None):
    """Sharding pytree for ``tx.init(params)`` mirroring the params' own
    layout.

    Optimizer moments (Adam's mu/nu etc.) are param-pytrees embedded in
    the optax state, so every moment leaf's tree path ENDS WITH the path
    of the param it mirrors — match by (path suffix, shape) and reuse
    that param's sharding; everything else (step counters, masked-state
    wrappers' scalars) replicates.  No jit involved: ``jit(tx.init)``
    without out_shardings does NOT propagate input shardings (init has
    no data dependency on the param values — it zeros_like them), which
    would commit the full fp32 moment buffers to ONE device.

    :param param_shardings: optional NamedSharding pytree to mirror
        INSTEAD of the params' own ``.sharding`` — the ZeRO-1 hook
        (``parallel/fsdp.py``): moments shard over ``data`` while the
        params they mirror stay replicated.
    """
    from jax.tree_util import tree_flatten_with_path

    p_leaves, _ = tree_flatten_with_path(params_sharded)
    if param_shardings is None:
        sh_leaves = [leaf.sharding for _, leaf in p_leaves]
    else:
        # tree.map pairs by STRUCTURE, so an override built from a
        # different params tree fails loudly instead of positionally
        # mispairing (which by_shape below would silently degrade to
        # replicated — exactly the failure the pin exists to prevent)
        paired = jax.tree.map(lambda _, s: s, params_sharded,
                              param_shardings)
        sh_leaves = jax.tree.leaves(
            paired, is_leaf=lambda x: isinstance(x, NamedSharding))
    by_path = {tuple(_path_str(e) for e in path): sh
               for (path, _), sh in zip(p_leaves, sh_leaves)}
    by_shape = {}
    for (path, leaf), sh in zip(p_leaves, sh_leaves):
        by_shape.setdefault(leaf.shape, set()).add(sh)
    mesh = sh_leaves[0].mesh
    rep = NamedSharding(mesh, P())

    shapes = jax.eval_shape(tx.init, params_sharded)
    o_leaves, treedef = tree_flatten_with_path(shapes)
    out = []
    for path, leaf in o_leaves:
        p = tuple(_path_str(e) for e in path)
        sh = rep
        # longest suffix first: prefer the most specific param path (a
        # short top-level param name could alias a nested one's tail)
        for k in range(len(p), 0, -1):
            cand = by_path.get(p[-k:])
            if cand is not None:
                # suffix hit — take it only when the shapes agree (a
                # transformed-chain state could reuse a param name for a
                # different buffer)
                if by_shape.get(leaf.shape) and cand in by_shape[leaf.shape]:
                    sh = cand
                break
        out.append(sh)
    return jax.tree.unflatten(treedef, out)


def shard_opt_state(tx, params_sharded, opt_state=None,
                    param_shardings=None, shardings=None):
    """Optimizer state laid out like the params (moments carry the
    mirrored param's sharding, scalars replicate — see
    :func:`opt_state_shardings`; ``param_shardings`` overrides the
    mirrored layout, the ZeRO-1 hook; ``shardings`` supplies the full
    precomputed opt-state layout, skipping the recomputation).  With
    ``opt_state`` given (a restored checkpoint), its leaves are
    device_put onto that layout instead of re-initialising."""
    if shardings is None:
        shardings = opt_state_shardings(tx, params_sharded, param_shardings)
    if opt_state is None:
        return jax.jit(tx.init, out_shardings=shardings)(params_sharded)
    return jax.tree.map(
        lambda r, s: jax.device_put(jax.numpy.asarray(r), s),
        opt_state, shardings)


def assert_tp_compatible(cfg, mesh: Mesh) -> None:
    """Fail loudly when a >1 model axis meets a single-shard Pallas path."""
    if _model_axis_size(mesh) <= 1:
        return
    from sod_tpu.parallel.mesh import assert_xla_path

    assert_xla_path(
        cfg,
        f"tensor parallelism (model axis {_model_axis_size(mesh)}) "
        "requires the XLA path",
        "Pallas kernels are single-shard programs (wrapping them in "
        "shard_map is future work, see docs/PERFORMANCE.md)")
