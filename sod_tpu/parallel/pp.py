"""Pipeline parallelism (GPipe) over the ViT block stack.

The reference is single-GPU torch with no model parallelism of any kind
(SURVEY §2 parallelism table: TP/PP/SP/EP all absent; the only scaffolding
is a dormant ``DistributedSampler``, ``datasets/base_dataset.py:138-164``).
This module is the TPU-native pipeline axis of the scaling story, joining
``parallel/mesh.py`` (DP) and ``parallel/tp.py`` (TP): encoders whose
stacked weights exceed one chip's HBM (ViT-g scale at canvas resolutions)
shard *layers* over a ``pipe`` mesh axis instead of *features*.

The encoder is already a ``lax.scan`` over per-layer stacked params
(``models/vit.py``), which maps onto a pipeline directly: shard the
stacked params' leading ``L`` axis over ``pipe`` so each device owns
``L / n_pipe`` contiguous blocks, split the batch into micro-batches, and
circulate activations stage-to-stage with ``lax.ppermute`` over ICI — the
classic collective-permute pipeline (GPipe schedule).  ``shard_map`` makes
the per-stage program explicit; gradients flow through the ``ppermute``
(its transpose is the reverse permute), so the SAME pipelined function
serves training — proven equal to the single-device step in
``tests/test_pipeline_parallel.py`` and the driver's ``dryrun_multichip``.

Schedule and cost model: with ``S`` stages and ``M`` micro-batches the
loop runs ``M + S - 1`` ticks, so the bubble fraction is
``(S - 1) / (M + S - 1)`` — pick ``M >= S`` (default ``M = S``).  Stages
in the bubble compute on zeros and their outputs are masked off; that
wasted compute is the textbook GPipe trade and is documented rather than
hidden.

Composability: the mesh is ``(data, pipe)`` — the batch additionally
shards over ``data`` exactly like the pure-DP path (each pipeline stage
processes its data-shard of every micro-batch).  Everything outside the
encoder (patchify, decoder, heads, loss) runs under plain GSPMD with
replicated weights, as in the DP/TP paths.

Pallas kernels (flash attention, fused blocks) are per-device programs
and could in principle run inside each stage, but the pipelined path is
validated on the XLA ops only — ``pp_vit_apply`` raises on the fused
flags, mirroring ``tp.assert_tp_compatible``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sod_tpu.models.vit import ViTConfig, _block_apply, prepare_tokens
from sod_tpu.ops.layers import layer_norm


def make_mesh_pp(n_data: Optional[int] = None, n_pipe: int = 1,
                 devices=None) -> Mesh:
    """A ``(data, pipe)`` mesh.  ``n_data=None`` uses all remaining
    devices after the pipe axis."""
    if devices is None:
        devices = jax.devices()
    if n_pipe < 1:
        raise ValueError(f"n_pipe must be >= 1, got {n_pipe}")
    if n_data is None:
        n_data = len(devices) // n_pipe
    total = n_data * n_pipe
    if total > len(devices) or total < 1:
        raise ValueError(
            f"requested {n_data}x{n_pipe} devices, have {len(devices)}")
    grid = np.asarray(devices[:total]).reshape(n_data, n_pipe)
    return Mesh(grid, axis_names=("data", "pipe"))


def _pipe_size(mesh: Mesh) -> int:
    return mesh.shape.get("pipe", 1) if "pipe" in mesh.axis_names else 1


def pp_specs(params, n_pipe: int, depth: int):
    """PartitionSpec pytree: encoder block stacks shard their leading
    (layer) axis over ``pipe``; every other leaf replicates.

    A leaf is layer-stacked iff its path goes through a ``blocks`` /
    ``blocks_q`` dict key AND its leading axis equals ``depth``.  The
    decoder's ``layers`` stack stays replicated — only the encoder runs
    through the pipeline stages; decoder/heads execute on every device
    under plain GSPMD.
    """
    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    leaves, treedef = tree_flatten_with_path(params)
    out = []
    for path, leaf in leaves:
        keys = [getattr(e, "key", None) for e in path]
        stacked = any(k in ("blocks", "blocks_q") for k in keys)
        if (stacked and getattr(leaf, "ndim", 0) >= 1
                and leaf.shape[0] == depth and depth % n_pipe == 0
                and n_pipe > 1):
            out.append(P("pipe"))
        else:
            out.append(P())
    return tree_unflatten(treedef, out)


def pp_param_shardings(params, mesh: Mesh, depth: int):
    specs = pp_specs(params, _pipe_size(mesh), depth)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params_pp(params, mesh: Mesh, depth: int):
    """device_put the param tree with block stacks layer-sharded over
    ``pipe`` (everything else replicated)."""
    return jax.tree.map(jax.device_put, params,
                        pp_param_shardings(params, mesh, depth))


def assert_pp_compatible(cfg, mesh: Mesh, n_micro: int) -> None:
    """Fail loudly on configs the pipelined path does not cover."""
    if _pipe_size(mesh) <= 1:
        return
    from sod_tpu.parallel.mesh import assert_xla_path

    assert_xla_path(
        cfg,
        f"pipeline parallelism (pipe axis {_pipe_size(mesh)}) requires "
        "the XLA path",
        "the pipelined stage program is validated on XLA ops only "
        "(see parallel/pp.py docstring)")
    if n_micro < 1:
        raise ValueError(f"n_micro must be >= 1, got {n_micro}")


def _pipeline_blocks(blocks, norm, tokens: jax.Array, cfg: ViTConfig,
                     mesh: Mesh, n_micro: int,
                     token_mask: Optional[jax.Array] = None,
                     block_fn=None, block_specs=None) -> jax.Array:
    """Run the block stack as a GPipe pipeline over the mesh's ``pipe``
    axis.  Returns the final-LayerNormed per-layer token stack
    [L, B, 1+N, D] — exactly ``vit_apply(all_layers=True)``'s contract.

    :param block_fn: per-block apply ``(bp, x, cfg, key_mask) -> x`` run
        inside the stage program (default :func:`_block_apply`).  A 3-D
        ``(data, pipe, model)`` mesh plugs in the tensor-parallel block
        here (``parallel/p3.py``) — its ``psum`` over ``model`` composes
        with this loop's ``ppermute`` over ``pipe`` because shard_map
        makes every mesh axis manual.
    :param block_specs: per-leaf PartitionSpecs for ``blocks`` (default
        ``P("pipe")`` on every leaf — layer-sharded, feature-replicated).
    """
    S = _pipe_size(mesh)
    L = cfg.depth
    if L % S != 0:
        raise ValueError(f"depth {L} not divisible by pipe axis {S}")
    B = tokens.shape[0]
    if B % n_micro != 0:
        raise ValueError(f"batch {B} not divisible by n_micro {n_micro}")
    per_stage = L // S
    M = n_micro
    mb = B // M
    micro = tokens.reshape((M, mb) + tokens.shape[1:])
    has_data = "data" in mesh.axis_names and mesh.shape["data"] > 1
    if has_data and mb % mesh.shape["data"] != 0:
        raise ValueError(
            f"micro-batch {mb} (batch {B} / n_micro {M}) not divisible by "
            f"data axis {mesh.shape['data']}")
    dspec = "data" if has_data else None
    mask_micro = None
    if token_mask is not None:
        mask_micro = token_mask.reshape((M, mb) + token_mask.shape[1:])

    if block_fn is None:
        block_fn = lambda bp, x_, cfg_, km: _block_apply(bp, x_, cfg_,
                                                         key_mask=km)
    if block_specs is None:
        block_specs = jax.tree.map(lambda _: P("pipe"), blocks)
    norm_specs = jax.tree.map(lambda _: P(), norm)
    in_specs = (block_specs, norm_specs, P(None, dspec),
                P(None, dspec) if mask_micro is not None else P())
    out_specs = P(None, "pipe", dspec)

    def stage(local_blocks, norm_p, mbs, kmasks):
        # per-device program: ``local_blocks`` leaves carry [per_stage, ...]
        idx = jax.lax.axis_index("pipe")

        def run(x, km):
            def body(c, bp):
                out = block_fn(bp, c, cfg, km)
                return out, layer_norm(norm_p, out, cfg.ln_eps)

            return jax.lax.scan(body, x, local_blocks)

        state0 = jnp.zeros_like(mbs[0])
        coll0 = jnp.zeros((M, per_stage) + mbs.shape[1:], mbs.dtype)

        def tick(carry, t):
            state, coll = carry
            # stage 0 injects micro-batch t (clipped in the drain ticks —
            # its masked-off output is never collected); later stages use
            # the activation ppermuted in from upstream
            t_in = jnp.clip(t, 0, M - 1)
            inj = jax.lax.dynamic_index_in_dim(mbs, t_in, 0, keepdims=False)
            x_in = jnp.where(idx == 0, inj, state)
            # the key mask belongs to the micro-batch THIS stage is
            # processing at tick t (micro-batch t - idx)
            w = jnp.clip(t - idx, 0, M - 1)
            km = None
            if kmasks is not None:
                km = jax.lax.dynamic_index_in_dim(kmasks, w, 0,
                                                  keepdims=False)
            final, normed = run(x_in, km)   # [mb,N,D], [per_stage,mb,N,D]
            valid = (t - idx >= 0) & (t - idx < M)
            cur = jax.lax.dynamic_index_in_dim(coll, w, 0, keepdims=False)
            coll = jax.lax.dynamic_update_index_in_dim(
                coll, jnp.where(valid, normed, cur), w, 0)
            nxt = jax.lax.ppermute(final, "pipe",
                                   [(i, i + 1) for i in range(S - 1)])
            return (nxt, coll), None

        (_, coll), _ = jax.lax.scan(tick, (state0, coll0),
                                    jnp.arange(M + S - 1))
        return coll                        # [M, per_stage, mb, N, D]

    if mask_micro is None:
        fn = lambda b, n, m: stage(b, n, m, None)
        in_specs = in_specs[:3]
        args = (blocks, norm, micro)
    else:
        fn = stage
        args = (blocks, norm, micro, mask_micro)

    coll = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(*args)
    # [M, L, mb, N, D] -> [L, M, mb, N, D] -> [L, B, N, D]
    lbnd = jnp.moveaxis(coll, 1, 0)
    return lbnd.reshape((L, B) + tokens.shape[1:])


def pp_vit_apply(params: dict, x: jax.Array, cfg: ViTConfig,
                 mesh: Mesh, n_micro: Optional[int] = None,
                 all_layers: bool = True,
                 token_mask: Optional[jax.Array] = None,
                 pos_embed_override: Optional[jax.Array] = None) -> jax.Array:
    """``vit_apply`` with the block stack pipelined over ``mesh``'s
    ``pipe`` axis (GPipe, ``n_micro`` micro-batches; default = the number
    of stages).  Identical math to the unfused ``vit_apply`` — asserted
    in ``tests/test_pipeline_parallel.py``.
    """
    if cfg.use_flash or cfg.fused_mlp or cfg.fused_train:
        raise ValueError(
            "pp_vit_apply requires the XLA block path "
            "(use_flash/fused_mlp/fused_train off) — see parallel/pp.py")
    if n_micro is None:
        n_micro = _pipe_size(mesh)
    tokens, _ = prepare_tokens(params, x, cfg, pos_embed_override)
    stack = _pipeline_blocks(params["blocks"], params["norm"], tokens, cfg,
                             mesh, n_micro, token_mask)
    if all_layers:
        return stack                       # [L, B, 1+N, D]
    return stack[-1]                       # == layer_norm(final tokens)


def make_pp_apply(mesh: Mesh, n_micro: Optional[int] = None):
    """A ``maskformer_apply``-compatible callable whose ViT encoder runs
    pipelined over ``mesh``.  Drop-in for ``make_train_step(apply_fn=...)``
    and direct forward calls; decoder/heads run under plain GSPMD.
    """
    from sod_tpu.models.maskformer import maskformer_apply

    def apply_fn(params, x, mcfg, train: bool = False, **kw):
        enc = functools.partial(pp_vit_apply, cfg=mcfg.vit, mesh=mesh,
                                n_micro=n_micro, all_layers=False)
        return maskformer_apply(params, x, mcfg, train=train,
                                encoder_apply=lambda p, xx: enc(p, xx), **kw)

    return apply_fn
