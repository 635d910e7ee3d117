"""3-D mesh: data x pipeline x tensor parallelism composed.

The reference is single-GPU torch with no model parallelism of any kind
(SURVEY §2 parallelism table).  ``parallel/tp.py`` (Megatron feature
sharding via GSPMD), ``parallel/pp.py`` (GPipe layer sharding via
shard_map + ppermute) and ``parallel/mesh.py`` (DP) each own one mesh
axis; this module composes all three on a ``(data, pipe, model)`` mesh —
the production large-model recipe (data-parallel replicas of a pipeline
whose stages are tensor-parallel groups, "How to Scale Your Model" ch. 5).

Design: the GPipe stage program from ``parallel/pp.py`` already runs
under ``shard_map``, where EVERY mesh axis is manual — so tensor
parallelism inside a stage is just (a) weights sharded over ``model`` on
their Megatron axis in addition to ``pipe`` on the layer axis, and (b) a
``lax.psum`` over ``model`` after each row-parallel matmul (attention
out-projection and MLP fc1 — the classic two collectives per block).
``ppermute`` over ``pipe`` and ``psum`` over ``model`` compose freely in
one program; gradients flow through both (their transposes are the
reverse permute and broadcast), so the SAME function trains.

Head alignment: the packed qkv weight's (D, 3D) columns are laid out
``[3, H, hd]`` (q|k|v outermost — ``ops/attention.py:78-82``), so a
contiguous ``model`` shard of the packed matrix would split q/k/v
unevenly across ranks.  The stored layout under this mesh therefore
SPLITS qkv into separate q/k/v matrices (each (D, D), column layout
``[H, hd]`` — a contiguous shard IS a head group): ``p3_split_blocks`` /
``p3_merge_blocks`` convert, losslessly, between the standard packed
layout and the TP-split layout.  Checkpoint policy (see
``train/trainer.py``): ``latest_model`` stores the split layout verbatim
(resume with the same 3-D config is bit-exact); ``best_model_*`` and the
in-loop Evaluator handoff merge back to the standard layout so they stay
usable from every other configuration.

Like TP/PP/SP this is a capability at ViT-S scale, not a speedup —
``docs/PARALLEL.md`` has the cost model.  XLA path only (the stage
program is explicit shard_map); ``fsdp="zero1"`` composes on top
(``zero1_moment_shardings`` adds ``data`` over the split layout's own
pipe+model sharding).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sod_tpu.models.vit import ViTConfig, prepare_tokens
from sod_tpu.ops.attention import _merge_heads, _sdpa, _split_heads
from sod_tpu.ops.layers import gelu, layer_norm, linear
from sod_tpu.parallel.pp import _pipeline_blocks, _pipe_size


def make_mesh_3d(n_data: Optional[int] = None, n_pipe: int = 1,
                 n_model: int = 1, devices=None) -> Mesh:
    """A ``(data, pipe, model)`` mesh.  ``n_data=None`` uses all remaining
    devices after the pipe and model axes."""
    if devices is None:
        devices = jax.devices()
    if n_pipe < 1 or n_model < 1:
        raise ValueError(
            f"n_pipe/n_model must be >= 1, got {n_pipe}/{n_model}")
    if n_data is None:
        n_data = len(devices) // (n_pipe * n_model)
    total = n_data * n_pipe * n_model
    if total > len(devices) or total < 1:
        raise ValueError(f"requested {n_data}x{n_pipe}x{n_model} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:total]).reshape(n_data, n_pipe, n_model)
    return Mesh(grid, axis_names=("data", "pipe", "model"))


def _model_size(mesh: Mesh) -> int:
    return mesh.shape.get("model", 1) if "model" in mesh.axis_names else 1


# --------------------------------------------------------------- layout

def p3_split_blocks(blocks: dict) -> dict:
    """Standard packed block stack -> TP-split layout.

    ``attn.qkv`` (w (L, D, 3D), b (L, 3D)) becomes ``attn.q/k/v`` (each
    w (L, D, D), b (L, D)) so a contiguous ``model`` column shard is a
    whole head group; every other leaf passes through unchanged.
    Lossless — :func:`p3_merge_blocks` is the exact inverse.
    """
    attn = blocks["attn"]
    w, b = attn["qkv"]["w"], attn["qkv"].get("b")
    d = w.shape[1]
    out_attn = {"proj": attn["proj"]}
    for i, name in enumerate(("q", "k", "v")):
        leaf = {"w": w[:, :, i * d:(i + 1) * d]}
        if b is not None:
            leaf["b"] = b[:, i * d:(i + 1) * d]
        out_attn[name] = leaf
    return {**blocks, "attn": out_attn}


def p3_merge_blocks(blocks: dict) -> dict:
    """TP-split block stack -> standard packed layout (inverse of
    :func:`p3_split_blocks`).  Host (numpy) inputs stay on host — the
    ``p3_host_params`` boundary must not re-upload the biggest weight
    stacks through this box's ~MB/s tunnel just to concatenate them."""
    attn = blocks["attn"]
    cat = (np.concatenate if isinstance(attn["q"]["w"], np.ndarray)
           else jnp.concatenate)
    qkv = {"w": cat([attn[n]["w"] for n in ("q", "k", "v")], axis=-1)}
    if "b" in attn["q"]:
        qkv["b"] = cat([attn[n]["b"] for n in ("q", "k", "v")], axis=-1)
    return {**blocks, "attn": {"qkv": qkv, "proj": attn["proj"]}}


def p3_is_split(blocks: dict) -> bool:
    return "q" in blocks.get("attn", {})


def p3_block_specs(split_blocks: dict) -> dict:
    """PartitionSpecs for the TP-split stack on a (data, pipe, model)
    mesh: every leaf layer-shards over ``pipe``; the Megatron rules place
    ``model`` — column-parallel q/k/v and mlp.fc0 shard output features
    (+ bias), row-parallel proj and mlp.fc1 shard input features (bias
    replicated, added once after the psum); norms replicate.  Built by
    walking the ACTUAL tree (path-keyed rules), so bias-free configs
    (``qkv_bias=False``) just lack those entries."""
    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    col_w, row_w = P("pipe", None, "model"), P("pipe", "model", None)
    rules = {
        ("attn", "q", "w"): col_w, ("attn", "k", "w"): col_w,
        ("attn", "v", "w"): col_w, ("attn", "proj", "w"): row_w,
        ("mlp", "fc0", "w"): col_w, ("mlp", "fc1", "w"): row_w,
        ("attn", "q", "b"): P("pipe", "model"),
        ("attn", "k", "b"): P("pipe", "model"),
        ("attn", "v", "b"): P("pipe", "model"),
        ("mlp", "fc0", "b"): P("pipe", "model"),
    }
    leaves, treedef = tree_flatten_with_path(split_blocks)
    out = []
    for path, leaf in leaves:
        key = tuple(getattr(e, "key", None) for e in path)
        spec = rules.get(key)
        if spec is None:
            # proj/fc1 bias, norm scale/bias: pipe on the layer axis only
            spec = P(*(("pipe",) + (None,) * (getattr(leaf, "ndim", 1) - 1)))
        out.append(spec)
    return tree_unflatten(treedef, out)


def p3_param_shardings(params: dict, mesh: Mesh, depth: int):
    """NamedSharding pytree for the FULL model with the encoder blocks in
    TP-split layout: blocks shard per :func:`p3_block_specs`, everything
    else replicates (decoder/heads run under plain GSPMD, as in pp)."""
    S = _pipe_size(mesh)
    if S > 1 and depth % S != 0:
        raise ValueError(f"depth {depth} not divisible by pipe axis {S}")
    def to_named(tree):
        return jax.tree.map(lambda s: NamedSharding(mesh, s), tree,
                            is_leaf=lambda x: isinstance(x, P))

    out = jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    enc = dict(out["encoder"])
    enc["blocks"] = to_named(p3_block_specs(params["encoder"]["blocks"]))
    out = dict(out)
    out["encoder"] = enc
    return out


def shard_params_p3(params: dict, mesh: Mesh, depth: int):
    """Split the encoder blocks into the TP layout and device_put the
    whole tree onto its (pipe, model) sharding.  ``params`` may already
    be in the split layout (a resumed p3 checkpoint)."""
    enc = dict(params["encoder"])
    if not p3_is_split(enc["blocks"]):
        enc["blocks"] = p3_split_blocks(enc["blocks"])
    params = dict(params)
    params["encoder"] = enc
    return jax.tree.map(jax.device_put, params,
                        p3_param_shardings(params, mesh, depth))


def p3_host_params(params: dict) -> dict:
    """Host copy in the STANDARD layout (packed qkv) — the boundary
    converter for best_model checkpoints and the Evaluator handoff."""
    params = jax.device_get(params)
    enc = dict(params["encoder"])
    if p3_is_split(enc["blocks"]):
        enc["blocks"] = p3_merge_blocks(enc["blocks"])
    out = dict(params)
    out["encoder"] = enc
    return out


def assert_p3_compatible(cfg, mesh: Mesh, vit_cfg: ViTConfig) -> None:
    """Fail loudly on configs the 3-D mesh path does not cover."""
    n_model = _model_size(mesh)
    if n_model <= 1 or _pipe_size(mesh) <= 1:
        return
    from sod_tpu.parallel.mesh import assert_xla_path

    assert_xla_path(
        cfg, "the (data, pipe, model) mesh requires the XLA path",
        "the stage program is explicit shard_map "
        "(see parallel/p3.py docstring)")
    if vit_cfg.depth % _pipe_size(mesh) != 0:
        raise ValueError(f"depth {vit_cfg.depth} not divisible by pipe "
                         f"axis {_pipe_size(mesh)}")
    for name, dim in (("n_heads", vit_cfg.n_heads),
                      ("embed_dim", vit_cfg.embed_dim),
                      ("mlp hidden", int(vit_cfg.embed_dim
                                         * vit_cfg.mlp_ratio))):
        if dim % n_model != 0:
            raise ValueError(
                f"{name} {dim} not divisible by model axis {n_model} — "
                "Megatron head/feature sharding needs even splits")


# -------------------------------------------------------- stage program

def _row_parallel(x: jax.Array, w: jax.Array, b) -> jax.Array:
    """Local partial matmul + psum over ``model`` + replicated bias —
    Megatron's g operator.  Mirrors ``ops.layers.linear`` numerics
    (fp32 accumulation and bias add) up to the psum reassociation."""
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    y = jax.lax.psum(y, "model")
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _block_apply_tp(bp: dict, x: jax.Array, cfg: ViTConfig,
                    key_mask: Optional[jax.Array]) -> jax.Array:
    """One transformer block with Megatron tensor parallelism over the
    manual ``model`` axis (ref block: ``vision_transformer.py:136-170``;
    identical math to ``models.vit._block_apply`` up to the two psum
    reassociations — asserted in ``tests/test_3d_mesh.py``).

    ``bp`` leaves are the LOCAL shards of the TP-split layout: q/k/v and
    fc0 carry this rank's output columns (whole heads), proj and fc1
    carry the matching input rows.
    """
    n_local_heads = bp["attn"]["q"]["w"].shape[-1] // (
        cfg.embed_dim // cfg.n_heads)
    scale = (cfg.embed_dim // cfg.n_heads) ** -0.5

    h = layer_norm(bp["norm1"], x, cfg.ln_eps)
    q = _split_heads(linear(bp["attn"]["q"], h), n_local_heads)
    k = _split_heads(linear(bp["attn"]["k"], h), n_local_heads)
    v = _split_heads(linear(bp["attn"]["v"], h), n_local_heads)
    out = _sdpa(q, k, v, scale, key_mask)          # this rank's heads
    y = _row_parallel(_merge_heads(out), bp["attn"]["proj"]["w"],
                      bp["attn"]["proj"].get("b"))
    x = x + y

    h2 = layer_norm(bp["norm2"], x, cfg.ln_eps)
    u = gelu(linear(bp["mlp"]["fc0"], h2))         # local hidden columns
    z = _row_parallel(u, bp["mlp"]["fc1"]["w"], bp["mlp"]["fc1"].get("b"))
    return x + z


def p3_vit_apply(params: dict, x: jax.Array, cfg: ViTConfig,
                 mesh: Mesh, n_micro: Optional[int] = None,
                 all_layers: bool = True,
                 token_mask: Optional[jax.Array] = None,
                 pos_embed_override: Optional[jax.Array] = None) -> jax.Array:
    """``vit_apply`` with the block stack pipelined over ``pipe`` AND
    tensor-parallel over ``model`` (``params["blocks"]`` must be in the
    TP-split layout — ``shard_params_p3``)."""
    if cfg.use_flash or cfg.fused_mlp or cfg.fused_train:
        raise ValueError(
            "p3_vit_apply requires the XLA block path "
            "(use_flash/fused_mlp/fused_train off) — see parallel/p3.py")
    if not p3_is_split(params["blocks"]):
        raise ValueError("p3_vit_apply needs the TP-split block layout — "
                         "shard with parallel.shard_params_p3 first")
    if n_micro is None:
        n_micro = _pipe_size(mesh)
    tokens, _ = prepare_tokens(params, x, cfg, pos_embed_override)
    stack = _pipeline_blocks(
        params["blocks"], params["norm"], tokens, cfg, mesh, n_micro,
        token_mask, block_fn=_block_apply_tp,
        block_specs=p3_block_specs(params["blocks"]))
    if all_layers:
        return stack                       # [L, B, 1+N, D]
    return stack[-1]


def make_p3_apply(mesh: Mesh, n_micro: Optional[int] = None):
    """A ``maskformer_apply``-compatible callable whose ViT encoder runs
    pipelined + tensor-parallel over ``mesh`` — drop-in for
    ``make_train_step(apply_fn=...)``; decoder/heads run under plain
    GSPMD exactly as in the pp path."""
    import functools

    from sod_tpu.models.maskformer import maskformer_apply

    def apply_fn(params, x, mcfg, train: bool = False, **kw):
        enc = functools.partial(p3_vit_apply, cfg=mcfg.vit, mesh=mesh,
                                n_micro=n_micro, all_layers=False)
        return maskformer_apply(params, x, mcfg, train=train,
                                encoder_apply=lambda p, xx: enc(p, xx), **kw)

    return apply_fn
