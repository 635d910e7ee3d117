"""Sequence x tensor parallelism: ring attention inside Megatron TP
groups on a 3-D ``(data, seq, model)`` device mesh.

The reference is single-GPU torch with no model parallelism of any kind
(SURVEY §2 parallelism table); this composes the repo's own
``parallel/sp.py`` (ring attention over the token axis) with
``parallel/tp.py`` (Megatron feature sharding) — the canonical long-
context pairing: TP shrinks the weights and per-token FLOPs, SP shrinks
the activations, and the two shard ORTHOGONAL axes of the same attention
computation (heads over ``model``, tokens over ``seq``).

Design: one ``shard_map`` stage over the full mesh, where every axis is
manual:

* weights live in the TP-split layout from ``parallel/p3.py`` (q/k/v as
  separate (D, D) matrices whose column shards are whole head groups),
  sharded over ``model`` on their Megatron axis — the SAME specs as the
  3-D pipe mesh minus the ``pipe`` layer axis;
* activations shard over ``data`` (batch) and ``seq`` (tokens); each
  device holds its [B/dp, T/S, D] token slice with the FULL feature
  width (LayerNorm / residual need full D — the classic Megatron
  replication over ``model`` within a token slice);
* q/k/v projections are column-parallel (local head group, zero
  communication), then :func:`sod_tpu.parallel.sp.ring_attention` runs
  UNCHANGED on the local heads — the online-softmax ring over ``seq`` is
  per-head math, so head sharding over ``model`` composes for free;
* the attention out-projection and MLP fc1 are row-parallel —
  ``lax.psum`` over ``model`` (``parallel/p3._row_parallel``), exactly
  the two collectives per block of the pure-TP path.

Gradients flow through both collectives (``ppermute``'s transpose is the
reverse permute, ``psum``'s is broadcast), so the SAME function trains:
``make_train_step(apply_fn=make_sptp_apply(mesh))``.  Checkpoint layout
follows the 3-D pipe mesh policy (``train/trainer.py``): ``latest_model``
stores the TP-split layout verbatim, ``best_model_*``/Evaluator handoffs
merge back to packed via ``p3_host_params``.

XLA path only (the stage is explicit shard_map; Pallas kernels are
single-shard) — ``assert_sptp_compatible`` enforces this plus the
Megatron divisibility rules.  SP x PP remains deliberately absent: GPipe
microbatching multiplies the ring's per-tick latency by the stage count
on exactly the long-token path SP exists to serve; docs/PARALLEL.md has
the rejection note.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sod_tpu.models.vit import ViTConfig, prepare_tokens
from sod_tpu.ops.layers import gelu, layer_norm, linear
from sod_tpu.parallel.p3 import (
    _row_parallel,
    p3_block_specs,
    p3_is_split,
    p3_split_blocks,
)
from sod_tpu.parallel.sp import ring_attention


def make_mesh_sptp(n_data: Optional[int] = None, n_seq: int = 1,
                   n_model: int = 1, devices=None) -> Mesh:
    """A ``(data, seq, model)`` mesh.  ``n_data=None`` uses all remaining
    devices after the seq and model axes."""
    if devices is None:
        devices = jax.devices()
    if n_seq < 1 or n_model < 1:
        raise ValueError(
            f"n_seq/n_model must be >= 1, got {n_seq}/{n_model}")
    if n_data is None:
        n_data = len(devices) // (n_seq * n_model)
    total = n_data * n_seq * n_model
    if total > len(devices) or total < 1:
        raise ValueError(f"requested {n_data}x{n_seq}x{n_model} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[:total]).reshape(n_data, n_seq, n_model)
    return Mesh(grid, axis_names=("data", "seq", "model"))


def _axis(mesh: Mesh, name: str) -> int:
    return mesh.shape.get(name, 1) if name in mesh.axis_names else 1


def sptp_block_specs(split_blocks: dict) -> dict:
    """PartitionSpecs for the TP-split stack on a (data, seq, model)
    mesh: the 3-D pipe mesh's Megatron placement with the layer axis
    UNSHARDED (no pipe here — the ``lax.scan`` over layers runs whole on
    every device, as in sp)."""
    specs = p3_block_specs(split_blocks)
    return jax.tree.map(lambda s: P(None, *tuple(s)[1:]), specs,
                        is_leaf=lambda x: isinstance(x, P))


def sptp_param_shardings(params: dict, mesh: Mesh):
    """NamedSharding pytree for the FULL model with the encoder blocks in
    TP-split layout: blocks shard per :func:`sptp_block_specs`,
    everything else replicates (decoder/heads run under plain GSPMD)."""
    def to_named(tree):
        return jax.tree.map(lambda s: NamedSharding(mesh, s), tree,
                            is_leaf=lambda x: isinstance(x, P))

    out = jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    enc = dict(out["encoder"])
    enc["blocks"] = to_named(sptp_block_specs(params["encoder"]["blocks"]))
    out = dict(out)
    out["encoder"] = enc
    return out


def shard_params_sptp(params: dict, mesh: Mesh):
    """Split the encoder blocks into the TP layout and device_put the
    whole tree onto its ``model`` sharding.  ``params`` may already be in
    the split layout (a resumed sptp checkpoint)."""
    enc = dict(params["encoder"])
    if not p3_is_split(enc["blocks"]):
        enc["blocks"] = p3_split_blocks(enc["blocks"])
    params = dict(params)
    params["encoder"] = enc
    return jax.tree.map(jax.device_put, params,
                        sptp_param_shardings(params, mesh))


def assert_sptp_compatible(cfg, mesh: Mesh, vit_cfg: ViTConfig) -> None:
    """Fail loudly on configs the (data, seq, model) mesh does not
    cover."""
    n_model = _axis(mesh, "model")
    if n_model <= 1 or _axis(mesh, "seq") <= 1:
        return
    from sod_tpu.parallel.mesh import assert_xla_path

    assert_xla_path(
        cfg, "the (data, seq, model) mesh requires the XLA path",
        "the ring-TP stage program is explicit shard_map "
        "(see parallel/sptp.py docstring)")
    for name, dim in (("n_heads", vit_cfg.n_heads),
                      ("embed_dim", vit_cfg.embed_dim),
                      ("mlp hidden", int(vit_cfg.embed_dim
                                         * vit_cfg.mlp_ratio))):
        if dim % n_model != 0:
            raise ValueError(
                f"{name} {dim} not divisible by model axis {n_model} — "
                "Megatron head/feature sharding needs even splits")


def _block_apply_ring_tp(bp: dict, x: jax.Array, cfg: ViTConfig,
                         key_mask: jax.Array, n_ring: int) -> jax.Array:
    """One transformer block, tokens ring-sharded over ``seq`` AND heads
    Megatron-sharded over ``model`` (ref block:
    ``vision_transformer.py:136-170``; identical math to
    ``models.vit._block_apply`` up to the ring's online-softmax
    reassociation and the two psums — asserted in tests/test_sptp.py).

    ``bp`` leaves are the LOCAL ``model`` shards of the TP-split layout;
    ``x`` / ``key_mask`` are the LOCAL token slice [b, C, D] / [b, C].
    """
    hd = cfg.embed_dim // cfg.n_heads
    n_local_heads = bp["attn"]["q"]["w"].shape[-1] // hd
    scale = hd ** -0.5

    h = layer_norm(bp["norm1"], x, cfg.ln_eps)
    b_, c_, _ = h.shape

    def heads(t):                                   # [b, C, Hloc*hd]
        return t.reshape(b_, c_, n_local_heads, hd).transpose(0, 2, 1, 3)

    q = heads(linear(bp["attn"]["q"], h))
    k = heads(linear(bp["attn"]["k"], h))
    v = heads(linear(bp["attn"]["v"], h))
    o = ring_attention(q, k, v, key_mask, scale, n_ring)  # local heads
    o = o.transpose(0, 2, 1, 3).reshape(b_, c_, n_local_heads * hd)
    x = x + _row_parallel(o, bp["attn"]["proj"]["w"],
                          bp["attn"]["proj"].get("b"))

    h2 = layer_norm(bp["norm2"], x, cfg.ln_eps)
    u = gelu(linear(bp["mlp"]["fc0"], h2))          # local hidden columns
    return x + _row_parallel(u, bp["mlp"]["fc1"]["w"],
                             bp["mlp"]["fc1"].get("b"))


def _ring_tp_blocks(blocks: dict, norm: dict, tokens: jax.Array,
                    mask: jax.Array, cfg: ViTConfig, mesh: Mesh,
                    all_layers: bool = True) -> jax.Array:
    """Run the block stack with tokens sharded over ``seq`` and Megatron
    features over ``model``.  Same output contract as
    ``parallel.sp._ring_blocks``."""
    S = _axis(mesh, "seq")
    B = tokens.shape[0]
    has_data = _axis(mesh, "data") > 1
    if has_data and B % mesh.shape["data"] != 0:
        raise ValueError(
            f"batch {B} not divisible by data axis {mesh.shape['data']}")
    dspec = "data" if has_data else None

    def stage(local_blocks, norm_p, toks, kmask):
        def body(x, bp):
            x = _block_apply_ring_tp(bp, x, cfg, kmask, S)
            return x, (layer_norm(norm_p, x, cfg.ln_eps)
                       if all_layers else None)

        final, stack = jax.lax.scan(body, toks, local_blocks)
        if all_layers:
            return stack                              # [L, b, C, D]
        return layer_norm(norm_p, final, cfg.ln_eps)  # [b, C, D]

    out_specs = (P(None, dspec, "seq", None) if all_layers
                 else P(dspec, "seq", None))
    return jax.shard_map(
        stage, mesh=mesh,
        in_specs=(sptp_block_specs(blocks),
                  jax.tree.map(lambda _: P(), norm),
                  P(dspec, "seq", None), P(dspec, "seq")),
        out_specs=out_specs,
        check_vma=False)(blocks, norm, tokens, mask)


def sptp_vit_apply(params: dict, x: jax.Array, cfg: ViTConfig,
                   mesh: Mesh, all_layers: bool = True,
                   token_mask: Optional[jax.Array] = None,
                   pos_embed_override: Optional[jax.Array] = None
                   ) -> jax.Array:
    """``vit_apply`` with tokens sharded over ``seq`` (ring attention)
    and features over ``model`` (Megatron) — identical math to the
    unfused ``vit_apply`` up to the ring softmax's reassociation and the
    two per-block psums; asserted in ``tests/test_sptp.py``.
    ``params["blocks"]`` must be in the TP-split layout
    (``shard_params_sptp``)."""
    if cfg.use_flash or cfg.fused_mlp or cfg.fused_train:
        raise ValueError(
            "sptp_vit_apply requires the XLA block path "
            "(use_flash/fused_mlp/fused_train off) — see parallel/sptp.py")
    if not p3_is_split(params["blocks"]):
        raise ValueError("sptp_vit_apply needs the TP-split block layout "
                         "— shard with parallel.shard_params_sptp first")
    S = _axis(mesh, "seq")
    tokens, _ = prepare_tokens(params, x, cfg, pos_embed_override)
    B, T, _ = tokens.shape
    mask = (jnp.ones((B, T), bool) if token_mask is None
            else token_mask.astype(bool))
    t_pad = -(-T // S) * S
    if t_pad > T:
        tokens = jnp.pad(tokens, ((0, 0), (0, t_pad - T), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, t_pad - T)))   # pads: False
    stack = _ring_tp_blocks(params["blocks"], params["norm"], tokens, mask,
                            cfg, mesh, all_layers=all_layers)
    if all_layers:
        return stack[:, :, :T]                           # drop ring pads
    return stack[:, :T]                                  # final normed


def make_sptp_apply(mesh: Mesh):
    """A ``maskformer_apply``-compatible callable whose ViT encoder runs
    token-sharded AND tensor-parallel over ``mesh`` — drop-in for
    ``make_train_step(apply_fn=...)``; decoder/heads run under plain
    GSPMD exactly as in the sp path."""
    from sod_tpu.models.maskformer import maskformer_apply

    def apply_fn(params, x, mcfg, train: bool = False, **kw):
        enc = functools.partial(sptp_vit_apply, cfg=mcfg.vit, mesh=mesh,
                                all_layers=False)
        return maskformer_apply(params, x, mcfg, train=train,
                                encoder_apply=lambda p, xx: enc(p, xx), **kw)

    return apply_fn
