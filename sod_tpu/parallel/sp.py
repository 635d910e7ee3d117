"""Sequence (context) parallelism: ring attention over the ViT token axis
on a 2-D ``(data, seq)`` device mesh.

The reference has no sequence parallelism of any kind (SURVEY §2
parallelism table and §5 "long-context" note: attention is one dense
``softmax(QKᵀ)V`` over ≤785 tokens, ``networks/vision_transformer.py:122``).
This module is the fourth and final axis of the TPU scaling story, joining
``parallel/mesh.py`` (DP), ``parallel/tp.py`` (TP) and ``parallel/pp.py``
(PP): when the *activations* are what no longer fits — large canvases at
patch 8 (512 px → 4097 tokens, [B,H,N,N] attention scores grow
quadratically) — the token axis itself shards over a ``seq`` mesh axis and
each device keeps only its ``T/S`` token slice of every activation.

Design (the classic ring-attention schedule, TPU-native):

* LayerNorm / QKV / output projection / MLP are **per-token** maps — they
  run on the local token slice with zero communication.
* Attention couples tokens: each device computes online-softmax attention
  of its **local queries** against the **full key/value sequence** by
  circulating K/V slices around the ``seq`` ring with ``lax.ppermute``
  over ICI (``S`` ticks; one slice in flight per tick, overlapping the
  partial ``qkᵀ``/``pv`` matmuls).  The running (max, denominator,
  numerator) accumulators make the result mathematically identical to the
  dense fp32 softmax up to float reassociation — asserted against
  ``vit_apply`` in ``tests/test_sequence_parallel.py``.
* Gradients flow through the ring (``ppermute``'s transpose is the
  reverse permute, the online-softmax update is plain differentiable
  arithmetic), so the SAME function serves training:
  ``make_train_step(apply_fn=make_sp_apply(mesh))``.

Token counts need not divide the ring: the global token axis is padded to
a multiple of ``S`` and the pad positions are excluded from every softmax
through the same key-mask plumbing the fixed-canvas Evaluator already
uses (``ops/attention.py:_sdpa``), then sliced off after the encoder.

Composability: the mesh is ``(data, seq)`` — the batch additionally
shards over ``data`` exactly like the pure-DP path.  Everything outside
the encoder (patchify, decoder, heads, loss) runs under plain GSPMD with
replicated weights, as in the DP/TP/PP paths.  Params are fully
replicated (SP shards activations, not weights), so ``tp.shard_params``
on a seq mesh lays them out correctly as-is.

Pallas kernels (flash attention, fused blocks) are single-shard programs
— the ring path is validated on the XLA ops only; ``sp_vit_apply`` raises
on the fused flags, mirroring ``tp.assert_tp_compatible``.

(Expert parallelism remains deliberately absent: the reference has no
MoE anywhere — SURVEY §2 parallelism table.)
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sod_tpu.models.vit import ViTConfig, prepare_tokens
from sod_tpu.ops.layers import layer_norm, linear, mlp_apply


def make_mesh_sp(n_data: Optional[int] = None, n_seq: int = 1,
                 devices=None) -> Mesh:
    """A ``(data, seq)`` mesh.  ``n_data=None`` uses all remaining devices
    after the seq axis."""
    if devices is None:
        devices = jax.devices()
    if n_seq < 1:
        raise ValueError(f"n_seq must be >= 1, got {n_seq}")
    if n_data is None:
        n_data = len(devices) // n_seq
    total = n_data * n_seq
    if total > len(devices) or total < 1:
        raise ValueError(
            f"requested {n_data}x{n_seq} devices, have {len(devices)}")
    grid = np.asarray(devices[:total]).reshape(n_data, n_seq)
    return Mesh(grid, axis_names=("data", "seq"))


def _seq_size(mesh: Mesh) -> int:
    return mesh.shape.get("seq", 1) if "seq" in mesh.axis_names else 1


def assert_sp_compatible(cfg, mesh: Mesh) -> None:
    """Fail loudly on configs the ring-attention path does not cover."""
    if _seq_size(mesh) <= 1:
        return
    from sod_tpu.parallel.mesh import assert_xla_path

    assert_xla_path(
        cfg,
        f"sequence parallelism (seq axis {_seq_size(mesh)}) requires "
        "the XLA path",
        "the ring stage program is validated on XLA ops only "
        "(see parallel/sp.py docstring)")


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   key_mask: jax.Array, scale: float, n_ring: int,
                   axis: str = "seq") -> jax.Array:
    """Online-softmax attention of local queries against the full ring.

    Per-device program (call inside ``shard_map``): ``q/k/v`` are the
    LOCAL token slice [B, H, C, hd], ``key_mask`` the matching [B, C]
    bool slice.  K/V/mask circulate ``n_ring`` ticks over the ``axis``
    ring via ``ppermute``; the running (max m, denominator l, numerator
    acc) update is the standard flash/online-softmax recurrence, fp32
    throughout — identical math to ``ops.attention._sdpa``'s fp32 softmax
    up to reassociation.  Returns [B, H, C, hd] in q's dtype.
    """
    bsz, n_heads, c, hd = q.shape
    qf = q.astype(jnp.float32)
    m = jnp.full((bsz, n_heads, c), -1e30, jnp.float32)
    l = jnp.zeros((bsz, n_heads, c), jnp.float32)
    acc = jnp.zeros((bsz, n_heads, c, hd), jnp.float32)
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

    def absorb(m, l, acc, kc, vc, mc):
        logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kc.astype(jnp.float32),
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mc[:, None, None, :], logits, -1e30)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        l_new = l * alpha + p.sum(axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vc.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    def tick(carry, _):
        m, l, acc, kc, vc, mc = carry
        m, l, acc = absorb(m, l, acc, kc, vc, mc)
        kc = jax.lax.ppermute(kc, axis, perm)
        vc = jax.lax.ppermute(vc, axis, perm)
        mc = jax.lax.ppermute(mc, axis, perm)
        return (m, l, acc, kc, vc, mc), None

    kc, vc, mc = k, v, key_mask
    if n_ring > 1:
        # a standard ring does n_ring - 1 permutes: the rotation after
        # the LAST slice would only be discarded, and through ICI those
        # 3 extra collectives per attention call are pure waste
        (m, l, acc, kc, vc, mc), _ = jax.lax.scan(
            tick, (m, l, acc, kc, vc, mc), None, length=n_ring - 1)
    m, l, acc = absorb(m, l, acc, kc, vc, mc)      # final slice, no permute
    return (acc / l[..., None]).astype(q.dtype)


def _ring_blocks(blocks, norm, tokens: jax.Array, mask: jax.Array,
                 cfg: ViTConfig, mesh: Mesh,
                 all_layers: bool = True) -> jax.Array:
    """Run the block stack with the token axis sharded over ``seq``.
    Returns the final-LayerNormed per-layer token stack [L, B, T_pad, D]
    — ``vit_apply(all_layers=True)``'s contract (before pad removal) —
    or just the final layer [B, T_pad, D] when ``all_layers=False``:
    both production callers (training, the canvas Evaluator) only need
    the last layer, and materializing the [L, B, T, D] stack inside the
    stage would cost L× the activation memory on exactly the long-token
    path SP exists to shrink.
    """
    S = _seq_size(mesh)
    B, T, D = tokens.shape
    H = cfg.n_heads
    hd = D // H
    scale = hd ** -0.5
    has_data = "data" in mesh.axis_names and mesh.shape["data"] > 1
    if has_data and B % mesh.shape["data"] != 0:
        raise ValueError(
            f"batch {B} not divisible by data axis {mesh.shape['data']}")
    dspec = "data" if has_data else None

    def stage(local_blocks, norm_p, toks, kmask):
        # per-device program: toks [b_loc, C, D], kmask [b_loc, C]
        def body(x, bp):
            h = layer_norm(bp["norm1"], x, cfg.ln_eps)
            qkv = linear(bp["attn"]["qkv"], h)           # [b, C, 3D]
            b_, c_, _ = qkv.shape
            qkv = qkv.reshape(b_, c_, 3, H, hd)
            q = qkv[:, :, 0].transpose(0, 2, 1, 3)        # [b, H, C, hd]
            kk = qkv[:, :, 1].transpose(0, 2, 1, 3)
            vv = qkv[:, :, 2].transpose(0, 2, 1, 3)
            o = ring_attention(q, kk, vv, kmask, scale, S)
            o = o.transpose(0, 2, 1, 3).reshape(b_, c_, D)
            x = x + linear(bp["attn"]["proj"], o)
            x = x + mlp_apply(bp["mlp"],
                              layer_norm(bp["norm2"], x, cfg.ln_eps),
                              activation="gelu")
            return x, (layer_norm(norm_p, x, cfg.ln_eps)
                       if all_layers else None)

        final, stack = jax.lax.scan(body, toks, local_blocks)
        if all_layers:
            return stack                                  # [L, b, C, D]
        return layer_norm(norm_p, final, cfg.ln_eps)      # [b, C, D]

    out_specs = (P(None, dspec, "seq", None) if all_layers
                 else P(dspec, "seq", None))
    return jax.shard_map(
        stage, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), blocks),
                  jax.tree.map(lambda _: P(), norm),
                  P(dspec, "seq", None), P(dspec, "seq")),
        out_specs=out_specs,
        check_vma=False)(blocks, norm, tokens, mask)


def sp_vit_apply(params: dict, x: jax.Array, cfg: ViTConfig,
                 mesh: Mesh, all_layers: bool = True,
                 token_mask: Optional[jax.Array] = None,
                 pos_embed_override: Optional[jax.Array] = None) -> jax.Array:
    """``vit_apply`` with the token axis sharded over ``mesh``'s ``seq``
    axis (ring attention; pads to a ring multiple and masks the pads).
    Identical math to the unfused ``vit_apply`` up to float reassociation
    in the online softmax — asserted in ``tests/test_sequence_parallel.py``.
    """
    if cfg.use_flash or cfg.fused_mlp or cfg.fused_train:
        raise ValueError(
            "sp_vit_apply requires the XLA block path "
            "(use_flash/fused_mlp/fused_train off) — see parallel/sp.py")
    S = _seq_size(mesh)
    tokens, _ = prepare_tokens(params, x, cfg, pos_embed_override)
    B, T, _ = tokens.shape
    mask = (jnp.ones((B, T), bool) if token_mask is None
            else token_mask.astype(bool))
    t_pad = -(-T // S) * S
    if t_pad > T:
        tokens = jnp.pad(tokens, ((0, 0), (0, t_pad - T), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, t_pad - T)))   # pads: False
    stack = _ring_blocks(params["blocks"], params["norm"], tokens, mask,
                         cfg, mesh, all_layers=all_layers)
    if all_layers:
        return stack[:, :, :T]                           # drop ring pads
    return stack[:, :T]                                  # final normed


def make_sp_apply(mesh: Mesh):
    """A ``maskformer_apply``-compatible callable whose ViT encoder runs
    token-sharded (ring attention) over ``mesh``.  Drop-in for
    ``make_train_step(apply_fn=...)`` and direct forward calls;
    decoder/heads run under plain GSPMD.
    """
    from sod_tpu.models.maskformer import maskformer_apply

    def apply_fn(params, x, mcfg, train: bool = False, **kw):
        enc = functools.partial(sp_vit_apply, cfg=mcfg.vit, mesh=mesh,
                                all_layers=False)
        return maskformer_apply(params, x, mcfg, train=train,
                                encoder_apply=lambda p, xx: enc(p, xx), **kw)

    return apply_fn
