"""MaskFormer-style saliency model, TPU-native.

Functional redesign of the reference model (ref
``networks/maskformer/maskformer.py`` + ``transformer_decoder.py``):

* ViT-S encoder (or ResNet-50 + 1x1 adapter, ref ``maskformer.py:36-41``);
* a DETR-style post-norm transformer decoder of ``n_decoder_layers`` layers
  run as one ``lax.scan`` over stacked layer params, collecting the
  per-layer (final-LayerNormed) query stacks that the reference's
  ``return_intermediate`` produces (ref ``transformer_decoder.py:104-150``);
* 20 learnable queries seeded as ``tgt = 0`` with ``query_pos`` = the
  embedding table (ref ``maskformer.py:118-142``);
* pixel decoder = bilinear x2 upsample of the last-layer patch tokens (ref
  ``maskformer.py:144-162``, live config ``learnable_pixel_decoder: false``);
* mask head = sigmoid(einsum(queries, upsampled features)) over every
  decoder layer (ref ``maskformer.py:219-225``) — a single batched MXU
  contraction;
* objectness head = 3-layer relu MLP -> sigmoid per layer (ref
  ``maskformer.py:55-58,227-239``);
* contrastive feature = mean over last-layer queries (this fork's addition,
  ref ``maskformer.py:197-203``).

Layouts: images NHWC; queries [B, L, Q, D]; mask_pred [B, L, Q, h, w].
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict

import jax
import jax.numpy as jnp

from sod_tpu.models.vit import (
    ViTConfig,
    make_input_divisible,
    vit_apply,
    vit_init,
    vit_small,
)
from sod_tpu.ops.attention import mha_init, multi_head_attention
from sod_tpu.ops.layers import (
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    mlp_apply,
    mlp_init,
)
from sod_tpu.ops.resize import interpolate_bilinear


@dataclass(frozen=True)
class MaskFormerConfig:
    n_queries: int = 20
    n_decoder_layers: int = 6
    arch: str = "vit_small"               # "vit_small" | "resnet50"
    patch_size: int = 8
    training_method: str = "dino"
    scale_factor: int = 2
    use_binary_classifier: bool = True
    learnable_pixel_decoder: bool = False  # False => bilinear (live config)
    lateral_connection: bool = False
    return_intermediate: bool = True       # loss_every_decoder_layer
    decoder_ln_eps: float = 1e-5           # torch nn.LayerNorm default
    vit: ViTConfig = field(default_factory=vit_small)

    @property
    def embed_dim(self) -> int:
        return 384 if self.arch != "vit_small" else self.vit.embed_dim

    @property
    def n_heads(self) -> int:
        return 6 if self.arch != "vit_small" else self.vit.n_heads

    @property
    def mlp_ratio(self) -> int:
        return 4


def config_from(cfg) -> "MaskFormerConfig":
    """Build a MaskFormerConfig from the flat experiment Config."""
    return MaskFormerConfig(
        n_queries=cfg.n_queries,
        n_decoder_layers=cfg.n_decoder_layers,
        arch=cfg.arch,
        patch_size=cfg.patch_size,
        training_method=cfg.training_method,
        scale_factor=cfg.scale_factor,
        use_binary_classifier=cfg.use_binary_classifier,
        learnable_pixel_decoder=cfg.learnable_pixel_decoder,
        lateral_connection=cfg.lateral_connection,
        return_intermediate=cfg.loss_every_decoder_layer,
        vit=vit_small(patch_size=cfg.patch_size,
                      use_flash=cfg.use_pallas_attention,
                      remat=getattr(cfg, "remat", False),
                      fused_mlp=getattr(cfg, "use_fused_mlp", False),
                      fused_train=getattr(cfg, "use_fused_train", False),
                      fused_save_acts=getattr(cfg, "fused_save_acts",
                                              False)),
    )


# ---------------------------------------------------------------------------
# Decoder layer (DETR post-norm, ref transformer_decoder.py:229-297)
# ---------------------------------------------------------------------------

def _decoder_layer_init(rng: jax.Array, d: int, ffn_dim: int, dtype=jnp.float32) -> dict:
    k_sa, k_ca, k_l1, k_l2 = jax.random.split(rng, 4)
    return {
        "self_attn": mha_init(k_sa, d, dtype),
        "cross_attn": mha_init(k_ca, d, dtype),
        "linear1": linear_init(k_l1, d, ffn_dim, init="torch_default", dtype=dtype),
        "linear2": linear_init(k_l2, ffn_dim, d, init="torch_default", dtype=dtype),
        "norm1": layer_norm_init(d, dtype),
        "norm2": layer_norm_init(d, dtype),
        "norm3": layer_norm_init(d, dtype),
    }


def _decoder_layer_apply(lp: dict, tgt: jax.Array, memory: jax.Array,
                         query_pos: jax.Array, n_heads: int,
                         eps: float, memory_mask=None) -> jax.Array:
    """Post-norm: self-attn -> cross-attn -> FFN (ref
    ``transformer_decoder.py:260-297``; dropout is 0 in the live config)."""
    qk = tgt + query_pos
    tgt = tgt + multi_head_attention(lp["self_attn"], qk, qk, tgt, n_heads)
    tgt = layer_norm(lp["norm1"], tgt, eps)

    q = tgt + query_pos
    tgt = tgt + multi_head_attention(lp["cross_attn"], q, memory, memory,
                                     n_heads, key_mask=memory_mask)
    tgt = layer_norm(lp["norm2"], tgt, eps)

    h = jax.nn.relu(linear(lp["linear1"], tgt))
    tgt = tgt + linear(lp["linear2"], h)
    tgt = layer_norm(lp["norm3"], tgt, eps)
    return tgt


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def maskformer_init(rng: jax.Array, cfg: MaskFormerConfig,
                    dtype=jnp.float32) -> dict:
    d = cfg.embed_dim
    ffn_dim = d * cfg.mlp_ratio
    k_enc, k_dec, k_q, k_ffn, k_cls, k_adapter = jax.random.split(rng, 6)

    if cfg.arch == "vit_small":
        encoder = vit_init(k_enc, cfg.vit, dtype)
    else:
        from sod_tpu.models.resnet import resnet50_init

        encoder = resnet50_init(k_enc, dtype=dtype)

    layer_keys = jax.random.split(k_dec, cfg.n_decoder_layers)
    layers = [_decoder_layer_init(k, d, ffn_dim, dtype) for k in layer_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)

    params = {
        "encoder": encoder,
        "decoder": {"layers": stacked, "norm": layer_norm_init(d, dtype)},
        # nn.Embedding default init: N(0, 1) (ref maskformer.py:53)
        "query_embed": jax.random.normal(k_q, (cfg.n_queries, d), dtype),
    }
    if cfg.use_binary_classifier:
        # MLP(d, d, 1, num_layers=3) (ref maskformer.py:58)
        params["ffn"] = mlp_init(k_ffn, [d, d, d, 1], init="torch_default",
                                 dtype=dtype)
    else:
        params["ffn"] = mlp_init(k_ffn, [d, d, d, d], init="torch_default",
                                 dtype=dtype)
        params["linear_classifier"] = linear_init(k_cls, d, 2,
                                                  init="torch_default", dtype=dtype)
        params["norm"] = layer_norm_init(d, dtype)
    if cfg.arch != "vit_small":
        # 1x1 conv channel adapter == a linear on the channel axis
        from sod_tpu.models.resnet import RESNET50_OUT_CHANNELS

        params["linear_layer"] = linear_init(k_adapter, RESNET50_OUT_CHANNELS, d,
                                             init="torch_default", dtype=dtype)
    return params


def forward_encoder(params: dict, x: jax.Array, cfg: MaskFormerConfig,
                    all_layers: bool = False, train: bool = False,
                    bn_stats: dict = None):
    """Return patch tokens.

    vit: [B, N, D] last-layer patch tokens (CLS dropped), or [L, B, N, D]
    when ``all_layers`` (ref ``maskformer.py:99-113``).
    resnet50: [B, h*w, D] adapted res5 features + their (h, w).

    :param train: resnet path only — live BatchNorm statistics (the
        reference fine-tunes the encoder under ``model.train()``,
        ``utils/misc.py:187-188``); updated buffers land in ``bn_stats``.
    """
    if cfg.arch == "vit_small":
        if all_layers:
            tokens = vit_apply(params["encoder"], x, cfg.vit, all_layers=True)
            return tokens[:, :, 1:, :]            # [L, B, N, D]
        tokens = vit_apply(params["encoder"], x, cfg.vit, all_layers=False)
        return tokens[:, 1:, :]                    # [B, N, D]
    else:
        from sod_tpu.models.resnet import resnet50_apply

        feats = resnet50_apply(params["encoder"], x, train=train,
                               stats=bn_stats)["res5"]         # [B, h, w, C]
        feats = linear(params["linear_layer"], feats)          # [B, h, w, D]
        b, h, w, d = feats.shape
        return feats.reshape(b, h * w, d), (h, w)


def _replicate_edges(feats: jax.Array, gh: jax.Array, gw: jax.Array) -> jax.Array:
    """Clamp-gather so rows >= gh repeat row gh-1 and cols >= gw repeat col
    gw-1.  Makes bilinear upsampling of a canvas grid bit-equal to torch's
    edge-clamped upsampling of the true (gh, gw) grid for every output pixel
    inside the valid region (fixed-canvas variable-size eval)."""
    g_h, g_w = feats.shape[0], feats.shape[1]
    rows = jnp.minimum(jnp.arange(g_h), gh - 1)
    cols = jnp.minimum(jnp.arange(g_w), gw - 1)
    return feats[rows][:, cols]


def forward_transformer_decoder(params: dict, memory: jax.Array,
                                cfg: MaskFormerConfig,
                                memory_mask=None) -> jax.Array:
    """Queries through the decoder.

    :param memory: [B, N, D] patch tokens.
    :return: [B, L, Q, D] per-layer query stacks (return_intermediate), each
        passed through the decoder's final LayerNorm — matching the
        reference's intermediate stacking + last-entry replacement
        (``transformer_decoder.py:138-148``).
    """
    b = memory.shape[0]
    d = memory.shape[-1]
    query_pos = jnp.broadcast_to(params["query_embed"].astype(memory.dtype),
                                 (b, cfg.n_queries, d))
    tgt0 = jnp.zeros_like(query_pos)

    dec = params["decoder"]
    eps = cfg.decoder_ln_eps

    def body(tgt, lp):
        tgt = _decoder_layer_apply(lp, tgt, memory, query_pos, cfg.n_heads,
                                   eps, memory_mask=memory_mask)
        return tgt, layer_norm(dec["norm"], tgt, eps)

    _, per_layer = jax.lax.scan(body, tgt0, dec["layers"])   # [L, B, Q, D]
    return per_layer.transpose(1, 0, 2, 3)                    # [B, L, Q, D]


def forward_pixel_decoder(patch_tokens: jax.Array, grid_hw, cfg: MaskFormerConfig) -> jax.Array:
    """Bilinear x``scale_factor`` upsample of patch tokens (ref
    ``maskformer.py:144-162``).  [B, N, D] -> [B, h*s, w*s, D]."""
    b, n, d = patch_tokens.shape
    h, w = grid_hw
    feats = patch_tokens.reshape(b, h, w, d).transpose(0, 3, 1, 2)  # [B,D,h,w]
    feats = interpolate_bilinear(feats, h * cfg.scale_factor, w * cfg.scale_factor)
    return feats.transpose(0, 2, 3, 1)                              # [B,H,W,D]


def maskformer_apply(params: dict, x: jax.Array, cfg: MaskFormerConfig,
                     encoder_only: bool = False,
                     fused: bool = False,
                     train: bool = False,
                     encoder_apply=None) -> Dict[str, jax.Array]:
    """Full forward (ref ``maskformer.py:164-251``).

    :param x: [B, H, W, 3] normalized images.
    :param train: training-mode normalization — for the resnet50 encoder
        BatchNorm uses live batch statistics and the output carries
        ``batch_stats`` (EMA-updated buffers) for the train step to merge
        back into params.  No-op for the ViT encoder (LayerNorm).
    :param encoder_apply: optional ViT-encoder override
        ``(encoder_params, x) -> [B, 1+N, D]`` normed last-layer tokens —
        the hook the pipeline-parallel path (``parallel/pp.py``) plugs a
        stage-sharded encoder into; must be identical math to
        ``vit_apply(all_layers=False)``.
    :return: dict with
        ``mask_pred``  [B, L, Q, h, w]  (sigmoid),
        ``objectness`` [B, L, Q, 1]     (sigmoid; binary-classifier mode),
        ``features``   [B, D]           (mean last-layer queries).
        With ``encoder_only``: ``patch_tokens`` [B, gh, gw, D].
    """
    bn_stats: Dict = {}
    if cfg.arch == "vit_small":
        padded = make_input_divisible(x, cfg.vit.patch_size)
        gh, gw = padded.shape[1] // cfg.vit.patch_size, padded.shape[2] // cfg.vit.patch_size
        if encoder_apply is not None:
            memory = encoder_apply(params["encoder"], x)[:, 1:, :]
        elif fused:
            tokens = vit_apply(params["encoder"], x, cfg.vit,
                               all_layers=False, fused=True)
            memory = tokens[:, 1:, :]
        else:
            memory = forward_encoder(params, x, cfg)          # [B, N, D]
    else:
        memory, (gh, gw) = forward_encoder(params, x, cfg, train=train,
                                           bn_stats=bn_stats)

    if encoder_only:
        b, n, d = memory.shape
        return {"patch_tokens": memory.reshape(b, gh, gw, d)}

    queries = forward_transformer_decoder(params, memory, cfg)  # [B, L, Q, D]

    # contrastive features: mean over last-layer queries (ref :197-203)
    features = queries[:, -1].mean(axis=1)                      # [B, D]

    upsampled = forward_pixel_decoder(memory, (gh, gw), cfg)    # [B, H, W, D]

    if cfg.use_binary_classifier:
        mask_logits = jnp.einsum("blqd,bhwd->blqhw", queries, upsampled,
                                 preferred_element_type=jnp.float32)
        mask_pred = jax.nn.sigmoid(mask_logits)
        objectness = jax.nn.sigmoid(
            mlp_apply(params["ffn"], queries.astype(jnp.float32),
                      activation="relu"))                       # [B, L, Q, 1]
        out = {"mask_pred": mask_pred, "objectness": objectness,
               "features": features}
    else:
        proj = mlp_apply(params["ffn"], queries, activation="relu")
        mask_logits = jnp.einsum("blqd,bhwd->blqhw", proj, upsampled,
                                 preferred_element_type=jnp.float32)
        out = {"mask_pred": jax.nn.sigmoid(mask_logits), "features": features}
    if train and bn_stats:
        # rooted like the params tree so the train step can merge directly
        out["batch_stats"] = {"encoder": bn_stats}
    return out


def maskformer_apply_canvas(params: dict, x: jax.Array,
                            cfg: MaskFormerConfig,
                            token_mask: jax.Array,
                            pos_embed_override: jax.Array,
                            grid_sizes: jax.Array,
                            fused: bool = False,
                            encoder_apply=None) -> Dict[str, jax.Array]:
    """Fixed-canvas forward for variable-resolution batched evaluation.

    The reference evaluates each image at its own (padded-to-patch) original
    resolution with batch_size=1 (evaluator pyc 175-211; base
    ``__getitem__`` never resizes in test mode).  On TPU that would mean a
    recompile per unique image shape, so instead every image is placed in
    the top-left of a fixed canvas and:

    * canvas-padding tokens are excluded from attention via ``token_mask``
      ([B, 1+N]; CLS always True),
    * per-image bicubic pos-embeds for the TRUE grid are computed on the
      host and passed via ``pos_embed_override`` ([B, 1+N, D], zeros on
      padding tokens),
    * before the pixel-decoder upsample the valid region's edge rows/cols
      are replicated across the padding (``_replicate_edges``) so the
      bilinear interpolation at the valid-region boundary clamps exactly
      like torch's edge handling on the true-size grid.

    The result equals running the reference per image, with one compile and
    full batching.  ``grid_sizes``: [B, 2] int (gh, gw) per image.
    Returns full-canvas ``mask_pred`` [B, L, Q, 2G_h, 2G_w] — callers crop
    to each image's valid region.

    :param encoder_apply: optional ViT-encoder override
        ``(encoder_params, x, token_mask, pos_embed_override) -> [B, 1+N, D]``
        normed last-layer tokens — the hook the sequence-parallel path
        (``parallel/sp.py``) plugs a token-sharded ring-attention encoder
        into (the canvas is exactly the long-token case SP exists for);
        must be identical math to ``vit_apply(all_layers=False)``.
    """
    assert cfg.arch == "vit_small", "canvas path is for the ViT encoder"
    from sod_tpu.models.vit import vit_apply

    if encoder_apply is not None:
        tokens = encoder_apply(params["encoder"], x, token_mask,
                               pos_embed_override)
    else:
        tokens = vit_apply(params["encoder"], x, cfg.vit, all_layers=False,
                           token_mask=token_mask,
                           pos_embed_override=pos_embed_override, fused=fused)
    memory = tokens[:, 1:, :]                                  # [B, N, D]
    patch_mask = token_mask[:, 1:]

    queries = forward_transformer_decoder(params, memory, cfg,
                                          memory_mask=patch_mask)
    features = queries[:, -1].mean(axis=1)

    b, n, d = memory.shape
    gh_c = x.shape[1] // cfg.vit.patch_size
    gw_c = x.shape[2] // cfg.vit.patch_size
    grid = memory.reshape(b, gh_c, gw_c, d)
    grid = jax.vmap(_replicate_edges)(grid, grid_sizes[:, 0], grid_sizes[:, 1])
    upsampled = forward_pixel_decoder(grid.reshape(b, n, d), (gh_c, gw_c), cfg)

    mask_logits = jnp.einsum("blqd,bhwd->blqhw", queries, upsampled,
                             preferred_element_type=jnp.float32)
    out = {"mask_pred": jax.nn.sigmoid(mask_logits), "features": features}
    if cfg.use_binary_classifier:
        out["objectness"] = jax.nn.sigmoid(
            mlp_apply(params["ffn"], queries.astype(jnp.float32),
                      activation="relu"))
    return out


# ---------------------------------------------------------------------------
# Auxiliary components kept for capability parity
# ---------------------------------------------------------------------------

def positional_encoding_2d(n_dims: int, height: int, width: int) -> jax.Array:
    """Static sin/cos 2-D positional grid (ref ``maskformer.py:75-97``;
    declared but unused in the live forward path).  Returns
    [n_dims, height, width]."""
    if n_dims % 4 != 0:
        raise ValueError(f"n_dims must be divisible by 4, got {n_dims}")
    import math

    d_model = n_dims // 2
    div_term = jnp.exp(jnp.arange(0.0, d_model, 2.0)
                       * -(math.log(10000.0) / d_model))
    pos_w = jnp.arange(0.0, width)[:, None]
    pos_h = jnp.arange(0.0, height)[:, None]
    pe = jnp.zeros((n_dims, height, width))
    sin_w = jnp.sin(pos_w * div_term).T[:, None, :]   # [d/4, 1, W]
    cos_w = jnp.cos(pos_w * div_term).T[:, None, :]
    pe = pe.at[0:d_model:2].set(jnp.broadcast_to(sin_w,
                                                 (sin_w.shape[0], height, width)))
    pe = pe.at[1:d_model:2].set(jnp.broadcast_to(cos_w,
                                                 (cos_w.shape[0], height, width)))
    sin_h = jnp.sin(pos_h * div_term).T[:, :, None]   # [d/4, H, 1]
    cos_h = jnp.cos(pos_h * div_term).T[:, :, None]
    pe = pe.at[d_model::2].set(jnp.broadcast_to(sin_h,
                                                (sin_h.shape[0], height, width)))
    pe = pe.at[d_model + 1::2].set(jnp.broadcast_to(cos_h,
                                                    (cos_h.shape[0], height, width)))
    return pe


def upsample_block_init(rng: jax.Array, in_channels: int, out_channels: int,
                        n_groups: int = 32, dtype=jnp.float32) -> dict:
    """Learnable pixel-decoder block (ref ``UpsampleBlock``,
    ``maskformer.py:271-282``): 3x3 conv + GroupNorm + ReLU + bilinear x2.
    Present for the ``learnable_pixel_decoder: true`` configuration (false
    in the live config)."""
    import math

    k1, k2 = jax.random.split(rng)
    fan_in = in_channels * 9
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "conv": jax.random.uniform(k1, (3, 3, in_channels, out_channels),
                                   dtype, -bound, bound),
        "conv_b": jax.random.uniform(k2, (out_channels,), dtype,
                                     -bound, bound),
        "gn_scale": jnp.ones((out_channels,), dtype),
        "gn_bias": jnp.zeros((out_channels,), dtype),
        "n_groups": n_groups,
    }


def upsample_block_apply(p: dict, x: jax.Array,
                         scale_factor: int = 2) -> jax.Array:
    """x: [B, H, W, C] -> [B, H*s, W*s, C']."""
    y = jax.lax.conv_general_dilated(
        x, p["conv"].astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.float32)
    y = y + p["conv_b"].astype(jnp.float32)
    b, h, w, c = y.shape
    g = int(p["n_groups"])
    yg = y.reshape(b, h, w, g, c // g)
    mean = yg.mean(axis=(1, 2, 4), keepdims=True)
    var = jnp.var(yg, axis=(1, 2, 4), keepdims=True)
    yg = (yg - mean) * jax.lax.rsqrt(var + 1e-5)
    y = yg.reshape(b, h, w, c) * p["gn_scale"] + p["gn_bias"]
    y = jax.nn.relu(y).astype(x.dtype)
    y = y.transpose(0, 3, 1, 2)
    y = interpolate_bilinear(y, h * scale_factor, w * scale_factor)
    return y.transpose(0, 2, 3, 1)


def position_embedding_sine(mask_shape, num_pos_feats: int = 64,
                            temperature: float = 10000.0,
                            normalize: bool = False,
                            scale: float = None,
                            not_mask: jax.Array = None) -> jax.Array:
    """DETR sine position embedding (ref
    ``networks/maskformer/positional_embedding.py:12-48``; declared but not
    in the live forward path): cumsum-based y/x embeds with interleaved
    sin/cos.  Returns [B, 2*num_pos_feats, H, W]."""
    import math

    if scale is not None and not normalize:
        raise ValueError("normalize should be True if scale is passed")
    if scale is None:
        scale = 2 * math.pi
    b, h, w = mask_shape
    if not_mask is None:
        not_mask = jnp.ones((b, h, w), jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=4).reshape(b, h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=4).reshape(b, h, w, -1)
    pos = jnp.concatenate([pos_y, pos_x], axis=3)
    return pos.transpose(0, 3, 1, 2)
