"""Numerical parity of core ops vs torch (CPU), the reference's runtime.

These tests build the *same math* in torch functional ops (not by importing
the reference repo) and check our JAX ops agree to float32 tolerance:
fused-QKV self-attention, nn.MultiheadAttention, LayerNorm eps semantics,
bilinear/bicubic/nearest interpolate, and a full ViT block.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from sod_tpu.ops.attention import multi_head_attention, self_attention_qkv  # noqa: E402
from sod_tpu.ops.layers import layer_norm, linear, mlp_apply  # noqa: E402
from sod_tpu.ops.resize import (  # noqa: E402
    interpolate_bicubic,
    interpolate_bilinear,
    interpolate_nearest,
)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_linear_parity(rng):
    x = rng.randn(2, 5, 16).astype(np.float32)
    w = rng.randn(16, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    ours = linear({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x))
    theirs = F.linear(torch.from_numpy(x), torch.from_numpy(w.T),
                      torch.from_numpy(b))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_layer_norm_parity(rng):
    x = rng.randn(3, 7, 32).astype(np.float32)
    g = rng.randn(32).astype(np.float32)
    b = rng.randn(32).astype(np.float32)
    for eps in (1e-6, 1e-5):
        ours = layer_norm({"scale": jnp.asarray(g), "bias": jnp.asarray(b)},
                          jnp.asarray(x), eps=eps)
        theirs = F.layer_norm(torch.from_numpy(x), (32,),
                              torch.from_numpy(g), torch.from_numpy(b), eps)
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_gelu_mlp_parity(rng):
    x = rng.randn(2, 4, 16).astype(np.float32)
    w0 = rng.randn(16, 64).astype(np.float32)
    b0 = rng.randn(64).astype(np.float32)
    w1 = rng.randn(64, 16).astype(np.float32)
    b1 = rng.randn(16).astype(np.float32)
    params = {"fc0": {"w": jnp.asarray(w0), "b": jnp.asarray(b0)},
              "fc1": {"w": jnp.asarray(w1), "b": jnp.asarray(b1)}}
    ours = mlp_apply(params, jnp.asarray(x), activation="gelu")
    xt = torch.from_numpy(x)
    theirs = F.linear(F.gelu(F.linear(xt, torch.from_numpy(w0.T),
                                      torch.from_numpy(b0))),
                      torch.from_numpy(w1.T), torch.from_numpy(b1))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=5e-5)


def test_vit_self_attention_parity(rng):
    """ViT fused-QKV attention vs explicit torch math (ref
    vision_transformer.py:110-133)."""
    B, N, D, H = 2, 9, 24, 3
    x = rng.randn(B, N, D).astype(np.float32)
    wqkv = rng.randn(D, 3 * D).astype(np.float32)
    bqkv = rng.randn(3 * D).astype(np.float32)
    wp = rng.randn(D, D).astype(np.float32)
    bp = rng.randn(D).astype(np.float32)

    params = {"qkv": {"w": jnp.asarray(wqkv), "b": jnp.asarray(bqkv)},
              "proj": {"w": jnp.asarray(wp), "b": jnp.asarray(bp)}}
    ours = self_attention_qkv(params, jnp.asarray(x), n_heads=H)

    xt = torch.from_numpy(x)
    qkv = F.linear(xt, torch.from_numpy(wqkv.T), torch.from_numpy(bqkv))
    qkv = qkv.reshape(B, N, 3, H, D // H).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * (D // H) ** -0.5
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, N, D)
    theirs = F.linear(out, torch.from_numpy(wp.T), torch.from_numpy(bp))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)


def test_multihead_attention_parity(rng):
    """Decoder attention vs torch nn.MultiheadAttention."""
    B, Nq, Nk, D, H = 2, 5, 11, 24, 3
    q = rng.randn(B, Nq, D).astype(np.float32)
    k = rng.randn(B, Nk, D).astype(np.float32)
    v = rng.randn(B, Nk, D).astype(np.float32)

    mha = torch.nn.MultiheadAttention(D, H, dropout=0.0, batch_first=True)
    mha.eval()
    with torch.no_grad():
        theirs, _ = mha(torch.from_numpy(q), torch.from_numpy(k),
                        torch.from_numpy(v))

    params = {
        "in_proj": {"w": t2j(mha.in_proj_weight.T), "b": t2j(mha.in_proj_bias)},
        "out_proj": {"w": t2j(mha.out_proj.weight.T), "b": t2j(mha.out_proj.bias)},
    }
    ours = multi_head_attention(params, jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), n_heads=H)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


@pytest.mark.parametrize("mode,fn", [
    ("bilinear", interpolate_bilinear),
    ("bicubic", interpolate_bicubic),
    ("nearest", interpolate_nearest),
])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((28, 28), (12, 12)),   # pos-embed downsize
    ((28, 28), (56, 56)),   # pixel decoder x2
    ((14, 20), (56, 80)),   # evaluator x4, non-square
    ((7, 7), (10, 13)),     # odd ratios
])
def test_interpolate_parity(rng, mode, fn, in_hw, out_hw):
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    ours = fn(jnp.asarray(x), *out_hw)
    kwargs = {} if mode == "nearest" else {"align_corners": False}
    theirs = F.interpolate(torch.from_numpy(x), size=out_hw, mode=mode, **kwargs)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               atol=2e-5, rtol=1e-4)
