"""Functional neural-net primitives over parameter pytrees.

Conventions
-----------
* Parameters are nested dicts of ``jnp.ndarray``; every layer has an
  ``*_init(rng, ...) -> params`` and a pure ``apply``-style function.
* Weights are stored in the (in_features, out_features) layout so that the
  forward pass is a plain ``x @ w`` — directly MXU-friendly; the torch
  checkpoint converter (``sod_tpu.models.convert``) transposes.
* Compute dtype is the caller's; matmuls always request an fp32 accumulator
  via ``preferred_element_type`` so bf16 inputs keep fp32 accuracy.

Reference semantics mirrored here:
* ``trunc_normal`` — truncated-normal init (ref
  ``networks/vision_transformer.py:14-53``).
* LayerNorm with eps 1e-6 in the ViT (ref
  ``networks/vision_transformer.py:508,522``), 1e-5 in the decoder (torch
  ``nn.LayerNorm`` default, ref ``networks/maskformer/transformer_decoder.py``).
* ``Mlp`` — fc1 → GELU → fc2 (ref ``networks/vision_transformer.py:78-94``)
  and the DETR-style relu MLP head (ref
  ``networks/maskformer/maskformer.py:254-268``).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def trunc_normal(rng: jax.Array, shape, std: float = 0.02, mean: float = 0.0,
                 a: float = -2.0, b: float = 2.0, dtype=jnp.float32) -> jax.Array:
    """Truncated normal init matching torch's inverse-CDF method.

    Ref ``networks/vision_transformer.py:14-53``: sample U in [cdf(a'),
    cdf(b')] of the *standard* normal (a' = (a-mean)/std), apply erfinv, then
    scale/shift.  Note the reference truncates at ``a``/``b`` in units of
    std around ``mean`` only implicitly via the clamp; we reproduce the same
    construction.
    """
    low = _norm_cdf((a - mean) / std)
    high = _norm_cdf((b - mean) / std)
    u = jax.random.uniform(rng, shape, minval=2 * low - 1, maxval=2 * high - 1,
                           dtype=jnp.float32)
    x = jax.scipy.special.erfinv(u)
    x = x * std * math.sqrt(2.0) + mean
    x = jnp.clip(x, a, b)
    return x.astype(dtype)


def _norm_cdf(x: float) -> float:
    return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0


def lecun_uniform(rng: jax.Array, shape, fan_in: int, dtype=jnp.float32) -> jax.Array:
    """torch ``nn.Linear`` default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(rng, shape, minval=-bound, maxval=bound, dtype=dtype)


def kaiming_uniform(rng: jax.Array, shape, fan_in: int, dtype=jnp.float32) -> jax.Array:
    """torch ``nn.Linear`` default weight init (kaiming_uniform with a=sqrt(5)),
    which reduces to U(-sqrt(1/fan_in), sqrt(1/fan_in)) * sqrt(3)/sqrt(3)...
    For parity it equals U(-sqrt(6/((1+5)fan_in)), ...) = U(-1/sqrt(fan_in),..).
    """
    bound = math.sqrt(6.0 / ((1.0 + 5.0) * fan_in))
    return jax.random.uniform(rng, shape, minval=-bound, maxval=bound, dtype=dtype)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(rng: jax.Array, in_features: int, out_features: int,
                bias: bool = True, init: str = "trunc_normal",
                dtype=jnp.float32) -> dict:
    wk, bk = jax.random.split(rng)
    if init == "trunc_normal":          # ViT linears (ref :251-255)
        w = trunc_normal(wk, (in_features, out_features), std=0.02, dtype=dtype)
    elif init == "torch_default":       # decoder/head linears
        w = kaiming_uniform(wk, (in_features, out_features), in_features, dtype)
    else:
        raise ValueError(init)
    params = {"w": w}
    if bias:
        if init == "trunc_normal":
            params["b"] = jnp.zeros((out_features,), dtype)
        else:
            params["b"] = lecun_uniform(bk, (out_features,), in_features, dtype)
    return params


def linear(params: dict, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, params["w"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------

def layer_norm_init(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm over the last axis, computed in fp32 for stability."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch ``nn.GELU`` default used by the ViT Mlp."""
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------

def mlp_init(rng: jax.Array, dims: Sequence[int], init: str = "trunc_normal",
             dtype=jnp.float32) -> dict:
    """A stack of linears: dims = [in, hidden..., out]."""
    keys = jax.random.split(rng, len(dims) - 1)
    return {f"fc{i}": linear_init(k, dims[i], dims[i + 1], init=init, dtype=dtype)
            for i, k in enumerate(keys)}


def mlp_apply(params: dict, x: jax.Array, activation: str = "gelu") -> jax.Array:
    """Apply an MLP with the given inter-layer activation (none on output).

    ``gelu`` matches the ViT ``Mlp`` (ref ``vision_transformer.py:88-94``);
    ``relu`` matches the DETR-style ``MLP`` head used for objectness (ref
    ``maskformer.py:265-268``).
    """
    n = len(params)
    act = gelu if activation == "gelu" else jax.nn.relu
    for i in range(n):
        x = linear(params[f"fc{i}"], x)
        if i < n - 1:
            x = act(x)
    return x


# ---------------------------------------------------------------------------
# Dropout / DropPath (functional; identity when rate == 0 or rng is None)
# ---------------------------------------------------------------------------

def dropout(x: jax.Array, rate: float, rng: Optional[jax.Array]) -> jax.Array:
    if rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def drop_path(x: jax.Array, rate: float, rng: Optional[jax.Array]) -> jax.Array:
    """Stochastic depth per sample (ref ``vision_transformer.py:56-75``)."""
    if rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
