"""Clustering backends for pseudo-mask generation.

The reference imports ``SpectralClustering`` / ``KMeansClustering`` from a
``clusterings`` module whose source is missing from the repo (SURVEY §0.2;
imported by ``main`` and ``datasets/mask_generator`` bytecode, upstream
backed by faiss-gpu, ``README.md:68``).  Rebuilt here from the paper's
description ("Unsupervised Salient Object Detection with Spectral Cluster
Voting": normalized-cut spectral clustering over patch-feature affinities):

* affinity = thresholded cosine similarity of L2-normalized features;
* normalized Laplacian ``L_sym = I - D^-1/2 A D^-1/2``;
* the k smallest eigenvectors of ``L_sym`` — orthogonal subspace
  iteration (pure MXU matmuls) for the real pipeline node counts
  (784 ViT patch nodes, 3136 mocov2/swav res5 nodes), dense
  ``jnp.linalg.eigh`` below ``_EIGH_MAX_N``.  The eigh path is the
  scipy-validated oracle; the subspace path is label-equivalent on
  realistic affinities (measured on chip at N=784: partition agreement
  1.0000/0.9975/0.9957 for k=2/3/4 pre-vote, 41.5x faster —
  ``SOD_SPECTRAL_EIGH_MAX_N=1024`` reverts dino to dense eigh);
* row-normalized spectral embedding clustered by seeded k-means++ /
  Lloyd iterations (``lax.while/fori`` loops, fully jit-able and
  vmappable over a batch of images).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _kmeans_pp_init(rng: jax.Array, x: jax.Array, k: int) -> jax.Array:
    """k-means++ seeding (greedy max-min after the first random pick)."""
    n = x.shape[0]
    first = jax.random.randint(rng, (), 0, n)
    centers = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])

    def body(i, carry):
        centers, mind = carry
        d = jnp.sum((x - centers[i - 1]) ** 2, axis=-1)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind)
        centers = centers.at[i].set(x[nxt])
        return centers, mind

    centers, _ = jax.lax.fori_loop(
        1, k, body, (centers, jnp.full((n,), jnp.inf, x.dtype)))
    return centers


def kmeans(x: jax.Array, k: int, seed: int = 0,
           n_iters: int = 50) -> jax.Array:
    """Lloyd's algorithm; returns labels [N].  jit-able (static k)."""
    x = x.astype(jnp.float32)
    rng = jax.random.key(seed)
    centers = _kmeans_pp_init(rng, x, k)

    def step(_, centers):
        d = (jnp.sum(x * x, -1, keepdims=True)
             - 2.0 * x @ centers.T
             + jnp.sum(centers * centers, -1)[None, :])
        labels = jnp.argmin(d, axis=-1)
        one_hot = jax.nn.one_hot(labels, k, dtype=x.dtype)       # [N, k]
        counts = one_hot.sum(0)                                   # [k]
        sums = one_hot.T @ x                                      # [k, D]
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1)[:, None],
                        centers)
        return new

    centers = jax.lax.fori_loop(0, n_iters, step, centers)
    d = (jnp.sum(x * x, -1, keepdims=True) - 2.0 * x @ centers.T
         + jnp.sum(centers * centers, -1)[None, :])
    return jnp.argmin(d, axis=-1)


#: full dense eigh below this node count; orthogonal-subspace iteration
#: above it (an O(N^3) eigh is not MXU work — iterating [N, N] x [N, m]
#: matmuls is, and only the k smallest eigenvectors are needed).  512
#: puts BOTH real pipeline grids (dino 784, res5 3136) on the subspace
#: path: measured on chip the dino clustering program drops 426.8 ->
#: 10.3 ms/batch16 (41.5x) with partition agreement >= 0.9957 per k and
#: voted-pseudo-mask agreement measured end-to-end (docs/PERFORMANCE.md,
#: round 5).  Env-overridable for the scipy-exact dense path.
_EIGH_MAX_N = int(os.environ.get("SOD_SPECTRAL_EIGH_MAX_N", "512"))


def _build_lsym(features: jax.Array) -> jax.Array:
    f = features.astype(jnp.float32)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    a = f @ f.T                                   # cosine affinity
    a = jnp.maximum(a, 0.0)                       # threshold negatives
    n = a.shape[0]
    a = a * (1.0 - jnp.eye(n)) + jnp.eye(n)       # unit self-affinity
    deg = a.sum(axis=-1)
    d_inv_sqrt = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    return jnp.eye(n) - (d_inv_sqrt[:, None] * a * d_inv_sqrt[None, :])


def spectral_embedding(features: jax.Array, kmax: int,
                       n_subspace_iters: int = 100) -> jax.Array:
    """The ``kmax`` smallest eigenvectors of the normalized Laplacian.

    N <= _EIGH_MAX_N: dense ``jnp.linalg.eigh`` (validated against scipy,
    tests/test_clusterings_parity.py).  Larger N: orthogonal subspace
    iteration on ``2I - L_sym`` (PSD, largest eigenpairs == smallest of
    L_sym) followed by a Rayleigh-Ritz rotation — pure [N, N] x [N, m]
    MXU matmuls + tiny QR/eigh, ~40x cheaper than the full eigh at the
    3136-node ResNet grid and label-equivalent on realistic affinities
    (tested)."""
    l_sym = _build_lsym(features)
    n = l_sym.shape[0]
    if n <= _EIGH_MAX_N:
        _, eigvecs = jnp.linalg.eigh(l_sym)       # ascending
        return eigvecs[:, :kmax]

    m = kmax + 2                                  # guard vectors
    # deterministic start (keyed on nothing image-specific: the subspace
    # converges to the same invariant subspace regardless)
    q0 = jax.random.normal(jax.random.key(0), (n, m), jnp.float32)
    q0, _ = jnp.linalg.qr(q0)

    def body(_, q):
        z = 2.0 * q - l_sym @ q                   # (2I - L_sym) q
        q, _ = jnp.linalg.qr(z)
        return q

    q = jax.lax.fori_loop(0, n_subspace_iters, body, q0)
    # Rayleigh-Ritz: order the subspace by Ritz values of L_sym
    t = q.T @ (l_sym @ q)
    _, u = jnp.linalg.eigh((t + t.T) * 0.5)       # ascending
    return (q @ u)[:, :kmax]


def spectral_cluster(features: jax.Array, k: int, seed: int = 0,
                     n_kmeans_iters: int = 50) -> jax.Array:
    """Normalized-cut spectral clustering of [N, D] features -> labels [N]."""
    emb = spectral_embedding(features, k)
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True),
                            1e-12)
    return kmeans(emb, k, seed=seed, n_iters=n_kmeans_iters)


def spectral_cluster_multi(features: jax.Array, ks, seed: int = 0,
                           n_kmeans_iters: int = 50):
    """Labels for EVERY k in ``ks`` from ONE eigendecomposition — the
    pseudo-mask pipeline clusters each image at k in {2, 3, 4}
    (``configs/...yaml:11``) and the eigenbasis is shared (the first
    max(ks) eigenvectors nest)."""
    emb = spectral_embedding(features, max(ks))
    outs = []
    for k in ks:
        e = emb[:, :k]
        e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True),
                            1e-12)
        outs.append(kmeans(e, k, seed=seed, n_iters=n_kmeans_iters))
    return tuple(outs)


class KMeansClustering:
    """Reference-API shim (the missing module's class name)."""

    def __init__(self, use_gpu: bool = True, n_samples: Optional[int] = None):
        self.use_gpu = use_gpu      # kept for config parity; XLA decides
        self.n_samples = n_samples

    def __call__(self, features, k: int, seed: int = 0):
        return kmeans(jnp.asarray(features), k, seed=seed)


class SpectralClustering:
    """Reference-API shim (the missing module's class name)."""

    def __init__(self, use_gpu: bool = True, n_samples: Optional[int] = None):
        self.use_gpu = use_gpu
        self.n_samples = n_samples

    def __call__(self, features, k: int, seed: int = 0):
        return spectral_cluster(jnp.asarray(features), k, seed=seed)
