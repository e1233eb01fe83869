"""On-device k-means for IVF partitioning (new TPU component; replaces the
index_params plumbing the reference forwards to Chroma/FAISS,
``utu/rag/config.py:63-66``).

Lloyd's iterations run fully under ``jit``: assignment is an MXU matmul
(argmax of cosine/IP against centroids), the update is a segment-sum via
one-hot matmul — both large, static-shaped ops XLA tiles well."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def kmeans_fit(x: jax.Array, n_clusters: int, iters: int = 10, seed: int = 0):
    """Fit k-means centroids on unit-normalized vectors (spherical k-means).

    Args:
      x: [N, d] float; should be L2-normalized for cosine metrics.
    Returns:
      centroids [n_clusters, d] float32 (L2-normalized).
    """
    n, d = x.shape
    x = x.astype(jnp.float32)
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (n_clusters,), replace=n < n_clusters)
    cent = x[init_idx]

    def step(cent, _):
        sim = x @ cent.T  # [N, C]
        assign = jnp.argmax(sim, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.float32)  # [N, C]
        sums = onehot.T @ x  # [C, d]
        counts = jnp.sum(onehot, axis=0)[:, None]  # [C, 1]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), cent)
        norm = jnp.linalg.norm(new, axis=1, keepdims=True)
        new = new / jnp.maximum(norm, 1e-12)
        return new, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent


@jax.jit
def kmeans_assign(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """Assign rows of x [N, d] to nearest centroid by inner product."""
    sim = x.astype(jnp.float32) @ centroids.T.astype(jnp.float32)
    return jnp.argmax(sim, axis=1).astype(jnp.int32)
