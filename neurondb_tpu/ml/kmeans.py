"""K-means — MXU-native Lloyd's iterations (+ mini-batch variant).

Reference semantics: NeuronDB/src/index/ivf_am.c:2164-2294
(kmeans_assign = nearest centroid by L2, kmeans_update_centroids = mean of
assigned points, find_nearest_centroid), defaults max_iter=50 tol=1e-3
(ivf_am.c:56-57); the standalone trainers src/ml/ml_kmeans.c
(cluster_kmeans:148, train_kmeans_model_id:412, evaluate_kmeans:626) and
src/ml/ml_minibatch_kmeans.c.

TPU design: assignment is a [N, k] GEMM-argmin (squared-L2 expansion on the
MXU); the update is a one-hot matmul segment-sum — also a GEMM — so a whole
Lloyd's iteration is two GEMMs inside one jitted ``lax.while_loop``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class KMeansState(NamedTuple):
    centroids: jax.Array   # [k, D]
    inertia: jax.Array     # scalar: sum of squared distances
    n_iter: jax.Array      # scalar int32
    shift: jax.Array       # last centroid movement (for tol test)


def _assign(x: jax.Array, centroids: jax.Array,
            x_sq: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
    """Nearest centroid per row: ([N] int32 labels, [N] f32 sq-dists)."""
    if x_sq is None:
        x_sq = jnp.sum(x * x, axis=1)
    c_sq = jnp.sum(centroids * centroids, axis=1)
    dots = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
    d2 = x_sq[:, None] + c_sq[None, :] - 2.0 * dots
    labels = jnp.argmin(d2, axis=1).astype(jnp.int32)
    best = jnp.maximum(jnp.min(d2, axis=1), 0.0)
    return labels, best


def _update(x: jax.Array, labels: jax.Array, k: int,
            old: jax.Array, weights: Optional[jax.Array] = None) -> jax.Array:
    """Mean of assigned points per cluster; empty clusters keep old centroid
    (matches kmeans_update_centroids's no-member guard)."""
    onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)            # [N, k]
    if weights is not None:
        onehot = onehot * weights[:, None]
    sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)  # [k, D]
    counts = jnp.sum(onehot, axis=0)                             # [k]
    means = sums / jnp.maximum(counts[:, None], 1.0)
    return jnp.where(counts[:, None] > 0, means, old)


def kmeans_plusplus_init(x: jax.Array, k: int, key: jax.Array) -> jax.Array:
    """k-means++ seeding (D^2 sampling), fixed trip count."""
    n = x.shape[0]
    x_sq = jnp.sum(x * x, axis=1)
    first = jax.random.randint(key, (), 0, n)
    centroids = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])
    mind2 = jnp.maximum(
        x_sq + jnp.sum(x[first] ** 2) - 2.0 * jnp.dot(x, x[first]), 0.0)

    def body(i, carry):
        centroids, mind2, key = carry
        key, sub = jax.random.split(key)
        probs = mind2 / jnp.maximum(jnp.sum(mind2), 1e-30)
        idx = jax.random.choice(sub, n, p=probs)
        c = x[idx]
        centroids = centroids.at[i].set(c)
        d2 = jnp.maximum(x_sq + jnp.sum(c * c) - 2.0 * jnp.dot(x, c), 0.0)
        return centroids, jnp.minimum(mind2, d2), key

    centroids, _, _ = jax.lax.fori_loop(1, k, body, (centroids, mind2, key))
    return centroids


@functools.partial(jax.jit, static_argnames=("k", "max_iter", "init"))
def kmeans_fit(x: jax.Array, k: int, *, max_iter: int = 50,
               tol: float = 1e-3, seed: int = 0,
               init: str = "kmeans++") -> KMeansState:
    """Full-batch Lloyd's. Convergence: mean centroid shift < tol
    (ivf_am.c:56-57 envelope: <=50 iters @ 1e-3)."""
    x = jnp.asarray(x, jnp.float32)
    key = jax.random.PRNGKey(seed)
    if init == "kmeans++":
        c0 = kmeans_plusplus_init(x, k, key)
    else:
        idx = jax.random.choice(key, x.shape[0], (k,), replace=False)
        c0 = x[idx]
    x_sq = jnp.sum(x * x, axis=1)

    def cond(s: KMeansState):
        return (s.n_iter < max_iter) & (s.shift >= tol)

    def body(s: KMeansState):
        labels, d2 = _assign(x, s.centroids, x_sq)
        new_c = _update(x, labels, k, s.centroids)
        shift = jnp.mean(jnp.linalg.norm(new_c - s.centroids, axis=1))
        return KMeansState(new_c, jnp.sum(d2), s.n_iter + 1, shift)

    init_state = KMeansState(c0, jnp.float32(jnp.inf), jnp.int32(0),
                             jnp.float32(jnp.inf))
    s = jax.lax.while_loop(cond, body, init_state)
    # final inertia with the final centroids
    _, d2 = _assign(x, s.centroids, x_sq)
    return KMeansState(s.centroids, jnp.sum(d2), s.n_iter, s.shift)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _predict_chunked(centroids: jax.Array, x: jax.Array,
                     *, chunk: int) -> jax.Array:
    pad = (-x.shape[0]) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0))).reshape(-1, chunk, x.shape[1])
    return jax.lax.map(lambda xc: _assign(xc, centroids)[0],
                       xp).reshape(-1)


def kmeans_predict(centroids: jax.Array, x: jax.Array,
                   chunk: int = 131072) -> jax.Array:
    """Nearest-centroid labels, chunked over rows so the [N, k] distance
    block never exceeds ~chunk*k floats (1M x 1024 would be 4.3GB).

    The pad/reshape/map MUST run under one jit: eager per-primitive
    dispatch of big-array ops is pathological on this backend (measured
    round 2: the same 1M assignment is 1.1 s jitted vs 765 s eager —
    IVF build_seconds regressed 28 s -> 900 s before this was found)."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    if n <= chunk:
        return jax.jit(_assign)(x, centroids)[0]
    return _predict_chunked(centroids, x, chunk=chunk)[:n]


@functools.partial(jax.jit, static_argnames=("k", "batch", "iters"))
def minibatch_kmeans_fit(x: jax.Array, k: int, *, batch: int = 1024,
                         iters: int = 100, seed: int = 0) -> KMeansState:
    """Mini-batch k-means (ml_minibatch_kmeans.c parity): per-batch
    assignment + per-cluster learning-rate update (Sculley 2010)."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    key = jax.random.PRNGKey(seed)
    c0 = kmeans_plusplus_init(x, k, key)

    def body(i, carry):
        centroids, counts, key = carry
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (batch,), 0, n)
        xb = x[idx]
        labels, _ = _assign(xb, centroids)
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
        bc = jnp.sum(onehot, axis=0)
        new_counts = counts + bc
        lr = bc / jnp.maximum(new_counts, 1.0)
        bmean = jnp.dot(onehot.T, xb) / jnp.maximum(bc[:, None], 1.0)
        centroids = jnp.where(
            bc[:, None] > 0,
            centroids * (1.0 - lr[:, None]) + bmean * lr[:, None],
            centroids)
        return centroids, new_counts, key

    c, _, _ = jax.lax.fori_loop(
        0, iters, body, (c0, jnp.zeros((k,), jnp.float32), key))
    _, d2 = _assign(x, c)
    return KMeansState(c, jnp.sum(d2), jnp.int32(iters), jnp.float32(0))


def silhouette_score(x: jax.Array, labels: jax.Array, k: int,
                     sample: int = 2048, seed: int = 0) -> jax.Array:
    """Approximate silhouette via centroid distances (fast evaluate path,
    matching evaluate_kmeans_by_model_id's cluster-quality metrics)."""
    x = jnp.asarray(x, jnp.float32)
    centroids = _update(x, labels, k, jnp.zeros((k, x.shape[1])))
    d = jnp.sqrt(jnp.maximum(
        jnp.sum(x * x, axis=1)[:, None] + jnp.sum(centroids ** 2, axis=1)[None, :]
        - 2.0 * jnp.dot(x, centroids.T), 0.0))                   # [N, k]
    own = jnp.take_along_axis(d, labels[:, None], axis=1)[:, 0]
    masked = jnp.where(jax.nn.one_hot(labels, k, dtype=bool), jnp.inf, d)
    other = jnp.min(masked, axis=1)
    s = (other - own) / jnp.maximum(jnp.maximum(own, other), 1e-30)
    return jnp.mean(s)


def davies_bouldin_index(x: jax.Array, labels: jax.Array, k: int) -> jax.Array:
    """Davies-Bouldin cluster-quality index (src/ml/ml_davies_bouldin.c)."""
    x = jnp.asarray(x, jnp.float32)
    centroids = _update(x, labels, k, jnp.zeros((k, x.shape[1])))
    onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    # mean intra-cluster distance to centroid
    d_own = jnp.linalg.norm(x - centroids[labels], axis=1)
    intra = (jnp.zeros((k,)).at[labels].add(d_own)) / jnp.maximum(counts, 1.0)
    cd = jnp.linalg.norm(centroids[:, None, :] - centroids[None, :, :], axis=-1)
    ratio = (intra[:, None] + intra[None, :]) / jnp.maximum(cd, 1e-30)
    ratio = jnp.where(jnp.eye(k, dtype=bool), -jnp.inf, ratio)
    valid = counts > 0
    r = jnp.where(valid[:, None] & valid[None, :], ratio, -jnp.inf)
    per = jnp.max(r, axis=1)
    per = jnp.where(valid & jnp.isfinite(per), per, 0.0)
    return jnp.sum(per) / jnp.maximum(jnp.sum(valid), 1.0)
