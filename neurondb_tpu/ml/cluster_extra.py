"""DBSCAN, agglomerative clustering, anomaly/outlier detection.

Reference: NeuronDB/src/ml/ml_dbscan.c (1341), ml_hierarchical.c (1623),
ml_anomaly_detection.c, ml_outlier_detection.c. TPU shapes:
- DBSCAN: the eps-neighborhood graph is a (chunked) distance matrix
  threshold; cluster expansion is label propagation over that implicit
  graph to a fixpoint (no per-point queue).
- Agglomerative: classic O(N^2) centroid/average linkage on device
  arrays with masked actives (suitable for the N<=10k the reference
  handles through SQL).
- Anomaly: z-score, IQR, kNN-distance and GMM-likelihood detectors.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from neurondb_tpu.ops import topk as TK


@functools.partial(jax.jit, static_argnames=("min_samples", "max_iter"))
def dbscan_fit(x, *, eps: float = 0.5, min_samples: int = 5,
               max_iter: int = 0) -> Dict:
    """Labels: -1 noise, else cluster id (smallest core-point row id in the
    cluster — stable, deterministic)."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    sq = jnp.sum(x * x, axis=1)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * x @ x.T, 0.0)
    adj = d2 <= eps * eps                                    # [N, N] incl self
    degree = jnp.sum(adj, axis=1)
    core = degree >= min_samples
    # propagate min-label through core connectivity: border points take the
    # label of any core neighbor; core-core edges merge clusters
    labels = jnp.where(core, jnp.arange(n), n)               # n = unassigned

    iters = max_iter or n

    def body(_, labels):
        # min over core neighbors (only core nodes propagate their label)
        nbr_lab = jnp.where(adj & core[None, :], labels[None, :], n)
        best = jnp.min(nbr_lab, axis=1)
        new = jnp.where(core, jnp.minimum(labels, best), best)
        return new

    labels = jax.lax.fori_loop(0, iters, body, labels)
    labels = jnp.where(labels >= n, -1, labels)
    return {"labels": labels.astype(jnp.int32), "core": core,
            "eps": jnp.float32(eps), "X": x}


def dbscan_predict(model: Dict, x) -> jax.Array:
    """Assign new points to the cluster of the nearest core point within
    eps, else -1."""
    q = jnp.asarray(x, jnp.float32)
    X = model["X"]
    core = model["core"]
    sq = jnp.sum(X * X, axis=1)
    d2 = jnp.maximum(jnp.sum(q * q, 1)[:, None] + sq[None, :]
                     - 2.0 * q @ X.T, 0.0)
    d2 = jnp.where(core[None, :], d2, jnp.inf)
    j = jnp.argmin(d2, axis=1)
    ok = jnp.take_along_axis(d2, j[:, None], 1)[:, 0] <= model["eps"] ** 2
    return jnp.where(ok, model["labels"][j], -1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def agglomerative_fit(x, n_clusters: int = 2) -> Dict:
    """Centroid-linkage agglomerative clustering (ml_hierarchical.c)."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    centroids = x
    sizes = jnp.ones((n,))
    active = jnp.ones((n,), bool)
    labels = jnp.arange(n)

    def merge(state, _):
        centroids, sizes, active, labels = state
        sq = jnp.sum(centroids * centroids, axis=1)
        d2 = jnp.maximum(sq[:, None] + sq[None, :]
                         - 2.0 * centroids @ centroids.T, 0.0)
        big = jnp.float32(jnp.finfo(jnp.float32).max)
        mask = active[:, None] & active[None, :] & ~jnp.eye(n, dtype=bool)
        d2 = jnp.where(mask, d2, big)
        flat = jnp.argmin(d2)
        i, j = flat // n, flat % n
        lo, hi = jnp.minimum(i, j), jnp.maximum(i, j)
        # merge hi into lo
        tot = sizes[lo] + sizes[hi]
        newc = (centroids[lo] * sizes[lo] + centroids[hi] * sizes[hi]) / tot
        centroids = centroids.at[lo].set(newc)
        sizes = sizes.at[lo].set(tot)
        active = active.at[hi].set(False)
        labels = jnp.where(labels == labels[hi], labels[lo], labels)
        return (centroids, sizes, active, labels), None

    (centroids, sizes, active, labels), _ = jax.lax.scan(
        merge, (centroids, sizes, active, labels), None,
        length=max(n - n_clusters, 0))
    return {"labels": labels.astype(jnp.int32), "active": active,
            "centroids": centroids}


def relabel_consecutive(labels: jax.Array) -> jax.Array:
    """Map arbitrary label values to 0..k-1 (host helper)."""
    import numpy as np
    lab = np.asarray(labels)
    uniq = {v: i for i, v in enumerate(sorted(set(lab.tolist())))}
    return jnp.asarray([uniq[int(v)] for v in lab], dtype=jnp.int32)


# ---- anomaly / outlier detection ----

def zscore_outliers(x, threshold: float = 3.0) -> jax.Array:
    x = jnp.asarray(x, jnp.float32)
    z = jnp.abs(x - jnp.mean(x, axis=0)) / jnp.maximum(jnp.std(x, axis=0),
                                                       1e-12)
    return jnp.any(z > threshold, axis=1)


def iqr_outliers(x, factor: float = 1.5) -> jax.Array:
    x = jnp.asarray(x, jnp.float32)
    q1 = jnp.percentile(x, 25, axis=0)
    q3 = jnp.percentile(x, 75, axis=0)
    iqr = q3 - q1
    lo, hi = q1 - factor * iqr, q3 + factor * iqr
    return jnp.any((x < lo) | (x > hi), axis=1)


def knn_outlier_scores(x, k: int = 5) -> jax.Array:
    """Mean distance to k nearest neighbors (excluding self)."""
    x = jnp.asarray(x, jnp.float32)
    d, _ = TK.chunked_knn(x, x, k + 1, metric="l2",
                          chunk=min(x.shape[0], 65536))
    return jnp.mean(d[:, 1:], axis=1)


def isolation_scores(x, *, n_trees: int = 50, sample: int = 256,
                     seed: int = 0) -> jax.Array:
    """Isolation-forest-style scores via random hyperplane split depths
    (a vectorized stand-in scoring the same phenomenon: short average
    isolation depth = outlier)."""
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    key = jax.random.PRNGKey(seed)
    depth_cap = int(jnp.ceil(jnp.log2(max(min(sample, n), 2))))

    def one_tree(key):
        ks = jax.random.split(key, depth_cap + 1)
        alive = jnp.ones((n,), bool)
        depth = jnp.zeros((n,))

        def level(carry, kk):
            alive, depth, code = carry
            w = jax.random.normal(kk, (d,))
            proj = x @ w
            # split at a random quantile between the alive min/max
            lo = jnp.min(jnp.where(alive, proj, jnp.inf))
            hi = jnp.max(jnp.where(alive, proj, -jnp.inf))
            t = lo + jax.random.uniform(kk) * jnp.maximum(hi - lo, 1e-12)
            side = proj > t
            code = code * 2 + side.astype(jnp.int32)
            # a point is "isolated" when its side-group is a singleton
            counts = jnp.zeros((2 ** depth_cap,)).at[
                code % (2 ** depth_cap)].add(alive.astype(jnp.float32))
            group = counts[code % (2 ** depth_cap)]
            newly = alive & (group <= 1.0)
            depth = jnp.where(alive, depth + 1.0, depth)
            alive = alive & ~newly
            return (alive, depth, code), None

        (alive, depth, _), _ = jax.lax.scan(
            level, (alive, depth, jnp.zeros((n,), jnp.int32)),
            ks[:depth_cap])
        return depth

    keys = jax.random.split(key, n_trees)
    depths = jax.vmap(one_tree)(keys)                       # [T, N]
    mean_depth = jnp.mean(depths, axis=0)
    return -mean_depth  # higher score = more anomalous (isolated earlier)
