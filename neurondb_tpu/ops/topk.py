"""Top-k selection: the k-NN selection stage, streaming over HBM chunks.

The reference selects top-k with selection sort over candidate arrays
(NeuronDB/src/index/hnsw_am.c:1984-2013) and sorts per-probe candidates
host-side for IVF (src/index/ivf_am.c:1722+). On TPU the equivalent is:

- per-chunk exact selection via XLA TopK (``jax.lax.top_k``) or the
  TPU-optimized PartialReduce (``jax.lax.approx_min_k``), then
- a running merge across chunks inside ``lax.scan`` so the full [B, N]
  distance matrix is never materialized in HBM.

This module is the correctness oracle and the default execution path;
the fused Pallas scans (``ops/pallas/ivf_scan_grouped.py``,
``ops/pallas/ivfpq_scan.py``) fuse distance + selection into the list
scan for the IVF paths. ``recall_target < 1.0`` switches per-chunk
selection to the TPU-native PartialReduce (``lax.approx_min_k``),
measured 5.3x faster than XLA TopK at [16384, 16384].
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from neurondb_tpu.ops import distance as D

NEG_FILL = jnp.finfo(jnp.float32).max


def topk_smallest(scores: jax.Array, k: int, *,
                  recall_target: float = 1.0) -> Tuple[jax.Array, jax.Array]:
    """Smallest-k along the last axis -> (values, indices), ascending.

    recall_target < 1.0 uses the TPU-native approximate PartialReduce
    (``lax.approx_min_k``) which is substantially faster for large N.
    """
    k = min(k, scores.shape[-1])
    if recall_target < 1.0:
        vals, idx = jax.lax.approx_min_k(
            scores, k, recall_target=recall_target, aggregate_to_topk=True)
        return vals, idx
    negv, idx = jax.lax.top_k(-scores, k)
    return -negv, idx


def merge_topk(vals_a: jax.Array, idx_a: jax.Array,
               vals_b: jax.Array, idx_b: jax.Array,
               k: int) -> Tuple[jax.Array, jax.Array]:
    """Merge two (values, ids) top-k sets -> ascending top-k.

    Deterministic tie-break: on equal distance the candidate from ``a``
    wins (stable concat order + stable XLA sort), mirroring the
    deterministic cross-shard merge of the reference's
    merge_distributed_results (src/util/distributed.c:320).
    """
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    v, pos = jax.lax.top_k(-vals, min(k, vals.shape[-1]))
    return -v, jnp.take_along_axis(idx, pos, axis=-1)


def chunked_knn(
    queries: jax.Array,           # [B, D]
    base: jax.Array,              # [N, D]
    k: int,
    *,
    metric: str = "l2",
    chunk: int = 65536,
    base_sqnorms: Optional[jax.Array] = None,
    ids: Optional[jax.Array] = None,      # [N] global ids; default arange
    valid: Optional[jax.Array] = None,    # [N] bool mask (tombstones)
    recall_target: float = 1.0,
    dot_dtype=None,                       # bf16 GEMM inputs (see distance)
) -> Tuple[jax.Array, jax.Array]:
    """Exact k-NN scan without materializing [B, N]: lax.scan over N-chunks,
    GEMM distances per chunk, running top-k merge. Returns (dists [B,k],
    ids [B,k]) ascending. Invalid/padded slots get distance +inf and id -1.

    Replaces the reference's flat GPU scan SQL functions
    (vector_*_distance_gpu + host sort, src/gpu/common/gpu_sql.c:90-498).

    Runs as ONE jit: the pad/reshape/scan chain must never execute
    eagerly — per-primitive dispatch of big-array ops on this backend is
    ~1000x slower than the same ops inside a jit (see
    ml/kmeans.kmeans_predict)."""
    return _chunked_knn_jit(
        queries, base, base_sqnorms, ids, valid, k=min(k, base.shape[0]),
        metric=D.canonical_metric(metric), chunk=chunk,
        recall_target=recall_target,
        dot_dtype=None if dot_dtype is None else jnp.dtype(dot_dtype).name)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "chunk", "recall_target", "dot_dtype"))
def _chunked_knn_jit(queries, base, base_sqnorms, ids, valid, *, k: int,
                     metric: str, chunk: int, recall_target: float,
                     dot_dtype=None):
    B, dims = queries.shape
    N = base.shape[0]
    # Pad N to a multiple of chunk so scan trip count is static.
    n_chunks = max(1, -(-N // chunk))
    n_pad = n_chunks * chunk - N
    basep = jnp.pad(base, ((0, n_pad), (0, 0)))
    idsp = ids if ids is not None else jnp.arange(N, dtype=jnp.int32)
    idsp = jnp.pad(idsp, (0, n_pad), constant_values=-1)
    validp = jnp.ones((N,), jnp.bool_) if valid is None else valid
    validp = jnp.pad(validp, (0, n_pad), constant_values=False)
    sq = base_sqnorms
    if sq is None and metric in ("l2", "sqeuclidean", "cosine"):
        sq = jnp.sum(basep * basep, axis=-1)
    elif sq is not None:
        sq = jnp.pad(sq, (0, n_pad))

    base_c = basep.reshape(n_chunks, chunk, dims)
    ids_c = idsp.reshape(n_chunks, chunk)
    valid_c = validp.reshape(n_chunks, chunk)
    sq_c = sq.reshape(n_chunks, chunk) if sq is not None else None

    init = (jnp.full((B, k), NEG_FILL, jnp.float32),
            jnp.full((B, k), -1, jnp.int32))

    def step(carry, xs):
        bvals, bids = carry
        if sq_c is not None:
            xc, ic, vc, sqc = xs
        else:
            (xc, ic, vc), sqc = xs, None
        d = D.pairwise_distance(queries, xc, metric, base_sqnorms=sqc,
                                dot_dtype=dot_dtype)
        d = jnp.where(vc[None, :], d, NEG_FILL)
        cv, cpos = topk_smallest(d, k, recall_target=recall_target)
        cids = ic[cpos]
        bvals, bids = merge_topk(bvals, bids, cv, cids, k)
        return (bvals, bids), None

    xs = (base_c, ids_c, valid_c, sq_c) if sq_c is not None else (base_c, ids_c, valid_c)
    (vals, out_ids), _ = jax.lax.scan(step, init, xs)
    return vals, out_ids
