"""Specialty index variants: RRI (rerank-ready) and CQ (consistent query).

Reference behaviors rebuilt TPU-first:

- RRI — NeuronDB/src/index/index_rerank.c:3-8 ("stores top-k candidate
  lists for hot queries, enabling zero round trips to heap for
  reranking"): a per-query-hash cache table of precomputed candidates
  (``__rerank_cache_*``: query_hash -> candidate_id/vec/similarity,
  index_rerank.c:46-60,258-260), populated on miss and warmed in bulk
  (rerank_index_warm, index_rerank.c:374-435). Here the candidate lists
  are computed as batched exact GEMM top-k on device, and the cache is a
  host dict keyed by the query bytes' hash — a cache hit returns ids,
  distances AND the candidate vectors with no device round trip at all.

- CQ — NeuronDB/src/index/index_consistent.c:3-14,104-172 ("snapshot
  pinning to ensure identical query results across all replicas"):
  MVCC-pinned search with deterministic tie-breaking
  (ORDER BY dist ASC, ctid ASC, id ASC). JAX arrays are immutable, so a
  snapshot is literally a reference: ``pin()`` captures the current
  device arrays as a frozen version for free (no copy-on-write
  machinery), and ``search`` against a pinned version is unaffected by
  concurrent adds/deletes. Ties are broken by ascending external id, so
  two replicas holding the same snapshot return byte-identical results.
"""

from __future__ import annotations

import hashlib
import threading
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from neurondb_tpu.config import get_config
from neurondb_tpu.index.base import as_batch
from neurondb_tpu.ops import distance as D
from neurondb_tpu.ops import topk as TK


def _query_hash(q: np.ndarray) -> str:
    """Stable hash of the exact query bytes (index_rerank.c hashes the
    query literal; f32 bytes are the equivalent identity here)."""
    return hashlib.sha1(np.ascontiguousarray(q, np.float32).tobytes()
                        ).hexdigest()


class RerankReadyIndex:
    """Precomputed-candidate index (RRI).

    ``get_candidates`` returns (distances, ids, candidate_vectors) for a
    query: from the cache when the exact query was seen (or warmed), and
    from one exact device top-k otherwise. ``warm`` bulk-populates the
    cache for a batch of hot queries in a single GEMM dispatch.
    """

    kind = "rerank_ready"

    def __init__(self, vectors, *, metric: str = "l2", ids=None,
                 k: int = 32, max_cached: int = 10000):
        x = jnp.asarray(vectors, jnp.float32)
        self.metric = D.canonical_metric(metric)
        self.dim = int(x.shape[1])
        self.n = int(x.shape[0])
        self.k = int(k)
        self.max_cached = int(max_cached)
        self._vecs = x
        self._vecs_np = np.asarray(x)
        self._sqnorms = jnp.sum(x * x, axis=1)
        self._ids = (np.asarray(ids, np.int64) if ids is not None
                     else np.arange(self.n, dtype=np.int64))
        self._cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    # -- internal: batched exact candidate lists --
    def _compute(self, q: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        cfg = get_config()
        k = min(self.k, self.n)
        d, rows = TK.chunked_knn(
            jnp.asarray(q, jnp.float32), self._vecs, k, metric=self.metric,
            chunk=min(cfg.scan_chunk, max(self.n, 1)),
            base_sqnorms=self._sqnorms)
        d, rows = np.asarray(d), np.asarray(rows)
        return d, rows

    def warm(self, queries) -> int:
        """Precompute candidate lists for hot queries (rerank_index_warm
        parity). Returns the number of lists inserted."""
        q, _ = as_batch(queries)
        qn = np.asarray(q, np.float32)
        d, rows = self._compute(qn)
        added = 0
        with self._lock:
            for i in range(qn.shape[0]):
                h = _query_hash(qn[i])
                if h not in self._cache and len(self._cache) < self.max_cached:
                    self._cache[h] = (d[i], rows[i])
                    added += 1
        return added

    def get_candidates(self, query, k: Optional[int] = None
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(distances, external ids, candidate vectors) for one query.
        Cache hits are pure host memory — zero device round trips
        (index_rerank.c:211-218 returns candidate_vec from the cache
        table for the same reason)."""
        qn = np.asarray(query, np.float32).reshape(-1)
        h = _query_hash(qn)
        with self._lock:
            hit = self._cache.get(h)
        if hit is None:
            self.misses += 1
            d, rows = self._compute(qn[None])
            d, rows = d[0], rows[0]
            with self._lock:
                if len(self._cache) < self.max_cached:
                    self._cache[h] = (d, rows)
        else:
            self.hits += 1
            d, rows = hit
        kk = min(k or self.k, len(rows))
        rows_k = rows[:kk]
        safe = np.maximum(rows_k, 0)
        vecs = np.where((rows_k >= 0)[:, None], self._vecs_np[safe], 0.0)
        ids = np.where(rows_k >= 0, self._ids[safe], -1)
        return d[:kk], ids, vecs

    def search(self, queries, k: int = 10, **kw):
        q, single = as_batch(queries)
        qn = np.asarray(q, np.float32)
        outs_d, outs_i = [], []
        for i in range(qn.shape[0]):
            d, ids, _ = self.get_candidates(qn[i], k=k)
            outs_d.append(d)
            outs_i.append(ids)
        dd, ii = np.stack(outs_d), np.stack(outs_i)
        return (dd[0], ii[0]) if single else (dd, ii)

    def stats(self) -> Dict[str, int]:
        return {"cached": len(self._cache), "hits": self.hits,
                "misses": self.misses, "k": self.k}


class ConsistentIndex:
    """Snapshot-pinned deterministic kNN (CQ semantics).

    ``pin()`` freezes the current state under a version id; ``search``
    with ``snapshot=`` that id sees exactly that state regardless of
    later mutations. Results order ties by ascending external id
    (index_consistent.c:166 ORDER BY dist ASC, ... id ASC), so replicas
    sharing a snapshot return identical (id, dist) sequences.
    """

    kind = "consistent"

    def __init__(self, vectors=None, *, dim: Optional[int] = None,
                 metric: str = "l2", ids=None, seed: int = 0):
        self.metric = D.canonical_metric(metric)
        self.seed = int(seed)            # distributed determinism seed
        if vectors is None and dim is None:
            raise ValueError("need vectors or dim")
        if vectors is not None:
            x = jnp.asarray(vectors, jnp.float32)
            dim = int(x.shape[1])
        else:
            x = jnp.zeros((0, dim), jnp.float32)
        self.dim = int(dim)
        self._vecs = x
        self._sqnorms = jnp.sum(x * x, axis=1)
        self._ids = (np.asarray(ids, np.int64) if ids is not None
                     else np.arange(x.shape[0], dtype=np.int64))
        self._snapshots: Dict[int, Tuple] = {}
        self._next_vid = 1

    @property
    def n(self) -> int:
        return int(self._vecs.shape[0])

    def add(self, vectors, ids=None) -> None:
        x = jnp.asarray(vectors, jnp.float32)
        start = self.n
        new_ids = (np.asarray(ids, np.int64) if ids is not None
                   else np.arange(start, start + x.shape[0], dtype=np.int64))
        # jnp concat makes NEW arrays; pinned snapshots keep referencing
        # the old ones untouched
        self._vecs = jnp.concatenate([self._vecs, x])
        self._sqnorms = jnp.concatenate(
            [self._sqnorms, jnp.sum(x * x, axis=1)])
        self._ids = np.concatenate([self._ids, new_ids])

    def delete(self, ids) -> int:
        mask = ~np.isin(self._ids, np.asarray(ids, np.int64))
        removed = int((~mask).sum())
        if removed:
            keep = jnp.asarray(np.nonzero(mask)[0])
            self._vecs = self._vecs[keep]
            self._sqnorms = self._sqnorms[keep]
            self._ids = self._ids[mask]
        return removed

    def pin(self) -> int:
        """Freeze the current state; returns the snapshot version id."""
        vid = self._next_vid
        self._next_vid += 1
        self._snapshots[vid] = (self._vecs, self._sqnorms, self._ids)
        return vid

    def release(self, vid: int) -> None:
        self._snapshots.pop(vid, None)

    def search(self, queries, k: int = 10, *, snapshot: Optional[int] = None,
               **kw) -> Tuple[np.ndarray, np.ndarray]:
        if snapshot is not None:
            if snapshot not in self._snapshots:
                raise KeyError(f"unknown snapshot {snapshot}")
            vecs, sqnorms, ids = self._snapshots[snapshot]
        else:
            vecs, sqnorms, ids = self._vecs, self._sqnorms, self._ids
        cfg = get_config()
        q, single = as_batch(queries)
        n = int(vecs.shape[0])
        kk = min(k, max(n, 1))
        # fetch a margin so host-side deterministic tie-breaking can
        # reorder equal-distance candidates by external id
        km = min(n, kk + 8) if n else 1
        d, rows = TK.chunked_knn(
            q, vecs, km, metric=self.metric,
            chunk=min(cfg.scan_chunk, max(n, 1)), base_sqnorms=sqnorms)
        d, rows = np.asarray(d), np.asarray(rows)
        ext = np.where(rows >= 0, ids[np.maximum(rows, 0)], np.int64(2**62))
        # deterministic ordering: (dist ASC, id ASC); distances rounded
        # to f32 so replicas with different accumulation orders agree
        d32 = d.astype(np.float32)
        order = np.lexsort((ext, d32), axis=-1)[:, :kk]
        dd = np.take_along_axis(d32, order, axis=1)
        ii = np.take_along_axis(np.where(rows >= 0, ext, -1), order, axis=1)
        return (dd[0], ii[0]) if single else (dd, ii)

    def stats(self) -> Dict[str, int]:
        return {"n": self.n, "pinned": len(self._snapshots),
                "seed": self.seed}
