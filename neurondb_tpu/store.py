"""VectorStore — HBM-resident vector table with ids and tombstones.

Replaces the reference's heap-table + varlena storage: instead of one
vector per 8KB page behind the PG buffer manager (the design that forces
one buffer read per distance, NeuronDB/src/index/hnsw_am.c:124-156), the
store is a single padded [capacity, D] device array plus int64 ids and a
validity bitmap. Deletes are tombstones (mask flips) compacted by the
maintenance worker — the neurandefrag role (src/worker/worker_defrag.c).

Capacity grows by doubling so jitted consumers re-trace only O(log N)
times. Quantized stores keep codes + scales per ``neurondb_tpu.types.
quantized`` and can serve search directly (asymmetric) or via rerank.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neurondb_tpu.config import get_config
from neurondb_tpu.ops import distance as D
from neurondb_tpu.ops import topk as TK
from neurondb_tpu.types.quantized import Quantized, quantize, dequantize


def _round_capacity(n: int) -> int:
    cap = 1024
    while cap < n:
        cap *= 2
    return cap


class VectorStore:
    """A mutable table of vectors. Host-side object owning device arrays."""

    def __init__(self, dim: int, *, dtype: str = "float32",
                 metric: str = "l2", capacity: int = 1024):
        cfg = get_config()
        if dim <= 0 or dim > cfg.max_dim:
            raise ValueError(
                f"dimension {dim} out of range (1..{cfg.max_dim})")  # neurondb.h:113
        self.dim = dim
        self.metric = D.canonical_metric(metric)
        self.dtype = dtype
        self._capacity = _round_capacity(capacity)
        self._n = 0
        self._next_id = 0
        store_dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self._vecs = jnp.zeros((self._capacity, dim), store_dt)
        # external ids stay host-side int64 (device int32 would truncate)
        self._ids = np.full((self._capacity,), -1, np.int64)
        self._valid = jnp.zeros((self._capacity,), jnp.bool_)
        self._sqnorms = jnp.zeros((self._capacity,), jnp.float32)
        self._deleted = 0

    # ---- properties ----
    def __len__(self) -> int:
        return self._n - self._deleted

    @property
    def size(self) -> int:
        return self._n            # rows including tombstones

    @property
    def capacity(self) -> int:
        return self._capacity

    @property
    def vectors(self) -> jax.Array:
        return self._vecs

    @property
    def ids(self) -> jax.Array:
        return self._ids

    @property
    def valid(self) -> jax.Array:
        return self._valid

    @property
    def sqnorms(self) -> jax.Array:
        return self._sqnorms

    # ---- mutation ----
    def _grow_to(self, need: int) -> None:
        if need <= self._capacity:
            return
        new_cap = _round_capacity(need)
        pad = new_cap - self._capacity
        self._vecs = jnp.pad(self._vecs, ((0, pad), (0, 0)))
        self._ids = np.pad(self._ids, (0, pad), constant_values=-1)
        self._valid = jnp.pad(self._valid, (0, pad), constant_values=False)
        self._sqnorms = jnp.pad(self._sqnorms, (0, pad))
        self._capacity = new_cap

    def add(self, vecs, ids=None) -> np.ndarray:
        """Append [M, D] vectors; returns assigned int64 ids."""
        vecs = jnp.asarray(vecs)
        if vecs.ndim == 1:
            vecs = vecs[None, :]
        if vecs.shape[1] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {vecs.shape[1]}")
        m = vecs.shape[0]
        if ids is None:
            new_ids = np.arange(self._next_id, self._next_id + m, dtype=np.int64)
            self._next_id += m
        else:
            new_ids = np.asarray(ids, np.int64)
            if len(new_ids):
                self._next_id = max(self._next_id, int(new_ids.max()) + 1)
        self._grow_to(self._n + m)
        sl = slice(self._n, self._n + m)
        vf = vecs.astype(jnp.float32)
        self._vecs = self._vecs.at[sl].set(vecs.astype(self._vecs.dtype))
        self._ids[sl] = new_ids
        self._valid = self._valid.at[sl].set(True)
        self._sqnorms = self._sqnorms.at[sl].set(jnp.sum(vf * vf, axis=1))
        self._n += m
        return new_ids

    def delete(self, ids) -> int:
        """Tombstone rows by external id; returns count removed."""
        ids = np.atleast_1d(np.asarray(ids, np.int64))
        mask = np.isin(self._ids, ids) & np.asarray(self._valid)
        removed = int(mask.sum())
        self._valid = jnp.where(jnp.asarray(mask), False, self._valid)
        self._deleted += removed
        return removed

    def compact(self) -> None:
        """Physically drop tombstones (neurandefrag role)."""
        keep = np.asarray(self._valid[: self._n])
        idx = np.nonzero(keep)[0]
        n = len(idx)
        vecs = jnp.asarray(np.asarray(self._vecs)[idx])
        ids = self._ids[idx]
        self.__init__(self.dim, dtype=self.dtype, metric=self.metric,
                      capacity=max(n, 1024))
        if n:
            self.add(vecs, ids=np.asarray(ids))

    def get(self, ids) -> np.ndarray:
        ids = np.atleast_1d(np.asarray(ids, np.int64))
        all_ids = np.asarray(self._ids)
        pos = {int(v): i for i, v in enumerate(all_ids[: self._n])}
        rows = [pos[int(i)] for i in ids]
        return np.asarray(self._vecs)[rows]

    # ---- search ----
    def search(self, queries, k: int = 10, *,
               metric: Optional[str] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Exact flat k-NN: (dists [B,k], ids [B,k]). The batched-query
        replacement for the <->-ordered index scan (SURVEY.md §7 API)."""
        cfg = get_config()
        q = jnp.asarray(queries, jnp.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        m = D.canonical_metric(metric or self.metric)
        dists, rows = TK.chunked_knn(
            q, self._vecs.astype(jnp.float32), k,
            metric=m, chunk=min(cfg.scan_chunk, self._capacity),
            base_sqnorms=self._sqnorms if m in ("l2", "sqeuclidean", "cosine") else None,
            valid=self._valid,
            recall_target=cfg.topk_recall_target)
        dists, rows = np.asarray(dists), np.asarray(rows)
        out_ids = np.where(rows >= 0, self._ids[np.maximum(rows, 0)], -1)
        return (dists[0], out_ids[0]) if single else (dists, out_ids)

    # ---- quantization ----
    def quantized(self, fmt: str) -> Quantized:
        return quantize(self._vecs[: self._n].astype(jnp.float32), fmt)
