"""Flat (exact) indexes: f32 scan and quantized scan + exact rerank.

Replaces the reference's GPU flat-scan SQL surface
(NeuronDB/src/gpu/common/gpu_sql.c:90-498: vector_*_distance_gpu + host
sort) and the fp16/int8 distance paths in src/types/quantization.c.
The quantized index implements the asymmetric search-then-rerank pipeline
of BASELINE.json config #3: coarse k'·k candidates from the compressed
store, exact rerank from the f32 (or f16) originals.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neurondb_tpu.config import get_config
from neurondb_tpu.index.base import BaseIndex, as_batch
from neurondb_tpu.ops import distance as D
from neurondb_tpu.ops import topk as TK
from neurondb_tpu.types.quantized import Quantized, dequantize, quantize


class FlatIndex(BaseIndex):
    """Exact brute-force k-NN over an [N, D] device array."""

    kind = "flat"

    def __init__(self, vectors, *, metric: str = "l2", ids=None,
                 store_dtype: str = "float32"):
        x = jnp.asarray(vectors)
        self.metric = D.canonical_metric(metric)
        self.dim = int(x.shape[1])
        self.n = int(x.shape[0])
        dt = jnp.bfloat16 if store_dtype == "bfloat16" else jnp.float32
        self._store_dtype = store_dtype
        self._vecs = x.astype(dt)
        xf = x.astype(jnp.float32)
        self._sqnorms = jnp.sum(xf * xf, axis=1)
        # external ids stay host-side int64: mapping on device would
        # silently truncate ids beyond int32
        self._ids = (np.asarray(ids, np.int64) if ids is not None
                     else np.arange(self.n, dtype=np.int64))

    def search(self, queries, k: int = 10, **kw) -> Tuple[np.ndarray, np.ndarray]:
        cfg = get_config()
        q, single = as_batch(queries)
        dists, rows = TK.chunked_knn(
            q, self._vecs.astype(jnp.float32), k, metric=self.metric,
            chunk=min(cfg.scan_chunk, max(self.n, 1)),
            base_sqnorms=self._sqnorms,
            recall_target=cfg.topk_recall_target)
        dists, rows = np.asarray(dists), np.asarray(rows)
        ids = np.where(rows >= 0, self._ids[np.maximum(rows, 0)], -1)
        return (dists[0], ids[0]) if single else (dists, ids)

    def _state(self):
        return ({"vecs": self._vecs.astype(jnp.float32), "ids": self._ids},
                {"store_dtype": self._store_dtype, "n": self.n})

    def _load_state(self, arrays, meta):
        self.__init__(arrays["vecs"], metric=meta["metric"], ids=arrays["ids"],
                      store_dtype=meta.get("store_dtype", "float32"))


class QuantizedFlatIndex(BaseIndex):
    """Compressed flat scan with optional exact rerank.

    search(k, rerank=R): coarse top-(R*k) from the quantized codes, then
    exact distances on those candidates from the kept originals. R=0 skips
    rerank (pure compressed scan). Binary codes score by Hamming distance
    (the reference's bit fast path) regardless of the final metric, then
    rerank fixes the ordering.
    """

    kind = "quantized_flat"

    def __init__(self, vectors, *, fmt: str = "int8", metric: str = "l2",
                 ids=None, keep_originals: bool = True):
        x = jnp.asarray(vectors, jnp.float32)
        self.metric = D.canonical_metric(metric)
        self.dim = int(x.shape[1])
        self.n = int(x.shape[0])
        self.fmt = fmt
        self.q = quantize(x, fmt)
        self._orig = x if keep_originals else None
        self._orig_sq = jnp.sum(x * x, axis=1) if keep_originals else None
        self._ids = (np.asarray(ids, np.int64) if ids is not None
                     else np.arange(self.n, dtype=np.int64))
        # decoded approximation used for the coarse pass on non-binary formats
        if fmt != "binary":
            self._approx = dequantize(self.q)
            self._approx_sq = jnp.sum(self._approx * self._approx, axis=1)

    @property
    def compression_bytes(self) -> int:
        return self.q.nbytes

    def search(self, queries, k: int = 10, *, rerank: int = 4,
               **kw) -> Tuple[np.ndarray, np.ndarray]:
        cfg = get_config()
        q, single = as_batch(queries)
        coarse_k = max(k, min(self.n, k * max(rerank, 1)))
        if self.fmt == "binary":
            qbits = quantize(q, "binary")
            d = D.pairwise_distance(qbits.codes, self.q.codes, "hamming")
            d = d.astype(jnp.float32)
            cd, rows = TK.topk_smallest(d, coarse_k)
        else:
            cd, rows = TK.chunked_knn(
                q, self._approx, coarse_k, metric=self.metric,
                chunk=min(cfg.scan_chunk, max(self.n, 1)),
                base_sqnorms=self._approx_sq)
        if rerank and self._orig is not None:
            rows_safe = jnp.maximum(rows, 0)
            cand = self._orig[rows_safe]                         # [B, ck, D]
            dd = _exact_candidate_dist(q, cand, self.metric)
            dd = jnp.where(rows >= 0, dd, TK.NEG_FILL)
            vals, pos = TK.topk_smallest(dd, k)
            rows = jnp.take_along_axis(rows, pos, axis=-1)
            cd = vals
        else:
            cd, rows = cd[:, :k], rows[:, :k]
        cd, rows = np.asarray(cd), np.asarray(rows)
        ids = np.where(rows >= 0, self._ids[np.maximum(rows, 0)], -1)
        return (cd[0], ids[0]) if single else (cd, ids)

    def _state(self):
        arrays = {"codes": self.q.codes, "scale": self.q.scale,
                  "offset": self.q.offset, "ids": self._ids}
        if self._orig is not None:
            arrays["orig"] = self._orig
        return arrays, {"fmt": self.fmt, "n": self.n, "qdim": self.q.dim}

    def _load_state(self, arrays, meta):
        self.metric = meta["metric"]
        self.dim = meta["dim"]
        self.n = meta["n"]
        self.fmt = meta["fmt"]
        self.q = Quantized(jnp.asarray(arrays["codes"]),
                           jnp.asarray(arrays["scale"]),
                           jnp.asarray(arrays["offset"]),
                           meta["fmt"], meta["qdim"])
        self._ids = np.asarray(arrays["ids"], np.int64)
        if "orig" in arrays:
            self._orig = jnp.asarray(arrays["orig"])
            self._orig_sq = jnp.sum(self._orig * self._orig, axis=1)
        else:
            self._orig, self._orig_sq = None, None
        if self.fmt != "binary":
            self._approx = dequantize(self.q)
            self._approx_sq = jnp.sum(self._approx * self._approx, axis=1)


def _exact_candidate_dist(q: jax.Array, cand: jax.Array, metric: str) -> jax.Array:
    """q [B, D] vs per-query candidates [B, C, D] -> [B, C]."""
    if metric in ("l2", "sqeuclidean"):
        d = q[:, None, :] - cand
        d2 = jnp.sum(d * d, axis=-1)
        return d2 if metric == "sqeuclidean" else jnp.sqrt(jnp.maximum(d2, 0.0))
    if metric == "ip":
        return -jnp.einsum("bd,bcd->bc", q, cand)
    if metric == "cosine":
        dots = jnp.einsum("bd,bcd->bc", q, cand)
        qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
        cn = jnp.linalg.norm(cand, axis=-1)
        den = jnp.maximum(qn * cn, 1e-30)
        return 1.0 - jnp.where(den > 1e-30, dots / den, 0.0)
    # generic fallback
    return jax.vmap(lambda qq, cc: D.pairwise_distance(qq[None], cc, metric)[0])(
        q, cand)
