"""Product quantization + OPQ — compressed ANN with asymmetric distance.

Reference: NeuronDB/src/ml/ml_product_quantization.c (train_pq_codebook:192,
pq_encode_vector:416, pq_asymmetric_distance:1003), ml_opq.c
(train_opq_rotation:94) and gpu_pq_kernels.cu.

TPU design: per-subspace codebooks train as a vmapped batched k-means (all
M subspaces in parallel on the MXU). Search exploits the identity
ADC(q, x) = ||q - decode(x)||^2: each scan chunk gathers its codes'
centroids into a decoded block and reuses the fused GEMM+top-k scan, so
the hot loop stays on the MXU instead of doing scalar LUT lookups (the
reference's pq_asymmetric_distance walks a [M, ksub] table per vector).
OPQ learns a rotation R by alternating PQ training with the Procrustes
solution of min ||XR - decode(XR)|| (OPQ-NP).

Why not an ADC-LUT kernel (measured, round 2): the LUT formulation as
MXU matmuls is one-hot(codes) @ LUT per subspace = n_sub*ksub multiplies
per (vector, query) pair vs D for decode+GEMM — 32x MORE FLOPs at
n_sub=16/ksub=256/D=128; and per-element dynamic VMEM gathers map poorly
to the VPU's lane structure. decode+GEMM reads only the 16x-compressed
codes from HBM (the decode gather hits VMEM-resident codebooks), so the
scan is compute-bound at flat-GEMM FLOPs with 16x less memory traffic —
the right trade on an MXU machine. Measured 1M x 128: 2.4k QPS
(n_sub=16), vs 1.5k flat; PQ's value here is the 16-64x memory
compression, not scan speedup. For speed AND compression, route through
IVF first (posting-list pruning), as BASELINE config #3 does via
QuantizedFlatIndex/int8.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neurondb_tpu.config import get_config
from neurondb_tpu.index.base import BaseIndex, as_batch
from neurondb_tpu.ml.kmeans import kmeans_fit
from neurondb_tpu.ops import topk as TK
from neurondb_tpu.ops import distance as D


@functools.partial(jax.jit, static_argnames=("n_sub", "ksub", "iters"))
def train_pq_codebook(x: jax.Array, *, n_sub: int = 8, ksub: int = 256,
                      iters: int = 25, seed: int = 0) -> jax.Array:
    """[n_sub, ksub, ds] codebooks; all subspaces train in parallel."""
    n, d = x.shape
    ds = d // n_sub
    xs = x[:, : n_sub * ds].reshape(n, n_sub, ds).transpose(1, 0, 2)

    def fit_one(sub_x, key_seed):
        s = kmeans_fit(sub_x, ksub, max_iter=iters, seed=0, init="kmeans++")
        return s.centroids

    # vmap over subspaces (kmeans_fit is jit-compatible)
    return jax.vmap(lambda sx: kmeans_fit(
        sx, ksub, max_iter=iters, init="kmeans++").centroids)(xs)


@jax.jit
def pq_encode(codebooks: jax.Array, x: jax.Array) -> jax.Array:
    """[N, n_sub] uint8 codes via per-subspace GEMM argmin."""
    n_sub, ksub, ds = codebooks.shape
    n = x.shape[0]
    xs = x[:, : n_sub * ds].reshape(n, n_sub, ds).transpose(1, 0, 2)

    def enc(sub_x, cb):
        d2 = (jnp.sum(sub_x * sub_x, 1)[:, None]
              + jnp.sum(cb * cb, 1)[None, :]
              - 2.0 * jnp.dot(sub_x, cb.T, preferred_element_type=jnp.float32))
        return jnp.argmin(d2, axis=1)

    codes = jax.vmap(enc)(xs, codebooks)               # [n_sub, N]
    return codes.T.astype(jnp.uint8 if ksub <= 256 else jnp.int32)


@jax.jit
def pq_decode(codebooks: jax.Array, codes: jax.Array) -> jax.Array:
    """[N, n_sub*ds] reconstruction."""
    n_sub, ksub, ds = codebooks.shape
    g = jax.vmap(lambda cb, c: cb[c], in_axes=(0, 1))(codebooks,
                                                      codes.astype(jnp.int32))
    return g.transpose(1, 0, 2).reshape(codes.shape[0], n_sub * ds)


def pq_asymmetric_distance(codebooks: jax.Array, q: jax.Array,
                           codes: jax.Array) -> jax.Array:
    """[B, N] squared ADC distances (reference pq_asymmetric_distance
    semantics), via the LUT formulation — used for small N / parity tests;
    the index scan path uses the decode+GEMM identity instead."""
    n_sub, ksub, ds = codebooks.shape
    B = q.shape[0]
    qs = q[:, : n_sub * ds].reshape(B, n_sub, ds).transpose(1, 0, 2)

    def tab(sub_q, cb):                                  # [B, ksub]
        return (jnp.sum(sub_q * sub_q, 1)[:, None]
                + jnp.sum(cb * cb, 1)[None, :]
                - 2.0 * jnp.dot(sub_q, cb.T,
                                preferred_element_type=jnp.float32))

    tables = jax.vmap(tab)(qs, codebooks)                # [n_sub, B, ksub]
    ci = codes.astype(jnp.int32)                         # [N, n_sub]
    per_sub = jax.vmap(lambda t, c: t[:, c], in_axes=(0, 1))(tables, ci)
    return jnp.maximum(jnp.sum(per_sub, axis=0), 0.0)    # [B, N]


@functools.partial(jax.jit, static_argnames=("pq_iters", "opq_iters",
                                             "n_sub", "ksub"))
def train_opq_rotation(x: jax.Array, *, n_sub: int = 8, ksub: int = 256,
                       pq_iters: int = 15, opq_iters: int = 8) -> Tuple:
    """(R [D, D], codebooks) — OPQ-NP alternating minimization
    (train_opq_rotation parity)."""
    d = x.shape[1]
    R = jnp.eye(d)

    def body(_, carry):
        R, _ = carry
        xr = x @ R
        cb = train_pq_codebook(xr, n_sub=n_sub, ksub=ksub, iters=pq_iters)
        rec = pq_decode(cb, pq_encode(cb, xr))
        # Procrustes: min_R ||X R - rec||  =>  R = U V^T of X^T rec
        u, _, vt = jnp.linalg.svd(x.T @ rec, full_matrices=False)
        return u @ vt, cb

    cb0 = train_pq_codebook(x, n_sub=n_sub, ksub=ksub, iters=pq_iters)
    R, cb = jax.lax.fori_loop(0, opq_iters, body, (R, cb0))
    return R, cb


@functools.partial(jax.jit, static_argnames=("k", "metric", "chunk"))
def _pq_chunked_scan(q, codebooks, codes, *, k: int, metric: str,
                     chunk: int = 65536):
    """ADC scan without materializing the full decoded corpus: scan over
    code chunks, decode each chunk on device, fused distance + running
    top-k merge. Keeps query-time memory at O(chunk * D) instead of
    O(N * D) (a 10M x 128 corpus would otherwise decode 5 GB per call)."""
    n = codes.shape[0]
    k = min(k, n)
    n_chunks = max(1, -(-n // chunk))
    pad = n_chunks * chunk - n
    codes_p = jnp.pad(codes, ((0, pad), (0, 0))).reshape(
        n_chunks, chunk, codes.shape[1])
    valid = jnp.pad(jnp.ones((n,), jnp.bool_), (0, pad)).reshape(
        n_chunks, chunk)
    base = jnp.arange(n_chunks) * chunk
    q_sq = jnp.sum(q * q, axis=1)

    init = (jnp.full((q.shape[0], k), TK.NEG_FILL, jnp.float32),
            jnp.full((q.shape[0], k), -1, jnp.int32))

    def step(carry, xs):
        bv, bi = carry
        cchunk, vmask, off = xs
        dec = pq_decode(codebooks, cchunk)                 # [chunk, D]
        if metric == "ip":
            d = -jnp.dot(q, dec.T, preferred_element_type=jnp.float32)
        else:
            d_sq = jnp.sum(dec * dec, axis=1)
            dots = jnp.dot(q, dec.T, preferred_element_type=jnp.float32)
            d = jnp.maximum(q_sq[:, None] + d_sq[None, :] - 2.0 * dots, 0.0)
        d = jnp.where(vmask[None, :], d, TK.NEG_FILL)
        cv, cpos = TK.topk_smallest(d, min(k, chunk))
        cids = off + cpos
        return TK.merge_topk(bv, bi, cv, cids.astype(jnp.int32), k), None

    (vals, rows), _ = jax.lax.scan(step, init, (codes_p, valid, base))
    return vals, rows


class PQIndex(BaseIndex):
    """PQ (or OPQ) compressed index with asymmetric scan + optional exact
    rerank from kept originals (BASELINE.json config #3 pipeline)."""

    kind = "pq"

    def __init__(self, vectors, *, n_sub: int = 8, ksub: int = 256,
                 metric: str = "l2", opq: bool = False, ids=None,
                 train_sample: int = 65536, keep_originals: bool = False,
                 seed: int = 0):
        x = np.asarray(vectors, np.float32)
        m = "l2" if metric == "sqeuclidean" else D.canonical_metric(metric)
        if m not in ("l2", "sqeuclidean", "cosine", "ip"):
            raise ValueError(f"pq supports l2/cosine/ip, got {metric}")
        self.metric = m
        self.dim = x.shape[1]
        self.n = x.shape[0]
        self.n_sub = n_sub
        self.ksub = min(ksub, max(self.n, 2))
        self.opq = opq
        self._spherical = self.metric == "cosine"
        if self._spherical:
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        self._ids = np.asarray(ids if ids is not None else np.arange(self.n),
                               np.int64)
        rng = np.random.default_rng(seed)
        sample = x if self.n <= train_sample else \
            x[rng.choice(self.n, train_sample, replace=False)]
        if opq:
            R, cb = train_opq_rotation(jnp.asarray(sample),
                                       n_sub=n_sub, ksub=self.ksub)
            self.R = R
            xr = jnp.asarray(x) @ R
        else:
            self.R = None
            cb = train_pq_codebook(jnp.asarray(sample), n_sub=n_sub,
                                   ksub=self.ksub)
            xr = jnp.asarray(x)
        self.codebooks = cb
        self.codes = pq_encode(cb, xr)
        self._orig = jnp.asarray(x) if keep_originals else None

    @property
    def code_bytes(self) -> int:
        return int(self.codes.size * self.codes.dtype.itemsize)

    def search(self, queries, k: int = 10, *, rerank: int = 0,
               **kw) -> Tuple[np.ndarray, np.ndarray]:
        q, single = as_batch(queries)
        if rerank and self._orig is None:
            raise ValueError(
                "rerank requires keep_originals=True (the compressed codes "
                "alone cannot produce exact distances); build with "
                "PQIndex(..., keep_originals=True) or pass rerank=0")
        if self._spherical:
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True),
                                1e-30)
        if self.R is not None:
            qr = q @ self.R
        else:
            qr = q
        coarse_k = max(k, min(self.n, k * max(rerank, 1)))
        metric = "sqeuclidean" if self.metric in ("l2", "cosine") else "ip"
        d, rows = _pq_chunked_scan(qr, self.codebooks, self.codes,
                                   k=coarse_k, metric=metric)
        if rerank and self._orig is not None:
            rs = jnp.maximum(rows, 0)
            cand = self._orig[rs]
            dd = jnp.sum((q[:, None, :] - cand) ** 2, axis=-1) \
                if self.metric != "ip" else -jnp.einsum("bd,bcd->bc", q, cand)
            dd = jnp.where(rows >= 0, dd, TK.NEG_FILL)
            d, pos = TK.topk_smallest(dd, k)
            rows = jnp.take_along_axis(rows, pos, axis=-1)
        else:
            d, rows = d[:, :k], rows[:, :k]
        if self.metric == "l2":
            d = jnp.sqrt(jnp.maximum(d, 0.0))
        elif self.metric == "cosine":
            d = d * 0.5
        ids = np.where(np.asarray(rows) >= 0,
                       self._ids[np.maximum(np.asarray(rows), 0)], -1)
        d = np.asarray(d)
        return (d[0], ids[0]) if single else (d, ids)

    def _state(self):
        arrays = {"codebooks": self.codebooks, "codes": self.codes,
                  "ids": self._ids}
        if self.R is not None:
            arrays["R"] = self.R
        if self._orig is not None:
            arrays["orig"] = self._orig
        return arrays, {"n_sub": self.n_sub, "ksub": self.ksub,
                        "n": self.n, "opq": self.opq}

    def _load_state(self, arrays, meta):
        self.metric = meta["metric"]
        self.dim = meta["dim"]
        self.n = meta["n"]
        self.n_sub = meta["n_sub"]
        self.ksub = meta["ksub"]
        self.opq = meta["opq"]
        self._spherical = self.metric == "cosine"
        self.codebooks = jnp.asarray(arrays["codebooks"])
        self.codes = jnp.asarray(arrays["codes"])
        self._ids = np.asarray(arrays["ids"])
        self.R = jnp.asarray(arrays["R"]) if "R" in arrays else None
        self._orig = jnp.asarray(arrays["orig"]) if "orig" in arrays else None
