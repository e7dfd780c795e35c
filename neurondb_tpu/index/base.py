"""Common index API and checkpoint manifest handling.

Checkpoint/resume parity: the reference persists index state in PG pages
(durable via WAL, NeuronDB/src/index/hnsw_am.c:108-122 meta page) and ML
models as bytea rows. Here every index serializes its device arrays to an
``.npz`` plus a JSON manifest (SURVEY.md §5 checkpoint equivalent).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BaseIndex:
    """Interface: build/add/search/save/load. Subclasses set ``kind``."""

    kind: str = "base"
    metric: str = "l2"
    dim: int = 0

    def search(self, queries, k: int = 10, **kw) -> Tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError

    # ---- persistence ----
    def _state(self) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
        raise NotImplementedError

    def _load_state(self, arrays: Dict[str, np.ndarray], meta: Dict[str, Any]) -> None:
        raise NotImplementedError

    def save(self, path: str) -> None:
        arrays, meta = self._state()
        os.makedirs(path, exist_ok=True)
        np.savez_compressed(os.path.join(path, "arrays.npz"),
                            **{k: _to_savable(v) for k, v in arrays.items()})
        # a subclass _state() may bump format_version for layouts older
        # readers must NOT silently misread (e.g. IVF-PQ int8 originals)
        meta = dict({"format_version": 1}, **meta, kind=self.kind,
                    metric=self.metric, dim=self.dim)
        with open(os.path.join(path, "manifest.json"), "w") as f:
            json.dump(meta, f, indent=2)

    @classmethod
    def load(cls, path: str) -> "BaseIndex":
        with open(os.path.join(path, "manifest.json")) as f:
            meta = json.load(f)
        data = np.load(os.path.join(path, "arrays.npz"))
        arrays = {k: _from_saved(data[k]) for k in data.files}
        obj = cls.__new__(cls)
        obj._load_state(arrays, meta)
        return obj


def _to_savable(v) -> np.ndarray:
    """npz can't round-trip ml_dtypes (bfloat16 saves as raw void V2 and
    fails to load) — upcast non-standard numeric dtypes to float32.
    TPU-resident stores are bf16, so this path is live on device saves."""
    a = np.asarray(v)
    if a.dtype.kind not in "biufc":
        a = np.asarray(jnp.asarray(v).astype(jnp.float32))
    return a


def _from_saved(a: np.ndarray) -> np.ndarray:
    if a.dtype.kind == "V" and a.dtype.itemsize == 2:
        # checkpoint written before _to_savable existed: raw bf16 bytes
        import ml_dtypes
        return a.view(ml_dtypes.bfloat16).astype(np.float32)
    return a


def as_batch(queries) -> Tuple[jax.Array, bool]:
    """Batchify to [B, D] f32 on device.

    Half-precision HOST arrays (float16 / ml_dtypes.bfloat16) are
    transferred in their own 2-byte dtype and upcast on device: the
    host->device link is the serving bottleneck (measured ~50 MB/s
    through the axon tunnel — 8 MB of f32 queries cost ~160 ms of a
    183 ms batch), so clients that tolerate half-precision queries get
    2x the ingest for free. Passing f32 keeps exact semantics.

    A ``(int8_codes [B, D], scales [B] or [B, 1] f32)`` tuple is the
    1-byte wire: codes ship as int8, dequantized on device as
    ``codes * scales`` (client quantizes with per-query max-abs/127).
    Costs ~0.005 recall@10 on the 1M headline (measured — clients
    compensate with one nprobe step)."""
    if (isinstance(queries, tuple) and len(queries) == 2
            and getattr(queries[0], "dtype", None) is not None
            and np.dtype(queries[0].dtype) == np.int8):
        codes, scales = queries
        q = _dequant_int8(jnp.asarray(codes), jnp.asarray(scales))
        if q.ndim == 1:
            return q[None, :], True
        return q, False
    if (isinstance(queries, tuple) and len(queries) == 3
            and getattr(queries[0], "dtype", None) is not None
            and np.dtype(queries[0].dtype) == np.int8):
        # int12 wire: int8 codes + packed int4 residual (1.53 B/dim).
        # Wire-only ranking recall measured 0.9991 on the 200k headline
        # corpus vs bf16's 0.9959 at 77% of bf16's bytes — the default
        # escalation when the plain int8 wire's recall misses the bar.
        codes, resid, scales = queries
        q = _dequant_int12(jnp.asarray(codes), jnp.asarray(resid),
                           jnp.asarray(scales))
        if q.ndim == 1:
            return q[None, :], True
        return q, False
    if (isinstance(queries, tuple) and len(queries) == 2
            and getattr(queries[0], "dtype", None) is not None
            and np.dtype(queries[0].dtype) == np.uint8):
        # packed int4 wire: two offset-8 nibbles per byte, 0.5 B/dim
        codes, scales = queries
        q = _dequant_int4(jnp.asarray(codes), jnp.asarray(scales))
        if q.ndim == 1:
            return q[None, :], True
        return q, False
    if (not isinstance(queries, jax.Array)
            and getattr(queries, "dtype", None) is not None
            and np.dtype(queries.dtype).itemsize == 2
            and np.dtype(queries.dtype).kind in "fV"):
        q = jnp.asarray(queries).astype(jnp.float32)
    else:
        q = jnp.asarray(queries, jnp.float32)
    if q.ndim == 1:
        return q[None, :], True
    return q, False


@jax.jit
def _dequant_int8(codes: jax.Array, scales: jax.Array) -> jax.Array:
    s = scales.astype(jnp.float32)
    if s.ndim == codes.ndim - 1:
        s = s[..., None]
    return codes.astype(jnp.float32) * s


@jax.jit
def _dequant_int12(codes: jax.Array, resid: jax.Array,
                   scales: jax.Array) -> jax.Array:
    lo = (resid & 0xF).astype(jnp.float32) - 7.0
    hi = (resid >> 4).astype(jnp.float32) - 7.0
    r = jnp.stack([lo, hi], axis=-1).reshape(*resid.shape[:-1],
                                             resid.shape[-1] * 2)
    s = scales.astype(jnp.float32)
    if s.ndim == codes.ndim - 1:
        s = s[..., None]
    return (codes.astype(jnp.float32) + r / 14.0) * s


@jax.jit
def _dequant_int4(codes: jax.Array, scales: jax.Array) -> jax.Array:
    lo = (codes & 0xF).astype(jnp.float32) - 8.0
    hi = (codes >> 4).astype(jnp.float32) - 8.0
    q = jnp.stack([lo, hi], axis=-1).reshape(*codes.shape[:-1],
                                             codes.shape[-1] * 2)
    s = scales.astype(jnp.float32)
    if s.ndim == q.ndim - 1:
        s = s[..., None]
    return q * s


def quantize_queries_int4(q: np.ndarray):
    """Client-side helper for the packed int4 wire: per-query max-abs
    scales over 7 levels, two dims per byte (even dim in the low
    nibble). Returns (packed uint8 [B, D//2], scales f32 [B, 1]) for
    as_batch. D must be even. Half the wire bytes of the int8 wire;
    coarser quantization — measure recall through the wire and
    compensate with nprobe."""
    q = np.asarray(q, np.float32)
    if q.shape[-1] % 2:
        raise ValueError("int4 wire requires an even dimension")
    sc = np.abs(q).max(axis=-1, keepdims=True) / 7.0
    sc = np.maximum(sc, 1e-30)
    codes = (np.clip(np.round(q / sc), -7, 7) + 8).astype(np.uint8)
    lo, hi = codes[..., 0::2], codes[..., 1::2]
    packed = lo | (hi << 4)
    return packed, sc.astype(np.float32)


def quantize_queries_int8(q: np.ndarray):
    """Client-side helper for the int8 wire: per-query max-abs scales.
    Returns (codes int8 [B, D], scales f32 [B, 1]) for as_batch."""
    q = np.asarray(q, np.float32)
    sc = np.abs(q).max(axis=-1, keepdims=True) / 127.0
    sc = np.maximum(sc, 1e-30)
    codes = np.clip(np.round(q / sc), -127, 127).astype(np.int8)
    return codes, sc.astype(np.float32)


def quantize_queries_int12(q: np.ndarray):
    """Client-side helper for the int12 wire: int8 codes + a packed
    int4 refinement of the rounding residual (15 levels over ±scale/2,
    even dim in the low nibble). Returns (codes int8 [B, D],
    resid uint8 [B, D//2], scales f32 [B, 1]) for as_batch. D must be
    even. 1.53 B/dim — between the int8 (1.03) and bf16 (2.0) wires —
    with wire-only ranking recall indistinguishable from full precision
    (0.9991 vs bf16's 0.9959 on the 200k headline-corpus probe)."""
    q = np.asarray(q, np.float32)
    if q.shape[-1] % 2:
        raise ValueError("int12 wire requires an even dimension")
    sc = np.abs(q).max(axis=-1, keepdims=True) / 127.0
    sc = np.maximum(sc, 1e-30)
    codes = np.clip(np.round(q / sc), -127, 127)
    r = np.clip(np.round((q / sc - codes) * 14.0), -7, 7) + 7
    r = r.astype(np.uint8)
    packed = r[..., 0::2] | (r[..., 1::2] << 4)
    return codes.astype(np.int8), packed, sc.astype(np.float32)
