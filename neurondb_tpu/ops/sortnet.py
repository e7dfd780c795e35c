"""Bitonic sort/merge networks as pure elementwise compare-exchange.

XLA's ``sort``/``top_k`` HLOs serialize on the TPU scalar core: the
HNSW beam step at B=1024 spent ~6 ms of its 8.5 ms in the pop-top_k,
dedup argsort, and beam-merge top_k, dwarfing the 1.8 ms of gathers and
distances that are the step's actual work (round-2 profile,
IMPLEMENTATION_NOTES candidate #1). A bitonic network over the (short,
power-of-two-padded) last axis replaces each of those with ~log2(P)^2/2
stages of vectorized min/max/select on [B, P] blocks — pure VPU work
that XLA fuses into a handful of kernels, no sort HLO anywhere.

This is selection the TPU way; the reference's equivalents are scalar
selection-sort loops (NeuronDB/src/index/hnsw_am.c:1984-2013) and host
qsort (src/index/ivf_am.c:1722).

Widths here are small (ef + expand*degree <= a few hundred), where the
O(P log^2 P) network work is trivially cheaper than a serialized sort.
For corpus-width selection keep ``ops.topk`` (chunked GEMM + top_k).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _ceil_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _partner(x: jax.Array, j: int) -> jax.Array:
    """x[..., i ^ j] for power-of-two j, expressed as reshape + reverse
    (no gather HLO): i = b*(2j) + s*j + t with s in {0,1}; i^j flips s."""
    P = x.shape[-1]
    y = x.reshape(*x.shape[:-1], P // (2 * j), 2, j)
    y = y[..., ::-1, :]
    return y.reshape(*x.shape[:-1], P)


def _stage(keys, payloads, idx, j, k, ascending: bool):
    """One compare-exchange stage: partner = idx ^ j, block direction
    from idx & k (the standard iterative bitonic schedule)."""
    kp = _partner(keys, j)
    if ascending:
        up = (idx & k) == 0
    else:
        up = (idx & k) != 0
    take_min = up == ((idx & j) == 0)
    keep = jnp.where(take_min, keys <= kp, keys >= kp)
    keys = jnp.where(keep, keys, kp)
    out = []
    for p in payloads:
        out.append(jnp.where(keep, p, _partner(p, j)))
    return keys, out


def sort_with_payloads(
    keys: jax.Array,
    payloads: Sequence[jax.Array] = (),
    *,
    ascending: bool = True,
    fill=None,
) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """Sort ``keys`` along the last axis, co-permuting ``payloads``.

    Pads the axis to a power of two with ``fill`` (default: +inf for
    floats / dtype-max for ints when ascending, the negation otherwise)
    and trims back, so pad slots land at the tail. Not stable: equal
    keys may land in either order — callers that need a pinned tie
    order must make keys distinct (e.g. fold the index into the key).
    """
    P0 = keys.shape[-1]
    P = _ceil_pow2(max(P0, 1))
    if fill is None:
        if jnp.issubdtype(keys.dtype, jnp.floating):
            lim = jnp.array(jnp.inf, keys.dtype)
        else:
            lim = jnp.array(jnp.iinfo(keys.dtype).max, keys.dtype)
        fill = lim if ascending else -lim
    if P != P0:
        pad = [(0, 0)] * (keys.ndim - 1) + [(0, P - P0)]
        keys = jnp.pad(keys, pad, constant_values=fill)
        payloads = [jnp.pad(p, pad) for p in payloads]
    else:
        payloads = list(payloads)
    if P == 1:
        return keys[..., :P0], tuple(p[..., :P0] for p in payloads)
    idx = jnp.arange(P)
    k = 2
    while k <= P:
        j = k // 2
        while j >= 1:
            keys, payloads = _stage(keys, payloads, idx, j, k, ascending)
            j //= 2
        k *= 2
    return keys[..., :P0], tuple(p[..., :P0] for p in payloads)


def merge_sorted_with_payloads(
    keys_a: jax.Array, payloads_a: Sequence[jax.Array],
    keys_b: jax.Array, payloads_b: Sequence[jax.Array],
    *, out_width: int | None = None,
) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """Merge two ascending-sorted runs into one ascending run using a
    single log2(P) bitonic merge (reverse ``b``, concatenate — the
    concatenation is bitonic — then one merge sweep). Both runs must
    already be power-of-two widths for the merge to be a pure sweep;
    otherwise falls back to a full sort of the concatenation.

    ``out_width`` trims the result (top-k of the union) for free.
    """
    Pa, Pb = keys_a.shape[-1], keys_b.shape[-1]
    keys = jnp.concatenate([keys_a, keys_b[..., ::-1]], axis=-1)
    payloads = [jnp.concatenate([pa, pb[..., ::-1]], axis=-1)
                for pa, pb in zip(payloads_a, payloads_b)]
    P = Pa + Pb
    if _ceil_pow2(P) == P:
        idx = jnp.arange(P)
        j = P // 2
        while j >= 1:
            keys, payloads = _stage(keys, payloads, idx, j, P, True)
            j //= 2
    else:
        keys, payloads = sort_with_payloads(keys, payloads)
        payloads = list(payloads)
    w = P if out_width is None else min(out_width, P)
    return keys[..., :w], tuple(p[..., :w] for p in payloads)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_smallest(scores: jax.Array, k: int):
    """Network top-k (values ascending, positions) — drop-in for
    ``ops.topk.topk_smallest`` at network-friendly widths."""
    P = scores.shape[-1]
    pos = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), scores.shape)
    v, (i,) = sort_with_payloads(scores, (pos,))
    kk = min(k, P)
    return v[..., :kk], i[..., :kk]
