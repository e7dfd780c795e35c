"""Distance functions — semantics of the reference SQL operators.

Operator semantics preserved (reference: NeuronDB/neurondb--1.0.sql:2391-2468
operator definitions; src/core/distance.c:73-291 and
src/vector/vector_distance.c:124-545 scalar kernels; strategy mapping
1=L2, 2=cosine, 3=negative-inner-product in src/index/hnsw_am.c:1301-1345):

    <->   l2_distance              sqrt(sum((x-y)^2))
    <=>   cosine_distance          1 - x.y / (|x||y|)
    <#>   inner_product_distance   -(x.y)          (negative IP, ascending sort)
    <+>   l1_distance              sum|x-y|
    <~>   hamming_distance         popcount(x xor y) for binary vectors
    plus: squared_l2, chebyshev, minkowski(p), jaccard, dice, mahalanobis.

Every function has two entry points:
- elementwise pair form ``f(x, y)`` broadcasting over leading dims, and
- ``pairwise_distance(q, x, metric)`` computing a [B, N] matrix the
  MXU-friendly way (GEMM expansion for l2/cosine/ip; VPU broadcast
  reductions otherwise).

All inputs are plain jnp arrays with trailing dim D. No varlena headers,
no typmod — dimension checking happens at the API layer
(``neurondb_tpu.store``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Metric name registry. Aliases map SQL operator spellings to canonical names.
METRICS = ("l2", "sqeuclidean", "cosine", "ip", "l1", "hamming",
           "chebyshev", "minkowski", "jaccard", "dice")
ALIASES = {
    "<->": "l2", "euclidean": "l2", "l2_distance": "l2",
    "<=>": "cosine", "angular": "cosine",
    "<#>": "ip", "inner_product": "ip", "dot": "ip", "neg_ip": "ip",
    "<+>": "l1", "manhattan": "l1", "taxicab": "l1",
    "<~>": "hamming",
    "squared_l2": "sqeuclidean", "sql2": "sqeuclidean",
    "linf": "chebyshev",
}


def canonical_metric(name: str) -> str:
    m = ALIASES.get(name, name)
    if m not in METRICS:
        raise ValueError(f"unknown distance metric {name!r}; known: {METRICS}")
    return m


# --------------------------------------------------------------------------
# pair forms (broadcast over leading dims)
# --------------------------------------------------------------------------

def squared_l2_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    d = x - y
    return jnp.sum(d * d, axis=-1)


def l2_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.sqrt(squared_l2_distance(x, y))


def inner_product(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.sum(x * y, axis=-1)


def inner_product_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """``<#>``: negative inner product so ascending order = most similar."""
    return -inner_product(x, y)


def cosine_similarity(x: jax.Array, y: jax.Array, eps: float = 0.0) -> jax.Array:
    num = inner_product(x, y)
    den = jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(y, axis=-1)
    # Reference returns NaN-free 0 similarity on zero vectors
    # (src/core/distance.c guards zero norms).
    return jnp.where(den > eps, num / jnp.maximum(den, 1e-30), 0.0)


def cosine_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    return 1.0 - cosine_similarity(x, y)


def l1_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.sum(jnp.abs(x - y), axis=-1)


def chebyshev_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.max(jnp.abs(x - y), axis=-1)


def minkowski_distance(x: jax.Array, y: jax.Array, p: float = 3.0) -> jax.Array:
    if p <= 0:
        raise ValueError("minkowski p must be > 0")
    return jnp.power(jnp.sum(jnp.power(jnp.abs(x - y), p), axis=-1), 1.0 / p)


def hamming_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """Bit-level Hamming distance.

    Accepts packed uint8 codes (popcount of xor, matching the reference's
    bit-type Hamming in src/types/quantization.c bit casts) or float/int
    arrays treated as elementwise sign mismatch counts.
    """
    if x.dtype == jnp.uint8 and y.dtype == jnp.uint8:
        return jnp.sum(_popcount_u8(jnp.bitwise_xor(x, y)), axis=-1)
    return jnp.sum((x != y).astype(jnp.int32), axis=-1)


def jaccard_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    """Jaccard over binary indicators (>0), matching vector_distance.c."""
    xb = x > 0
    yb = y > 0
    inter = jnp.sum(jnp.logical_and(xb, yb), axis=-1).astype(jnp.float32)
    union = jnp.sum(jnp.logical_or(xb, yb), axis=-1).astype(jnp.float32)
    return jnp.where(union > 0, 1.0 - inter / jnp.maximum(union, 1.0), 0.0)


def dice_distance(x: jax.Array, y: jax.Array) -> jax.Array:
    xb = x > 0
    yb = y > 0
    inter = jnp.sum(jnp.logical_and(xb, yb), axis=-1).astype(jnp.float32)
    tot = (jnp.sum(xb, axis=-1) + jnp.sum(yb, axis=-1)).astype(jnp.float32)
    return jnp.where(tot > 0, 1.0 - 2.0 * inter / jnp.maximum(tot, 1.0), 0.0)


def mahalanobis_distance(x: jax.Array, y: jax.Array, vi: jax.Array) -> jax.Array:
    """Mahalanobis with inverse covariance ``vi`` [D, D]."""
    d = x - y
    return jnp.sqrt(jnp.einsum("...i,ij,...j->...", d, vi, d))


def _popcount_u8(v: jax.Array) -> jax.Array:
    # SWAR popcount on uint8 lanes.
    v = v.astype(jnp.uint8)
    v = (v & 0x55) + ((v >> 1) & 0x55)
    v = (v & 0x33) + ((v >> 2) & 0x33)
    v = (v & 0x0F) + ((v >> 4) & 0x0F)
    return v.astype(jnp.int32)


# --------------------------------------------------------------------------
# pairwise [B, D] x [N, D] -> [B, N]
# --------------------------------------------------------------------------

def pairwise_distance(
    queries: jax.Array,
    base: jax.Array,
    metric: str = "l2",
    *,
    p: float = 3.0,
    base_sqnorms: Optional[jax.Array] = None,
    precision=jax.lax.Precision.DEFAULT,
    dot_dtype=None,
) -> jax.Array:
    """Distance matrix the MXU way.

    l2/sqeuclidean use the GEMM expansion ||q||^2 + ||x||^2 - 2 q.x; cosine
    and ip are plain GEMMs with an epilogue. l1/chebyshev/minkowski/hamming
    are broadcast VPU reductions (O(B*N*D) memory traffic — use only for
    small N; the reference's scalar loops had the same cost shape).

    ``base_sqnorms`` lets callers cache ||x||^2 across queries, the moral
    equivalent of the reference's precomputed norms in batch ops
    (src/vector/vector_batch.c:37-645).

    ``dot_dtype`` (e.g. jnp.bfloat16) casts ONLY the GEMM inputs — norms
    stay in the incoming precision. With a bf16 base this turns a mixed
    f32xbf16 dot (XLA promotes to f32, ~4x slower on the MXU) into a
    bf16xbf16 -> f32 dot, the same contract the fused Pallas kernels use
    (products of bf16 inputs are exact in f32).
    """
    metric = canonical_metric(metric)
    q = queries
    x = base

    def _dot(a, b):
        if dot_dtype is not None:
            a, b = a.astype(dot_dtype), b.astype(dot_dtype)
        return jnp.dot(a, b, precision=precision,
                       preferred_element_type=jnp.float32)

    if metric in ("l2", "sqeuclidean"):
        qn = jnp.sum(q * q, axis=-1, keepdims=True)                 # [B, 1]
        xn = base_sqnorms if base_sqnorms is not None else jnp.sum(x * x, axis=-1)
        dots = _dot(q, x.T)                                          # [B, N]
        d2 = jnp.maximum(qn + xn[None, :] - 2.0 * dots, 0.0)
        return d2 if metric == "sqeuclidean" else jnp.sqrt(d2)
    if metric == "ip":
        return -_dot(q, x.T)
    if metric == "cosine":
        qn = jnp.linalg.norm(q, axis=-1, keepdims=True)             # [B, 1]
        xn = (jnp.sqrt(base_sqnorms) if base_sqnorms is not None
              else jnp.linalg.norm(x, axis=-1))                      # [N]
        dots = _dot(q, x.T)
        den = jnp.maximum(qn * xn[None, :], 1e-30)
        sim = jnp.where((qn > 0) & (xn[None, :] > 0), dots / den, 0.0)
        return 1.0 - sim
    if metric == "l1":
        return jnp.sum(jnp.abs(q[:, None, :] - x[None, :, :]), axis=-1)
    if metric == "chebyshev":
        return jnp.max(jnp.abs(q[:, None, :] - x[None, :, :]), axis=-1)
    if metric == "minkowski":
        return jnp.power(
            jnp.sum(jnp.power(jnp.abs(q[:, None, :] - x[None, :, :]), p), axis=-1),
            1.0 / p)
    if metric == "hamming":
        return jax.vmap(lambda qq: hamming_distance(qq[None, :], x))(q).reshape(
            q.shape[0], x.shape[0])
    if metric == "jaccard":
        return jax.vmap(lambda qq: jaccard_distance(qq[None, :], x))(q).reshape(
            q.shape[0], x.shape[0])
    if metric == "dice":
        return jax.vmap(lambda qq: dice_distance(qq[None, :], x))(q).reshape(
            q.shape[0], x.shape[0])
    raise ValueError(metric)


# Names matching the reference SQL functions, for the API layer.
vector_l2_distance = l2_distance
vector_cosine_distance = cosine_distance
vector_inner_product = inner_product
vector_l1_distance = l1_distance
