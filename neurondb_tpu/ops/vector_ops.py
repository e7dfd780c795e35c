"""Vector math / utility ops — parity with the reference's SQL vector ops.

Covers NeuronDB/src/vector/vector_ops.c:32-776 (element access, arithmetic,
stats, normalization), vector_advanced.c:30-445 (cross product, percentiles,
scale/translate/filter), vector_batch.c:37-645 (batched normalize/sum/avg),
and src/types/aggregates.c (vector avg/sum aggregates). All functions accept
[..., D] jnp arrays and broadcast over leading dims; "batch" forms take
[N, D].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ---- element access / shape (vector_ops.c get/set/slice/append) ----

def vector_get(x: jax.Array, i) -> jax.Array:
    return jnp.take(x, i, axis=-1)


def vector_set(x: jax.Array, i, value) -> jax.Array:
    return x.at[..., i].set(value)


def vector_slice(x: jax.Array, start: int, stop: int) -> jax.Array:
    return x[..., start:stop]


def vector_append(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.concatenate([x, jnp.atleast_1d(y)], axis=-1)


def vector_concat(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.concatenate([x, y], axis=-1)


def vector_dims(x: jax.Array) -> int:
    return x.shape[-1]


# ---- elementwise arithmetic ----

def vector_add(x, y): return x + y
def vector_sub(x, y): return x - y
def vector_mul(x, y): return x * y          # alias of hadamard
def vector_hadamard(x, y): return x * y     # vector_ops.c:~300
def vector_div(x, y): return x / y
def vector_scale(x, s): return x * s        # vector_advanced.c scale
def vector_translate(x, t): return x + t    # vector_advanced.c translate
def vector_abs(x): return jnp.abs(x)
def vector_square(x): return x * x
def vector_sqrt(x): return jnp.sqrt(x)
def vector_pow(x, p): return jnp.power(x, p)
def vector_exp(x): return jnp.exp(x)
def vector_log(x): return jnp.log(x)
def vector_negate(x): return -x


def vector_cross_product(x: jax.Array, y: jax.Array) -> jax.Array:
    """3-D cross product (vector_advanced.c:30+)."""
    if x.shape[-1] != 3 or y.shape[-1] != 3:
        raise ValueError("cross product requires 3-dimensional vectors")
    return jnp.cross(x, y)


# ---- reductions / stats (vector_ops.c stats block) ----

def vector_sum(x): return jnp.sum(x, axis=-1)
def vector_mean(x): return jnp.mean(x, axis=-1)
def vector_min(x): return jnp.min(x, axis=-1)
def vector_max(x): return jnp.max(x, axis=-1)
def vector_var(x): return jnp.var(x, axis=-1)
def vector_stddev(x): return jnp.std(x, axis=-1)
def vector_norm(x): return jnp.linalg.norm(x, axis=-1)
def vector_argmin(x): return jnp.argmin(x, axis=-1)
def vector_argmax(x): return jnp.argmax(x, axis=-1)


def vector_median(x: jax.Array) -> jax.Array:
    return jnp.median(x, axis=-1)


def vector_percentile(x: jax.Array, pct) -> jax.Array:
    """vector_advanced.c percentile: pct in [0, 100]."""
    return jnp.percentile(x, pct, axis=-1)


def vector_quantile(x: jax.Array, q) -> jax.Array:
    return jnp.quantile(x, q, axis=-1)


# ---- normalization / transforms ----

def vector_normalize(x: jax.Array, eps: float = 1e-30) -> jax.Array:
    """L2-normalize; zero vectors pass through unchanged (reference guards
    zero norm rather than emitting NaN)."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.where(n > 0, x / jnp.maximum(n, eps), x)


def vector_clip(x: jax.Array, lo, hi) -> jax.Array:
    return jnp.clip(x, lo, hi)


def vector_standardize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Zero-mean unit-variance per vector (vector_ops.c standardize)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    sd = jnp.std(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.maximum(sd, eps)


def vector_minmax_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    lo = jnp.min(x, axis=-1, keepdims=True)
    hi = jnp.max(x, axis=-1, keepdims=True)
    return (x - lo) / jnp.maximum(hi - lo, eps)


def vector_softmax(x: jax.Array) -> jax.Array:
    return jax.nn.softmax(x, axis=-1)


# ---- comparison / hash (src/core/operators.c:45-144) ----

def vector_eq(x, y): return jnp.all(x == y, axis=-1)
def vector_ne(x, y): return jnp.any(x != y, axis=-1)


def vector_lt(x: jax.Array, y: jax.Array) -> jax.Array:
    """Lexicographic < (operators.c semantics)."""
    return _lex_cmp(x, y) < 0


def vector_le(x, y): return _lex_cmp(x, y) <= 0
def vector_gt(x, y): return _lex_cmp(x, y) > 0
def vector_ge(x, y): return _lex_cmp(x, y) >= 0


def _lex_cmp(x: jax.Array, y: jax.Array) -> jax.Array:
    """-1/0/+1 lexicographic comparison along the last axis."""
    neq = x != y
    any_neq = jnp.any(neq, axis=-1)
    first = jnp.argmax(neq, axis=-1)
    xa = jnp.take_along_axis(x, first[..., None], axis=-1)[..., 0]
    ya = jnp.take_along_axis(y, first[..., None], axis=-1)[..., 0]
    sgn = jnp.sign(xa - ya).astype(jnp.int32)
    return jnp.where(any_neq, sgn, 0)


def vector_hash(x: jax.Array) -> jax.Array:
    """Deterministic 32-bit content hash (FNV-1a over float bits)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)

    def body(h, w):
        for shift in (0, 8, 16, 24):
            h = jnp.bitwise_xor(h, (w >> shift) & jnp.uint32(0xFF))
            h = (h * jnp.uint32(16777619)).astype(jnp.uint32)
        return h, None

    h0 = jnp.full(x.shape[:-1], 2166136261, jnp.uint32)
    h, _ = jax.lax.scan(body, h0, jnp.moveaxis(bits, -1, 0))
    return h


# ---- batch forms ([N, D]) (vector_batch.c) ----

def batch_normalize(xs: jax.Array) -> jax.Array:
    return vector_normalize(xs)


def batch_sum(xs: jax.Array) -> jax.Array:
    """Aggregate SUM over a set of vectors -> [D]."""
    return jnp.sum(xs, axis=0)


def batch_avg(xs: jax.Array, valid: Optional[jax.Array] = None) -> jax.Array:
    """Aggregate AVG -> [D]; optional validity mask for padded rows."""
    if valid is None:
        return jnp.mean(xs, axis=0)
    w = valid.astype(xs.dtype)[:, None]
    return jnp.sum(xs * w, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
