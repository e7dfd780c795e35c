"""Sparse vector types — `sparsevec` / `vecmap` parity, TPU layout.

Reference: pgvector-compatible `sparsevec` with L2/cos/IP/norm/normalize
(NeuronDB/src/vector/vector_types.c:375-786), `vecmap` int32-index +
f4-value maps with total_dim/nnz (include/neurondb_types.h:47-53,106-107),
and the `<*>` sparse inner-product operator (sql/22_sparse_vectors.sql).

TPU layout: a batch of sparse vectors is a padded COO block —
indices [N, S] int32 (pad = -1) + values [N, S] f32, fixed slot budget S.
Padded slots contribute 0 to every reduction, so all ops are dense VPU
work with static shapes; scatter into a dense [D] buffer happens only in
`to_dense`. For corpus-scale retrieval over learned-sparse embeddings see
``neurondb_tpu.search.sparse_search``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class SparseVectors:
    """Padded batch of sparse vectors. indices: [N, S] int32 (-1 = pad,
    ascending within row), values: [N, S] f32, dim: logical dimension."""

    indices: jax.Array
    values: jax.Array
    dim: int

    def tree_flatten(self):
        return (self.indices, self.values), (self.dim,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    # ---- construction ----
    @classmethod
    def from_dense(cls, x: jax.Array, slots: Optional[int] = None) -> "SparseVectors":
        x = np.asarray(x, np.float32)
        if x.ndim == 1:
            x = x[None, :]
        n, d = x.shape
        nnz = (x != 0).sum(axis=1)
        s = int(slots if slots is not None else max(int(nnz.max()), 1))
        idx = np.full((n, s), -1, np.int32)
        val = np.zeros((n, s), np.float32)
        for i in range(n):
            nz = np.nonzero(x[i])[0][:s]
            idx[i, :len(nz)] = nz
            val[i, :len(nz)] = x[i, nz]
        return cls(jnp.asarray(idx), jnp.asarray(val), d)

    @classmethod
    def from_coo(cls, indices, values, dim: int) -> "SparseVectors":
        idx = jnp.asarray(indices, jnp.int32)
        val = jnp.asarray(values, jnp.float32)
        if idx.ndim == 1:
            idx, val = idx[None, :], val[None, :]
        return cls(idx, jnp.where(idx >= 0, val, 0.0), dim)

    @property
    def mask(self) -> jax.Array:
        return self.indices >= 0

    @property
    def nnz(self) -> jax.Array:
        return jnp.sum(self.mask, axis=1)

    def to_dense(self) -> jax.Array:
        n, s = self.indices.shape
        safe_idx = jnp.where(self.mask, self.indices, 0)
        dense = jnp.zeros((n, self.dim), jnp.float32)
        vals = jnp.where(self.mask, self.values, 0.0)
        return dense.at[jnp.arange(n)[:, None], safe_idx].add(vals)

    # ---- ops (vector_types.c sparsevec block) ----
    def norm(self) -> jax.Array:
        v = jnp.where(self.mask, self.values, 0.0)
        return jnp.sqrt(jnp.sum(v * v, axis=1))

    def normalize(self) -> "SparseVectors":
        n = jnp.maximum(self.norm(), 1e-30)[:, None]
        return SparseVectors(self.indices, self.values / n, self.dim)


def sparse_inner_product(a: SparseVectors, b: SparseVectors) -> jax.Array:
    """Pairwise rowwise x.y for aligned batches -> [N]. The `<*>` operator
    (sql/22_sparse_vectors.sql:39). Implemented as a sorted-merge-free
    broadcast join over the padded slots (S_a x S_b per row)."""
    ia, va = a.indices, jnp.where(a.mask, a.values, 0.0)
    ib, vb = b.indices, jnp.where(b.mask, b.values, 0.0)
    eq = (ia[:, :, None] == ib[:, None, :]) & (ia[:, :, None] >= 0)
    return jnp.sum(eq * (va[:, :, None] * vb[:, None, :]), axis=(1, 2))


def sparse_l2_distance(a: SparseVectors, b: SparseVectors) -> jax.Array:
    aa = jnp.sum(jnp.where(a.mask, a.values, 0.0) ** 2, axis=1)
    bb = jnp.sum(jnp.where(b.mask, b.values, 0.0) ** 2, axis=1)
    ab = sparse_inner_product(a, b)
    return jnp.sqrt(jnp.maximum(aa + bb - 2.0 * ab, 0.0))


def sparse_cosine_distance(a: SparseVectors, b: SparseVectors) -> jax.Array:
    ab = sparse_inner_product(a, b)
    den = jnp.maximum(a.norm() * b.norm(), 1e-30)
    return 1.0 - jnp.where(den > 1e-30, ab / den, 0.0)


def sparse_dense_matmul(sp: SparseVectors, dense: jax.Array) -> jax.Array:
    """[N_sparse rows] x dense [D, M] -> [N, M] via gather (no dense
    scatter). Used by the sparse retrieval scorer."""
    safe_idx = jnp.where(sp.mask, sp.indices, 0)
    gathered = dense[safe_idx]                      # [N, S, M]
    w = jnp.where(sp.mask, sp.values, 0.0)[:, :, None]
    return jnp.sum(gathered * w, axis=1)
