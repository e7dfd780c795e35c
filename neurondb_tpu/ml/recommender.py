"""Recommender — matrix-factorization collaborative filtering.

Reference: NeuronDB/src/ml/ml_recommender.c (2683 LoC) with the
collaborative_filter_models / recommendations_cache catalog tables.
TPU design: ALS on a dense-masked rating matrix (each alternation is a
batched D x D solve — vmapped Cholesky on device) plus item-item cosine
kNN over the learned factors via the vector engine.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("factors", "iters"))
def als_fit(ratings, mask, *, factors: int = 16, iters: int = 10,
            l2: float = 0.1, seed: int = 0) -> Dict:
    """ratings [U, I] with mask [U, I] (1 = observed). Classic ALS."""
    R = jnp.asarray(ratings, jnp.float32)
    M = jnp.asarray(mask, jnp.float32)
    U, I = R.shape
    key = jax.random.PRNGKey(seed)
    ku, ki = jax.random.split(key)
    P = jax.random.normal(ku, (U, factors)) * 0.1
    Q = jax.random.normal(ki, (I, factors)) * 0.1
    eye = jnp.eye(factors)

    def solve_side(Fixed, Rside, Mside):
        # for each row u: (F^T diag(m_u) F + l2 I) p_u = F^T (m_u * r_u)
        def one(r, m):
            A = (Fixed * m[:, None]).T @ Fixed + l2 * eye
            b = Fixed.T @ (m * r)
            return jax.scipy.linalg.solve(A, b, assume_a="pos")
        return jax.vmap(one)(Rside, Mside)

    def step(_, carry):
        P, Q = carry
        P = solve_side(Q, R, M)
        Q = solve_side(P, R.T, M.T)
        return P, Q

    P, Q = jax.lax.fori_loop(0, iters, step, (P, Q))
    return {"user_factors": P, "item_factors": Q}


def predict_ratings(model: Dict, user_ids=None) -> jax.Array:
    P, Q = model["user_factors"], model["item_factors"]
    if user_ids is not None:
        P = P[jnp.asarray(user_ids)]
    return P @ Q.T


def recommend(model: Dict, user_id: int, k: int = 10,
              exclude_mask=None) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k unseen items for a user: (scores, item_ids)."""
    scores = np.asarray(predict_ratings(model, [user_id]))[0]
    if exclude_mask is not None:
        scores = np.where(np.asarray(exclude_mask, bool), -np.inf, scores)
    order = np.argsort(-scores)[:k]
    return scores[order], order


def similar_items(model: Dict, item_id: int, k: int = 10
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Item-item cosine neighbors in factor space."""
    Q = np.asarray(model["item_factors"])
    qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    sims = qn @ qn[item_id]
    sims[item_id] = -np.inf
    order = np.argsort(-sims)[:k]
    return sims[order], order
