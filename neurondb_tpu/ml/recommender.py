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


def recommend_content_based(item_features, item_id: int, k: int = 10
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Items most similar to ``item_id`` by cosine over raw feature
    vectors (ml_recommender.c:1340 recommend_content_based — loads an
    item_id/features table, cosine vs the target, top-N excluding self).

    item_features: [I, F] array of per-item feature vectors.
    Returns (similarities, item_ids)."""
    F = np.asarray(item_features, np.float32)
    if not (0 <= item_id < len(F)):
        raise ValueError(f"item_id {item_id} out of range [0, {len(F)})")
    fn = F / np.maximum(np.linalg.norm(F, axis=1, keepdims=True), 1e-12)
    sims = fn @ fn[item_id]
    sims[item_id] = -np.inf
    order = np.argsort(-sims)[:k]
    return sims[order], order


def user_similarity(ratings, mask, user1: int, user2: int) -> float:
    """Pearson correlation over co-rated items
    (ml_recommender.c:1602 user_similarity — joins the two users' rows
    on item and computes r over the co-rated pairs; 0 when fewer than
    2 co-rated items or zero variance)."""
    R = np.asarray(ratings, np.float32)
    M = np.asarray(mask, bool)
    both = M[user1] & M[user2]
    n = int(both.sum())
    if n < 2:
        return 0.0
    x, y = R[user1][both], R[user2][both]
    vx, vy = x - x.mean(), y - y.mean()
    denom = float(np.sqrt((vx ** 2).sum() * (vy ** 2).sum()))
    if denom < 1e-12:
        return 0.0
    return float((vx * vy).sum() / denom)


def recommend_hybrid(model: Dict, item_features, user_id: int, *,
                     cf_weight: float = 0.7, k: int = 10,
                     exclude_mask=None) -> Tuple[np.ndarray, np.ndarray]:
    """Blend collaborative-filter scores with content similarity to the
    user's top CF item (ml_recommender.c:1706 recommend_hybrid —
    cf_weight * CF + (1 - cf_weight) * content, both min-max normalised).
    Returns (scores, item_ids)."""
    if not 0.0 <= cf_weight <= 1.0:
        raise ValueError("cf_weight must be between 0.0 and 1.0")
    cf = np.asarray(predict_ratings(model, [user_id]))[0]
    F = np.asarray(item_features, np.float32)
    if len(F) != len(cf):
        raise ValueError("item_features rows must match item count")
    anchor = int(np.argmax(cf))
    fn = F / np.maximum(np.linalg.norm(F, axis=1, keepdims=True), 1e-12)
    content = fn @ fn[anchor]

    def _norm(v):
        lo, hi = float(v.min()), float(v.max())
        return (v - lo) / (hi - lo) if hi > lo else np.zeros_like(v)

    scores = cf_weight * _norm(cf) + (1.0 - cf_weight) * _norm(content)
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
