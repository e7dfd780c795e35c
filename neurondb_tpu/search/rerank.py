"""Reranking — cross-encoder / LLM / ColBERT / LTR / ensemble / MMR.

Reference surface (NeuronDB/src/ml/reranking.c): rerank_cross_encoder:92,
rerank_llm:320, rerank_cohere:594, rerank_colbert:751 (late interaction),
rerank_ltr:945, rerank_ensemble:1131; weighted/Borda ensembles
(ml_rerank_ensemble.c:89,285); pointwise LTR (ml_ltr.c:99,239); flash-
attention long-context rerank (ml_reranking_flash.c:64,125).

The cross-encoder path scores (query, doc) pairs with the in-repo
transformer encoder (neurondb_tpu.ml.transformer) whose attention runs the
Pallas flash-attention kernel on TPU — the analog of
gpu_flash_attention.cu. Models are pluggable: any callable
``scorer(query: str, docs: list[str]) -> np.ndarray`` works.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from neurondb_tpu.ops import distance as D


def rerank_cross_encoder(query: str, docs: Sequence[str],
                         scorer: Callable[[str, Sequence[str]], np.ndarray],
                         k: Optional[int] = None
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Score each (query, doc) pair with a cross-encoder; return
    (scores desc, doc positions). ``scorer`` is typically
    ``ml.transformer.CrossEncoder.__call__`` (reranking.c:92 parity)."""
    scores = np.asarray(scorer(query, docs), np.float32)
    order = np.argsort(-scores, kind="stable")
    if k is not None:
        order = order[:k]
    return scores[order], order


def rerank_flash(query: str, docs: Sequence[str], scorer,
                 k: Optional[int] = None):
    """Long-context cross-encoder rerank (ml_reranking_flash.c:64) — same
    API; the O(N)-memory tiled attention lives in the scorer's kernel."""
    return rerank_cross_encoder(query, docs, scorer, k)


def rerank_colbert(query_tokens: np.ndarray, doc_tokens: Sequence[np.ndarray],
                   k: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """ColBERT late interaction (reranking.c:751): score(d) =
    sum_i max_j cos(q_i, d_j) over query token embeddings [Tq, D] and
    per-doc token embeddings [Td, D]."""
    q = np.asarray(query_tokens, np.float32)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    scores = np.zeros(len(doc_tokens), np.float32)
    for i, dt in enumerate(doc_tokens):
        d = np.asarray(dt, np.float32)
        dn = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-30)
        sim = qn @ dn.T                                  # [Tq, Td]
        scores[i] = sim.max(axis=1).sum()
    order = np.argsort(-scores, kind="stable")
    if k is not None:
        order = order[:k]
    return scores[order], order


def rerank_ltr(features: np.ndarray, weights: np.ndarray,
               k: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Pointwise learning-to-rank (ml_ltr.c:99): linear score over
    per-candidate feature vectors [N, F]."""
    f = np.asarray(features, np.float32)
    w = np.asarray(weights, np.float32)
    scores = f @ w
    order = np.argsort(-scores, kind="stable")
    if k is not None:
        order = order[:k]
    return scores[order], order


def train_ltr(features: np.ndarray, relevance: np.ndarray,
              l2: float = 1e-3) -> np.ndarray:
    """Fit pointwise LTR weights by ridge regression on graded relevance
    (ml_ltr.c:239 train path)."""
    from neurondb_tpu.ml.linear import linear_regression_fit
    model = linear_regression_fit(jnp.asarray(features),
                                  jnp.asarray(relevance), l2=l2,
                                  fit_intercept=False)
    return np.asarray(model["coef"])


def rerank_ensemble(rankings: Sequence[Tuple[np.ndarray, np.ndarray]],
                    weights: Optional[Sequence[float]] = None,
                    k: Optional[int] = None, *, method: str = "weighted"
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Ensemble rerank (reranking.c:1131; ml_rerank_ensemble.c:89,285).

    rankings: list of (scores, ids). method:
    - "weighted": min-max normalize each scorer, weighted sum;
    - "borda": positional Borda count (ml_rerank_ensemble.c:285).
    """
    weights = list(weights) if weights is not None else [1.0] * len(rankings)
    agg: Dict[int, float] = {}
    for (scores, ids), w in zip(rankings, weights):
        scores = np.asarray(scores, np.float32)
        ids = np.asarray(ids)
        if method == "borda":
            n = len(ids)
            for pos, i in enumerate(ids):
                agg[int(i)] = agg.get(int(i), 0.0) + w * (n - pos)
        else:
            lo, hi = scores.min(), scores.max()
            norm = (scores - lo) / (hi - lo) if hi > lo else np.ones_like(scores)
            for s, i in zip(norm, ids):
                agg[int(i)] = agg.get(int(i), 0.0) + w * float(s)
    items = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
    if k is not None:
        items = items[:k]
    return (np.asarray([s for _, s in items], np.float32),
            np.asarray([i for i, _ in items], np.int64))


def rerank_llm(query: str, docs: Sequence[str], llm_client,
               k: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """LLM-as-judge rerank (reranking.c:320): asks the gateway to score each
    document's relevance 0-10. ``llm_client`` is service.llm.LLMRouter."""
    scores = np.asarray(llm_client.rerank(query, list(docs)), np.float32)
    order = np.argsort(-scores, kind="stable")
    if k is not None:
        order = order[:k]
    return scores[order], order
