"""Topic discovery, explainability, feature store — ML catalog extras.

Reference: NeuronDB/src/ml/ml_topic_discovery.c, ml_explainable_ai.c,
ml_feature_store.c (+ feature_stores/feature_definitions catalog tables),
ml_histogram.c, ml_analytics.c.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# topic discovery (tf-idf + spherical k-means; NMF refinement)
# --------------------------------------------------------------------------

def discover_topics(docs: Sequence[str], n_topics: int = 5, *,
                    top_words: int = 8, iters: int = 30,
                    seed: int = 0) -> Dict:
    """Cluster documents into topics over tf-idf; returns per-topic top
    words + document assignments (ml_topic_discovery.c parity)."""
    from neurondb_tpu.search.bm25 import tokenize
    vocab: Dict[str, int] = {}
    rows = []
    for doc in docs:
        c: Dict[int, float] = {}
        for t in tokenize(doc):
            if t not in vocab:
                vocab[t] = len(vocab)
            ti = vocab[t]
            c[ti] = c.get(ti, 0.0) + 1.0
        rows.append(c)
    nv = len(vocab)
    X = np.zeros((len(docs), nv), np.float32)
    for i, c in enumerate(rows):
        for ti, tf in c.items():
            X[i, ti] = tf
    df = (X > 0).sum(0)
    idf = np.log((len(docs) + 1) / (df + 1)) + 1.0
    X = X * idf[None, :]
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-9)

    from neurondb_tpu.ml.kmeans import kmeans_fit, kmeans_predict
    k = min(n_topics, len(docs))
    state = kmeans_fit(jnp.asarray(X), k, max_iter=iters, seed=seed)
    labels = np.asarray(kmeans_predict(state.centroids, jnp.asarray(X)))
    inv_vocab = {v: t for t, v in vocab.items()}
    topics = []
    cent = np.asarray(state.centroids)
    for t in range(k):
        order = np.argsort(-cent[t])[:top_words]
        topics.append({"topic": t,
                       "words": [inv_vocab[int(w)] for w in order
                                 if cent[t, w] > 0],
                       "size": int((labels == t).sum())})
    return {"topics": topics, "labels": labels.tolist(), "n_topics": k}


# --------------------------------------------------------------------------
# LDA (variational EM) — a REAL trainer where the reference stubs one
# --------------------------------------------------------------------------

def lda_fit(counts, n_topics: int, *, alpha: float = 0.1,
            eta: float = 0.01, iters: int = 60, e_steps: int = 25,
            seed: int = 0, restarts: int = 2):
    """Latent Dirichlet Allocation by batch variational EM (the
    mean-field updates of Blei et al. 2003 / Hoffman et al. 2010).

    The reference's topic model initializes random topic-word
    distributions and never trains them
    (ml_topic_discovery.c:443-458 — "simplified LDA"); SURVEY §0 directs
    implementing the real capability. Dense formulation: counts [D, V]
    term counts; every E-step is [D,K]x[K,V] matmuls — MXU-shaped.

    Returns (topic_word [K, V] rows summing to 1, doc_topic [D, K]).
    """
    import jax
    from jax.scipy.special import digamma

    X = jnp.asarray(counts, jnp.float32)                  # [D, V]
    Dn, V = X.shape
    K = min(n_topics, max(2, Dn))

    @jax.jit
    def em_step(lam):
        Elog_beta = digamma(lam) - digamma(
            jnp.sum(lam, 1, keepdims=True))                # [K, V]
        expB = jnp.exp(Elog_beta)

        def e_body(_, gamma):
            Elog_th = digamma(gamma) - digamma(
                jnp.sum(gamma, 1, keepdims=True))          # [D, K]
            expT = jnp.exp(Elog_th)
            # phi normalizer per (d, v): sum_k expT[d,k] expB[k,v]
            norm = expT @ expB + 1e-30                     # [D, V]
            return alpha + expT * ((X / norm) @ expB.T)    # [D, K]

        gamma0 = jnp.ones((Dn, K)) + X.sum(1, keepdims=True) / K
        gamma = jax.lax.fori_loop(0, e_steps, e_body, gamma0)
        Elog_th = digamma(gamma) - digamma(
            jnp.sum(gamma, 1, keepdims=True))
        expT = jnp.exp(Elog_th)
        norm = expT @ expB + 1e-30
        lam_new = eta + expB * (expT.T @ (X / norm))       # [K, V]
        return lam_new, gamma

    # mean-field LDA is multi-modal: keep the restart with the best
    # training log-likelihood proxy sum(X * log(theta @ beta))
    best = None
    for r in range(max(1, restarts)):
        key = jax.random.PRNGKey(seed + 1000 * r)
        lam = jax.random.gamma(key, 100.0, (K, V)) * 0.01 + eta
        gamma = None
        for _ in range(iters):
            lam, gamma = em_step(lam)
        lam_np = np.asarray(lam)
        tw = lam_np / lam_np.sum(1, keepdims=True)
        g = np.asarray(gamma)
        dt = g / g.sum(1, keepdims=True)
        ll = float(np.sum(np.asarray(X) * np.log(dt @ tw + 1e-30)))
        if best is None or ll > best[0]:
            best = (ll, tw, dt)
    return best[1], best[2]


def lda_topics(docs: Sequence[str], n_topics: int = 5, *,
               top_words: int = 8, iters: int = 30, seed: int = 0) -> Dict:
    """discover_topics-compatible output via real LDA training."""
    from neurondb_tpu.search.bm25 import tokenize
    vocab: Dict[str, int] = {}
    rows = []
    for doc in docs:
        c: Dict[int, float] = {}
        for t in tokenize(doc):
            if t not in vocab:
                vocab[t] = len(vocab)
            ti = vocab[t]
            c[ti] = c.get(ti, 0.0) + 1.0
        rows.append(c)
    V = max(len(vocab), 1)
    X = np.zeros((len(docs), V), np.float32)
    for i, c in enumerate(rows):
        for ti, tf in c.items():
            X[i, ti] = tf
    tw, dt = lda_fit(X, n_topics, iters=iters, seed=seed)
    inv_vocab = {v: t for t, v in vocab.items()}
    labels = dt.argmax(1)
    topics = []
    for t in range(tw.shape[0]):
        order = np.argsort(-tw[t])[:top_words]
        topics.append({"topic": t,
                       "words": [inv_vocab[int(w)] for w in order
                                 if int(w) in inv_vocab],
                       "size": int((labels == t).sum())})
    return {"topics": topics, "labels": labels.tolist(),
            "doc_topic": dt.tolist(), "n_topics": tw.shape[0]}


# --------------------------------------------------------------------------
# explainable AI
# --------------------------------------------------------------------------

def permutation_importance(predict_fn: Callable, X, y, *,
                           metric: str = "accuracy", n_repeats: int = 3,
                           seed: int = 0) -> np.ndarray:
    """Per-feature importance: metric drop when the column is shuffled
    (ml_explainable_ai.c parity)."""
    X = np.asarray(X, np.float32)
    y = np.asarray(y)
    rng = np.random.default_rng(seed)

    def score(Xs):
        pred = np.asarray(predict_fn(Xs))
        if metric == "accuracy":
            return float((pred == y).mean())
        return -float(((pred - y) ** 2).mean())

    base = score(X)
    out = np.zeros(X.shape[1], np.float32)
    for f in range(X.shape[1]):
        drops = []
        for _ in range(n_repeats):
            Xp = X.copy()
            rng.shuffle(Xp[:, f])
            drops.append(base - score(Xp))
        out[f] = np.mean(drops)
    return out


def linear_feature_attribution(model: Dict, x) -> np.ndarray:
    """Exact additive attribution for linear models: phi_i = w_i*(x_i -
    mean_i is unavailable without training stats, so contribution =
    w_i * x_i (reference reports the same weight*value products)."""
    coef = np.asarray(model["coef"])
    x = np.asarray(x, np.float32)
    if coef.ndim == 1:
        return x * coef[None, :] if x.ndim > 1 else x * coef
    return x[..., None] * coef[None, :, :]


def prediction_explanation(model_id: int, X, top_k: int = 5) -> List[Dict]:
    """Explain registry-model predictions (linear family: exact weights;
    others: permutation importance proxy)."""
    from neurondb_tpu.ml.registry import get_registry
    rec = get_registry().get(model_id)
    X = np.atleast_2d(np.asarray(X, np.float32))
    out = []
    if "coef" in rec.model and np.asarray(rec.model["coef"]).ndim <= 2:
        contrib = linear_feature_attribution(rec.model, X)
        if contrib.ndim == 3:
            contrib = np.abs(contrib).sum(-1)
        for row in contrib:
            order = np.argsort(-np.abs(row))[:top_k]
            out.append({"features": order.tolist(),
                        "contributions": row[order].tolist()})
        return out
    raise ValueError(f"no fast explanation for {rec.algorithm}; use "
                     "permutation_importance")


# --------------------------------------------------------------------------
# feature store (feature_stores / feature_definitions catalog parity)
# --------------------------------------------------------------------------

@dataclass
class FeatureDefinition:
    name: str
    dtype: str = "float32"
    transform: Optional[Callable[[np.ndarray], np.ndarray]] = None
    description: str = ""
    created_at: float = field(default_factory=time.time)


class FeatureStore:
    """Named feature groups keyed by entity id, with point-in-time reads."""

    def __init__(self):
        self._defs: Dict[str, FeatureDefinition] = {}
        self._data: Dict[str, Dict[int, List]] = {}   # feature -> id -> [(ts, val)]

    def define(self, fd: FeatureDefinition) -> None:
        self._defs[fd.name] = fd
        self._data.setdefault(fd.name, {})

    def list_features(self) -> List[str]:
        return sorted(self._defs)

    def write(self, feature: str, entity_id: int, value,
              ts: Optional[float] = None) -> None:
        if feature not in self._defs:
            raise KeyError(f"undefined feature {feature!r}")
        fd = self._defs[feature]
        if fd.transform is not None:
            value = fd.transform(np.asarray(value))
        self._data[feature].setdefault(entity_id, []).append(
            (ts if ts is not None else time.time(), value))

    def read(self, feature: str, entity_id: int,
             as_of: Optional[float] = None):
        hist = self._data.get(feature, {}).get(entity_id, [])
        if not hist:
            return None
        if as_of is None:
            return hist[-1][1]
        eligible = [v for t, v in hist if t <= as_of]
        return eligible[-1] if eligible else None

    def matrix(self, features: Sequence[str], entity_ids: Sequence[int],
               as_of: Optional[float] = None) -> np.ndarray:
        """Assemble a training matrix (point-in-time correct)."""
        out = np.zeros((len(entity_ids), len(features)), np.float32)
        for j, f in enumerate(features):
            for i, e in enumerate(entity_ids):
                v = self.read(f, e, as_of)
                out[i, j] = 0.0 if v is None else float(np.asarray(v))
        return out


# --------------------------------------------------------------------------
# analytics (ml_analytics.c / ml_histogram.c)
# --------------------------------------------------------------------------

def histogram(x, bins: int = 10) -> Dict:
    x = np.asarray(x, np.float32).ravel()
    counts, edges = np.histogram(x, bins=bins)
    return {"counts": counts.tolist(), "edges": edges.tolist()}


def describe(X) -> List[Dict]:
    """Per-feature summary statistics."""
    X = np.atleast_2d(np.asarray(X, np.float32))
    out = []
    for f in range(X.shape[1]):
        col = X[:, f]
        out.append({"feature": f, "mean": float(col.mean()),
                    "std": float(col.std()), "min": float(col.min()),
                    "p25": float(np.percentile(col, 25)),
                    "p50": float(np.percentile(col, 50)),
                    "p75": float(np.percentile(col, 75)),
                    "max": float(col.max())})
    return out


def correlation_matrix(X) -> np.ndarray:
    return np.corrcoef(np.asarray(X, np.float32).T)
