"""Topic discovery, explainability, feature store, analytics, GCN."""

import numpy as np
import pytest

import jax.numpy as jnp

from neurondb_tpu.ml import extras as EX
from neurondb_tpu.ml import gnn as G
from neurondb_tpu.types.graph import VectorGraph


def test_topic_discovery():
    docs = (["database index query storage transaction"] * 5 +
            ["neural network training gradient layers"] * 5 +
            ["football soccer goal match player"] * 5)
    out = EX.discover_topics(docs, n_topics=3, seed=0)
    assert out["n_topics"] == 3
    sizes = sorted(t["size"] for t in out["topics"])
    assert sizes == [5, 5, 5]
    words = {w for t in out["topics"] for w in t["words"]}
    assert "databas" in words or "database" in words


def test_permutation_importance(rng):
    X = rng.standard_normal((300, 4)).astype(np.float32)
    y = (X[:, 1] > 0).astype(np.int32)   # only feature 1 matters

    def predict(Xs):
        return (Xs[:, 1] > 0).astype(np.int32)

    imp = EX.permutation_importance(predict, X, y, n_repeats=2)
    assert imp.argmax() == 1
    assert imp[1] > 0.3
    assert abs(imp[0]) < 0.05


def test_linear_explanation(rng):
    from neurondb_tpu.ml import api as ML
    X = rng.standard_normal((100, 3)).astype(np.float32)
    y = X @ np.array([5.0, 0.0, -1.0], np.float32)
    mid = ML.train("exp", "linear_regression", X, y)
    out = EX.prediction_explanation(mid, X[:2], top_k=2)
    assert out[0]["features"][0] in (0, 2)  # dominant weights


def test_feature_store():
    fs = EX.FeatureStore()
    fs.define(EX.FeatureDefinition("age"))
    fs.define(EX.FeatureDefinition("score",
                                   transform=lambda v: v / 100.0))
    fs.write("age", 1, 30.0, ts=100.0)
    fs.write("age", 1, 31.0, ts=200.0)
    fs.write("score", 1, 50.0, ts=150.0)
    assert fs.read("age", 1) == 31.0
    assert fs.read("age", 1, as_of=150.0) == 30.0
    assert fs.read("age", 2) is None
    m = fs.matrix(["age", "score"], [1, 2])
    np.testing.assert_allclose(m, [[31.0, 0.5], [0.0, 0.0]])
    with pytest.raises(KeyError):
        fs.write("unknown", 1, 1.0)


def test_analytics(rng):
    X = rng.standard_normal((200, 2)).astype(np.float32)
    h = EX.histogram(X[:, 0], bins=5)
    assert sum(h["counts"]) == 200
    d = EX.describe(X)
    assert len(d) == 2 and abs(d[0]["mean"]) < 0.3
    c = EX.correlation_matrix(X)
    assert c.shape == (2, 2)
    np.testing.assert_allclose(np.diag(c), 1.0, rtol=1e-5)


def test_gcn_two_cliques(rng):
    # two 10-cliques joined by one edge; features = noisy class signal
    edges = []
    for a in range(10):
        for b in range(a + 1, 10):
            edges.append((a, b))
            edges.append((a + 10, b + 10))
    edges.append((0, 10))
    g = VectorGraph.from_edges(20, edges)
    X = rng.standard_normal((20, 8)).astype(np.float32) * 0.1
    X[:10, 0] += 1.0
    X[10:, 1] += 1.0
    y = np.repeat([0, 1], 10).astype(np.int32)
    train_mask = np.zeros(20, np.float32)
    train_mask[[0, 1, 10, 11]] = 1.0   # 2 labeled nodes per class
    model = G.gcn_fit(g, X, y, train_mask=train_mask, hidden=16,
                      iters=150, seed=0)
    pred = np.asarray(G.gcn_predict(model, X))
    assert (pred == y).mean() > 0.9


def test_lda_recovers_planted_topics():
    """Variational-EM LDA (the reference's ml_topic_discovery.c never
    trains its 'simplified LDA' — ours must actually recover structure)."""
    rng = np.random.default_rng(0)
    V, K, D = 60, 3, 200
    true_tw = np.zeros((K, V))
    for k in range(K):
        true_tw[k, k * 20:(k + 1) * 20] = 1 / 20
    X = np.zeros((D, V), np.float32)
    zs = rng.integers(0, K, D)
    for d in range(D):
        words = rng.choice(V, size=50, p=true_tw[zs[d]])
        np.add.at(X[d], words, 1)
    tw, dt = EX.lda_fit(X, K, iters=60, seed=1)
    assert tw.shape == (K, V) and dt.shape == (D, K)
    np.testing.assert_allclose(tw.sum(1), 1.0, atol=1e-4)
    purity = tw.reshape(K, K, 20).sum(-1).max(1).mean()
    assert purity > 0.95, purity
    # doc assignments consistent with the planted labels
    pred = dt.argmax(1)
    agree = np.mean([(pred[a] == pred[b]) == (zs[a] == zs[b])
                     for a in range(60) for b in range(60)])
    assert agree > 0.95


def test_lda_topics_words():
    docs = ["apple banana fruit salad", "banana apple smoothie",
            "rocket launch orbit space", "orbit satellite rocket",
            "guitar drum music band", "music guitar concert"]
    out = EX.lda_topics(docs, 3, iters=40, seed=0)
    assert out["n_topics"] == 3
    words = {w for t in out["topics"] for w in t["words"][:3]}
    assert {"apple", "rocket", "music"} & words
