"""ML runtime: trainers vs closed-form/sklearn-free oracles + unified API."""

import numpy as np
import pytest

import jax.numpy as jnp

from neurondb_tpu.ml import api as ML
from neurondb_tpu.ml import kmeans as KM
from neurondb_tpu.ml import linear as LIN


@pytest.fixture(scope="module")
def reg_data(rng_mod):
    rng = rng_mod
    X = rng.standard_normal((200, 5)).astype(np.float32)
    w = np.array([1.0, -2.0, 0.5, 0.0, 3.0], np.float32)
    y = X @ w + 0.7 + 0.01 * rng.standard_normal(200).astype(np.float32)
    return X, y, w


def test_linear_regression(reg_data):
    X, y, w = reg_data
    model = LIN.linear_regression_fit(X, y)
    np.testing.assert_allclose(model["coef"], w, atol=0.02)
    np.testing.assert_allclose(model["intercept"], 0.7, atol=0.02)
    m = LIN.regression_metrics(model, X, y)
    assert float(m["r2"]) > 0.99


def test_ridge_shrinks(reg_data):
    X, y, _ = reg_data
    m0 = LIN.linear_regression_fit(X, y, l2=0.0)
    m1 = LIN.linear_regression_fit(X, y, l2=1000.0)
    assert np.linalg.norm(m1["coef"]) < np.linalg.norm(m0["coef"])


def test_lasso_sparsity(reg_data):
    X, y, w = reg_data
    model = LIN.lasso_fit(X, y, l1=0.05, iters=800)
    coef = np.asarray(model["coef"])
    # true-zero coefficient driven to (near) zero
    assert abs(coef[3]) < 0.02
    assert abs(coef[4] - 3.0) < 0.2


def test_logistic_binary(rng):
    X = rng.standard_normal((300, 4)).astype(np.float32)
    y = (X[:, 0] - X[:, 1] > 0).astype(np.int32)
    model = LIN.logistic_regression_fit(X, y, iters=30)
    acc = float(LIN.classification_metrics(model, X, y)["accuracy"])
    assert acc > 0.95


def test_logistic_multiclass(rng):
    X = rng.standard_normal((400, 4)).astype(np.float32)
    y = np.argmax(X[:, :3], axis=1).astype(np.int32)
    model = LIN.logistic_regression_fit(X, y, num_classes=3, iters=60)
    acc = float(LIN.classification_metrics(model, X, y)["accuracy"])
    assert acc > 0.85


def test_kmeans(rng):
    centers = np.array([[0, 0], [10, 0], [0, 10]], np.float32)
    X = np.concatenate([c + rng.standard_normal((100, 2)).astype(np.float32)
                        for c in centers])
    s = KM.kmeans_fit(jnp.asarray(X), 3, seed=1)
    got = np.sort(np.round(np.asarray(s.centroids)).astype(int), axis=0)
    np.testing.assert_allclose(np.sort(centers, axis=0), got, atol=1)
    labels = KM.kmeans_predict(s.centroids, X)
    assert float(KM.silhouette_score(X, labels, 3)) > 0.5
    assert float(KM.davies_bouldin_index(X, labels, 3)) < 0.5


def test_minibatch_kmeans(rng):
    centers = np.array([[0, 0], [10, 10]], np.float32)
    X = np.concatenate([c + rng.standard_normal((500, 2)).astype(np.float32)
                        for c in centers])
    s = KM.minibatch_kmeans_fit(jnp.asarray(X), 2, batch=128, iters=50, seed=0)
    c = np.sort(np.asarray(s.centroids), axis=0)
    np.testing.assert_allclose(c, np.sort(centers, axis=0), atol=1.0)


def test_unified_api(rng, reg_data):
    X, y, _ = reg_data
    mid = ML.train("proj1", "linear_regression", X, y)
    pred = ML.predict(mid, X)
    assert pred.shape == (200,)
    ev = ML.evaluate(mid, X, y)
    assert ev["r2"] > 0.99
    ML.deploy(mid)
    from neurondb_tpu.ml.registry import get_registry
    assert get_registry().get(mid).status == "deployed"


def test_unified_api_aliases(rng):
    X = rng.standard_normal((50, 3)).astype(np.float32)
    mid = ML.train("proj1", "kmeans", X, hyperparams={"k": 4})
    labels = ML.predict(mid, X)
    assert set(np.unique(labels)) <= set(range(4))


def test_unknown_algorithm():
    with pytest.raises(ValueError, match="unknown algorithm"):
        ML.train("p", "not_an_algo", np.zeros((2, 2)))


def test_registry_versioning(rng):
    X = rng.standard_normal((50, 3)).astype(np.float32)
    y = X[:, 0]
    m1 = ML.train("vproj", "ridge", X, y, {"alpha": 0.1})
    m2 = ML.train("vproj", "ridge", X, y, {"alpha": 0.2})
    from neurondb_tpu.ml.registry import get_registry
    assert get_registry().get(m2).version == get_registry().get(m1).version + 1


def test_registry_persistence(tmp_path, rng):
    from neurondb_tpu.ml.registry import ModelRegistry
    reg = ModelRegistry(str(tmp_path))
    X = rng.standard_normal((30, 2)).astype(np.float32)
    model = LIN.linear_regression_fit(X, X[:, 0])
    mid = reg.register("p", "linear_regression", model)
    reg2 = ModelRegistry(str(tmp_path))
    rec = reg2.get(mid)
    np.testing.assert_allclose(rec.model["coef"], model["coef"])


def test_registry_persistence_no_pickle(tmp_path, rng):
    """Model dirs are npz + JSON only — loading an untrusted model root
    must never execute code (ADVICE r1: pickled treedef)."""
    import os
    from neurondb_tpu.ml.registry import ModelRegistry
    reg = ModelRegistry(str(tmp_path))
    X = rng.standard_normal((30, 2)).astype(np.float32)
    model = {"nested": {"coef": X[:, 0], "mix": [X, (1, 2.5, None)]}}
    mid = reg.register("p", "custom", model)
    files = os.listdir(os.path.join(str(tmp_path), f"model_{mid:06d}"))
    assert not any(f.endswith(".pkl") for f in files)
    rec = ModelRegistry(str(tmp_path)).get(mid)
    np.testing.assert_allclose(rec.model["nested"]["coef"], X[:, 0])
    np.testing.assert_allclose(rec.model["nested"]["mix"][0], X)
    assert isinstance(rec.model["nested"]["mix"][1], tuple)
    assert rec.model["nested"]["mix"][1][2] is None
