"""Phase-6 ML algorithms: gmm/pca/knn/nb/svm/dbscan/hierarchical/trees."""

import numpy as np
import pytest

import jax.numpy as jnp

from neurondb_tpu.ml import api as ML
from neurondb_tpu.ml import cluster_extra as CE
from neurondb_tpu.ml import gmm as GMM
from neurondb_tpu.ml import neighbors as NB
from neurondb_tpu.ml import pca as PCA
from neurondb_tpu.ml import trees as TR


@pytest.fixture(scope="module")
def blobs(rng_mod):
    rng = rng_mod
    centers = np.array([[0, 0, 0], [8, 8, 0], [0, 8, 8]], np.float32)
    X = np.concatenate([c + rng.standard_normal((150, 3)).astype(np.float32)
                        for c in centers])
    y = np.repeat(np.arange(3), 150).astype(np.int32)
    return X, y


def _cluster_agreement(labels, y, k):
    """Majority-vote accuracy of cluster labels vs ground truth."""
    labels = np.asarray(labels)
    correct = 0
    for c in np.unique(labels):
        if c < 0:
            continue
        members = y[labels == c]
        correct += np.bincount(members).max()
    return correct / len(y)


def test_gmm(blobs):
    X, y = blobs
    s = GMM.gmm_fit(X, 3, iters=60, seed=0)
    labels = np.asarray(GMM.gmm_predict(s, X))
    assert _cluster_agreement(labels, y, 3) > 0.95
    probs = np.asarray(GMM.gmm_predict_proba(s, X))
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)
    assert np.isfinite(float(s.log_likelihood))


def test_gmm_scores_flag_outliers(blobs):
    X, _ = blobs
    s = GMM.gmm_fit(X, 3, iters=60, seed=0)
    scores = np.asarray(GMM.gmm_score_samples(s, X))
    out = np.asarray(GMM.gmm_score_samples(s, X + 50.0))
    assert out.mean() < scores.mean() - 100


def test_pca(rng):
    # data with one dominant direction
    z = rng.standard_normal((500, 1)).astype(np.float32) * 10
    noise = rng.standard_normal((500, 4)).astype(np.float32) * 0.1
    X = np.concatenate([z, noise], axis=1)
    m = PCA.pca_fit(X, 2)
    assert float(m["explained_variance_ratio"][0]) > 0.97
    Z = PCA.pca_transform(m, X)
    assert Z.shape == (500, 2)
    Xr = PCA.pca_inverse_transform(m, Z)
    assert float(jnp.mean((Xr - X) ** 2)) < 0.05
    mw = PCA.pca_fit(X, 2, whiten=True)
    Zw = np.asarray(PCA.pca_transform(mw, X))
    np.testing.assert_allclose(Zw.std(0), 1.0, atol=0.1)


def test_knn_classifier(blobs):
    X, y = blobs
    m = NB.knn_fit(X, y, k=5)
    pred = np.asarray(NB.knn_predict(m, X))
    assert (pred == y).mean() > 0.97


def test_knn_regressor(rng):
    X = rng.standard_normal((300, 2)).astype(np.float32)
    y = (X[:, 0] * 2 + X[:, 1]).astype(np.float32)
    m = NB.knn_fit(X, y, k=5, task="regress")
    pred = np.asarray(NB.knn_predict(m, X[:50]))
    assert np.corrcoef(pred, y[:50])[0, 1] > 0.95


def test_naive_bayes(blobs):
    X, y = blobs
    m = NB.naive_bayes_fit(X, y, num_classes=3)
    pred = np.asarray(NB.naive_bayes_predict(m, X))
    assert (pred == y).mean() > 0.97


def test_svm_linear():
    # own seed: the shared session rng's stream position depends on which
    # tests ran before, and this threshold sits near the noise floor
    rng = np.random.default_rng(7)
    X = rng.standard_normal((400, 4)).astype(np.float32)
    y = (X[:, 0] + X[:, 1] > 0).astype(np.int32)
    m = NB.svm_fit(X, y, num_classes=2, iters=400)
    pred = np.asarray(NB.svm_predict(m, X))
    assert (pred == y).mean() > 0.95


def test_svm_rbf_via_api(rng):
    t = rng.uniform(0, 2 * np.pi, 400).astype(np.float32)
    r = np.concatenate([np.full(200, 1.0), np.full(200, 3.0)]).astype(np.float32)
    X = np.stack([r * np.cos(t), r * np.sin(t)], 1)
    X += 0.1 * rng.standard_normal(X.shape).astype(np.float32)
    y = (r > 2).astype(np.int32)
    mid = ML.train("p", "svm", X, y, {"kernel": "rbf", "gamma": 0.5,
                                      "iters": 400})
    pred = ML.predict(mid, X)
    assert (pred == y).mean() > 0.9  # circles are not linearly separable


def test_dbscan(blobs):
    X, y = blobs
    m = CE.dbscan_fit(X, eps=1.5, min_samples=5)
    labels = np.asarray(m["labels"])
    assert _cluster_agreement(labels, y, 3) > 0.9
    # new points assign to nearest cluster
    pred = np.asarray(CE.dbscan_predict(m, X[:5] + 0.1))
    assert (pred == labels[:5]).all()
    # far point is noise
    assert CE.dbscan_predict(m, np.full((1, 3), 100.0, np.float32))[0] == -1


def test_hierarchical(blobs):
    X, y = blobs
    m = CE.agglomerative_fit(X[:90], n_clusters=3)
    labels = np.asarray(m["labels"])
    assert len(np.unique(labels)) == 3
    assert _cluster_agreement(labels, y[:90], 3) > 0.9


def test_outliers(rng):
    X = rng.standard_normal((200, 3)).astype(np.float32)
    X[0] = 100.0
    assert bool(CE.zscore_outliers(X)[0])
    assert CE.zscore_outliers(X)[1:].mean() < 0.1
    assert bool(CE.iqr_outliers(X)[0])
    scores = np.asarray(CE.knn_outlier_scores(X, k=3))
    assert scores[0] == scores.max()


def test_decision_tree(blobs):
    X, y = blobs
    m = TR.decision_tree_fit(X, y, depth=4)
    pred = np.asarray(TR.ensemble_predict(m, X))
    assert (pred == y).mean() > 0.95


def test_random_forest(blobs):
    X, y = blobs
    m = TR.random_forest_fit(X, y, n_trees=10, depth=4, seed=0)
    pred = np.asarray(TR.ensemble_predict(m, X))
    assert (pred == y).mean() > 0.95
    proba = np.asarray(TR.ensemble_predict_proba(m, X))
    np.testing.assert_allclose(proba.sum(1), 1.0, rtol=1e-4)


def test_gbt_regression(rng):
    X = rng.standard_normal((500, 3)).astype(np.float32)
    y = np.sin(X[:, 0]) + 0.5 * X[:, 1]
    m = TR.gradient_boosting_fit(X, y, task="regress", n_trees=30, depth=3)
    pred = np.asarray(TR.ensemble_predict(m, X))
    assert np.corrcoef(pred, y)[0, 1] ** 2 > 0.8


def test_rf_regression(rng):
    X = rng.standard_normal((400, 2)).astype(np.float32)
    y = X[:, 0] ** 2 + X[:, 1]
    m = TR.random_forest_fit(X, y, task="regress", n_trees=20, depth=5,
                             seed=0)
    pred = np.asarray(TR.ensemble_predict(m, X))
    assert np.corrcoef(pred, y)[0, 1] ** 2 > 0.8


def test_trees_via_unified_api(blobs):
    X, y = blobs
    for algo in ("dt", "rf", "xgboost"):
        mid = ML.train("p", algo, X, y, {"depth": 4})
        assert (ML.predict(mid, X) == y).mean() > 0.9


def test_anomaly_via_api(rng):
    X = rng.standard_normal((300, 4)).astype(np.float32)
    mid = ML.train("p", "anomaly_detection", X, hyperparams={"k": 5})
    flags = ML.predict(mid, np.vstack([X[:10], np.full((1, 4), 30.0)]))
    assert flags[-1]
    assert flags[:10].mean() < 0.5


def test_algorithm_listing():
    algos = ML.list_algorithms()
    for name in ("kmeans", "gmm", "pca", "dbscan", "random_forest",
                 "gradient_boosting", "svm", "naive_bayes",
                 "knn_classifier", "logistic_regression", "lasso"):
        assert name in algos


# ---- kernel SVM (exact dual solver) ----

def test_svm_dual_matches_numpy_qp_oracle():
    """The jitted projected-gradient dual solve must reach the same box-QP
    optimum as a float64 numpy oracle run to tight convergence."""
    rng = np.random.default_rng(3)
    X = rng.standard_normal((80, 3)).astype(np.float32)
    y = (X[:, 0] - 0.5 * X[:, 1] > 0).astype(np.int32)
    C, gamma = 1.0, 0.7

    m = NB.svm_kernel_fit(X, y, num_classes=2, C=C, kernel="rbf",
                          gamma=gamma, iters=3000)

    # float64 oracle: same QP, scalar projected gradient to convergence
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1).astype(np.float64)
    K = np.exp(-gamma * d2)
    t = np.where(y == 1, 1.0, -1.0)
    lam = np.linalg.eigvalsh(K).max()
    a = np.zeros(80)
    for _ in range(20000):
        a = np.clip(a + (1.0 / lam) * (1.0 - t * (K @ (a * t))), 0.0, C)
    f_oracle = K @ (a * t)

    # compare decision values (up to the shared bias), class-1 column
    dec = np.asarray(NB.svm_kernel_decision(m, X))
    f_model = dec[:, 1] - float(np.asarray(m["b"])[1])
    assert np.max(np.abs(f_model - f_oracle)) < 5e-2
    # support-vector compaction kept only active rows
    assert int(m["n_support"]) <= 80
    assert int(m["n_support"]) >= int((a > 1e-6).sum()) - 5


def test_svm_dual_rbf_circles(rng):
    """Nonlinear decision surface the linear solver cannot represent."""
    t = rng.uniform(0, 2 * np.pi, 400).astype(np.float32)
    r = np.concatenate([np.full(200, 1.0), np.full(200, 3.0)]).astype(
        np.float32)
    X = np.stack([r * np.cos(t), r * np.sin(t)], 1)
    X += 0.1 * rng.standard_normal(X.shape).astype(np.float32)
    y = (r > 2).astype(np.int32)
    m = NB.svm_kernel_fit(X, y, num_classes=2, kernel="rbf", gamma=0.5,
                          iters=800)
    pred = np.asarray(NB.svm_kernel_predict(m, X))
    assert (pred == y).mean() > 0.97


def test_svm_dual_multiclass_and_api(blobs):
    X, y = blobs
    mid = ML.train("p", "svm", X, y, {"kernel": "rbf", "gamma": 0.2,
                                      "solver": "dual", "iters": 600})
    assert (ML.predict(mid, X) == y).mean() > 0.95


def test_svm_dual_poly_kernel(rng):
    X = rng.standard_normal((300, 2)).astype(np.float32)
    y = ((X[:, 0] * X[:, 1]) > 0).astype(np.int32)   # XOR-ish quadrant
    m = NB.svm_kernel_fit(X, y, num_classes=2, kernel="poly", degree=2,
                          gamma=1.0, coef0=0.0, iters=1500, C=5.0)
    pred = np.asarray(NB.svm_kernel_predict(m, X))
    assert (pred == y).mean() > 0.9
