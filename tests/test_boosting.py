"""Per-library boosting semantics (ml/boosting.py — xgboost/lightgbm/
catboost fidelity, VERDICT r1 missing item 6)."""

import numpy as np
import pytest

from neurondb_tpu.ml import boosting as BO


@pytest.fixture(scope="module")
def clf_data():
    rng = np.random.default_rng(5)
    X = rng.standard_normal((600, 6)).astype(np.float32)
    y = ((X[:, 0] > 0) ^ (X[:, 1] > 0.5)).astype(np.int32)  # non-linear
    return X, y


@pytest.fixture(scope="module")
def reg_data():
    rng = np.random.default_rng(6)
    X = rng.standard_normal((600, 5)).astype(np.float32)
    y = (np.sin(X[:, 0]) + 0.5 * X[:, 1] ** 2).astype(np.float32)
    return X, y


def _acc(pred, y):
    return float((np.asarray(pred) == y).mean())


def _r2(pred, y):
    p = np.asarray(pred).ravel()
    return 1 - ((y - p) ** 2).sum() / ((y - y.mean()) ** 2).sum()


# ---- XGBoost ----

def test_xgboost_classification(clf_data):
    X, y = clf_data
    m = BO.xgboost_fit(X, y, n_trees=30, depth=4, learning_rate=0.3)
    assert _acc(BO.xgboost_predict(m, X), y) > 0.93
    proba = np.asarray(BO.xgboost_predict_proba(m, X))
    assert proba.shape == (600, 2)
    np.testing.assert_allclose(proba.sum(1), 1.0, rtol=1e-4)


def test_xgboost_regression(reg_data):
    X, y = reg_data
    m = BO.xgboost_fit(X, y, task="regress", n_trees=40, depth=4,
                       learning_rate=0.3)
    assert _r2(BO.xgboost_predict(m, X), y) > 0.85


def test_xgboost_regularization_shrinks_leaves(reg_data):
    """Larger lambda must shrink leaf magnitudes (the defining
    regularization semantic: leaf = -G/(H+lambda))."""
    X, y = reg_data
    m1 = BO.xgboost_fit(X, y, task="regress", n_trees=5, depth=3,
                        reg_lambda=0.1)
    m2 = BO.xgboost_fit(X, y, task="regress", n_trees=5, depth=3,
                        reg_lambda=100.0)
    l1 = np.abs(np.asarray(m1["trees"]["leaf"])).mean()
    l2 = np.abs(np.asarray(m2["trees"]["leaf"])).mean()
    assert l2 < l1 * 0.5


def test_xgboost_gamma_prunes_splits(reg_data):
    X, y = reg_data
    m_free = BO.xgboost_fit(X, y, task="regress", n_trees=3, depth=4,
                            gamma=0.0)
    m_tight = BO.xgboost_fit(X, y, task="regress", n_trees=3, depth=4,
                             gamma=1e6)
    splits_free = int((np.asarray(m_free["trees"]["feat"]) >= 0).sum())
    splits_tight = int((np.asarray(m_tight["trees"]["feat"]) >= 0).sum())
    assert splits_tight < splits_free


# ---- LightGBM ----

def test_lightgbm_classification(clf_data):
    X, y = clf_data
    m = BO.lightgbm_fit(X, y, n_trees=25, num_leaves=15,
                        learning_rate=0.3)
    assert _acc(BO.lightgbm_predict(m, X), y) > 0.93


def test_lightgbm_leafwise_unbalanced(reg_data):
    """Leaf-wise growth must produce UNBALANCED trees: with num_leaves
    much smaller than 2^depth-equivalent, some branches go deeper than
    others (child pointers differ from the heap layout)."""
    X, y = reg_data
    m = BO.lightgbm_fit(X, y, task="regress", n_trees=1, num_leaves=8)
    left = np.asarray(m["trees"]["left"])[0, 0]
    feat = np.asarray(m["trees"]["feat"])[0, 0]
    internal = feat >= 0
    assert internal.sum() == 7               # num_leaves-1 splits
    # heap layout would force left child == 2*i+1 everywhere; leaf-wise
    # allocation is sequential so at least one internal node differs
    idx = np.where(internal)[0]
    assert any(left[i] != 2 * i + 1 for i in idx)


def test_lightgbm_goss(clf_data):
    X, y = clf_data
    m = BO.lightgbm_fit(X, y, n_trees=25, num_leaves=15, goss=True,
                        learning_rate=0.3)
    assert _acc(BO.lightgbm_predict(m, X), y) > 0.9


def test_lightgbm_regression(reg_data):
    X, y = reg_data
    m = BO.lightgbm_fit(X, y, task="regress", n_trees=40, num_leaves=15,
                        learning_rate=0.2)
    assert _r2(BO.lightgbm_predict(m, X), y) > 0.85


# ---- CatBoost ----

def test_catboost_classification(clf_data):
    X, y = clf_data
    m = BO.catboost_fit(X, y, n_trees=40, depth=4, learning_rate=0.3)
    assert _acc(BO.catboost_predict(m, X), y) > 0.9


def test_catboost_oblivious_symmetry(reg_data):
    """Oblivious trees use ONE (feature, bin) per level."""
    X, y = reg_data
    m = BO.catboost_fit(X, y, task="regress", n_trees=2, depth=4)
    assert m["trees"]["feats"].shape == (2, 1, 4)    # [T, C, depth]
    assert m["trees"]["leaf"].shape == (2, 1, 16)    # 2^depth leaves


def test_catboost_ordered_vs_plain(reg_data):
    """Ordered boosting must differ from plain (prediction-shift-free
    gradients) while still fitting."""
    X, y = reg_data
    m_ord = BO.catboost_fit(X, y, task="regress", n_trees=20, depth=4,
                            ordered=True, seed=1)
    m_pln = BO.catboost_fit(X, y, task="regress", n_trees=20, depth=4,
                            ordered=False, seed=1)
    r_ord = _r2(BO.catboost_predict(m_ord, X), y)
    r_pln = _r2(BO.catboost_predict(m_pln, X), y)
    assert r_ord > 0.75 and r_pln > 0.75
    assert not np.allclose(np.asarray(m_ord["trees"]["leaf"]),
                           np.asarray(m_pln["trees"]["leaf"]))


def test_ordered_target_encoding():
    cat = np.asarray([0, 0, 1, 1, 0, 1])
    y = np.asarray([1.0, 0.0, 1.0, 1.0, 1.0, 0.0])
    perm = np.arange(6)
    enc = BO.ordered_target_encode(cat, y, perm, prior=0.5, a=1.0)
    # first occurrence of each category sees only the prior
    assert enc[0] == pytest.approx(0.5)
    assert enc[2] == pytest.approx(0.5)
    # later ones see the prefix mean: cat0 at i=4 saw y=[1,0]
    assert enc[4] == pytest.approx((1.0 + 0.5) / 3.0)
    # leak-free: encoding never uses its own target
    y2 = y.copy()
    y2[4] = 0.0
    enc2 = BO.ordered_target_encode(cat, y2, perm)
    assert enc2[4] == enc[4]


# ---- unified API ----

def test_boosting_via_unified_api(clf_data):
    from neurondb_tpu.ml import api as ml
    X, y = clf_data
    for algo in ("xgboost", "lightgbm", "catboost"):
        mid = ml.train("bst", algo, X, y,
                       hyperparams={"n_trees": 10,
                                    "learning_rate": 0.3})
        pred = ml.predict(mid, X)
        assert _acc(pred, y) > 0.8, algo
        ev = ml.evaluate(mid, X, y)
        assert ev["accuracy"] > 0.8, algo
