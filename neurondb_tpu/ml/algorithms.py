"""Algorithm dispatch table — registers every trainer with the unified API.

One registration per reference algorithm file (SURVEY.md §2.4 inventory).
Import side effects only; keep this module free of heavy work.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from neurondb_tpu.ml import kmeans as KM
from neurondb_tpu.ml import linear as LIN
from neurondb_tpu.ml.api import Trainer, register_algorithm


# ---- clustering ----

def _kmeans_train(X, *, k: int = 8, max_iter: int = 50, tol: float = 1e-3,
                  seed: int = 0, init: str = "kmeans++"):
    s = KM.kmeans_fit(X, k, max_iter=max_iter, tol=tol, seed=seed, init=init)
    return {"centroids": s.centroids, "inertia": s.inertia, "n_iter": s.n_iter}


def _kmeans_eval(model, X, y=None) -> Dict:
    labels = KM.kmeans_predict(model["centroids"], X)
    k = model["centroids"].shape[0]
    return {"inertia": model["inertia"],
            "silhouette": KM.silhouette_score(X, labels, k),
            "davies_bouldin": KM.davies_bouldin_index(X, labels, k)}


register_algorithm(Trainer(
    "kmeans", _kmeans_train,
    lambda m, X: KM.kmeans_predict(m["centroids"], X),
    _kmeans_eval, task="unsupervised"))


def _mbk_train(X, *, k: int = 8, batch: int = 1024, iters: int = 100,
               seed: int = 0):
    s = KM.minibatch_kmeans_fit(X, k, batch=batch, iters=iters, seed=seed)
    return {"centroids": s.centroids, "inertia": s.inertia, "n_iter": s.n_iter}


register_algorithm(Trainer(
    "minibatch_kmeans", _mbk_train,
    lambda m, X: KM.kmeans_predict(m["centroids"], X),
    _kmeans_eval, task="unsupervised"))


# ---- linear family ----

register_algorithm(Trainer(
    "linear_regression",
    lambda X, y, **hp: LIN.linear_regression_fit(X, y, **hp),
    LIN.linear_regression_predict,
    LIN.regression_metrics))

register_algorithm(Trainer(
    "ridge",
    lambda X, y, *, alpha=1.0, **hp: LIN.linear_regression_fit(X, y, l2=alpha, **hp),
    LIN.linear_regression_predict,
    LIN.regression_metrics))

register_algorithm(Trainer(
    "lasso",
    lambda X, y, *, alpha=1.0, iters=500: LIN.lasso_fit(X, y, l1=alpha, iters=iters),
    LIN.linear_regression_predict,
    LIN.regression_metrics))

register_algorithm(Trainer(
    "elastic_net",
    lambda X, y, **hp: LIN.elastic_net_fit(X, y, **hp),
    LIN.linear_regression_predict,
    LIN.regression_metrics))


def _logreg_train(X, y, *, l2=1e-4, iters=50, num_classes=None):
    nc = int(num_classes if num_classes is not None
             else int(jnp.max(jnp.asarray(y))) + 1)
    return LIN.logistic_regression_fit(X, y, l2=l2, iters=iters,
                                       num_classes=max(nc, 2))


register_algorithm(Trainer(
    "logistic_regression", _logreg_train,
    LIN.logistic_predict,
    lambda m, X, y: LIN.classification_metrics(m, X, y)))


# ---- gmm / pca / dbscan / hierarchical ----

from neurondb_tpu.ml import cluster_extra as CE
from neurondb_tpu.ml import gmm as GMM
from neurondb_tpu.ml import neighbors as NB
from neurondb_tpu.ml import pca as PCA
from neurondb_tpu.ml import trees as TR


def _gmm_train(X, *, k: int = 4, iters: int = 100, seed: int = 0):
    s = GMM.gmm_fit(X, k, iters=iters, seed=seed)
    return {"means": s.means, "variances": s.variances,
            "weights": s.weights, "log_likelihood": s.log_likelihood}


def _gmm_state(m):
    return GMM.GMMState(m["means"], m["variances"], m["weights"],
                        m["log_likelihood"])


register_algorithm(Trainer(
    "gmm", _gmm_train,
    lambda m, X: GMM.gmm_predict(_gmm_state(m), X),
    lambda m, X, y=None: {"log_likelihood": m["log_likelihood"]},
    task="unsupervised"))

register_algorithm(Trainer(
    "pca",
    lambda X, *, n_components=2, whiten=False: PCA.pca_fit(
        X, n_components, whiten=whiten),
    PCA.pca_transform,
    lambda m, X, y=None: {
        "explained_variance_ratio_sum":
            float(jnp.sum(m["explained_variance_ratio"]))},
    task="unsupervised"))

register_algorithm(Trainer(
    "dbscan",
    lambda X, **hp: CE.dbscan_fit(X, **hp),
    CE.dbscan_predict,
    None, task="unsupervised"))

register_algorithm(Trainer(
    "hierarchical",
    lambda X, *, n_clusters=2: CE.agglomerative_fit(X, n_clusters),
    lambda m, X: KM.kmeans_predict(
        m["centroids"][m["active"]] if hasattr(m["active"], "shape")
        else m["centroids"], X),
    None, task="unsupervised"))


# ---- knn / naive bayes / svm ----

register_algorithm(Trainer(
    "knn_classifier",
    lambda X, y, *, k=5: NB.knn_fit(X, y, k=k, task="classify"),
    NB.knn_predict,
    lambda m, X, y: LIN.classification_metrics(m, X, y, NB.knn_predict)))

def _knn_reg_eval(m, X, y):
    pred = NB.knn_predict(m, X)
    yv = jnp.asarray(y, jnp.float32)
    mse = jnp.mean((pred - yv) ** 2)
    return {"mse": mse, "r2": 1.0 - mse / jnp.maximum(jnp.var(yv), 1e-30)}


register_algorithm(Trainer(
    "knn_regressor",
    lambda X, y, *, k=5: NB.knn_fit(X, y, k=k, task="regress"),
    NB.knn_predict, _knn_reg_eval))


def _nb_train(X, y, *, num_classes=None, var_smoothing=1e-9):
    nc = int(num_classes if num_classes is not None
             else int(jnp.max(jnp.asarray(y))) + 1)
    return NB.naive_bayes_fit(X, y, num_classes=nc,
                              var_smoothing=var_smoothing)


register_algorithm(Trainer(
    "naive_bayes", _nb_train,
    NB.naive_bayes_predict,
    lambda m, X, y: LIN.classification_metrics(m, X, y,
                                               NB.naive_bayes_predict)))


def _svm_train(X, y, *, num_classes=None, C=1.0, iters=None,
               kernel="linear", gamma=1.0, degree=3, coef0=1.0,
               solver=None, rff=256, sample_cap=8192, seed=0):
    """kernel != "linear" trains the exact dual solver (support-vector
    semantics, ml_svm.c parity) unless solver="rff" asks for the
    random-Fourier-feature approximation (faster at large n)."""
    nc = int(num_classes if num_classes is not None
             else int(jnp.max(jnp.asarray(y))) + 1)
    if solver is None:
        solver = "primal" if kernel == "linear" else "dual"
    if solver == "rff":
        Xf = NB.rbf_features(X, n_features=rff, gamma=gamma, seed=seed)
        m = NB.svm_fit(Xf, y, num_classes=max(nc, 2), C=C,
                       iters=int(iters or 300))
        m["rbf"] = {"gamma": jnp.asarray(gamma), "rff": jnp.asarray(rff),
                    "seed": jnp.asarray(seed)}
        return m
    if solver == "dual":
        return NB.svm_kernel_fit(
            X, y, num_classes=max(nc, 2), C=C, kernel=kernel, gamma=gamma,
            degree=degree, coef0=coef0, iters=int(iters or 500),
            sample_cap=sample_cap, seed=seed)
    return NB.svm_fit(X, y, num_classes=max(nc, 2), C=C,
                      iters=int(iters or 300))


def _svm_predict(m, X):
    if "sv" in m:
        return NB.svm_kernel_predict(m, X)
    if "rbf" in m:
        X = NB.rbf_features(X, n_features=int(m["rbf"]["rff"]),
                            gamma=float(m["rbf"]["gamma"]),
                            seed=int(m["rbf"]["seed"]))
    return NB.svm_predict(m, X)


register_algorithm(Trainer(
    "svm", _svm_train, _svm_predict,
    lambda m, X, y: LIN.classification_metrics(m, X, y, _svm_predict)))


# ---- trees ----

def _tree_eval(m, X, y):
    pred = TR.ensemble_predict(m, X)
    if bool(m["task_classify"]):
        acc = jnp.mean((pred == jnp.asarray(y, jnp.int32)).astype(jnp.float32))
        return {"accuracy": acc}
    yv = jnp.asarray(y, jnp.float32)
    mse = jnp.mean((pred - yv) ** 2)
    return {"mse": mse, "r2": 1.0 - mse / jnp.maximum(jnp.var(yv), 1e-30)}


register_algorithm(Trainer(
    "decision_tree",
    lambda X, y, **hp: TR.decision_tree_fit(X, y, **hp),
    TR.ensemble_predict, _tree_eval))

register_algorithm(Trainer(
    "random_forest",
    lambda X, y, **hp: TR.random_forest_fit(X, y, **hp),
    TR.ensemble_predict, _tree_eval))

register_algorithm(Trainer(
    "gradient_boosting",
    lambda X, y, **hp: TR.gradient_boosting_fit(X, y, **hp),
    TR.ensemble_predict, _tree_eval))


# ---- per-library boosting semantics (ml/boosting.py; reference
# ml_xgboost.c / ml_lightgbm.c / ml_catboost.c behaviors) ----

def _boost_eval(model, X, y):
    from neurondb_tpu.ml import boosting as BO
    pred = {"xgboost": BO.xgboost_predict,
            "lightgbm": BO.lightgbm_predict,
            "catboost": BO.catboost_predict}[model["algo"]](model, X)
    if model["task"] == "classify":
        return {"accuracy": float(
            (jnp.asarray(pred) == jnp.asarray(y, jnp.int32)).mean())}
    y = jnp.asarray(y, jnp.float32)
    p = jnp.asarray(pred, jnp.float32).reshape(y.shape)
    ss = jnp.sum((y - p) ** 2)
    st = jnp.sum((y - jnp.mean(y)) ** 2)
    return {"mse": float(ss / max(len(y), 1)),
            "r2": float(1.0 - ss / jnp.maximum(st, 1e-12))}


def _register_boosting():
    from neurondb_tpu.ml import boosting as BO
    register_algorithm(Trainer(
        "xgboost", lambda X, y, **hp: BO.xgboost_fit(X, y, **hp),
        BO.xgboost_predict, _boost_eval))
    register_algorithm(Trainer(
        "lightgbm", lambda X, y, **hp: BO.lightgbm_fit(X, y, **hp),
        BO.lightgbm_predict, _boost_eval))
    register_algorithm(Trainer(
        "catboost", lambda X, y, **hp: BO.catboost_fit(X, y, **hp),
        BO.catboost_predict, _boost_eval))


_register_boosting()


# ---- anomaly detection ----

def _anomaly_train(X, *, method="knn", k=5, threshold=3.0, contamination=0.1):
    X = jnp.asarray(X, jnp.float32)
    if method == "zscore":
        scores = None
        model = {"method": "zscore", "mean": jnp.mean(X, 0),
                 "std": jnp.std(X, 0), "threshold": jnp.asarray(threshold)}
        return model
    scores = CE.knn_outlier_scores(X, k=k)
    cut = jnp.quantile(scores, 1.0 - contamination)
    return {"method": "knn", "X": X, "k": jnp.asarray(k),
            "cutoff": cut}


def _anomaly_predict(m, X):
    X = jnp.asarray(X, jnp.float32)
    if m["method"] == "zscore":
        z = jnp.abs(X - m["mean"]) / jnp.maximum(m["std"], 1e-12)
        return jnp.any(z > m["threshold"], axis=1)
    from neurondb_tpu.ops import topk as TK
    d, _ = TK.chunked_knn(X, m["X"], int(m["k"]), metric="l2",
                          chunk=min(m["X"].shape[0], 65536))
    return jnp.mean(d, axis=1) > m["cutoff"]


register_algorithm(Trainer(
    "anomaly_detection", _anomaly_train, _anomaly_predict,
    None, task="unsupervised"))


# ---- timeseries (series-as-X convention: X is the 1-D series) ----

from neurondb_tpu.ml import timeseries as TS


def _ts_train(X, *, order=4, method="ar", season=12, p=1, d=1, q=1):
    y = jnp.asarray(X, jnp.float32).reshape(-1)
    if method == "holt_winters":
        m = TS.holt_winters_fit(y, season=season)
        m["method"] = "holt_winters"
    elif method == "arima":
        m = TS.arima_fit(y, p=p, d=d, q=q)
        m["method"] = "arima"
    else:
        m = TS.ar_fit(y, order=order)
        m["method"] = "ar"
        m["tail"] = y[-order:]
    return m


def _ts_predict(m, X):
    steps = int(jnp.asarray(X).reshape(-1)[0]) if jnp.asarray(X).size else 8
    if m["method"] == "holt_winters":
        return TS.holt_winters_forecast(m, steps=steps)
    if m["method"] == "arima":
        return TS.arima_forecast(m, steps=steps)
    return TS.ar_forecast(m, m["tail"], steps=steps)


register_algorithm(Trainer(
    "timeseries", _ts_train, _ts_predict, None, task="unsupervised"))

register_algorithm(Trainer(
    "arima",
    lambda X, **hp: _ts_train(X, method="arima", **hp),
    _ts_predict, None, task="unsupervised"))


# ---- recommender (X = [user, item, rating] triples) ----

from neurondb_tpu.ml import recommender as RC


def _rec_train(X, *, factors=16, iters=10, l2=0.1, seed=0):
    import numpy as _np
    t = _np.asarray(X, _np.float32)
    users = t[:, 0].astype(int)
    items = t[:, 1].astype(int)
    U, I = users.max() + 1, items.max() + 1
    R = _np.zeros((U, I), _np.float32)
    M = _np.zeros((U, I), _np.float32)
    R[users, items] = t[:, 2]
    M[users, items] = 1.0
    return RC.als_fit(R, M, factors=factors, iters=iters, l2=l2, seed=seed)


def _rec_predict(m, X):
    import numpy as _np
    t = _np.asarray(X)
    pred = _np.asarray(RC.predict_ratings(m))
    return pred[t[:, 0].astype(int), t[:, 1].astype(int)]


register_algorithm(Trainer(
    "recommender", _rec_train, _rec_predict, None, task="unsupervised"))


# ---- neural network ----

from neurondb_tpu.ml import neural as NN


def _nn_eval(m, X, y):
    pred = NN.mlp_predict(m, X)
    if bool(m["classify"]):
        return {"accuracy": jnp.mean(
            (pred == jnp.asarray(y, jnp.int32)).astype(jnp.float32))}
    yv = jnp.asarray(y, jnp.float32)
    mse = jnp.mean((pred - yv) ** 2)
    return {"mse": mse, "r2": 1.0 - mse / jnp.maximum(jnp.var(yv), 1e-30)}


register_algorithm(Trainer(
    "neural_network",
    lambda X, y, **hp: NN.mlp_fit(X, y, **hp),
    NN.mlp_predict, _nn_eval))

_ALIASES_EXTRA = {"mlp": "neural_network", "deeplearning": "neural_network",
                  "deep_learning": "neural_network"}
from neurondb_tpu.ml.api import _ALIASES as _A  # noqa: E402
_A.update(_ALIASES_EXTRA)


# ---- reinforcement learning ----

from neurondb_tpu.ml import rl as RL


def _rl_train(X, *, n_states=None, n_actions=None, alpha=0.1, gamma=0.95,
              epochs=50):
    import numpy as _np
    t = _np.asarray(X, _np.float32)
    ns = int(n_states if n_states is not None
             else max(t[:, 0].max(), t[:, 3].max()) + 1)
    na = int(n_actions if n_actions is not None else t[:, 1].max() + 1)
    Q = RL.q_learning_fit(t, n_states=ns, n_actions=na, alpha=alpha,
                          gamma=gamma, epochs=epochs)
    return {"Q": Q}


register_algorithm(Trainer(
    "reinforcement_learning", _rl_train,
    lambda m, X: m["Q"][jnp.asarray(X, jnp.int32).reshape(-1)].argmax(1),
    None, task="unsupervised"))
