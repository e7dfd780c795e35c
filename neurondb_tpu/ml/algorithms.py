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
