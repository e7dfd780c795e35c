"""kNN classifier / regressor + Gaussian Naive Bayes + linear SVM.

Reference: NeuronDB/src/ml/ml_knn.c (3359 LoC, classifier + regressor),
ml_naive_bayes.c (2595), ml_svm.c (3973) and their gpu_{knn,nb,svm}
kernels. kNN rides the same fused distance+top-k scan as the vector
engine; NB is two moment GEMMs; SVM is squared-hinge gradient descent
(linear; the reference's RBF mode is served via random Fourier features).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from neurondb_tpu.ops import topk as TK


# ---- kNN ----

def knn_fit(X, y, *, k: int = 5, task: str = "classify") -> Dict:
    return {"X": jnp.asarray(X, jnp.float32),
            "y": jnp.asarray(y), "k": jnp.asarray(k),
            "task_classify": jnp.asarray(task == "classify")}


def _knn_neighbors(model: Dict, X, k: int):
    q = jnp.asarray(X, jnp.float32)
    d, idx = TK.chunked_knn(q, model["X"], k, metric="l2",
                            chunk=min(65536, model["X"].shape[0]))
    return d, idx


def knn_predict(model: Dict, X) -> jax.Array:
    k = int(model["k"])
    d, idx = _knn_neighbors(model, X, k)
    ny = model["y"][idx]                                    # [B, k]
    if bool(model["task_classify"]):
        nclass = int(jnp.max(model["y"])) + 1
        onehot = jax.nn.one_hot(ny.astype(jnp.int32), nclass)
        votes = jnp.sum(onehot, axis=1)
        return jnp.argmax(votes, axis=1).astype(jnp.int32)
    # inverse-distance-weighted regression (reference semantics)
    w = 1.0 / jnp.maximum(d, 1e-6)
    return jnp.sum(ny.astype(jnp.float32) * w, axis=1) / jnp.sum(w, axis=1)


# ---- Gaussian Naive Bayes ----

@functools.partial(jax.jit, static_argnames=("num_classes",))
def naive_bayes_fit(X, y, *, num_classes: int, var_smoothing: float = 1e-9
                    ) -> Dict:
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.int32)
    onehot = jax.nn.one_hot(y, num_classes)                 # [N, C]
    counts = jnp.sum(onehot, axis=0)                        # [C]
    means = jnp.dot(onehot.T, X) / jnp.maximum(counts[:, None], 1.0)
    ex2 = jnp.dot(onehot.T, X * X) / jnp.maximum(counts[:, None], 1.0)
    var = jnp.maximum(ex2 - means ** 2, 0.0)
    var = var + var_smoothing * jnp.max(jnp.var(X, axis=0))
    priors = counts / X.shape[0]
    return {"means": means, "variances": var,
            "log_priors": jnp.log(jnp.maximum(priors, 1e-12))}


def naive_bayes_log_proba(model: Dict, X) -> jax.Array:
    X = jnp.asarray(X, jnp.float32)
    inv = 1.0 / model["variances"]                          # [C, D]
    x2 = jnp.dot(X * X, inv.T)
    xm = jnp.dot(X, (model["means"] * inv).T)
    m2 = jnp.sum(model["means"] ** 2 * inv, axis=1)
    quad = x2 - 2.0 * xm + m2[None, :]
    logdet = jnp.sum(jnp.log(model["variances"]), axis=1)
    return -0.5 * (quad + logdet[None, :]) + model["log_priors"][None, :]


def naive_bayes_predict(model: Dict, X) -> jax.Array:
    return jnp.argmax(naive_bayes_log_proba(model, X), axis=1).astype(jnp.int32)


# ---- linear SVM (squared hinge), one-vs-rest for multiclass ----

@functools.partial(jax.jit, static_argnames=("num_classes", "iters"))
def svm_fit(X, y, *, num_classes: int = 2, C: float = 1.0,
            iters: int = 300) -> Dict:
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.int32)
    n, d = X.shape
    A = jnp.concatenate([X, jnp.ones((n, 1))], axis=1)
    targets = jnp.where(jax.nn.one_hot(y, num_classes) > 0, 1.0, -1.0)  # [N, C]
    scale = jnp.maximum(jnp.mean(jnp.sum(A * A, axis=1)), 1.0)

    def body(_, W):                                          # W [d+1, C]
        margins = targets * (A @ W)                          # [N, C]
        viol = jnp.maximum(1.0 - margins, 0.0)
        g = -2.0 * C * (A.T @ (viol * targets)) / n + jnp.vstack(
            [W[:-1], jnp.zeros((1, num_classes))])
        return W - (0.5 / (1.0 + C * scale)) * g

    W = jax.lax.fori_loop(0, iters, body, jnp.zeros((d + 1, num_classes)))
    return {"W": W}


def svm_decision(model: Dict, X) -> jax.Array:
    X = jnp.asarray(X, jnp.float32)
    A = jnp.concatenate([X, jnp.ones((X.shape[0], 1))], axis=1)
    return A @ model["W"]


def svm_predict(model: Dict, X) -> jax.Array:
    return jnp.argmax(svm_decision(model, X), axis=1).astype(jnp.int32)


def rbf_features(X, n_features: int = 256, gamma: float = 1.0,
                 seed: int = 0) -> jax.Array:
    """Random Fourier features so kernel-SVM requests map to the linear
    solver (Rahimi-Recht), replacing the reference's RBF kernel path."""
    X = jnp.asarray(X, jnp.float32)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    w = jax.random.normal(k1, (X.shape[1], n_features)) * jnp.sqrt(2.0 * gamma)
    b = jax.random.uniform(k2, (n_features,), maxval=2.0 * jnp.pi)
    return jnp.sqrt(2.0 / n_features) * jnp.cos(X @ w + b)
