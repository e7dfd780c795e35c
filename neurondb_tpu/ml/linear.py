"""Linear model family — linear/ridge/lasso/elastic-net/logistic.

Reference parity: NeuronDB/src/ml/ml_linear_regression.c (3473 LoC),
ml_ridge_lasso.c (7339), ml_logistic_regression.c (3875) and their GPU
kernels (gpu_linreg/_lr/_ridge/_lasso kernels). TPU design: closed-form
solves are single MXU GEMM + Cholesky; lasso/elastic-net run FISTA with a
fixed trip count under jit; logistic uses full-batch Newton-IRLS (D x D
solves on the MXU) with gradient-descent fallback for wide features.

Models are dicts of arrays (pytrees) so the registry can serialize them.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _with_bias(X: jax.Array) -> jax.Array:
    return jnp.concatenate([X, jnp.ones((X.shape[0], 1), X.dtype)], axis=1)


# ---- linear / ridge (closed form) ----

@functools.partial(jax.jit, static_argnames=("l2", "fit_intercept"))
def linear_regression_fit(X, y, *, l2: float = 0.0, fit_intercept: bool = True):
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    A = _with_bias(X) if fit_intercept else X
    d = A.shape[1]
    G = jnp.dot(A.T, A, preferred_element_type=jnp.float32)
    if l2 > 0:
        reg = jnp.eye(d) * l2
        if fit_intercept:
            reg = reg.at[-1, -1].set(0.0)  # don't penalize intercept
        G = G + reg
    b = jnp.dot(A.T, y, preferred_element_type=jnp.float32)
    w = jax.scipy.linalg.solve(G + 1e-8 * jnp.eye(d), b, assume_a="pos")
    if fit_intercept:
        return {"coef": w[:-1], "intercept": w[-1]}
    return {"coef": w, "intercept": jnp.zeros(y.shape[1:] if y.ndim > 1 else ())}


def linear_regression_predict(model, X):
    return jnp.dot(jnp.asarray(X, jnp.float32), model["coef"]) + model["intercept"]


def regression_metrics(model, X, y) -> Dict[str, jax.Array]:
    pred = linear_regression_predict(model, X)
    y = jnp.asarray(y, jnp.float32)
    resid = y - pred
    mse = jnp.mean(resid ** 2)
    var = jnp.maximum(jnp.var(y), 1e-30)
    return {"mse": mse, "rmse": jnp.sqrt(mse), "mae": jnp.mean(jnp.abs(resid)),
            "r2": 1.0 - mse / var}


# ---- lasso / elastic net (FISTA) ----

@functools.partial(jax.jit, static_argnames=("iters",))
def lasso_fit(X, y, *, l1: float = 1.0, l2: float = 0.0, iters: int = 500):
    """FISTA proximal gradient; objective (1/2n)||Xw + b - y||^2 +
    l1*|w| + (l2/2)||w||^2. Matches ml_ridge_lasso.c's coordinate-descent
    solutions to tolerance but vectorizes on the MXU."""
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n, d = X.shape
    # Lipschitz constant of the smooth part via power iteration on X^T X / n
    G = jnp.dot(X.T, X) / n

    def pw(_, v):
        v = G @ v
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

    v0 = jnp.ones((d,)) / jnp.sqrt(d)
    v = jax.lax.fori_loop(0, 32, pw, v0)
    L = jnp.maximum(jnp.dot(v, G @ v), 1e-6) + l2

    ymean = jnp.mean(y)
    xmean = jnp.mean(X, axis=0)
    Xc = X - xmean
    yc = y - ymean

    def soft(u, t):
        return jnp.sign(u) * jnp.maximum(jnp.abs(u) - t, 0.0)

    def body(i, carry):
        w, z, t = carry
        grad = (Xc.T @ (Xc @ z - yc)) / n + l2 * z
        w_new = soft(z - grad / L, l1 / L)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z_new = w_new + ((t - 1.0) / t_new) * (w_new - w)
        return w_new, z_new, t_new

    w0 = jnp.zeros((d,))
    w, _, _ = jax.lax.fori_loop(0, iters, body, (w0, w0, jnp.float32(1.0)))
    intercept = ymean - jnp.dot(xmean, w)
    return {"coef": w, "intercept": intercept}


def elastic_net_fit(X, y, *, alpha: float = 1.0, l1_ratio: float = 0.5,
                    iters: int = 500):
    return lasso_fit(X, y, l1=alpha * l1_ratio,
                     l2=alpha * (1.0 - l1_ratio), iters=iters)


# ---- logistic regression ----

@functools.partial(jax.jit, static_argnames=("iters", "num_classes"))
def logistic_regression_fit(X, y, *, l2: float = 1e-4, iters: int = 50,
                            num_classes: int = 2, lr: float = 1.0):
    """Multinomial logistic regression by damped Newton (binary) /
    full-batch natural-ish GD (multiclass), fixed trip count."""
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.int32)
    A = _with_bias(X)
    n, d = A.shape
    if num_classes == 2:
        t = y.astype(jnp.float32)

        def body(_, w):
            z = A @ w
            p = jax.nn.sigmoid(z)
            g = A.T @ (p - t) / n + l2 * w
            s = jnp.maximum(p * (1.0 - p), 1e-6)
            H = (A.T * s[None, :]) @ A / n + l2 * jnp.eye(d)
            step = jax.scipy.linalg.solve(H, g, assume_a="pos")
            return w - lr * step

        w = jax.lax.fori_loop(0, iters, body, jnp.zeros((d,)))
        return {"coef": w[:-1, None], "intercept": w[-1:], "W": w[:, None]}
    # multiclass: softmax regression by full-batch GD, step sized by the
    # mean squared feature norm (a cheap Lipschitz proxy).
    onehot = jax.nn.one_hot(y, num_classes)
    scale = jnp.maximum(jnp.mean(jnp.sum(A * A, axis=1)), 1.0)

    def body_mc(_, W):
        p = jax.nn.softmax(A @ W, axis=1)
        g = A.T @ (p - onehot) / n + l2 * W
        return W - (2.0 / scale) * g

    W = jax.lax.fori_loop(0, iters * 10, body_mc, jnp.zeros((d, num_classes)))
    return {"coef": W[:-1], "intercept": W[-1], "W": W}


def logistic_predict_proba(model, X):
    X = jnp.asarray(X, jnp.float32)
    z = X @ model["coef"] + model["intercept"]
    if model["W"].shape[1] == 1:
        p1 = jax.nn.sigmoid(z[:, 0] if z.ndim > 1 else z)
        return jnp.stack([1.0 - p1, p1], axis=1)
    return jax.nn.softmax(z, axis=1)


def logistic_predict(model, X):
    return jnp.argmax(logistic_predict_proba(model, X), axis=1)


def classification_metrics(model, X, y, predict_fn=logistic_predict):
    pred = predict_fn(model, X)
    y = jnp.asarray(y, jnp.int32)
    acc = jnp.mean((pred == y).astype(jnp.float32))
    return {"accuracy": acc}
