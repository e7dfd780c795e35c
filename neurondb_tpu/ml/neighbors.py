"""kNN classifier / regressor + Gaussian Naive Bayes + SVM.

Reference: NeuronDB/src/ml/ml_knn.c (3359 LoC, classifier + regressor),
ml_naive_bayes.c (2595), ml_svm.c (3973) and their gpu_{knn,nb,svm}
kernels. kNN rides the same fused distance+top-k scan as the vector
engine; NB is two moment GEMMs. SVM ships two solvers: a squared-hinge
primal for the linear kernel, and an exact dual solver (projected
gradient on the box QP — the reference's coordinate-ascent "SMO"
reshaped into per-iteration GEMMs) with true support-vector semantics
for linear/rbf/poly kernels; random Fourier features remain as the
large-n approximation.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

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


# ---- kernel SVM on the dual (support-vector semantics) ----

def kernel_matrix(A, B, *, kernel: str = "rbf", gamma: float = 1.0,
                  degree: int = 3, coef0: float = 1.0) -> jax.Array:
    """K(A, B) for linear / rbf / poly kernels as one GEMM (+elementwise).
    Mirrors ml_svm.c linear_kernel:99 / rbf_kernel:126 semantics."""
    A = jnp.asarray(A, jnp.float32)
    B = jnp.asarray(B, jnp.float32)
    dots = A @ B.T
    if kernel == "linear":
        return dots
    if kernel == "poly":
        return (gamma * dots + coef0) ** degree
    if kernel == "rbf":
        a2 = jnp.sum(A * A, axis=1)[:, None]
        b2 = jnp.sum(B * B, axis=1)[None, :]
        return jnp.exp(-gamma * jnp.maximum(a2 + b2 - 2.0 * dots, 0.0))
    raise ValueError(f"unknown kernel {kernel!r}")


@functools.partial(jax.jit, static_argnames=("kernel", "num_classes",
                                             "iters", "degree"))
def _svm_dual_solve(X, y, *, num_classes: int, C: float, kernel: str,
                    gamma: float, degree: int, coef0: float, iters: int):
    """Box-constrained dual QP, all one-vs-rest classes at once.

    maximize  sum(a) - 0.5 (a*t)' K (a*t)   s.t. 0 <= a <= C   per class

    solved by projected gradient ascent with the 1/lambda_max(K) step
    (power-iteration estimate): each iteration is ONE [N,N]x[N,Cls] MXU
    matmul. The reference's CPU trainer (ml_svm.c:1488-1665) is a
    sequential single-coordinate ascent over the same box QP (no pair
    selection, no equality constraint — bias is recovered afterwards),
    so the two converge to the same optimum; this is that solver
    reshaped from coordinate-at-a-time to all-coordinates GEMM steps.
    """
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.int32)
    n = X.shape[0]
    K = kernel_matrix(X, X, kernel=kernel, gamma=gamma, degree=degree,
                      coef0=coef0)                         # [N, N] PSD
    t = jnp.where(jax.nn.one_hot(y, num_classes) > 0, 1.0, -1.0)  # [N,Cls]

    # lambda_max(K) by power iteration (PSD: converges monotonically)
    v0 = jnp.ones((n,), jnp.float32) / jnp.sqrt(n * 1.0)

    def pow_body(_, v):
        w = K @ v
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, 12, pow_body, v0)
    lam = jnp.maximum(v @ (K @ v), 1e-6)
    eta = 1.0 / lam

    def body(_, a):                                        # a [N, Cls]
        f = K @ (a * t)                                    # [N, Cls]
        g = 1.0 - t * f                                    # dD/da
        return jnp.clip(a + eta * g, 0.0, C)

    a = jax.lax.fori_loop(0, iters, body, jnp.zeros_like(t))

    # bias per class from the free support vectors' KKT condition
    # (0 < a < C  =>  t_i f(x_i) = 1  =>  b = t_i - f_i); fall back to
    # the margin midpoint when no SV is strictly inside the box
    f = K @ (a * t)
    free = (a > 1e-6 * C) & (a < C * (1.0 - 1e-6))
    nfree = jnp.sum(free, axis=0)
    b_free = jnp.sum(jnp.where(free, t - f, 0.0), axis=0) / \
        jnp.maximum(nfree, 1.0)
    on = a > 1e-6 * C
    b_mid = -0.5 * (
        jnp.min(jnp.where(on & (t > 0), f, jnp.inf), axis=0)
        + jnp.max(jnp.where(on & (t < 0), f, -jnp.inf), axis=0))
    b = jnp.where(nfree > 0, b_free, jnp.where(jnp.isfinite(b_mid),
                                               b_mid, 0.0))
    return a, t, b


def svm_kernel_fit(X, y, *, num_classes: int = 2, C: float = 1.0,
                   kernel: str = "rbf", gamma: float = 1.0,
                   degree: int = 3, coef0: float = 1.0, iters: int = 500,
                   sample_cap: int = 8192, seed: int = 0) -> Dict:
    """Exact kernel SVM (dual), compacted to its support vectors.

    The [N, N] kernel matrix bounds memory, so n > sample_cap subsamples
    (the reference caps harder: sample_limit=5000, ml_svm.c:1506).
    Returns only rows where any class keeps a_i > 0 — true
    support-vector semantics (alphas serialized like ml_svm.c:470).
    """
    X = np.asarray(X, np.float32)
    y = np.asarray(y)
    if len(X) > sample_cap:
        sel = np.random.default_rng(seed).choice(len(X), sample_cap,
                                                 replace=False)
        X, y = X[sel], y[sel]
    a, t, b = _svm_dual_solve(
        jnp.asarray(X), jnp.asarray(y, jnp.int32),
        num_classes=max(num_classes, 2), C=float(C), kernel=kernel,
        gamma=float(gamma), degree=int(degree), coef0=float(coef0),
        iters=int(iters))
    coef = np.asarray(a * t)                               # [N, Cls]
    keep = np.any(np.abs(coef) > 1e-6 * float(C), axis=1)
    if not keep.any():
        keep[:] = True
    return {"sv": jnp.asarray(X[keep]), "coef": jnp.asarray(coef[keep]),
            "b": b, "kernel": kernel, "gamma": jnp.asarray(gamma),
            "degree": jnp.asarray(degree), "coef0": jnp.asarray(coef0),
            "n_support": jnp.asarray(int(keep.sum()))}


def svm_kernel_decision(model: Dict, X) -> jax.Array:
    Kq = kernel_matrix(jnp.asarray(X, jnp.float32), model["sv"],
                       kernel=model["kernel"],
                       gamma=float(model["gamma"]),
                       degree=int(model["degree"]),
                       coef0=float(model["coef0"]))
    return Kq @ model["coef"] + model["b"][None, :]


def svm_kernel_predict(model: Dict, X) -> jax.Array:
    return jnp.argmax(svm_kernel_decision(model, X), axis=1).astype(
        jnp.int32)
