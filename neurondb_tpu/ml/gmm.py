"""Gaussian mixture model — EM on the MXU (diag covariance).

Reference: NeuronDB/src/ml/ml_gmm.c (1667 LoC) + gpu_gmm_kernels.cu.
E-step responsibilities and M-step moments are batched GEMMs; fixed
trip-count EM under jit with log-likelihood tracking.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from neurondb_tpu.ml.kmeans import kmeans_plusplus_init


class GMMState(NamedTuple):
    means: jax.Array        # [k, D]
    variances: jax.Array    # [k, D] diagonal
    weights: jax.Array      # [k]
    log_likelihood: jax.Array


def _log_prob(x, means, variances, weights):
    """[N, k] log p(x | comp) + log w."""
    # -(x-mu)^2 / (2 var) - 0.5 log(2 pi var), summed over dims; GEMM form
    inv = 1.0 / variances                                   # [k, D]
    x2 = jnp.dot(x * x, inv.T)                              # [N, k]
    xm = jnp.dot(x, (means * inv).T)
    m2 = jnp.sum(means * means * inv, axis=1)
    quad = x2 - 2.0 * xm + m2[None, :]
    logdet = jnp.sum(jnp.log(variances), axis=1)
    d = x.shape[1]
    return (-0.5 * (quad + logdet + d * jnp.log(2.0 * jnp.pi))
            + jnp.log(weights)[None, :])


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def gmm_fit(x, k: int, *, iters: int = 100, reg: float = 1e-6,
            seed: int = 0) -> GMMState:
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    key = jax.random.PRNGKey(seed)
    means0 = kmeans_plusplus_init(x, k, key)
    var0 = jnp.tile(jnp.var(x, axis=0)[None, :] + reg, (k, 1))
    w0 = jnp.full((k,), 1.0 / k)

    def step(_, state):
        means, variances, weights, _ = state
        logp = _log_prob(x, means, variances, weights)      # [N, k]
        ll = jnp.sum(jax.scipy.special.logsumexp(logp, axis=1))
        resp = jax.nn.softmax(logp, axis=1)                 # [N, k]
        nk = jnp.sum(resp, axis=0) + 1e-10                  # [k]
        new_means = jnp.dot(resp.T, x) / nk[:, None]
        ex2 = jnp.dot(resp.T, x * x) / nk[:, None]
        new_var = jnp.maximum(ex2 - new_means ** 2, reg)
        new_w = nk / n
        return new_means, new_var, new_w, ll

    means, variances, weights, ll = jax.lax.fori_loop(
        0, iters, step, (means0, var0, w0, jnp.float32(-jnp.inf)))
    return GMMState(means, variances, weights, ll)


def gmm_predict_proba(state: GMMState, x) -> jax.Array:
    logp = _log_prob(jnp.asarray(x, jnp.float32), state.means,
                     state.variances, state.weights)
    return jax.nn.softmax(logp, axis=1)


def gmm_predict(state: GMMState, x) -> jax.Array:
    return jnp.argmax(gmm_predict_proba(state, x), axis=1).astype(jnp.int32)


def gmm_score_samples(state: GMMState, x) -> jax.Array:
    """Per-sample log-likelihood (used by anomaly detection)."""
    logp = _log_prob(jnp.asarray(x, jnp.float32), state.means,
                     state.variances, state.weights)
    return jax.scipy.special.logsumexp(logp, axis=1)
