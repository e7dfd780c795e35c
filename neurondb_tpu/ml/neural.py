"""Neural network trainer — MLP classifier/regressor on optax.

Reference: NeuronDB/src/ml/ml_neural_network.c (2506 LoC) and
ml_deeplearning.c with the dl_models catalog table. Full-batch Adam with
mini-batching above a size threshold; models are pytrees for the registry.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def _init_mlp(key, dims: Sequence[int]) -> Dict:
    ks = jax.random.split(key, len(dims) - 1)
    return {"W": [jax.random.normal(ks[i], (dims[i], dims[i + 1]))
                  * (2.0 / dims[i]) ** 0.5 for i in range(len(dims) - 1)],
            "b": [jnp.zeros(dims[i + 1]) for i in range(len(dims) - 1)]}


def _forward(params: Dict, X: jnp.ndarray) -> jnp.ndarray:
    h = X
    n = len(params["W"])
    for i, (W, b) in enumerate(zip(params["W"], params["b"])):
        h = h @ W + b
        if i < n - 1:
            h = jax.nn.relu(h)
    return h


def mlp_fit(X, y, *, hidden: Sequence[int] = (64, 32),
            task: str = "classify", num_classes: Optional[int] = None,
            lr: float = 1e-3, epochs: int = 200, batch: int = 0,
            seed: int = 0, l2: float = 1e-5) -> Dict:
    X = jnp.asarray(X, jnp.float32)
    n, d = X.shape
    if task == "classify":
        y = jnp.asarray(y, jnp.int32)
        out_dim = int(num_classes if num_classes is not None
                      else int(jnp.max(y)) + 1)
    else:
        y = jnp.asarray(y, jnp.float32)
        out_dim = 1 if y.ndim == 1 else y.shape[1]
    mu = jnp.mean(X, axis=0)
    sd = jnp.maximum(jnp.std(X, axis=0), 1e-6)
    Xn = (X - mu) / sd
    params = _init_mlp(jax.random.PRNGKey(seed),
                       [d, *hidden, out_dim])
    opt = optax.adam(lr)
    state = opt.init(params)

    def loss_fn(p, xb, yb):
        out = _forward(p, xb)
        if task == "classify":
            logp = jax.nn.log_softmax(out, axis=1)
            nll = -jnp.mean(jnp.take_along_axis(logp, yb[:, None], 1))
        else:
            tgt = yb if yb.ndim > 1 else yb[:, None]
            nll = jnp.mean((out - tgt) ** 2)
        reg = sum(jnp.sum(W * W) for W in p["W"])
        return nll + l2 * reg

    @jax.jit
    def step(p, s, xb, yb):
        g = jax.grad(loss_fn)(p, xb, yb)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s

    if batch and batch < n:
        key = jax.random.PRNGKey(seed + 1)
        for e in range(epochs):
            key, sub = jax.random.split(key)
            idx = jax.random.randint(sub, (batch,), 0, n)
            params, state = step(params, state, Xn[idx], y[idx])
    else:
        for e in range(epochs):
            params, state = step(params, state, Xn, y)
    return {"params": params, "mu": mu, "sd": sd,
            "classify": jnp.asarray(task == "classify")}


def mlp_predict(model: Dict, X) -> jnp.ndarray:
    X = (jnp.asarray(X, jnp.float32) - model["mu"]) / model["sd"]
    out = _forward(model["params"], X)
    if bool(model["classify"]):
        return jnp.argmax(out, axis=1).astype(jnp.int32)
    return out[:, 0] if out.shape[1] == 1 else out


def mlp_predict_proba(model: Dict, X) -> jnp.ndarray:
    X = (jnp.asarray(X, jnp.float32) - model["mu"]) / model["sd"]
    return jax.nn.softmax(_forward(model["params"], X), axis=1)
