"""Graph neural networks — GCN over the vgraph adjacency arrays.

Reference: NeuronDB/src/ml/ml_graph_neural_networks.c. TPU design: the
padded dense adjacency of types.graph makes message passing one masked
gather-mean + GEMM per layer; training is full-batch gradient descent
with jax.grad (node classification).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neurondb_tpu.types.graph import VectorGraph


def _propagate(g_nbr, g_mask, h):
    """Mean aggregation over neighbors + self loop."""
    safe = jnp.where(g_mask, g_nbr, 0)
    msgs = h[safe] * g_mask[:, :, None]                 # [N, deg, H]
    deg = jnp.maximum(jnp.sum(g_mask, axis=1, keepdims=True), 1.0)
    return (jnp.sum(msgs, axis=1) + h) / (deg + 1.0)


def gcn_init(key, in_dim: int, hidden: int, out_dim: int,
             layers: int = 2) -> Dict:
    ks = jax.random.split(key, layers)
    dims = [in_dim] + [hidden] * (layers - 1) + [out_dim]
    return {"W": [jax.random.normal(ks[i], (dims[i], dims[i + 1])) *
                  (2.0 / dims[i]) ** 0.5 for i in range(layers)]}


def gcn_forward(params: Dict, g: VectorGraph, X: jnp.ndarray) -> jnp.ndarray:
    mask = g.mask
    h = jnp.asarray(X, jnp.float32)
    n_layers = len(params["W"])
    for i, W in enumerate(params["W"]):
        h = _propagate(g.neighbors, mask, h) @ W
        if i < n_layers - 1:
            h = jax.nn.relu(h)
    return h                                            # [N, out_dim] logits


@functools.partial(jax.jit, static_argnames=("iters",))
def _train_loop(params, nbr, mask_adj, X, y, train_mask, lr, iters):
    g_like = VectorGraph(nbr, jnp.zeros_like(nbr, jnp.float32))

    def loss_fn(p):
        logits = gcn_forward(p, g_like, X)
        logp = jax.nn.log_softmax(logits, axis=1)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
        return jnp.sum(nll * train_mask) / jnp.maximum(
            jnp.sum(train_mask), 1.0)

    def step(_, p):
        grads = jax.grad(loss_fn)(p)
        return jax.tree_util.tree_map(lambda w, g: w - lr * g, p, grads)

    return jax.lax.fori_loop(0, iters, step, params)


def gcn_fit(g: VectorGraph, X, y, *, train_mask=None, hidden: int = 32,
            layers: int = 2, lr: float = 0.1, iters: int = 200,
            num_classes: Optional[int] = None, seed: int = 0) -> Dict:
    """Semi-supervised node classification."""
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.int32)
    nc = int(num_classes if num_classes is not None else int(jnp.max(y)) + 1)
    tm = (jnp.ones(X.shape[0]) if train_mask is None
          else jnp.asarray(train_mask, jnp.float32))
    params = gcn_init(jax.random.PRNGKey(seed), X.shape[1], hidden, nc,
                      layers)
    params = _train_loop(params, g.neighbors, g.mask, X, y, tm,
                         jnp.float32(lr), iters)
    return {"params": params, "neighbors": g.neighbors,
            "weights": g.weights}


def gcn_predict(model: Dict, X) -> jnp.ndarray:
    g = VectorGraph(model["neighbors"], model["weights"])
    logits = gcn_forward(model["params"], g, jnp.asarray(X, jnp.float32))
    return jnp.argmax(logits, axis=1).astype(jnp.int32)
