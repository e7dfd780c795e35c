"""Reinforcement learning — tabular Q-learning + LinUCB contextual bandit.

Reference: NeuronDB/src/ml/ml_reinforcement_learning.c. The reference's RL
surface trains tabular policies from logged (state, action, reward,
next_state) tuples stored in SQL; the equivalents here consume the same
tuples as arrays. LinUCB covers the recommendation/bandit use the
reference pairs with its recommender.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit,
                   static_argnames=("n_states", "n_actions", "epochs"))
def q_learning_fit(transitions, *, n_states: int, n_actions: int,
                   alpha: float = 0.1, gamma: float = 0.95,
                   epochs: int = 50) -> jnp.ndarray:
    """Offline Q-learning over logged transitions [T, 4] =
    (state, action, reward, next_state). Returns Q [S, A]."""
    t = jnp.asarray(transitions, jnp.float32)
    s = t[:, 0].astype(jnp.int32)
    a = t[:, 1].astype(jnp.int32)
    r = t[:, 2]
    s2 = t[:, 3].astype(jnp.int32)
    Q0 = jnp.zeros((n_states, n_actions))

    def epoch(_, Q):
        def one(Q, i):
            target = r[i] + gamma * jnp.max(Q[s2[i]])
            upd = (1 - alpha) * Q[s[i], a[i]] + alpha * target
            return Q.at[s[i], a[i]].set(upd), None
        Q, _ = jax.lax.scan(one, Q, jnp.arange(t.shape[0]))
        return Q

    return jax.lax.fori_loop(0, epochs, epoch, Q0)


def q_policy(Q) -> np.ndarray:
    """Greedy policy: state -> action."""
    return np.asarray(jnp.argmax(Q, axis=1))


class LinUCB:
    """Contextual bandit (one ridge model per arm, UCB exploration)."""

    def __init__(self, n_arms: int, dim: int, alpha: float = 1.0,
                 l2: float = 1.0):
        self.n_arms = n_arms
        self.dim = dim
        self.alpha = alpha
        self.A = np.stack([np.eye(dim, dtype=np.float64) * l2
                           for _ in range(n_arms)])
        self.b = np.zeros((n_arms, dim))

    def select(self, context) -> int:
        x = np.asarray(context, np.float64).ravel()
        scores = np.empty(self.n_arms)
        for a in range(self.n_arms):
            Ainv = np.linalg.inv(self.A[a])
            theta = Ainv @ self.b[a]
            scores[a] = theta @ x + self.alpha * np.sqrt(x @ Ainv @ x)
        return int(np.argmax(scores))

    def update(self, arm: int, context, reward: float) -> None:
        x = np.asarray(context, np.float64).ravel()
        self.A[arm] += np.outer(x, x)
        self.b[arm] += reward * x
