"""MLP neural network + reinforcement learning."""

import numpy as np
import pytest

from neurondb_tpu.ml import neural as NN
from neurondb_tpu.ml import rl as RL


def test_mlp_classify_xor(rng):
    # XOR: not linearly separable; an MLP must solve it
    X = rng.uniform(-1, 1, (600, 2)).astype(np.float32)
    y = ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(np.int32)
    m = NN.mlp_fit(X, y, hidden=(32, 16), epochs=600, lr=5e-3, seed=0)
    pred = np.asarray(NN.mlp_predict(m, X))
    assert (pred == y).mean() > 0.95
    proba = np.asarray(NN.mlp_predict_proba(m, X))
    np.testing.assert_allclose(proba.sum(1), 1.0, rtol=1e-4)


def test_mlp_regression(rng):
    X = rng.standard_normal((500, 3)).astype(np.float32)
    y = np.sin(X[:, 0]) + X[:, 1] ** 2
    m = NN.mlp_fit(X, y, task="regress", hidden=(32,), epochs=500, lr=5e-3)
    pred = np.asarray(NN.mlp_predict(m, X))
    assert np.corrcoef(pred, y)[0, 1] ** 2 > 0.8


def test_mlp_via_api(rng):
    from neurondb_tpu.ml import api as ML
    X = np.concatenate([rng.standard_normal((60, 4)).astype(np.float32),
                        rng.standard_normal((60, 4)).astype(np.float32) + 3])
    y = np.repeat([0, 1], 60).astype(np.int32)
    mid = ML.train("nn", "mlp", X, y, {"epochs": 150})
    assert (ML.predict(mid, X) == y).mean() > 0.95


def test_q_learning_gridworld():
    # 4-state chain: 0 -> 1 -> 2 -> 3(goal). actions: 0=left, 1=right
    transitions = []
    for s in range(3):
        transitions.append([s, 1, 1.0 if s == 2 else 0.0, s + 1])
        transitions.append([s + 1, 0, 0.0, s])
    transitions = np.asarray(transitions * 20, np.float32)
    Q = RL.q_learning_fit(transitions, n_states=4, n_actions=2,
                          epochs=60)
    policy = RL.q_policy(Q)
    assert policy[0] == 1 and policy[1] == 1 and policy[2] == 1


def test_rl_via_api():
    from neurondb_tpu.ml import api as ML
    transitions = np.asarray([[0, 1, 0, 1], [1, 1, 1.0, 2],
                              [1, 0, 0, 0]] * 30, np.float32)
    mid = ML.train("rl", "reinforcement_learning", transitions,
                   hyperparams={"n_states": 3, "n_actions": 2})
    actions = ML.predict(mid, np.asarray([0, 1]))
    assert actions[1] == 1   # move toward reward


def test_linucb_bandit(rng):
    # arm 0 pays for context[0]>0, arm 1 otherwise
    b = RL.LinUCB(n_arms=2, dim=2, alpha=0.5)
    regret = 0.0
    for t in range(400):
        ctx = rng.standard_normal(2)
        best = 0 if ctx[0] > 0 else 1
        arm = b.select(ctx)
        reward = 1.0 if arm == best else 0.0
        regret += 1.0 - reward
        b.update(arm, ctx, reward)
    # after learning, accuracy on fresh contexts should be high
    correct = 0
    for _ in range(100):
        ctx = rng.standard_normal(2)
        correct += b.select(ctx) == (0 if ctx[0] > 0 else 1)
    assert correct > 85
