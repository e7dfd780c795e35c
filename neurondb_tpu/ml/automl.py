"""AutoML + hyperparameter tuning — algorithm selection by CV search.

Reference: NeuronDB/src/ml/ml_automl.c (3006 LoC) and
ml_hyperparameter_tuning.c: train candidate algorithms over a grid /
random search with k-fold validation, pick the best by task metric, and
register the winner. Candidates come from the unified dispatch table so
the search space grows automatically with new trainers.
"""

from __future__ import annotations

import itertools
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_SPACES: Dict[str, Dict[str, List]] = {
    "classify": {
        "logistic_regression": {"l2": [1e-4, 1e-2], "iters": [30]},
        "random_forest": {"n_trees": [20], "depth": [4, 6]},
        "gradient_boosting": {"n_trees": [30], "depth": [3, 4],
                              "learning_rate": [0.1]},
        "naive_bayes": {},
        "knn_classifier": {"k": [3, 7]},
        "svm": {"C": [1.0], "iters": [200]},
    },
    "regress": {
        "linear_regression": {},
        "ridge": {"alpha": [0.1, 1.0]},
        "lasso": {"alpha": [0.01, 0.1]},
        "gradient_boosting": {"task": ["regress"], "n_trees": [30],
                              "depth": [3, 4]},
        "knn_regressor": {"k": [3, 7]},
    },
}


def _grid(space: Dict[str, List]) -> List[Dict]:
    if not space:
        return [{}]
    keys = sorted(space)
    return [dict(zip(keys, combo))
            for combo in itertools.product(*(space[k] for k in keys))]


def _kfold_score(algorithm: str, hp: Dict, X: np.ndarray, y: np.ndarray,
                 task: str, folds: int, seed: int) -> float:
    from neurondb_tpu.ml.api import _resolve
    t = _resolve(algorithm)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(X))
    scores = []
    for f in range(folds):
        val = idx[f::folds]
        trn = np.setdiff1d(idx, val)
        model = t.train(X[trn], y[trn], **hp)
        pred = np.asarray(t.predict(model, X[val]))
        if task == "classify":
            scores.append(float((pred == y[val]).mean()))
        else:
            mse = float(((pred - y[val]) ** 2).mean())
            scores.append(-mse)
    return float(np.mean(scores))


def hyperparameter_search(algorithm: str, X, y, space: Dict[str, List], *,
                          task: str = "classify", folds: int = 3,
                          seed: int = 0) -> Tuple[Dict, float, List[Dict]]:
    """Grid search with k-fold CV -> (best_hp, best_score, trials)."""
    X = np.asarray(X, np.float32)
    y = np.asarray(y)
    trials = []
    best_hp: Dict = {}
    best = -np.inf
    for hp in _grid(space):
        s = _kfold_score(algorithm, hp, X, y, task, folds, seed)
        trials.append({"hyperparams": hp, "score": s})
        if s > best:
            best, best_hp = s, hp
    return best_hp, best, trials


def automl(project: str, X, y, *, task: str = "classify",
           algorithms: Optional[Sequence[str]] = None, folds: int = 3,
           seed: int = 0, register: bool = True) -> Dict:
    """Search algorithms x hyperparameters; optionally register the winner.
    Returns a leaderboard (neurondb automl parity)."""
    from neurondb_tpu.ml import api as ML
    X = np.asarray(X, np.float32)
    y = np.asarray(y)
    space = DEFAULT_SPACES[task]
    algos = list(algorithms) if algorithms else list(space)
    board = []
    for algo in algos:
        t0 = time.time()
        try:
            hp, score, trials = hyperparameter_search(
                algo, X, y, space.get(algo, {}), task=task, folds=folds,
                seed=seed)
            board.append({"algorithm": algo, "score": score,
                          "hyperparams": hp,
                          "seconds": round(time.time() - t0, 2)})
        except Exception as e:  # noqa: BLE001 - skip incompatible algos
            board.append({"algorithm": algo, "score": float("-inf"),
                          "error": str(e)})
    board.sort(key=lambda r: -r["score"])
    winner = board[0]
    result = {"leaderboard": board, "best_algorithm": winner["algorithm"],
              "best_hyperparams": winner.get("hyperparams", {}),
              "best_score": winner["score"]}
    if register and np.isfinite(winner["score"]):
        mid = ML.train(project, winner["algorithm"], X, y,
                       winner.get("hyperparams", {}))
        result["model_id"] = mid
    return result
