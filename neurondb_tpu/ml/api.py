"""Unified ML API — neurondb_train/predict/evaluate/deploy/load_model.

Reference: NeuronDB/src/ml/ml_unified_api.c:52-93 — one entry point that
maps an algorithm name to a trainer, runs it (GPU when allowed), packs the
model into the catalog, and mirror functions for predict/evaluate/deploy.

Here each algorithm module registers a ``Trainer`` (train/predict/evaluate
callables over jnp arrays) into a dispatch table via ``@register_algorithm``.
``train`` returns a model_id in the global registry.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from neurondb_tpu.ml.registry import get_registry


@dataclass
class Trainer:
    name: str
    train: Callable[..., Any]                    # (X, y?, **hp) -> model pytree
    predict: Callable[..., Any]                  # (model, X) -> predictions
    evaluate: Optional[Callable[..., Dict]] = None   # (model, X, y?) -> metrics
    task: str = "supervised"                     # supervised | unsupervised


_ALGORITHMS: Dict[str, Trainer] = {}

# Name aliases matching the reference's algorithm-from-string mapping
# (ml_unified_api.c:60-93).
_ALIASES = {
    "linreg": "linear_regression",
    "logreg": "logistic_regression",
    "logistic": "logistic_regression",
    "rf": "random_forest",
    "dt": "decision_tree",
    "gbt": "gradient_boosting",
    "xgboost": "gradient_boosting",
    "lightgbm": "gradient_boosting",
    "catboost": "gradient_boosting",
    "nb": "naive_bayes",
    "gaussian_nb": "naive_bayes",
    "knn": "knn_classifier",
    "pca_whitening": "pca",
    "minibatch-kmeans": "minibatch_kmeans",
}


def register_algorithm(trainer: Trainer) -> Trainer:
    _ALGORITHMS[trainer.name] = trainer
    return trainer


def _resolve(algorithm: str) -> Trainer:
    _ensure_loaded()
    name = _ALIASES.get(algorithm.lower(), algorithm.lower())
    if name not in _ALGORITHMS:
        known = ", ".join(sorted(_ALGORITHMS))
        raise ValueError(f"unknown algorithm {algorithm!r}; known: {known}")
    return _ALGORITHMS[name]


_loaded = False


def _ensure_loaded() -> None:
    """Import algorithm modules so their registrations run."""
    global _loaded
    if _loaded:
        return
    _loaded = True
    from neurondb_tpu.ml import algorithms  # noqa: F401  (registers all)


def list_algorithms() -> List[str]:
    _ensure_loaded()
    return sorted(_ALGORITHMS)


def train(project: str, algorithm: str, X, y=None,
          hyperparams: Optional[Dict[str, Any]] = None) -> int:
    """Train and register; returns model_id (neurondb_train parity)."""
    t = _resolve(algorithm)
    hp = dict(hyperparams or {})
    X = jnp.asarray(X)
    t0 = time.time()
    if t.task == "unsupervised":
        model = t.train(X, **hp)
    else:
        if y is None:
            raise ValueError(f"{algorithm} requires a target")
        model = t.train(X, jnp.asarray(y), **hp)
    wall = time.time() - t0
    metrics: Dict[str, Any] = {"train_seconds": wall}
    if t.evaluate is not None:
        try:
            ev = t.evaluate(model, X, y) if t.task != "unsupervised" \
                else t.evaluate(model, X)
            metrics.update({k: float(v) for k, v in ev.items()})
        except Exception:
            pass
    return get_registry().register(project, t.name, model, hp, metrics)


def predict(model_id: int, X) -> np.ndarray:
    rec = get_registry().get(model_id)
    t = _resolve(rec.algorithm)
    return np.asarray(t.predict(rec.model, jnp.asarray(X)))


def evaluate(model_id: int, X, y=None) -> Dict[str, float]:
    rec = get_registry().get(model_id)
    t = _resolve(rec.algorithm)
    if t.evaluate is None:
        raise ValueError(f"{rec.algorithm} has no evaluator")
    ev = t.evaluate(rec.model, jnp.asarray(X),
                    None if y is None else jnp.asarray(y))
    return {k: float(v) for k, v in ev.items()}


def deploy(model_id: int) -> None:
    get_registry().deploy(model_id)


def load_model(model_id: int):
    return get_registry().get(model_id).model
