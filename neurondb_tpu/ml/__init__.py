"""ML runtime — JAX train/predict/evaluate engine + model registry.

Rebuilds the reference's unified ML API (NeuronDB/src/ml/ml_unified_api.c:
52-93: neurondb_train/predict/evaluate/deploy/load_model dispatching over an
algorithm enum, models serialized into a catalog) as pure-JAX trainers that
produce pytree models tracked by ``neurondb_tpu.ml.registry``.
"""

from neurondb_tpu.ml.registry import ModelRegistry, get_registry  # noqa: F401
from neurondb_tpu.ml.api import train, predict, evaluate, deploy, load_model  # noqa: F401
