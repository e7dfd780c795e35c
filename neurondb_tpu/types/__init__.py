"""Value types: quantized vector formats, sparse vectors, vector graphs.

TPU-native replacements for the reference's SQL types
(NeuronDB/include/neurondb.h:35-113, include/neurondb_types.h): everything
is a dense, padded, statically-shaped jnp array or a small pytree of them.
"""

from neurondb_tpu.types.quantized import (  # noqa: F401
    Quantized,
    quantize,
    dequantize,
    quantize_analyze,
    FORMATS,
)
from neurondb_tpu.types.sparse import SparseVectors  # noqa: F401
from neurondb_tpu.types.graph import VectorGraph  # noqa: F401
