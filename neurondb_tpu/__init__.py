"""neurondb_tpu — a TPU-native vector-search + in-database-ML framework.

A from-scratch rebuild of the capabilities of the NeuronDB ecosystem
(PostgreSQL extension + agent + MCP services) designed TPU-first:

- Distance operators (`<->`, `<=>`, `<#>`, `<+>`, ...) become batched
  GEMM kernels on the MXU with fused top-k selection (``neurondb_tpu.ops``).
- Index access methods (HNSW / IVFFlat) become device-resident array
  structures queried by batched beam search / fused cluster scans
  (``neurondb_tpu.index``).
- The ML runtime (50+ algorithms) becomes a JAX train/predict/evaluate
  engine with a model registry (``neurondb_tpu.ml``).
- Distribution is `jax.sharding` over a device Mesh with XLA collectives
  (``neurondb_tpu.parallel``) instead of SQL shard fan-out.
- The service layer (REST agent runtime + MCP stdio server) lives in
  ``neurondb_tpu.service``.

Reference feature map: see SURVEY.md at the repo root. Citations in
docstrings point into the reference tree (``NeuronDB/src/...``) to make
behavior-parity auditable; no reference code is reused.
"""

from neurondb_tpu.version import __version__
from neurondb_tpu.config import NDBConfig, get_config, set_config, configure
from neurondb_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

from neurondb_tpu.ops import distance  # noqa: F401
from neurondb_tpu.ops.distance import (  # noqa: F401
    l2_distance,
    squared_l2_distance,
    cosine_distance,
    inner_product_distance,
    l1_distance,
    hamming_distance,
    chebyshev_distance,
    minkowski_distance,
    jaccard_distance,
    pairwise_distance,
)
from neurondb_tpu.ops.topk import topk_smallest, merge_topk  # noqa: F401
from neurondb_tpu.index import (  # noqa: F401
    ConsistentIndex,
    FlatIndex,
    HNSWIndex,
    IVFFlatIndex,
    IVFPQIndex,
    PQIndex,
    QuantizedFlatIndex,
    RerankReadyIndex,
)
from neurondb_tpu.index.base import (  # noqa: F401
    quantize_queries_int4,
    quantize_queries_int8,
    quantize_queries_int12,
)
from neurondb_tpu.store import VectorStore  # noqa: F401

__all__ = [
    "__version__",
    "NDBConfig",
    "get_config",
    "set_config",
    "configure",
    "l2_distance",
    "squared_l2_distance",
    "cosine_distance",
    "inner_product_distance",
    "l1_distance",
    "hamming_distance",
    "chebyshev_distance",
    "minkowski_distance",
    "jaccard_distance",
    "pairwise_distance",
    "topk_smallest",
    "merge_topk",
    "quantize_queries_int4",
    "quantize_queries_int8",
    "quantize_queries_int12",
    "FlatIndex",
    "QuantizedFlatIndex",
    "IVFFlatIndex",
    "IVFPQIndex",
    "PQIndex",
    "HNSWIndex",
    "RerankReadyIndex",
    "ConsistentIndex",
    "VectorStore",
]
