"""Index access methods — TPU-native replacements for the reference AMs.

The PG index-AM / buffer-manager entanglement (NeuronDB/src/index/hnsw_am.c,
ivf_am.c: one node per 8KB page, meta pages, buffer locks) becomes
device-resident array structures behind one batched query API:

    index.search(queries [B, D], k) -> (dists [B, k], ids [B, k])

preserving the ordering semantics of the ``<->``/``<=>``/``<#>`` operators
(strategy codes hnsw_am.c:1301-1345).
"""

from neurondb_tpu.index.flat import FlatIndex, QuantizedFlatIndex  # noqa: F401
from neurondb_tpu.index.ivf import IVFFlatIndex  # noqa: F401
from neurondb_tpu.index.hnsw import HNSWIndex  # noqa: F401
from neurondb_tpu.index.pq import PQIndex  # noqa: F401
from neurondb_tpu.index.specialty import (  # noqa: F401
    ConsistentIndex,
    RerankReadyIndex,
)
from neurondb_tpu.index.ivfpq import IVFPQIndex  # noqa: F401
