"""Distribution over TPU meshes — ICI/DCN sharding with XLA collectives.

Replaces the reference's SQL shard fan-out (NeuronDB/src/util/distributed.c:
53-180: per-shard SPI queries + host merge of k*nshards candidates) with
``shard_map`` over a ``jax.sharding.Mesh``: vector blocks / posting lists
are sharded across chips, each chip computes a fused local top-k, and partial
results merge with ``all_gather`` over ICI (SURVEY.md §2.10, §5).
"""

from neurondb_tpu.parallel.mesh import make_mesh, local_mesh  # noqa: F401
from neurondb_tpu.parallel.sharded import (  # noqa: F401
    sharded_knn,
    sharded_kmeans_step,
    ShardedFlatIndex,
    ShardedIVFIndex,
)
from neurondb_tpu.parallel.sharded_hnsw import (  # noqa: F401
    ShardedHNSWIndex,
)
from neurondb_tpu.parallel.sharded_ivfpq import (  # noqa: F401
    ShardedIVFPQIndex,
)
from neurondb_tpu.parallel.multihost import (  # noqa: F401
    MultiHostFlatIndex,
    MultiHostIVFIndex,
    kmeans_fit_2d,
    knn_2d,
    make_mesh_2d,
)
