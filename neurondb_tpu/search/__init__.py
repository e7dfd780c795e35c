"""Search orchestration: hybrid fusion, BM25, reranking, RAG.

Rebuilds the reference's L6 layer (NeuronDB/src/search/hybrid_search.c,
src/ml/reranking*.c, src/ml/ml_rag.c) on top of the batched index API.
"""

from neurondb_tpu.search.bm25 import BM25Index  # noqa: F401
from neurondb_tpu.search.hybrid import (  # noqa: F401
    HybridSearcher,
    hybrid_search,
    reciprocal_rank_fusion,
    mmr_diverse_search,
    temporal_vector_search,
    faceted_vector_search,
)
