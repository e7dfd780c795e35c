"""Service layer: LLM gateway, embeddings, REST API, MCP server, workers.

Rebuilds the reference's service surfaces: the in-database LLM runtime
(NeuronDB/src/llm/), embeddings (src/ml/embeddings.c), background workers
(src/worker/), the NeuronAgent REST runtime (Go) and the NeuronMCP stdio
JSON-RPC server (Go) — here as Python modules over the engine API.
"""

from neurondb_tpu.service.llm import LLMRouter, LLMCache  # noqa: F401
from neurondb_tpu.service.embeddings import EmbeddingService  # noqa: F401
