"""RAG pipeline: chunk -> embed -> index -> retrieve -> rank.

Reference: NeuronDB/src/ml/ml_rag.c:41-44 (neurondb_chunk_text,
neurondb_embed_text, neurondb_rank_documents, neurondb_transform_data) and
the RAG orchestration MCP tools. Embedding is pluggable: any callable
``embed(texts: list[str]) -> np.ndarray [N, D]``; the default is the
deterministic hashing embedder in service.embeddings (works offline), with
the LLM-gateway embedder as the production path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

_SENT = re.compile(r"(?<=[.!?])\s+")


def chunk_text(text: str, *, chunk_size: int = 512, overlap: int = 64,
               by: str = "chars") -> List[str]:
    """Split text into overlapping chunks (neurondb_chunk_text parity).
    by="chars" slides a window; by="sentences" packs whole sentences."""
    if by == "sentences":
        sents = [s.strip() for s in _SENT.split(text) if s.strip()]
        chunks, cur = [], ""
        for s in sents:
            if cur and len(cur) + 1 + len(s) > chunk_size:
                chunks.append(cur)
                cur = (cur[-overlap:] + " " if overlap else "") + s
            else:
                cur = (cur + " " + s).strip()
        if cur:
            chunks.append(cur)
        return chunks
    step = max(chunk_size - overlap, 1)
    out = [text[i:i + chunk_size] for i in range(0, max(len(text), 1), step)]
    return [c for c in out if c.strip()] or [""]


@dataclass
class RAGPipeline:
    """End-to-end retrieval pipeline over a document set."""

    embed: Callable[[Sequence[str]], np.ndarray]
    metric: str = "cosine"
    chunk_size: int = 512
    overlap: int = 64
    docs: List[str] = field(default_factory=list)
    chunks: List[str] = field(default_factory=list)
    chunk_doc: List[int] = field(default_factory=list)
    _index = None
    _bm25 = None

    def add_documents(self, docs: Sequence[str]) -> None:
        base = len(self.docs)
        self.docs.extend(docs)
        for di, doc in enumerate(docs, start=base):
            cs = chunk_text(doc, chunk_size=self.chunk_size,
                            overlap=self.overlap)
            self.chunks.extend(cs)
            self.chunk_doc.extend([di] * len(cs))
        self._rebuild()

    def _rebuild(self) -> None:
        from neurondb_tpu.index import FlatIndex
        from neurondb_tpu.search.bm25 import BM25Index
        embs = np.asarray(self.embed(self.chunks), np.float32)
        self._index = FlatIndex(embs, metric=self.metric)
        self._bm25 = BM25Index(self.chunks)

    def retrieve(self, query: str, k: int = 5, *, hybrid: bool = True,
                 weight: float = 0.5) -> List[Dict]:
        """Top-k chunks (neurondb_rank_documents parity). Returns dicts with
        chunk text, source doc id and score."""
        qv = np.asarray(self.embed([query]), np.float32)[0]
        if hybrid and self._bm25 is not None:
            from neurondb_tpu.search.hybrid import hybrid_search
            scores, ids = hybrid_search(self._index, self._bm25, qv, query,
                                        k=k, weight=weight)
        else:
            d, ids = self._index.search(qv, k=k)
            scores = 1.0 - d
        return [{"chunk": self.chunks[int(i)], "doc_id": self.chunk_doc[int(i)],
                 "chunk_id": int(i), "score": float(s)}
                for s, i in zip(scores, ids) if i >= 0]

    def context(self, query: str, k: int = 5, sep: str = "\n\n") -> str:
        """Concatenated context string for prompt assembly."""
        return sep.join(r["chunk"] for r in self.retrieve(query, k))
