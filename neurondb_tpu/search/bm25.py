"""BM25 full-text scoring — the ts_rank/FTS half of hybrid search.

The reference leans on PostgreSQL's FTS (``ts_rank`` inside the SPI SQL
built by hybrid_search, NeuronDB/src/search/hybrid_search.c:200-220) and a
sparse inverted index AM for SPLADE/BM25 posting lists
(src/index/sparse_index.c:3-8). Standalone, we build our own inverted
index: a CSR postings table scored with Okapi BM25. Scoring is vectorized
numpy over postings (host) — term-at-a-time accumulation; the fused-with-
ANN path converts scores to device arrays for rank fusion.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_TOKEN = re.compile(r"[a-z0-9]+")

# Minimal English stopword set (parity with to_tsvector's simple config).
STOPWORDS = frozenset("""a an and are as at be by for from has he in is it its
of on that the to was were will with this these those i you your we they them
or not no but if then so do does did been being have had""".split())


def tokenize(text: str, *, stem: bool = True,
             stopwords: bool = True) -> List[str]:
    toks = _TOKEN.findall(text.lower())
    if stopwords:
        toks = [t for t in toks if t not in STOPWORDS]
    if stem:
        toks = [_light_stem(t) for t in toks]
    return toks


def _light_stem(t: str) -> str:
    """Cheap suffix stripper (stand-in for the snowball stemmer PG uses)."""
    for suf in ("ingly", "edly", "ing", "ies", "ied", "ers", "est",
                "ed", "es", "ly", "s"):
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            if suf == "ies" or suf == "ied":
                return t[: -3] + "y"
            return t[: -len(suf)]
    return t


class BM25Index:
    """Okapi BM25 inverted index over a document corpus.

    Large corpora build through the native C++ tokenizer + vectorized
    postings construction (neurondb_tpu.native); small corpora keep the
    richer Python tokenizer (stopwords + stemming).
    """

    NATIVE_THRESHOLD = 5000  # docs

    def __init__(self, docs: Sequence[str], *, k1: float = 1.2,
                 b: float = 0.75, ids: Optional[Sequence[int]] = None,
                 use_native: Optional[bool] = None):
        self.k1 = k1
        self.b = b
        self.n_docs = len(docs)
        self.ids = np.asarray(ids if ids is not None else range(len(docs)),
                              np.int64)
        self._vocab: Dict[str, int] = {}
        self._hash_vocab: Optional[Dict[int, int]] = None
        if use_native is None:
            use_native = len(docs) >= self.NATIVE_THRESHOLD
        if use_native:
            from neurondb_tpu import native
            if native.available():
                self._build_native(docs)
                return
        self._build_python(docs)

    def _build_python(self, docs: Sequence[str]) -> None:
        doc_terms: List[Counter] = []
        lengths = np.zeros(len(docs), np.float32)
        for i, doc in enumerate(docs):
            toks = tokenize(doc)
            lengths[i] = len(toks)
            c = Counter(toks)
            doc_terms.append(c)
            for t in c:
                if t not in self._vocab:
                    self._vocab[t] = len(self._vocab)
        self.doc_len = lengths
        self.avg_len = float(lengths.mean()) if len(docs) else 0.0
        nv = len(self._vocab)
        # CSR postings: for each term, (doc_row, tf)
        counts = np.zeros(nv, np.int64)
        for c in doc_terms:
            for t in c:
                counts[self._vocab[t]] += 1
        self.df = counts.astype(np.float32)
        offsets = np.zeros(nv + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        self._post_doc = np.zeros(offsets[-1], np.int32)
        self._post_tf = np.zeros(offsets[-1], np.float32)
        cursor = offsets[:-1].copy()
        for i, c in enumerate(doc_terms):
            for t, tf in c.items():
                ti = self._vocab[t]
                self._post_doc[cursor[ti]] = i
                self._post_tf[cursor[ti]] = tf
                cursor[ti] += 1
        self._offsets = offsets
        self._finish_idf()

    def _build_native(self, docs: Sequence[str]) -> None:
        """Vectorized postings from the native (doc_id, hash) stream."""
        from neurondb_tpu import native
        doc_ids, hashes = native.tokenize_corpus(list(docs))
        self.doc_len = np.bincount(doc_ids, minlength=self.n_docs
                                   ).astype(np.float32)
        self.avg_len = float(self.doc_len.mean()) if self.n_docs else 0.0
        # unique (hash, doc) pairs -> term frequencies
        uniq_h, term_of = np.unique(hashes, return_inverse=True)
        self._hash_vocab = {int(h): i for i, h in enumerate(uniq_h)}
        key = term_of.astype(np.int64) * self.n_docs + doc_ids
        uk, tf = np.unique(key, return_counts=True)
        post_term = (uk // self.n_docs).astype(np.int64)
        self._post_doc = (uk % self.n_docs).astype(np.int32)
        self._post_tf = tf.astype(np.float32)
        nv = len(uniq_h)
        counts = np.bincount(post_term, minlength=nv)
        self.df = counts.astype(np.float32)
        offsets = np.zeros(nv + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        self._offsets = offsets   # post arrays already term-sorted by key
        self._finish_idf()

    def _finish_idf(self) -> None:
        self.idf = np.maximum(
            np.log((self.n_docs - self.df + 0.5) / (self.df + 0.5) + 1.0),
            0.0)

    def _term_index(self, token: str) -> Optional[int]:
        if self._hash_vocab is not None:
            from neurondb_tpu.native import _fnv1a
            import re as _re
            toks = _re.findall(r"[a-z0-9]+", token.lower())
            if not toks:
                return None
            return self._hash_vocab.get(_fnv1a(toks[0].encode()[:48]))
        return self._vocab.get(token)

    def scores(self, query: str) -> np.ndarray:
        """Dense [n_docs] BM25 scores (term-at-a-time accumulation)."""
        out = np.zeros(self.n_docs, np.float32)
        norm = 1.0 - self.b + self.b * self.doc_len / max(self.avg_len, 1e-9)
        if self._hash_vocab is not None:
            q_terms = _TOKEN.findall(query.lower())
        else:
            q_terms = tokenize(query)
        for t in q_terms:
            ti = self._term_index(t)
            if ti is None:
                continue
            s, e = self._offsets[ti], self._offsets[ti + 1]
            rows = self._post_doc[s:e]
            tf = self._post_tf[s:e]
            out[rows] += self.idf[ti] * tf * (self.k1 + 1.0) / (
                tf + self.k1 * norm[rows])
        return out

    def search(self, query: str, k: int = 10) -> Tuple[np.ndarray, np.ndarray]:
        s = self.scores(query)
        k = min(k, self.n_docs)
        rows = np.argpartition(-s, k - 1)[:k] if k < self.n_docs \
            else np.arange(self.n_docs)
        rows = rows[np.argsort(-s[rows], kind="stable")]
        return s[rows], self.ids[rows]
