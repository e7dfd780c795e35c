"""Hybrid search / BM25 / rerankers / RAG / metrics."""

import numpy as np
import pytest

from neurondb_tpu.index import FlatIndex
from neurondb_tpu.ml import metrics as M
from neurondb_tpu.search import bm25 as B
from neurondb_tpu.search import hybrid as H
from neurondb_tpu.search import rerank as R
from neurondb_tpu.search.rag import RAGPipeline, chunk_text

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "postgres is a relational database system",
    "vector search finds nearest neighbors quickly",
    "the fox is quick and brown",
    "tpu accelerators run matrix multiplications",
    "databases store structured data in tables",
]


@pytest.fixture(scope="module")
def bm25():
    return B.BM25Index(DOCS)


def test_bm25_basic(bm25):
    scores, ids = bm25.search("quick brown fox", k=3)
    assert ids[0] in (0, 3)
    assert scores[0] >= scores[1] >= scores[2]
    assert bm25.scores("quick fox")[1] == 0.0  # doc 1 has no query terms


def test_bm25_idf_prefers_rare(bm25):
    # 'tpu' appears once -> doc 4 must win for a tpu query
    _, ids = bm25.search("tpu", k=1)
    assert ids[0] == 4


def test_tokenizer():
    toks = B.tokenize("The Databases, databases! RUNNING runs")
    assert "the" not in toks
    assert len(set(toks)) <= 3  # database(s) and run forms collapse


@pytest.fixture(scope="module")
def embedded(rng_mod):
    rng = rng_mod
    # embed docs as random vectors, with doc 2 and the query aligned
    vecs = rng.standard_normal((len(DOCS), 16)).astype(np.float32)
    return vecs


def test_hybrid_search(embedded, bm25):
    idx = FlatIndex(embedded, metric="cosine")
    qv = embedded[2] + 0.01
    scores, ids = H.hybrid_search(idx, bm25, qv, "vector search neighbors",
                                  k=3, weight=0.5)
    assert ids[0] == 2  # wins on both components
    # pure-text weight: doc with matching text dominates
    s2, ids2 = H.hybrid_search(idx, bm25, qv, "lazy dog", k=3, weight=0.0)
    assert ids2[0] in (0, 3)


def test_hybrid_filter(embedded, bm25):
    idx = FlatIndex(embedded, metric="cosine")
    qv = embedded[2]
    _, ids = H.hybrid_search(idx, bm25, qv, "vector search", k=3,
                             filter_fn=lambda i: i != 2)
    assert 2 not in ids


def test_hybrid_search_batch(embedded, bm25):
    idx = FlatIndex(embedded, metric="cosine")
    qv = np.stack([embedded[2] + 0.01, embedded[4] + 0.01])
    scores, ids = H.hybrid_search_batch(
        idx, bm25, qv, ["vector search neighbors", "tpu matrix"], k=3)
    assert ids.shape == (2, 3)
    assert ids[0, 0] == 2
    assert ids[1, 0] == 4
    # matches the per-query path
    s1, i1 = H.hybrid_search(idx, bm25, qv[0], "vector search neighbors",
                             k=3)
    np.testing.assert_array_equal(ids[0], i1)


def test_rrf():
    a = np.array([1, 2, 3, 4])
    b = np.array([3, 1, 5, 6])
    scores, ids = H.reciprocal_rank_fusion([a, b], k=3)
    assert ids[0] == 1  # rank 1 + rank 2
    assert 3 in ids[:3]
    assert scores[0] > scores[1]


def test_mmr_diversity(rng):
    # two tight pairs; MMR at low lambda must pick one from each pair
    base = np.array([[1, 0], [0.99, 0.01], [0, 1], [0.01, 0.99]], np.float32)
    q = np.array([0.7, 0.7], np.float32)
    _, ids = H.mmr_diverse_search(q, base, np.arange(4), k=2, lambda_=0.3)
    assert {int(ids[0]) // 2, int(ids[1]) // 2} == {0, 1}


def test_temporal(embedded):
    idx = FlatIndex(embedded, metric="cosine")
    ts = np.full(len(DOCS), 1_000_000.0)
    ts[2] = 0.0  # doc 2 is ancient
    qv = embedded[2] + 0.01
    s, ids = H.temporal_vector_search(idx, qv, ts, k=2, decay=0.5,
                                      now=1_000_000.0)
    assert ids[0] != 2  # decayed away despite vector match


def test_faceted(embedded):
    idx = FlatIndex(embedded, metric="cosine")
    facets = {i: {"lang": "en" if i % 2 == 0 else "de"} for i in range(len(DOCS))}
    qv = embedded[3]
    _, ids = H.faceted_vector_search(idx, qv, facets, {"lang": "en"}, k=3)
    assert all(i % 2 == 0 for i in ids)


def test_multi_vector(embedded):
    idx = FlatIndex(embedded, metric="cosine")
    _, ids = H.multi_vector_search(idx, embedded[[1, 4]], k=2)
    assert set(ids[:2]) == {1, 4}


# ---- rerankers ----

def test_rerank_ltr():
    feats = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], np.float32)
    scores, order = R.rerank_ltr(feats, np.array([1.0, 2.0], np.float32))
    assert order[0] == 2
    w = R.train_ltr(feats, np.array([1.0, 2.0, 3.0], np.float32))
    s2, o2 = R.rerank_ltr(feats, w)
    assert o2[0] == 2


def test_rerank_colbert():
    qt = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    doc_good = np.array([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]], np.float32)
    doc_bad = np.array([[-1.0, 0.0], [0.0, -1.0]], np.float32)
    scores, order = R.rerank_colbert(qt, [doc_bad, doc_good])
    assert order[0] == 1


def test_rerank_ensemble_weighted():
    r1 = (np.array([0.9, 0.5]), np.array([10, 20]))
    r2 = (np.array([0.8, 0.7]), np.array([20, 30]))
    scores, ids = R.rerank_ensemble([r1, r2], k=3)
    assert set(ids) == {10, 20, 30}
    assert ids[-1] == 30  # weakest: zeroed by min-max in r2, absent in r1


def test_rerank_ensemble_borda():
    r1 = (np.array([3.0, 2.0, 1.0]), np.array([1, 2, 3]))
    r2 = (np.array([3.0, 2.0, 1.0]), np.array([2, 1, 3]))
    _, ids = R.rerank_ensemble([r1, r2], method="borda", k=3)
    assert set(ids[:2]) == {1, 2}


def test_rerank_cross_encoder_api():
    def scorer(q, docs):
        return np.array([float(len(set(q.split()) & set(d.split())))
                         for d in docs])
    scores, order = R.rerank_cross_encoder("quick fox", DOCS, scorer, k=2)
    assert order[0] in (0, 3)


def test_cross_encoder_pipelined_batches_match_single_shot():
    # sub-batched dispatch (tokenizer pipelined against the device
    # encoder, tail padded to one compile shape) must score identically
    # to the one-shot path
    from neurondb_tpu.ml.transformer import CrossEncoder
    ce = CrossEncoder(dim=64, max_len=32, seed=0, use_flash=False)
    docs = [f"word{i} alpha beta gamma {i}" for i in range(21)]
    one = ce("alpha query", docs, batch=0)          # single shot
    sub = ce("alpha query", docs, batch=8)          # 3 sub-batches + pad
    np.testing.assert_allclose(one, sub, rtol=1e-5, atol=1e-6)


# ---- RAG ----

def test_chunk_text():
    text = "abcdefghij" * 100
    chunks = chunk_text(text, chunk_size=100, overlap=10)
    assert all(len(c) <= 100 for c in chunks)
    assert sum(len(c) for c in chunks) >= len(text)
    s = chunk_text("One. Two. Three. Four.", chunk_size=12, by="sentences")
    assert len(s) >= 2


def test_rag_pipeline(rng):
    # deterministic bag-of-words hash embedding
    def embed(texts):
        out = np.zeros((len(texts), 32), np.float32)
        for i, t in enumerate(texts):
            for tok in B.tokenize(t):
                out[i, hash(tok) % 32] += 1.0
        return out

    rag = RAGPipeline(embed=embed, chunk_size=200)
    rag.add_documents(DOCS)
    res = rag.retrieve("vector nearest neighbor search", k=2)
    assert res[0]["doc_id"] == 2
    ctx = rag.context("tpu matrix", k=1)
    assert "tpu" in ctx


# ---- metrics ----

def test_metrics():
    got = np.array([[1, 2, 3], [4, 5, 6]])
    want = np.array([[1, 2, 9], [4, 5, 6]])
    assert M.recall_at_k(got, want) == pytest.approx(5 / 6)
    assert M.precision_at_k(got, [{1, 2}, {6}], k=3) == pytest.approx(3 / 6)
    assert M.mean_reciprocal_rank(got, np.array([2, 6])) == pytest.approx(
        (1 / 2 + 1 / 3) / 2)
    ndcg = M.ndcg_at_k(got, [{1: 1.0}, {6: 1.0}], k=3)
    assert 0 < ndcg <= 1


def test_bm25_scores_batch_matches_host_oracle():
    """Device batch scorer vs the host term-at-a-time loop (VERDICT r1
    item 8 fusion-correctness criterion)."""
    from neurondb_tpu.search.bm25 import BM25Index
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    docs = [" ".join(rng.choice(vocab, rng.integers(5, 30)))
            for _ in range(3000)]
    bm = BM25Index(docs, use_native=False)
    queries = [" ".join(rng.choice(vocab, 4)) for _ in range(17)]
    dev = bm.scores_batch(queries, device=True)
    host = np.stack([bm.scores(q) for q in queries])
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)


def test_bm25_scores_batch_hbm_budget_subbatches():
    """The batch scorer splits queries so no [b, n_docs] operand
    exceeds score_budget_bytes (a 512-query batch at 4M docs OOMed the
    16 GB chip — ~3 such operands are live in the tiled assembly).
    Shrinking the budget must change only the dispatch shape, never the
    scores, on both scorer modes and both output residencies."""
    from neurondb_tpu.search.bm25 import BM25Index
    from neurondb_tpu.config import configure
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(150)]
    docs = [" ".join(rng.choice(vocab, rng.integers(5, 20)))
            for _ in range(2500)]
    bm = BM25Index(docs, use_native=False)
    queries = [" ".join(rng.choice(vocab, 3)) for _ in range(23)]
    whole = bm.scores_batch(queries, device=True)
    bm.score_budget_bytes = 2500 * 4 * 8      # caps sub-batches at 8
    try:
        for mode in ("tiled", "scatter"):
            configure(bm25_scorer=mode)
            sub = bm.scores_batch(queries, device=True)
            np.testing.assert_allclose(sub, whole, rtol=1e-5, atol=1e-5)
            on_dev = bm.scores_batch(queries, device=True,
                                     return_device=True)
            assert on_dev.shape == (23, 2500)
            np.testing.assert_allclose(np.asarray(on_dev), whole,
                                       rtol=1e-5, atol=1e-5)
    finally:
        configure(bm25_scorer="tiled")


def test_bm25_bf16_heavy_tier():
    """At-scale heavy tier (bf16 [H, n_docs] rows, VERDICT r3 item 5):
    2x heavy terms under the same byte budget, scores within bf16
    rounding of the host oracle, and ranking-identical on top-k."""
    from neurondb_tpu.search.bm25 import BM25Index
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(200)]
    docs = [" ".join(rng.choice(vocab, rng.integers(5, 30)))
            for _ in range(3000)]
    bm = BM25Index(docs, use_native=False)
    bm.heavy_bf16_from = 1          # force the at-scale tier
    dev = bm._ensure_device()
    import jax.numpy as jnp
    assert dev["w_dense"].dtype == jnp.bfloat16
    queries = [" ".join(rng.choice(vocab, 4)) for _ in range(17)]
    got = bm.scores_batch(queries, device=True)
    host = np.stack([bm.scores(q) for q in queries])
    # bf16 rounding: ~2^-8 relative on the heavy rows AND (r5) on the
    # at-scale score accumulator itself
    np.testing.assert_allclose(got, host, rtol=1.5e-2, atol=1e-2)
    # top-10 sets must agree with the exact oracle (order-insensitive)
    for g, h in zip(got, host):
        tg = set(np.argsort(-g)[:10].tolist())
        th = np.argsort(-h)
        # accept ties at the oracle's k-th score boundary, within the
        # bf16-relative rounding of the scores
        kth = h[th[9]]
        cut = kth - (1e-2 + 1.5e-2 * abs(kth))
        assert tg <= set(th[h[th] >= cut].tolist())


def test_bm25_tiled_scorer_matches_host_oracle():
    """Round-5 tiled one-hot-GEMM scorer (default): exact vs the host
    loop — unlike the scatter tiers it has NO posting truncation, so
    the bar is full f32 parity (reference: ts_rank accumulation,
    NeuronDB/src/search/hybrid_search.c:200-220)."""
    from neurondb_tpu.config import configure
    from neurondb_tpu.search.bm25 import BM25Index
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    docs = [" ".join(rng.choice(vocab, rng.integers(5, 30)))
            for _ in range(3000)]
    bm = BM25Index(docs, use_native=False)
    assert bm._scorer_mode() == "tiled"      # the default
    queries = [" ".join(rng.choice(vocab, 4)) for _ in range(17)]
    queries.append("w0 w0 w5")               # repeated query term
    dev = bm.scores_batch(queries, device=True)
    host = np.stack([bm.scores(q) for q in queries])
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)
    # both modes agree with each other (scatter truncates via seg_cap,
    # but this corpus is far below any cap)
    configure(bm25_scorer="scatter")
    try:
        sc = bm.scores_batch(queries, device=True)
    finally:
        configure(bm25_scorer="tiled")
    np.testing.assert_allclose(sc, dev, rtol=1e-3, atol=1e-3)


def test_bm25_tiled_union_overflow_keeps_high_idf():
    """A batch whose distinct light terms exceed union_cap drops the
    LOWEST-idf extras (same rule as term_cap); covered terms stay
    exact."""
    from neurondb_tpu.search.bm25 import BM25Index
    rng = np.random.default_rng(6)
    vocab = [f"w{i}" for i in range(300)]
    docs = [" ".join(rng.choice(vocab, rng.integers(5, 30)))
            for _ in range(2000)]
    bm = BM25Index(docs, use_native=False)
    bm.union_cap = 8
    queries = [" ".join(rng.choice(vocab, 6)) for _ in range(9)]
    dev = bm.scores_batch(queries, device=True)
    host = np.stack([bm.scores(q) for q in queries])
    # scores are a LOWER bound of the oracle (dropped terms only ever
    # remove positive contributions) and never exceed it
    assert (dev <= host + 1e-4).all()
    # the heavy tier plus the 8 highest-idf union terms still score
    assert dev.max() > 0


def test_bm25_tiled_bf16_at_scale():
    """Force the at-scale bf16 tier through the tiled path: ranking
    agrees with the exact oracle within bf16 rounding."""
    from neurondb_tpu.search.bm25 import BM25Index
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(200)]
    docs = [" ".join(rng.choice(vocab, rng.integers(5, 30)))
            for _ in range(3000)]
    bm = BM25Index(docs, use_native=False)
    bm.heavy_bf16_from = 1                   # force the at-scale tier
    queries = [" ".join(rng.choice(vocab, 4)) for _ in range(9)]
    got = bm.scores_batch(queries, device=True)
    assert not bm._dev_tiled["f32"]
    host = np.stack([bm.scores(q) for q in queries])
    np.testing.assert_allclose(got, host, rtol=1.5e-2, atol=2e-2)


def test_bm25_scores_batch_native_corpus():
    from neurondb_tpu.search.bm25 import BM25Index
    rng = np.random.default_rng(4)
    vocab = [f"term{i}" for i in range(500)]
    docs = [" ".join(rng.choice(vocab, rng.integers(8, 40)))
            for _ in range(6000)]          # above NATIVE_THRESHOLD
    bm = BM25Index(docs)
    queries = [" ".join(rng.choice(vocab, 3)) for _ in range(9)]
    dev = bm.scores_batch(queries, device=True)
    host = np.stack([bm.scores(q) for q in queries])
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)


def test_hybrid_batch_uses_batch_scores(rng):
    """hybrid_search_batch fused output must equal the per-query path."""
    from neurondb_tpu.index import FlatIndex
    from neurondb_tpu.search.bm25 import BM25Index
    from neurondb_tpu.search.hybrid import hybrid_search, hybrid_search_batch
    n, d = 3000, 16
    x = rng.standard_normal((n, d)).astype(np.float32)
    vocab = [f"w{i}" for i in range(100)]
    docs = [" ".join(rng.choice(vocab, 10)) for _ in range(n)]
    idx = FlatIndex(x)
    bm = BM25Index(docs, use_native=False)
    q = x[:5]
    texts = [docs[i] for i in range(5)]
    bs, bi = hybrid_search_batch(idx, bm, q, texts, k=5)
    for b in range(5):
        ss, si = hybrid_search(idx, bm, q[b], texts[b], k=5)
        assert set(si.tolist()) == set(bi[b].tolist())
        np.testing.assert_allclose(np.sort(ss), np.sort(bs[b]), rtol=1e-4)


def test_hybrid_device_fusion_matches_host_oracle(rng):
    """The device fusion path (normalization + union + dedup + top-k in
    one jit) must reproduce the host _fuse_one semantics."""
    from neurondb_tpu.index import FlatIndex
    n = 3000
    x = rng.standard_normal((n, 16)).astype(np.float32)
    # external ids deliberately sparse/non-contiguous
    ext = (np.arange(n, dtype=np.int64) * 7 + 3)
    docs = [f"term{i % 37} body word{i % 11} filler" for i in range(n)]
    idx = FlatIndex(x, ids=ext)
    bm = B.BM25Index(docs, ids=ext)
    q = x[5:21] + 0.01
    texts = [f"term{(5 + i) % 37} word{(5 + i) % 11}" for i in range(16)]
    s_h, i_h = H.hybrid_search_batch(idx, bm, q, texts, k=8, device=False)
    s_d, i_d = H.hybrid_search_batch(idx, bm, q, texts, k=8, device=True)
    # same documents in the same order (ties broken identically is not
    # guaranteed across top_k implementations — compare sets + scores)
    for b in range(16):
        assert set(i_d[b]) == set(i_h[b]), (b, i_d[b], i_h[b])
    np.testing.assert_allclose(np.sort(s_d, axis=1),
                               np.sort(s_h, axis=1), rtol=1e-4, atol=1e-4)


def test_hybrid_searcher_pipelined_matches_batch(rng):
    """HybridSearcher (pipelined, zero host syncs between stages) must
    reproduce hybrid_search_batch on an IVF index with non-contiguous
    external ids, including across a sub-batch boundary."""
    from neurondb_tpu.index import IVFFlatIndex
    n = 4000
    x = rng.standard_normal((n, 16)).astype(np.float32)
    ext = np.arange(n, dtype=np.int64) * 3 + 1
    docs = [f"term{i % 29} body word{i % 13} filler" for i in range(n)]
    idx = IVFFlatIndex(x, nlists=8, ids=ext)
    bm = B.BM25Index(docs, ids=ext)
    q = np.repeat(x[5:21] + 0.01, 3, axis=0)          # 48 queries
    texts = [f"term{(5 + i // 3) % 29} word{(5 + i // 3) % 13}"
             for i in range(48)]
    searcher = H.HybridSearcher(idx, bm, candidates=64, approx=False)
    s_p, i_p = searcher.search_batch(q, texts, k=8, batch=32, nprobe=8)
    s_b, i_b = H.hybrid_search_batch(idx, bm, q, texts, k=8,
                                     candidates=64, nprobe=8)
    for b in range(48):
        assert set(i_p[b]) == set(i_b[b]), (b, i_p[b], i_b[b])
    np.testing.assert_allclose(np.sort(s_p, axis=1),
                               np.sort(s_b, axis=1), rtol=1e-4, atol=1e-4)
