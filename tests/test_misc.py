"""Exotic types, sparse retrieval, tenancy, native loaders."""

import numpy as np
import pytest

from neurondb_tpu.types.exotic import RetrievableText, VectorPacked
from neurondb_tpu.types.sparse import SparseVectors
from neurondb_tpu.search.sparse_search import (SparseInvertedIndex,
                                               dense_sparse_fusion)
from neurondb_tpu.service.tenant import (QuotaExceeded, TenantManager,
                                         TenantQuota, TenantScopedCollection)


# ---- rtext ----

def test_rtext():
    rt = RetrievableText.from_text("hello world. new section here",
                                   section_breaks=[13])
    assert rt.num_tokens == 5
    assert rt.token(0) == "hello"
    assert rt.token(1) == "world."
    assert rt.section_ids[0] == 0 and rt.section_ids[-1] == 1
    assert "new section here" == rt.section_text(1)
    assert rt.span_for_tokens(0, 2) == "hello world."


# ---- vectorp ----

def test_vectorp_roundtrip(rng):
    v = rng.standard_normal(16).astype(np.float32)
    blob = VectorPacked.pack(v)
    out = VectorPacked.unpack(blob)
    np.testing.assert_array_equal(out, v)


def test_vectorp_detects_corruption(rng):
    v = rng.standard_normal(8).astype(np.float32)
    blob = bytearray(VectorPacked.pack(v))
    blob[20] ^= 0xFF   # flip payload byte
    with pytest.raises(ValueError, match="checksum"):
        VectorPacked.unpack(bytes(blob))
    with pytest.raises(ValueError, match="magic"):
        VectorPacked.unpack(b"\x00" * 32)


def test_vectorp_dtypes(rng):
    for dt in (np.float16, np.int8, np.uint8):
        v = (rng.standard_normal(8) * 10).astype(dt)
        out = VectorPacked.unpack(VectorPacked.pack(v))
        np.testing.assert_array_equal(out, v)


# ---- sparse search ----

@pytest.fixture(scope="module")
def sparse_corpus(rng_mod):
    rng = rng_mod
    x = rng.standard_normal((200, 64)).astype(np.float32)
    x[np.abs(x) < 1.2] = 0   # sparsify
    return x


def test_sparse_inverted_index(sparse_corpus):
    sp = SparseVectors.from_dense(sparse_corpus)
    idx = SparseInvertedIndex(sp)
    q = SparseVectors.from_dense(sparse_corpus[5][None, :])
    scores, ids = idx.search(q, k=5)
    assert ids[0] == 5
    # oracle: dot products
    ref = sparse_corpus @ sparse_corpus[5]
    np.testing.assert_allclose(scores[0], ref.max(), rtol=1e-4)


def test_dense_sparse_fusion(sparse_corpus):
    from neurondb_tpu.index import FlatIndex
    dense = FlatIndex(sparse_corpus, metric="cosine")
    sp = SparseVectors.from_dense(sparse_corpus)
    sidx = SparseInvertedIndex(sp)
    q = SparseVectors.from_dense(sparse_corpus[7][None, :])
    s, ids = dense_sparse_fusion(dense, sidx, sparse_corpus[7], q, k=3)
    assert ids[0] == 7
    s2, ids2 = dense_sparse_fusion(dense, sidx, sparse_corpus[7], q, k=3,
                                   method="rrf")
    assert ids2[0] == 7


# ---- tenancy ----

def test_tenant_quota_vectors(rng):
    tm = TenantManager()
    tm.set_quota("acme", TenantQuota(max_vectors=100))
    tm.check_ingest("acme", 60, 1000)
    with pytest.raises(QuotaExceeded, match="vector quota"):
        tm.check_ingest("acme", 60, 1000)
    assert tm.usage("acme").vectors == 60
    assert any(e.action == "quota_reject" for e in tm.audit_log)


def test_tenant_qps_quota():
    tm = TenantManager()
    tm.set_quota("t", TenantQuota(max_qps=3))
    for _ in range(3):
        tm.check_query("t")
    with pytest.raises(QuotaExceeded, match="QPS"):
        tm.check_query("t")


def test_tenant_rls_filter():
    tm = TenantManager()
    tm.set_rls_policy("t", lambda i, md: i % 2 == 0)
    ids = np.array([0, 1, 2, 3])
    d = np.array([0.1, 0.2, 0.3, 0.4], np.float32)
    fids, fd = tm.filter_results("t", ids, d)
    assert fids.tolist() == [0, -1, 2, -1]
    assert np.isinf(fd[1])


def test_tenant_scoped_collection(rng):
    from neurondb_tpu.client import Client
    c = Client()
    col = c.create_collection("t1", 8)
    tm = TenantManager()
    tm.set_quota("acme", TenantQuota(max_vectors=50))
    scoped = TenantScopedCollection(col, tm, "acme")
    x = rng.standard_normal((30, 8)).astype(np.float32)
    scoped.add(x)
    with pytest.raises(QuotaExceeded):
        scoped.add(rng.standard_normal((30, 8)).astype(np.float32))
    res = scoped.search(x[3], k=2)
    assert res[0]["id"] == 3
    tm.set_rls_policy("acme", lambda i, md: i != 3)
    res = scoped.search(x[3], k=2)
    assert all(r["id"] != 3 for r in res)


# ---- native ----

def test_native_tokenizer_fallback_parity():
    from neurondb_tpu import native
    docs = ["The Quick brown-fox 42!", "data2 DATA2 data2"]
    d1, h1 = native._tokenize_py(docs)
    if native.available():
        d2, h2 = native.tokenize_corpus(docs)
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(h1, h2)


def test_native_vecs_roundtrip(tmp_path, rng):
    from neurondb_tpu import native
    x = rng.standard_normal((20, 8)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    with open(p, "wb") as f:
        for row in x:
            f.write(np.int32(8).tobytes())
            f.write(row.tobytes())
    got = native.read_vecs(p, "fvecs")
    np.testing.assert_allclose(got, x)
    got2 = native.read_vecs(p, "fvecs", max_n=5)
    assert got2.shape == (5, 8)


def test_native_iter_vecs_chunks(tmp_path, rng):
    """Streaming fvecs iterator: fseek-ranged native reads (fallback:
    python) must tile the file exactly."""
    import struct
    from neurondb_tpu import native
    x = rng.standard_normal((257, 8)).astype(np.float32)
    p = tmp_path / "c.fvecs"
    with open(p, "wb") as f:
        for row in x:
            f.write(struct.pack("<i", 8))
            f.write(row.tobytes())
    chunks = list(native.iter_vecs(str(p), chunk=100))
    assert [len(c) for c in chunks] == [100, 100, 57]
    np.testing.assert_array_equal(np.concatenate(chunks), x)
    partial = np.concatenate(list(native.iter_vecs(str(p), chunk=64,
                                                   max_n=150)))
    np.testing.assert_array_equal(partial, x[:150])


def test_native_graph_components():
    """Union-find CC over padded adjacency (r5: the HNSW bridge phase's
    initial labeling — 0.37 s at 1M x 32 vs ~25 s on-device)."""
    from neurondb_tpu import native
    nbr = np.array([[1, -1], [0, -1], [3, 4], [2, -1], [2, -1]], np.int32)
    lab = native.graph_components(nbr)
    if lab is None:                     # no compiler in this env
        import pytest
        pytest.skip("libndbnative unavailable")
    assert lab[0] == lab[1] and lab[2] == lab[3] == lab[4]
    assert lab[0] != lab[2]
    # root = smallest member row id
    assert lab[0] == 0 and lab[2] == 2
    # fully padded rows are singletons; out-of-range ids are ignored
    iso = native.graph_components(
        np.array([[-1, -1], [99, -1], [0, -1]], np.int32))
    assert iso[0] == iso[2] and iso[1] == 1
    # empty graph
    assert native.graph_components(np.zeros((0, 4), np.int32)).shape == (0,)


def test_bm25_no_mid_band_corpus():
    """A corpus whose every term is heavy or tiny (no mid-df band) must
    build and score through the tiled scorer's nsteps=0 path (r5)."""
    from neurondb_tpu.search.bm25 import BM25Index
    # 4 heavy terms everywhere + unique id tokens (df=1)
    docs = [f"alpha beta gamma delta id{i}" for i in range(3000)]
    bm = BM25Index(docs)
    got = bm.scores_batch(["alpha id7", "delta id2999"], device=True)
    host = np.stack([bm.scores("alpha id7"), bm.scores("delta id2999")])
    np.testing.assert_allclose(got, host, rtol=2e-2, atol=1e-2)
    assert int(np.argmax(got[0])) == 7
    assert int(np.argmax(got[1])) == 2999
