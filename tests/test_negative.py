"""Negative-path suite — the analog of the reference's tests/sql/negative
and crash_prevention corpora (SURVEY.md §4): invalid inputs must raise
clean errors, never crash or corrupt state."""

import numpy as np
import pytest

import neurondb_tpu as ndb
from neurondb_tpu.ml import api as ML


@pytest.fixture(scope="module")
def x(rng_mod):
    rng = rng_mod
    return rng.standard_normal((100, 8)).astype(np.float32)


# ---- store ----

def test_store_bad_dims():
    with pytest.raises(ValueError):
        ndb.VectorStore(0)
    with pytest.raises(ValueError):
        ndb.VectorStore(-5)
    with pytest.raises(ValueError):
        ndb.VectorStore(16001)


def test_store_mismatched_add(x):
    st = ndb.VectorStore(8)
    with pytest.raises(ValueError, match="dim"):
        st.add(np.zeros((3, 9), np.float32))


def test_store_delete_nonexistent(x):
    st = ndb.VectorStore(8)
    st.add(x)
    assert st.delete([99999]) == 0
    assert len(st) == 100


def test_store_search_empty():
    st = ndb.VectorStore(8)
    d, ids = st.search(np.zeros(8, np.float32), k=3)
    assert (ids == -1).all()


# ---- indexes ----

def test_bad_metric(x):
    with pytest.raises(ValueError, match="unknown distance metric"):
        ndb.FlatIndex(x, metric="euclidean3000")


def test_pq_bad_metric(x):
    with pytest.raises(ValueError, match="pq supports"):
        ndb.PQIndex(x, metric="hamming")


def test_index_k_zero_or_negative(x):
    idx = ndb.FlatIndex(x)
    d, ids = idx.search(x[0], k=1)
    assert ids.shape == (1,)


def test_hnsw_requires_data_or_dim():
    with pytest.raises(ValueError, match="vectors or dim"):
        ndb.HNSWIndex()


def test_ivf_single_point():
    one = np.ones((1, 4), np.float32)
    idx = ndb.IVFFlatIndex(one, nlists=10)
    d, ids = idx.search(one[0], k=5, nprobe=3)
    assert ids[0] == 0


def test_index_nan_query(x):
    idx = ndb.FlatIndex(x)
    q = np.full(8, np.nan, np.float32)
    d, ids = idx.search(q, k=3)   # must not crash
    assert d.shape == (3,)


# ---- ML API ----

def test_train_missing_target(x):
    with pytest.raises(ValueError, match="requires a target"):
        ML.train("p", "logistic_regression", x)


def test_predict_unknown_model():
    with pytest.raises(KeyError):
        ML.predict(999999, np.zeros((2, 2), np.float32))


def test_evaluate_no_evaluator(x):
    mid = ML.train("p", "dbscan", x, hyperparams={"eps": 1.0})
    with pytest.raises(ValueError, match="no evaluator"):
        ML.evaluate(mid, x)


def test_registry_delete_then_get(x):
    from neurondb_tpu.ml.registry import get_registry
    mid = ML.train("p", "kmeans", x, hyperparams={"k": 2})
    get_registry().delete(mid)
    with pytest.raises(KeyError):
        get_registry().get(mid)


# ---- quantization ----

def test_quantize_unknown_format(x):
    from neurondb_tpu.types.quantized import quantize
    with pytest.raises(ValueError, match="unknown quantization"):
        quantize(x, "int3")


# ---- sparse ----

def test_sparse_bad_shapes():
    from neurondb_tpu.types.sparse import SparseVectors
    sp = SparseVectors.from_coo([0, 2, -1], [1.0, 2.0, 0.0], dim=5)
    dense = np.asarray(sp.to_dense())
    np.testing.assert_allclose(dense[0], [1, 0, 2, 0, 0])


# ---- config ----

def test_config_unknown_knob():
    from neurondb_tpu.config import get_config
    with pytest.raises(AttributeError):
        get_config().show("no_such_knob")


def test_config_type_coercion():
    from neurondb_tpu.config import NDBConfig
    cfg = NDBConfig()
    cfg.set("ivf_nprobe", "25")          # string coerced to int
    assert cfg.ivf_nprobe == 25


# ---- graph ----

def test_graph_empty():
    from neurondb_tpu.types.graph import VectorGraph, pagerank
    g = VectorGraph.from_edges(3, [])
    pr = np.asarray(pagerank(g))
    np.testing.assert_allclose(pr.sum(), 1.0, rtol=1e-3)


# ---- services ----

def test_mcp_malformed_tool_args():
    import json
    from neurondb_tpu.service.mcp import MCPServer
    srv = MCPServer()
    out = json.loads(srv.handle(json.dumps({
        "jsonrpc": "2.0", "id": 1, "method": "tools/call",
        "params": {"name": "vector_search",
                   "arguments": {"vector": [1.0, 2.0]}}})))
    assert "error" in out   # unknown collection -> invalid params


def test_tenant_unknown_has_default_quota():
    from neurondb_tpu.service.tenant import TenantManager
    tm = TenantManager()
    tm.check_ingest("never-seen", 10, 100)   # default unlimited: no raise
