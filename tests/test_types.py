"""Sparse vectors, graphs, vector ops, store, config."""

import numpy as np
import pytest

import jax.numpy as jnp

from neurondb_tpu.config import NDBConfig, configure, get_config
from neurondb_tpu.store import VectorStore
from neurondb_tpu.types.sparse import (SparseVectors, sparse_cosine_distance,
                                       sparse_inner_product, sparse_l2_distance)
from neurondb_tpu.types.graph import (VectorGraph, bfs, community_labels,
                                      connected_components, dfs_order,
                                      pagerank, shortest_path_lengths)
from neurondb_tpu.ops import vector_ops as V


# ---- sparse ----

def test_sparse_roundtrip(rng):
    x = rng.standard_normal((4, 20)).astype(np.float32)
    x[x < 0.5] = 0
    sp = SparseVectors.from_dense(x)
    np.testing.assert_allclose(sp.to_dense(), x)


def test_sparse_ops(rng):
    a = rng.standard_normal((5, 30)).astype(np.float32)
    b = rng.standard_normal((5, 30)).astype(np.float32)
    a[np.abs(a) < 1.0] = 0
    b[np.abs(b) < 1.0] = 0
    sa, sb = SparseVectors.from_dense(a), SparseVectors.from_dense(b)
    np.testing.assert_allclose(sparse_inner_product(sa, sb),
                               np.sum(a * b, 1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sparse_l2_distance(sa, sb),
                               np.linalg.norm(a - b, axis=1), rtol=1e-4)
    ref_cos = 1 - np.sum(a * b, 1) / np.maximum(
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1), 1e-30)
    np.testing.assert_allclose(sparse_cosine_distance(sa, sb), ref_cos,
                               rtol=1e-4, atol=1e-5)


def test_sparse_normalize(rng):
    x = rng.standard_normal((3, 10)).astype(np.float32)
    x[np.abs(x) < 0.5] = 0
    sp = SparseVectors.from_dense(x).normalize()
    np.testing.assert_allclose(sp.norm(), np.ones(3), rtol=1e-5)


# ---- graph ----

def test_bfs_and_components():
    g = VectorGraph.from_edges(6, [(0, 1), (1, 2), (3, 4)])
    lv = np.asarray(bfs(g, 0))
    assert lv.tolist() == [0, 1, 2, -1, -1, -1]
    comp = np.asarray(connected_components(g))
    assert comp[0] == comp[1] == comp[2]
    assert comp[3] == comp[4]
    assert comp[5] not in (comp[0], comp[3])


def test_dfs():
    g = VectorGraph.from_edges(4, [(0, 1), (0, 2), (2, 3)])
    order = dfs_order(g, 0)
    assert order[0] == 0 and set(order) == {0, 1, 2, 3}


def test_pagerank():
    # star graph: center should dominate
    g = VectorGraph.from_edges(5, [(0, i) for i in range(1, 5)])
    pr = np.asarray(pagerank(g))
    assert pr[0] == pytest.approx(pr.max())
    assert pr.sum() == pytest.approx(1.0, abs=1e-3)


def test_sssp():
    g = VectorGraph.from_edges(4, [(0, 1), (1, 2), (0, 3)],
                               weights=[1.0, 2.0, 10.0])
    d = np.asarray(shortest_path_lengths(g, 0))
    assert d.tolist() == [0.0, 1.0, 3.0, 10.0]


def test_community():
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = VectorGraph.from_edges(6, edges)
    lab = np.asarray(community_labels(g, iters=30))
    assert lab.shape == (6,)


# ---- vector ops ----

def test_vector_ops_basic(rng):
    x = rng.standard_normal((3, 8)).astype(np.float32)
    np.testing.assert_allclose(V.vector_normalize(x),
                               x / np.linalg.norm(x, axis=1, keepdims=True),
                               rtol=1e-5)
    np.testing.assert_allclose(V.vector_standardize(x).mean(axis=-1), 0,
                               atol=1e-5)
    assert V.vector_dims(x) == 8
    np.testing.assert_allclose(V.vector_percentile(x, 50), np.median(x, 1),
                               rtol=1e-5)


def test_lexicographic():
    a = np.array([1.0, 2.0, 3.0], np.float32)
    b = np.array([1.0, 2.5, 0.0], np.float32)
    assert bool(V.vector_lt(a, b))
    assert not bool(V.vector_lt(b, a))
    assert not bool(V.vector_lt(a, a))
    assert bool(V.vector_le(a, a))


def test_vector_hash(rng):
    x = rng.standard_normal((4, 8)).astype(np.float32)
    h1 = np.asarray(V.vector_hash(x))
    h2 = np.asarray(V.vector_hash(x))
    np.testing.assert_array_equal(h1, h2)
    assert len(np.unique(h1)) == 4


def test_cross_product():
    a = np.array([1.0, 0, 0], np.float32)
    b = np.array([0, 1.0, 0], np.float32)
    np.testing.assert_allclose(V.vector_cross_product(a, b), [0, 0, 1.0])


# ---- store ----

def test_store_add_search(rng):
    st = VectorStore(16)
    x = rng.standard_normal((100, 16)).astype(np.float32)
    ids = st.add(x)
    assert len(st) == 100
    d, got = st.search(x[7], k=1)
    assert got[0] == ids[7]


def test_store_delete_compact(rng):
    st = VectorStore(8)
    x = rng.standard_normal((50, 8)).astype(np.float32)
    ids = st.add(x)
    st.delete(ids[:10])
    assert len(st) == 40
    _, got = st.search(x[5], k=3)
    assert ids[5] not in got
    st.compact()
    assert len(st) == 40 and st.size == 40
    _, got2 = st.search(x[20], k=1)
    assert got2[0] == ids[20]


def test_store_growth(rng):
    st = VectorStore(4, capacity=1024)
    for _ in range(3):
        st.add(rng.standard_normal((600, 4)).astype(np.float32))
    assert len(st) == 1800
    assert st.capacity >= 1800


def test_store_dim_validation():
    with pytest.raises(ValueError):
        VectorStore(0)
    with pytest.raises(ValueError):
        VectorStore(100000)  # > max_dim 16000 (neurondb.h:113)
    st = VectorStore(4)
    with pytest.raises(ValueError):
        st.add(np.zeros((2, 5), np.float32))


# ---- config ----

def test_config_show_set_reset():
    cfg = NDBConfig()
    assert cfg.show("neurondb.hnsw_ef_search") == 64
    cfg.set("hnsw_ef_search", 128)
    assert cfg.hnsw_ef_search == 128
    cfg.reset("neurondb.hnsw_ef_search")
    assert cfg.hnsw_ef_search == 64
    with pytest.raises(AttributeError):
        cfg.show("not_a_guc")


def test_config_global():
    configure(ivf_nprobe=21)
    assert get_config().ivf_nprobe == 21
    get_config().reset("ivf_nprobe")
