"""Index tuning heuristics + validators."""

import numpy as np
import pytest

from neurondb_tpu.index import HNSWIndex, IVFFlatIndex
from neurondb_tpu.index.tuning import (QueryPatternAnalyzer,
                                       recommend_hnsw_params,
                                       recommend_ivf_params,
                                       select_index_kind)
from neurondb_tpu.index.validate import validate_index


def test_param_recommendations():
    h = recommend_hnsw_params(1_000_000, 128, target_recall=0.95)
    assert h["m"] == 16 and h["ef_construction"] == 200
    h99 = recommend_hnsw_params(1_000_000, 128, target_recall=0.99)
    assert h99["m"] > h["m"]
    iv = recommend_ivf_params(1_000_000)
    assert 1000 <= iv["nlists"] <= 8192
    assert iv["nprobe"] >= 1


def test_index_selection():
    assert select_index_kind(1000, 128) == "flat"
    assert select_index_kind(10_000_000, 128, batch_queries=True) == "ivfflat"
    assert select_index_kind(1_000_000, 128, batch_queries=False,
                             write_heavy=False) == "hnsw"
    assert select_index_kind(10_000_000, 768,
                             memory_budget_bytes=10**9) == "pq"


def test_query_pattern_analyzer():
    qa = QueryPatternAnalyzer()
    assert qa.summary()["observations"] == 0
    for _ in range(50):
        qa.observe(k=10, batch_size=256, latency_s=0.01)
    s = qa.summary()
    assert s["k_p50"] == 10
    sug = qa.suggest(1_000_000, 128)
    assert sug["index"] == "ivfflat"
    assert "nlists" in sug


@pytest.fixture(scope="module")
def corpus(rng):
    return rng.standard_normal((1500, 16)).astype(np.float32)


def test_validate_hnsw(corpus):
    idx = HNSWIndex(corpus, m=8, ef_construction=40, seed=0, wave=512)
    rep = validate_index(idx)
    assert rep["valid"], rep
    conn = [c for c in rep["checks"]
            if c["check"] == "connectivity_from_entry"][0]
    assert conn["reachable_fraction"] > 0.99


def test_validate_ivf(corpus):
    idx = IVFFlatIndex(corpus, nlists=16, seed=0)
    rep = validate_index(idx)
    assert rep["valid"], rep


def test_validate_detects_corruption(corpus):
    idx = HNSWIndex(corpus[:500], m=8, ef_construction=40, seed=0, wave=256)
    import jax.numpy as jnp
    # corrupt: out-of-range neighbor ids
    idx._nbr0 = idx._nbr0.at[5, 0].set(10_000_000)
    rep = validate_index(idx)
    assert not rep["valid"]
