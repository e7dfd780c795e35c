"""RRI (rerank-ready) and CQ (consistent query) specialty index variants
(index_rerank.c, index_consistent.c behaviors)."""

import numpy as np
import pytest

from neurondb_tpu.index import ConsistentIndex, RerankReadyIndex


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    return rng.standard_normal((2000, 32)).astype(np.float32)


def test_rri_cache_hit_no_device_roundtrip(corpus):
    idx = RerankReadyIndex(corpus, k=16)
    q = corpus[5] + 0.01
    d1, i1, v1 = idx.get_candidates(q)
    assert idx.misses == 1 and idx.hits == 0
    d2, i2, v2 = idx.get_candidates(q)
    assert idx.hits == 1
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(d1, d2)
    # candidate vectors come from the cache-backed store
    np.testing.assert_allclose(v1[0], corpus[i1[0]], rtol=1e-6)


def test_rri_warm_bulk(corpus):
    idx = RerankReadyIndex(corpus, k=8)
    hot = corpus[:32] + 0.005
    added = idx.warm(hot)
    assert added == 32
    _ = idx.get_candidates(hot[3])
    assert idx.hits == 1 and idx.misses == 0


def test_rri_search_matches_exact(corpus):
    from neurondb_tpu.index import FlatIndex
    idx = RerankReadyIndex(corpus, k=16)
    flat = FlatIndex(corpus)
    q = corpus[:8] + 0.01
    _, ids_r = idx.search(q, k=5)
    _, ids_f = flat.search(q, k=5)
    assert (ids_r == ids_f).mean() > 0.95


def test_rri_cache_cap(corpus):
    idx = RerankReadyIndex(corpus, k=4, max_cached=2)
    for i in range(5):
        idx.get_candidates(corpus[i])
    assert idx.stats()["cached"] <= 2


def test_cq_snapshot_isolation(corpus):
    idx = ConsistentIndex(corpus[:1000])
    q = corpus[3] + 0.01
    vid = idx.pin()
    d0, i0 = idx.search(q, k=5, snapshot=vid)
    # mutate after pin: add rows closer to q and delete the old best
    idx.add(np.tile(q, (4, 1)), ids=[9001, 9002, 9003, 9004])
    idx.delete([int(i0[0])])
    d1, i1 = idx.search(q, k=5, snapshot=vid)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(d0, d1)
    # unpinned search sees the new state
    _, i2 = idx.search(q, k=5)
    assert int(i2[0]) in (9001, 9002, 9003, 9004)
    assert int(i0[0]) not in i2


def test_cq_deterministic_tie_break():
    # four identical vectors: ties MUST come back ordered by id ASC
    x = np.ones((6, 8), np.float32)
    x[4:] = 2.0
    idx = ConsistentIndex(x, ids=[42, 7, 19, 3, 100, 101])
    _, ids = idx.search(np.ones(8, np.float32), k=4)
    assert list(ids) == [3, 7, 19, 42]


def test_cq_replica_identical_results(corpus):
    a = ConsistentIndex(corpus, seed=1)
    b = ConsistentIndex(corpus, seed=1)
    q = corpus[:16] + 0.02
    da, ia = a.search(q, k=10)
    db, ib = b.search(q, k=10)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_array_equal(da, db)


def test_cq_release_and_errors(corpus):
    idx = ConsistentIndex(corpus[:100])
    vid = idx.pin()
    idx.release(vid)
    with pytest.raises(KeyError):
        idx.search(corpus[0], k=3, snapshot=vid)
