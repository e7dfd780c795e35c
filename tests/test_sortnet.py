"""Bitonic sort-network oracle tests (ops/sortnet.py): the network must
reproduce np.sort exactly on floats and ints, co-permute payloads, and
the sorted-run merge must equal sorting the concatenation."""

import jax.numpy as jnp
import numpy as np
import pytest

from neurondb_tpu.ops import sortnet as SN


@pytest.mark.parametrize("width", [1, 2, 3, 8, 17, 64, 129, 256])
def test_sort_matches_numpy(rng, width):
    x = rng.standard_normal((16, width)).astype(np.float32)
    v, (i,) = SN.sort_with_payloads(
        jnp.asarray(x),
        (jnp.broadcast_to(jnp.arange(width), (16, width)),))
    np.testing.assert_array_equal(np.asarray(v), np.sort(x, axis=-1))
    # payload co-permutation: gathering by the returned positions
    # reproduces the sorted keys (ties make positions non-unique vs
    # argsort, but the permutation must still be key-consistent)
    np.testing.assert_array_equal(
        np.take_along_axis(x, np.asarray(i), axis=-1), np.asarray(v))


def test_sort_descending_and_int_keys(rng):
    x = rng.integers(-1000, 1000, (8, 37)).astype(np.int32)
    v, _ = SN.sort_with_payloads(jnp.asarray(x), ascending=False)
    np.testing.assert_array_equal(np.asarray(v), -np.sort(-x, axis=-1))


def test_sort_inf_fill_non_pow2(rng):
    # pad slots (width 100 -> 128) must land at the tail, not interleave
    x = rng.standard_normal((4, 100)).astype(np.float32)
    x[0, :50] = np.inf
    v, _ = SN.sort_with_payloads(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(v), np.sort(x, axis=-1))


@pytest.mark.parametrize("wa,wb", [(8, 8), (16, 48), (8, 24), (5, 9)])
def test_merge_sorted_runs(rng, wa, wb):
    a = np.sort(rng.standard_normal((8, wa)).astype(np.float32), axis=-1)
    b = np.sort(rng.standard_normal((8, wb)).astype(np.float32), axis=-1)
    ia = rng.integers(0, 100, (8, wa)).astype(np.int32)
    ib = rng.integers(0, 100, (8, wb)).astype(np.int32)
    v, (i,) = SN.merge_sorted_with_payloads(
        jnp.asarray(a), (jnp.asarray(ia),),
        jnp.asarray(b), (jnp.asarray(ib),))
    cat = np.concatenate([a, b], axis=-1)
    np.testing.assert_array_equal(np.asarray(v), np.sort(cat, axis=-1))
    # payloads travel with their keys (keys here are a.s. distinct)
    lut = {}
    for r in range(8):
        for c in range(wa):
            lut[(r, float(a[r, c]))] = ia[r, c]
        for c in range(wb):
            lut[(r, float(b[r, c]))] = ib[r, c]
        for c in range(v.shape[1]):
            assert lut[(r, float(v[r, c]))] == int(i[r, c])


def test_merge_out_width(rng):
    a = np.sort(rng.standard_normal((4, 16)).astype(np.float32), axis=-1)
    b = np.sort(rng.standard_normal((4, 16)).astype(np.float32), axis=-1)
    v, _ = SN.merge_sorted_with_payloads(jnp.asarray(a), (), jnp.asarray(b),
                                         (), out_width=10)
    cat = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
    np.testing.assert_array_equal(np.asarray(v), cat[:, :10])


def test_network_topk(rng):
    x = rng.standard_normal((8, 73)).astype(np.float32)
    v, i = SN.topk_smallest(jnp.asarray(x), 5)
    np.testing.assert_array_equal(np.asarray(v), np.sort(x, axis=-1)[:, :5])
    np.testing.assert_array_equal(
        np.take_along_axis(x, np.asarray(i), axis=-1), np.asarray(v))


def test_hnsw_net_paths_agree(rng, monkeypatch):
    """The bitonic-network beam merge (TPU default) and the top_k merge
    (CPU default) must return the same neighbors: build once, query with
    NDB_SORTNET forced each way (net is a static jit arg read per call,
    so flipping the env retraces)."""
    from neurondb_tpu.index import HNSWIndex
    x = rng.standard_normal((3000, 32)).astype(np.float32)
    q = rng.standard_normal((64, 32)).astype(np.float32)
    idx = HNSWIndex(x, m=8)
    # pin the visited strategy so only the merge path differs (the ring
    # visited set is a separate, intentionally-inexact strategy — see
    # test_ring_visited_matches_bitmap)
    monkeypatch.setenv("NDB_VISITED", "bitmap")
    monkeypatch.setenv("NDB_SORTNET", "0")
    d0, i0 = idx.search(q, k=10, ef=64)
    monkeypatch.setenv("NDB_SORTNET", "1")
    d1, i1 = idx.search(q, k=10, ef=64)
    # identical beams up to distance ties
    same = np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                    for a, b in zip(i0, i1)])
    assert same >= 0.99, same
    np.testing.assert_allclose(np.sort(d0, axis=1), np.sort(d1, axis=1),
                               rtol=1e-5, atol=1e-5)


def test_ring_visited_matches_bitmap(rng, monkeypatch):
    """The [B, W] expanded-id ring visited set (TPU query default) vs
    the packed bitmap: the ring may RE-CONSIDER a scored-but-evicted
    candidate (classic HNSW forbids re-scoring), so results need not be
    identical — but recall vs brute force must not degrade, and no
    duplicate ids may survive the post-merge dedupe."""
    from neurondb_tpu.index import HNSWIndex
    x = rng.standard_normal((4000, 24)).astype(np.float32)
    # plant exact duplicate vectors (cross-id distance ties stress the
    # all-pairs beam dedupe)
    x[100] = x[7]
    x[2000] = x[7]
    q = x[rng.integers(0, 4000, 64)] + \
        0.01 * rng.standard_normal((64, 24)).astype(np.float32)
    d2 = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d2, axis=1)[:, :10]
    idx = HNSWIndex(x, m=8, seed=0)
    monkeypatch.setenv("NDB_VISITED", "bitmap")
    _, ib = idx.search(q, k=10, ef=48)
    monkeypatch.setenv("NDB_VISITED", "ring")
    _, ir = idx.search(q, k=10, ef=48)

    def recall(ids):
        return np.mean([len(set(a) & set(b)) / 10 for a, b in zip(ids, gt)])

    rb, rr = recall(ib), recall(ir)
    assert rr >= rb - 0.02, (rr, rb)
    # no duplicate ids within any row (the -1 pad may repeat)
    for row in ir:
        live = row[row >= 0]
        assert len(set(live.tolist())) == len(live), row
