"""Top-k selection + chunked k-NN vs brute-force NumPy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from neurondb_tpu.ops import topk as TK
from neurondb_tpu.ops import distance as D


def test_topk_smallest(rng):
    x = rng.standard_normal((4, 100)).astype(np.float32)
    v, i = TK.topk_smallest(jnp.asarray(x), 5)
    ref = np.sort(x, axis=1)[:, :5]
    np.testing.assert_allclose(v, ref, rtol=1e-6)
    np.testing.assert_array_equal(np.take_along_axis(x, np.asarray(i), 1), ref)


def test_merge_topk(rng):
    a = rng.standard_normal((3, 6)).astype(np.float32)
    b = rng.standard_normal((3, 6)).astype(np.float32)
    av, ai = TK.topk_smallest(jnp.asarray(a), 4)
    bv, bi = TK.topk_smallest(jnp.asarray(b), 4)
    mv, mi = TK.merge_topk(av, ai, bv, bi + 100, 4)
    both = np.concatenate([a, b], axis=1)
    np.testing.assert_allclose(mv, np.sort(both, axis=1)[:, :4], rtol=1e-6)
    assert np.all((np.asarray(mi) < 6) | (np.asarray(mi) >= 100))


@pytest.mark.parametrize("metric", ["l2", "cosine", "ip"])
def test_chunked_knn_exact(rng, metric):
    q = rng.standard_normal((9, 24)).astype(np.float32)
    x = rng.standard_normal((333, 24)).astype(np.float32)
    dists, ids = TK.chunked_knn(jnp.asarray(q), jnp.asarray(x), 7,
                                metric=metric, chunk=64)
    full = np.asarray(D.pairwise_distance(jnp.asarray(q), jnp.asarray(x), metric))
    ref_ids = np.argsort(full, axis=1, kind="stable")[:, :7]
    ref_d = np.take_along_axis(full, ref_ids, 1)
    np.testing.assert_allclose(dists, ref_d, rtol=1e-4, atol=1e-5)
    # ids may differ on exact ties only
    got_d = np.take_along_axis(full, np.asarray(ids), 1)
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-4, atol=1e-5)


def test_chunked_knn_tombstones(rng):
    x = rng.standard_normal((50, 8)).astype(np.float32)
    q = x[:3]  # exact matches exist
    valid = np.ones(50, bool)
    valid[:3] = False  # tombstone the exact matches
    d, ids = TK.chunked_knn(jnp.asarray(q), jnp.asarray(x), 5,
                            chunk=16, valid=jnp.asarray(valid))
    assert not np.any(np.isin(np.asarray(ids), [0, 1, 2]))
    assert np.all(np.asarray(d) > 0)


def test_chunked_knn_k_larger_than_n(rng):
    x = rng.standard_normal((5, 8)).astype(np.float32)
    q = rng.standard_normal((2, 8)).astype(np.float32)
    d, ids = TK.chunked_knn(jnp.asarray(q), jnp.asarray(x), 5, chunk=16)
    assert d.shape == (2, 5)
    assert np.all(np.asarray(ids) >= 0)
