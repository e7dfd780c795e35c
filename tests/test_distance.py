"""Distance kernels vs NumPy oracles (SURVEY.md §4 test tier (a))."""

import numpy as np
import pytest

import jax.numpy as jnp

from neurondb_tpu.ops import distance as D


@pytest.fixture(scope="module")
def data(rng_mod):
    rng = rng_mod
    x = rng.standard_normal((8, 32)).astype(np.float32)
    y = rng.standard_normal((8, 32)).astype(np.float32)
    return x, y


def test_l2(data):
    x, y = data
    ref = np.linalg.norm(x - y, axis=1)
    np.testing.assert_allclose(D.l2_distance(x, y), ref, rtol=1e-5)


def test_squared_l2(data):
    x, y = data
    ref = np.sum((x - y) ** 2, axis=1)
    np.testing.assert_allclose(D.squared_l2_distance(x, y), ref, rtol=1e-5)


def test_cosine(data):
    x, y = data
    ref = 1 - np.sum(x * y, 1) / (np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1))
    np.testing.assert_allclose(D.cosine_distance(x, y), ref, rtol=1e-4, atol=1e-6)


def test_cosine_zero_vector():
    x = np.zeros((1, 8), np.float32)
    y = np.ones((1, 8), np.float32)
    # zero vectors -> similarity 0 -> distance 1 (reference guards zero norm)
    np.testing.assert_allclose(D.cosine_distance(x, y), [1.0])


def test_inner_product(data):
    x, y = data
    np.testing.assert_allclose(D.inner_product_distance(x, y),
                               -np.sum(x * y, 1), rtol=1e-5)


def test_l1(data):
    x, y = data
    np.testing.assert_allclose(D.l1_distance(x, y),
                               np.abs(x - y).sum(1), rtol=1e-5)


def test_chebyshev(data):
    x, y = data
    np.testing.assert_allclose(D.chebyshev_distance(x, y),
                               np.abs(x - y).max(1), rtol=1e-5)


def test_minkowski(data):
    x, y = data
    p = 3.0
    ref = (np.abs(x - y) ** p).sum(1) ** (1 / p)
    np.testing.assert_allclose(D.minkowski_distance(x, y, p), ref, rtol=1e-4)


def test_hamming_packed():
    x = np.array([[0b10110010, 0b00000001]], np.uint8)
    y = np.array([[0b10010010, 0b00000000]], np.uint8)
    assert int(D.hamming_distance(x, y)[0]) == 2


def test_jaccard():
    x = np.array([[1.0, 0.0, 1.0, 1.0]], np.float32)
    y = np.array([[1.0, 1.0, 0.0, 1.0]], np.float32)
    np.testing.assert_allclose(D.jaccard_distance(x, y), [1 - 2 / 4])


def test_mahalanobis():
    vi = np.eye(4, dtype=np.float32)
    x = np.array([[1.0, 0, 0, 0]], np.float32)
    y = np.zeros((1, 4), np.float32)
    np.testing.assert_allclose(D.mahalanobis_distance(x, y, vi), [1.0])


@pytest.mark.parametrize("metric", ["l2", "sqeuclidean", "cosine", "ip", "l1",
                                    "chebyshev"])
def test_pairwise_matches_pairform(rng, metric):
    q = rng.standard_normal((5, 16)).astype(np.float32)
    x = rng.standard_normal((7, 16)).astype(np.float32)
    got = np.asarray(D.pairwise_distance(jnp.asarray(q), jnp.asarray(x), metric))
    fn = {"l2": D.l2_distance, "sqeuclidean": D.squared_l2_distance,
          "cosine": D.cosine_distance, "ip": D.inner_product_distance,
          "l1": D.l1_distance, "chebyshev": D.chebyshev_distance}[metric]
    ref = np.stack([np.asarray(fn(np.broadcast_to(qq, x.shape), x))
                    for qq in q])
    # GEMM expansion of L2 carries ~1e-3 relative cancellation error vs the
    # subtract-then-square oracle; ranking-equivalent.
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-3)


def test_operator_aliases():
    assert D.canonical_metric("<->") == "l2"
    assert D.canonical_metric("<=>") == "cosine"
    assert D.canonical_metric("<#>") == "ip"
    assert D.canonical_metric("<+>") == "l1"
    with pytest.raises(ValueError):
        D.canonical_metric("nope")


def test_pairwise_dot_dtype_bf16_ranking(rng):
    """dot_dtype=bfloat16 (the bf16-store GEMM contract: products of
    bf16 inputs are exact in f32) must preserve neighbor ranking vs the
    f32 path on bf16-representable inputs."""
    import jax.numpy as jnp
    from neurondb_tpu.ops import distance as D

    q = rng.standard_normal((8, 64)).astype(np.float32)
    x = rng.standard_normal((500, 64)).astype(np.float32)
    # make inputs bf16-representable so both paths see the same values
    q = np.asarray(jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32))
    x = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    for metric in ("l2", "ip", "cosine"):
        d32 = np.asarray(D.pairwise_distance(jnp.asarray(q), jnp.asarray(x),
                                             metric))
        dbf = np.asarray(D.pairwise_distance(jnp.asarray(q), jnp.asarray(x),
                                             metric, dot_dtype=jnp.bfloat16))
        np.testing.assert_allclose(dbf, d32, rtol=2e-3, atol=2e-3)
        assert np.array_equal(np.argsort(d32, axis=1)[:, :10],
                              np.argsort(dbf, axis=1)[:, :10])
