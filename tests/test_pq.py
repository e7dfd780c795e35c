"""PQ/OPQ: codebooks, encode/decode, ADC, index recall."""

import numpy as np
import pytest

import jax.numpy as jnp

from neurondb_tpu.index.pq import (PQIndex, pq_asymmetric_distance, pq_decode,
                                   pq_encode, train_opq_rotation,
                                   train_pq_codebook)
from neurondb_tpu.index import FlatIndex


@pytest.fixture(scope="module")
def corpus(rng_mod):
    rng = rng_mod
    centers = rng.standard_normal((16, 32)).astype(np.float32) * 3
    return np.concatenate([
        c + 0.5 * rng.standard_normal((150, 32)).astype(np.float32)
        for c in centers])


def test_pq_roundtrip(corpus):
    x = jnp.asarray(corpus)
    cb = train_pq_codebook(x, n_sub=8, ksub=64)
    assert cb.shape == (8, 64, 4)
    codes = pq_encode(cb, x)
    assert codes.shape == (corpus.shape[0], 8)
    rec = pq_decode(cb, codes)
    rel = float(jnp.mean((rec - x) ** 2) / jnp.mean(x * x))
    assert rel < 0.1  # clustered data compresses well


def test_adc_matches_decode_identity(corpus):
    x = jnp.asarray(corpus[:200])
    q = jnp.asarray(corpus[:5])
    cb = train_pq_codebook(x, n_sub=4, ksub=32)
    codes = pq_encode(cb, x)
    adc = np.asarray(pq_asymmetric_distance(cb, q, codes))
    rec = pq_decode(cb, codes)
    ref = np.asarray(jnp.sum((q[:, None, :] - rec[None, :, :]) ** 2, -1))
    np.testing.assert_allclose(adc, ref, rtol=1e-3, atol=1e-2)


def test_pq_index_recall(corpus, rng):
    q = corpus[rng.choice(len(corpus), 20, replace=False)]
    idx = PQIndex(corpus, n_sub=8, ksub=64, seed=0)
    flat = FlatIndex(corpus)
    _, ref = flat.search(q, k=10)
    _, got = idx.search(q, k=10)
    hits = sum(len(set(a.tolist()) & set(b.tolist()))
               for a, b in zip(got, ref))
    # compressed-only scan: tight clusters collide codes, so coarse recall
    # is modest by construction — the rerank path below is the contract
    assert hits / ref.size > 0.3
    # with exact rerank it should be near-perfect
    idx2 = PQIndex(corpus, n_sub=8, ksub=64, keep_originals=True, seed=0)
    _, got2 = idx2.search(q, k=10, rerank=20)
    hits2 = sum(len(set(a.tolist()) & set(b.tolist()))
                for a, b in zip(got2, ref))
    assert hits2 / ref.size > 0.9


def test_pq_compression(corpus):
    idx = PQIndex(corpus, n_sub=8, ksub=64)
    assert idx.code_bytes == corpus.shape[0] * 8  # 16x vs f32 at D=32


def test_opq_improves_or_matches(rng):
    # anisotropic data: OPQ's rotation should help subspace balance
    base = rng.standard_normal((1500, 16)).astype(np.float32)
    mix = rng.standard_normal((16, 16)).astype(np.float32)
    x = base @ mix  # correlated dims
    xj = jnp.asarray(x)
    cb = train_pq_codebook(xj, n_sub=4, ksub=32)
    err_pq = float(jnp.mean((pq_decode(cb, pq_encode(cb, xj)) - xj) ** 2))
    R, cbr = train_opq_rotation(xj, n_sub=4, ksub=32, opq_iters=4)
    xr = xj @ R
    err_opq = float(jnp.mean((pq_decode(cbr, pq_encode(cbr, xr)) - xr) ** 2))
    assert err_opq <= err_pq * 1.05


def test_opq_rotation_orthogonal(rng):
    x = jnp.asarray(rng.standard_normal((800, 16)).astype(np.float32))
    R, _ = train_opq_rotation(x, n_sub=4, ksub=16, opq_iters=2)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(16), atol=1e-4)


def test_pq_save_load(tmp_path, corpus, rng):
    q = corpus[:5]
    idx = PQIndex(corpus, n_sub=8, ksub=64, seed=0)
    d1, i1 = idx.search(q, k=5)
    idx.save(str(tmp_path / "pq"))
    idx2 = PQIndex.load(str(tmp_path / "pq"))
    d2, i2 = idx2.search(q, k=5)
    np.testing.assert_array_equal(i1, i2)


def test_pq_rerank_without_originals_raises(corpus):
    idx = PQIndex(corpus, n_sub=8, ksub=64, seed=0)
    with pytest.raises(ValueError, match="keep_originals"):
        idx.search(corpus[:2], k=5, rerank=4)
