"""IVF-PQ: compressed posting lists with on-the-fly residual decode."""

import numpy as np
import pytest

from neurondb_tpu.index import FlatIndex, IVFPQIndex


@pytest.fixture(scope="module")
def corpus(rng):
    centers = rng.standard_normal((64, 64)).astype(np.float32)
    lab = rng.integers(0, 64, 20000)
    return centers[lab] + 0.25 * rng.standard_normal(
        (20000, 64)).astype(np.float32)


@pytest.fixture(scope="module")
def queries(corpus, rng):
    q = corpus[rng.choice(len(corpus), 128, replace=False)]
    return q + 0.02 * rng.standard_normal(q.shape).astype(np.float32)


def recall(ids, gt):
    return np.mean([len(set(a) & set(b)) / gt.shape[1]
                    for a, b in zip(ids, gt)])


def test_ivfpq_recall_l2(corpus, queries):
    _, gt = FlatIndex(corpus).search(queries, k=10)
    idx = IVFPQIndex(corpus, nlists=64, n_sub=16, seed=0)
    _, ids = idx.search(queries, k=10, nprobe=16)
    assert recall(ids, gt) > 0.6          # coarse ADC on residuals
    assert idx.stats()["compression"] == 16.0


def test_ivfpq_rerank_recovers_exact(corpus, queries):
    _, gt = FlatIndex(corpus).search(queries, k=10)
    idx = IVFPQIndex(corpus, nlists=64, n_sub=16, seed=0,
                     keep_originals=True)
    _, ids = idx.search(queries, k=10, nprobe=16, rerank=8)
    assert recall(ids, gt) > 0.95


def test_ivfpq_ip_and_cosine(corpus, queries):
    for metric in ("ip", "cosine"):
        _, gt = FlatIndex(corpus, metric=metric).search(queries, k=10)
        idx = IVFPQIndex(corpus, nlists=64, n_sub=16, metric=metric,
                         seed=0, keep_originals=True)
        _, ids = idx.search(queries, k=10, nprobe=16, rerank=8)
        assert recall(ids, gt) > 0.9, metric


def test_ivfpq_delete(corpus, queries):
    idx = IVFPQIndex(corpus, nlists=64, n_sub=16, seed=0)
    _, before = idx.search(queries, k=10, nprobe=16)
    victims = np.unique(before[before >= 0])[:50]
    removed = idx.delete(victims)
    assert removed == len(victims)
    _, after = idx.search(queries, k=10, nprobe=16)
    assert not np.isin(after, victims).any()


def test_ivfpq_rerank_without_originals_raises(corpus):
    idx = IVFPQIndex(corpus[:2000], nlists=16, n_sub=16, seed=0)
    with pytest.raises(ValueError, match="keep_originals"):
        idx.search(corpus[:2], k=5, rerank=4)


def test_ivfpq_save_load(tmp_path, corpus, queries):
    idx = IVFPQIndex(corpus[:5000], nlists=32, n_sub=16, seed=0)
    d0, i0 = idx.search(queries, k=5, nprobe=8)
    idx.save(str(tmp_path / "ivfpq"))
    back = IVFPQIndex.load(str(tmp_path / "ivfpq"))
    d1, i1 = back.search(queries, k=5, nprobe=8)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-5)


def test_ivfpq_dim_validation():
    with pytest.raises(ValueError, match="divisible"):
        IVFPQIndex(np.zeros((10, 50), np.float32), nlists=2, n_sub=16)
