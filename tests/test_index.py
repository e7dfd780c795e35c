"""Index recall tests vs brute-force ground truth (SURVEY.md §4 tier (b))."""

import numpy as np
import pytest

import jax.numpy as jnp

from neurondb_tpu.index import FlatIndex, IVFFlatIndex, HNSWIndex
from neurondb_tpu.index.flat import QuantizedFlatIndex
from neurondb_tpu.ops import distance as D


def brute_force(q, x, k, metric):
    full = np.asarray(D.pairwise_distance(jnp.asarray(q), jnp.asarray(x), metric))
    ids = np.argsort(full, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(full, ids, 1), ids


def recall_at_k(got_ids, true_ids):
    hits = sum(len(set(g.tolist()) & set(t.tolist()))
               for g, t in zip(got_ids, true_ids))
    return hits / true_ids.size


@pytest.fixture(scope="module")
def corpus(rng_mod):
    rng = rng_mod
    # clustered data so IVF/HNSW have structure to exploit
    centers = rng.standard_normal((20, 32)).astype(np.float32) * 4
    x = np.concatenate([
        c + rng.standard_normal((200, 32)).astype(np.float32)
        for c in centers])
    q = x[rng.choice(len(x), 30, replace=False)] + \
        0.1 * rng.standard_normal((30, 32)).astype(np.float32)
    return x, q


@pytest.mark.parametrize("metric", ["l2", "cosine", "ip"])
def test_flat_exact(corpus, metric):
    x, q = corpus
    idx = FlatIndex(x, metric=metric)
    d, ids = idx.search(q, k=10)
    td, tids = brute_force(q, x, 10, metric)
    assert recall_at_k(ids, tids) > 0.99
    np.testing.assert_allclose(d, td, rtol=1e-3, atol=1e-4)


def test_flat_single_query(corpus):
    x, _ = corpus
    idx = FlatIndex(x)
    d, ids = idx.search(x[5], k=1)
    assert ids[0] == 5
    # self-distance via the GEMM expansion carries sqrt(cancellation)
    # noise of ~1e-2 at these norms; ranking (ids[0]==5) is the contract
    assert d[0] < 0.05


def test_flat_custom_ids(corpus):
    x, q = corpus
    ids_in = np.arange(len(x)) * 7 + 1000
    idx = FlatIndex(x, ids=ids_in)
    _, ids = idx.search(q[:2], k=3)
    assert np.all(np.isin(ids, ids_in))


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_ivf_recall(corpus, metric):
    x, q = corpus
    idx = IVFFlatIndex(x, nlists=32, metric=metric, seed=0)
    _, tids = brute_force(q, x, 10, metric)
    _, ids = idx.search(q, k=10, nprobe=8)
    assert recall_at_k(ids, tids) > 0.9
    # more probes -> exact
    _, ids_all = idx.search(q, k=10, nprobe=32)
    assert recall_at_k(ids_all, tids) > 0.99


def test_ivf_distances_correct(corpus):
    x, q = corpus
    idx = IVFFlatIndex(x, nlists=16, seed=0)
    d, ids = idx.search(q, k=5, nprobe=16)
    td, _ = brute_force(q, x, 5, "l2")
    np.testing.assert_allclose(d, td, rtol=1e-3, atol=1e-4)


def test_ivf_add_spill(corpus, rng):
    x, q = corpus
    idx = IVFFlatIndex(x[:1000], nlists=16, seed=0)
    idx.add(x[1000:1100])
    _, ids = idx.search(x[1050], k=1, nprobe=16)
    assert ids[0] == 1050
    idx.rebuild_lists()
    assert not idx._spill
    _, ids = idx.search(x[1050], k=1, nprobe=16)
    assert ids[0] == 1050


def test_ivf_stats(corpus):
    x, _ = corpus
    idx = IVFFlatIndex(x, nlists=16, seed=0)
    s = idx.stats()
    assert s["n"] == len(x)
    assert s["list_len_max"] >= s["list_len_mean"]


def test_ivf_save_load(tmp_path, corpus):
    x, q = corpus
    idx = IVFFlatIndex(x, nlists=16, seed=0)
    d1, i1 = idx.search(q, k=5, nprobe=4)
    idx.save(str(tmp_path / "ivf"))
    idx2 = IVFFlatIndex.load(str(tmp_path / "ivf"))
    d2, i2 = idx2.search(q, k=5, nprobe=4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, rtol=1e-5)


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_hnsw_recall(corpus, metric):
    x, q = corpus
    idx = HNSWIndex(x, m=8, ef_construction=60, metric=metric, seed=0,
                    wave=512)
    _, tids = brute_force(q, x, 10, metric)
    _, ids = idx.search(q, k=10, ef=80)
    assert recall_at_k(ids, tids) > 0.85


def test_hnsw_distances(corpus):
    x, q = corpus
    idx = HNSWIndex(x, m=8, ef_construction=60, seed=0, wave=512)
    d, ids = idx.search(q[:5], k=3, ef=100)
    # reported distances must be true metric distances of returned ids
    for b in range(5):
        for j in range(3):
            if ids[b, j] >= 0:
                true = np.linalg.norm(q[b] - x[ids[b, j]])
                np.testing.assert_allclose(d[b, j], true, rtol=1e-3, atol=1e-4)


def test_hnsw_self_query(corpus):
    x, _ = corpus
    idx = HNSWIndex(x[:500], m=8, ef_construction=60, seed=0, wave=256)
    d, ids = idx.search(x[:20], k=1, ef=60)
    assert (ids[:, 0] == np.arange(20)).mean() > 0.9


def test_hnsw_incremental_add(corpus):
    x, _ = corpus
    idx = HNSWIndex(x[:300], m=8, ef_construction=60, seed=0, wave=128)
    idx.add(x[300:600])
    assert idx.n == 600
    d, ids = idx.search(x[450], k=1, ef=80)
    assert ids[0] == 450


def test_hnsw_save_load(tmp_path, corpus):
    x, q = corpus
    idx = HNSWIndex(x[:800], m=8, ef_construction=60, seed=0, wave=512)
    d1, i1 = idx.search(q, k=5)
    idx.save(str(tmp_path / "hnsw"))
    idx2 = HNSWIndex.load(str(tmp_path / "hnsw"))
    d2, i2 = idx2.search(q, k=5)
    np.testing.assert_array_equal(i1, i2)


def test_hnsw_stats(corpus):
    x, _ = corpus
    idx = HNSWIndex(x[:500], m=8, ef_construction=40, seed=0, wave=256)
    s = idx.stats()
    assert s["n"] == 500
    assert s["isolated_nodes"] <= 1  # entry node of an empty graph may be isolated


@pytest.mark.parametrize("fmt,min_recall", [
    ("int8", 0.95), ("f16", 0.99), ("binary", 0.5)])
def test_quantized_flat_rerank(corpus, fmt, min_recall):
    x, q = corpus
    idx = QuantizedFlatIndex(x, fmt=fmt, metric="l2")
    _, tids = brute_force(q, x, 10, "l2")
    _, ids = idx.search(q, k=10, rerank=8)
    assert recall_at_k(ids, tids) >= min_recall


def test_bf16_store_checkpoint_roundtrip(tmp_path, rng):
    """TPU-resident stores are bf16; npz cannot round-trip ml_dtypes
    (raw V2 void on save). Regression for the device-save path."""
    import jax.numpy as jnp
    from neurondb_tpu.index import HNSWIndex
    x = rng.standard_normal((512, 16)).astype(np.float32)
    idx = HNSWIndex(x, m=8)
    idx._vecs = idx._vecs.astype(jnp.bfloat16)     # what TPU builds hold
    idx.save(str(tmp_path / "bf16idx"))
    back = HNSWIndex.load(str(tmp_path / "bf16idx"))
    _, ids = back.search(x[:16] + 1e-3, k=5, ef=64)
    assert (ids[:, 0] == np.arange(16)).mean() > 0.9


def test_legacy_void_bf16_checkpoint_loads(tmp_path, rng):
    """Checkpoints written before the dtype fix hold raw bf16 bytes as
    void V2 — the loader must still rescue them."""
    import ml_dtypes
    from neurondb_tpu.index import FlatIndex
    x = rng.standard_normal((256, 8)).astype(np.float32)
    idx = FlatIndex(x)
    idx.save(str(tmp_path / "legacy"))
    import numpy as _np
    data = dict(_np.load(str(tmp_path / "legacy/arrays.npz")))
    data["vecs"] = data["vecs"].astype(ml_dtypes.bfloat16).view("V2")
    _np.savez_compressed(str(tmp_path / "legacy/arrays.npz"), **data)
    back = FlatIndex.load(str(tmp_path / "legacy"))
    _, ids = back.search(x[:8], k=3)
    assert (ids[:, 0] == np.arange(8)).all()


def test_ivf_device_vectors_parity(corpus):
    """device_vectors (pre-uploaded corpus, r5 HNSW-build transfer fix)
    must produce the same index as the host-array constructor: same
    centroids (same seed/sample), same list assignment, same search."""
    x, q = corpus
    a = IVFFlatIndex(x, nlists=32, metric="l2", seed=0)
    b = IVFFlatIndex(x, nlists=32, metric="l2", seed=0,
                     device_vectors=jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(a.centroids),
                               np.asarray(b.centroids), rtol=1e-5,
                               atol=1e-5)
    da, ia = a.search(q, k=10, nprobe=8)
    db, ib = b.search(q, k=10, nprobe=8)
    assert (ia == ib).mean() > 0.99      # MXU nondeterminism tolerance
    np.testing.assert_allclose(da, db, rtol=1e-4, atol=1e-4)


def test_ivf_device_vectors_spherical(corpus):
    """cosine: device_vectors arrives pre-normalized (the HNSW caller
    normalizes before upload) — search results must match the host path."""
    x, q = corpus
    xs = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    a = IVFFlatIndex(x, nlists=32, metric="cosine", seed=0)
    b = IVFFlatIndex(x, nlists=32, metric="cosine", seed=0,
                     device_vectors=jnp.asarray(xs))
    _, ia = a.search(q, k=10, nprobe=32)
    _, ib = b.search(q, k=10, nprobe=32)
    assert (ia == ib).mean() > 0.99
