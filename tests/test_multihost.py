"""Multi-host (dcn x ici) sharding on the virtual 8-device CPU mesh as
2 hosts x 4 chips (SURVEY §5 DCN story, BASELINE config #5)."""

import numpy as np
import pytest

from neurondb_tpu.index import FlatIndex
from neurondb_tpu.parallel import (MultiHostFlatIndex, MultiHostIVFIndex,
                                   kmeans_fit_2d, make_mesh_2d)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh_2d(2, 4)


@pytest.fixture(scope="module")
def corpus(rng_mod):
    rng = rng_mod
    centers = rng.standard_normal((32, 24)).astype(np.float32)
    lab = rng.integers(0, 32, 5000)
    return (centers[lab]
            + 0.1 * rng.standard_normal((5000, 24)).astype(np.float32))


def test_mesh_axes(mesh):
    assert mesh.shape["dcn"] == 2 and mesh.shape["ici"] == 4


def test_flat_2d_matches_single_device(mesh, corpus, rng):
    q = corpus[:32] + 0.01
    idx = MultiHostFlatIndex(corpus, mesh=mesh)
    flat = FlatIndex(corpus)
    d2, i2 = idx.search(q, k=10)
    d1, i1 = flat.search(q, k=10)
    assert (i2 == i1).mean() > 0.99
    # sqrt amplifies GEMM-expansion cancellation noise near zero
    np.testing.assert_allclose(d2, d1, rtol=1e-3, atol=2e-3)


def test_flat_2d_uneven_rows(mesh, rng):
    # N not divisible by 8: padding rows must never be returned
    x = rng.standard_normal((1003, 16)).astype(np.float32)
    idx = MultiHostFlatIndex(x, mesh=mesh)
    d, ids = idx.search(x[:5], k=3)
    assert (ids[:, 0] == np.arange(5)).all()
    assert ids.max() < 1003


def test_kmeans_2d_converges(mesh, corpus):
    import jax, jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    xp = corpus[: (len(corpus) // 8) * 8]
    xs = jax.device_put(jnp.asarray(xp), NamedSharding(mesh, P(("dcn", "ici"))))
    c = np.asarray(kmeans_fit_2d(mesh, xs, 32, seed=0))
    # every point should be close to some centroid
    d = ((xp[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    assert float(np.sqrt(d.min(1)).mean()) < 1.0


def test_ivf_2d_streaming_build_and_recall(mesh, corpus):
    chunks = [corpus[i:i + 1250] for i in range(0, 5000, 1250)]
    idx = MultiHostIVFIndex.from_chunks(chunks, nlists=32, mesh=mesh,
                                        sample_cap=2000)
    assert idx.n == 5000
    q = corpus[:64] + 0.01
    flat = FlatIndex(corpus)
    _, gt = flat.search(q, k=10)
    _, ids = idx.search(q, k=10, nprobe=8)
    recall = (np.asarray([len(set(a) & set(b)) for a, b in zip(ids, gt)])
              / 10.0).mean()
    assert recall > 0.9, recall


def test_ivf_2d_external_int64_ids(mesh, corpus):
    idx = MultiHostIVFIndex.from_chunks([corpus[:2000]], nlists=16,
                                        mesh=mesh, sample_cap=1000)
    big = np.arange(2000, dtype=np.int64) + (1 << 40)
    idx.finalize(ids=big)
    _, ids = idx.search(corpus[:4] + 0.001, k=3, nprobe=8)
    assert (ids[:, 0] == big[:4]).all()


def test_ivf_2d_factory_streaming_matches_buffered(mesh, corpus):
    """The chunk-FACTORY path (bounded host memory: per-shard passes +
    make_array_from_single_device_arrays) must produce the same search
    results as the buffered path."""
    chunks = [corpus[i:i + 1250] for i in range(0, 5000, 1250)]
    buf = MultiHostIVFIndex.from_chunks(list(chunks), nlists=32,
                                        mesh=mesh, sample_cap=2000)
    stream = MultiHostIVFIndex.from_chunks(
        lambda: iter([c.copy() for c in chunks]), nlists=32,
        mesh=mesh, sample_cap=2000)
    assert stream.n == 5000
    q = corpus[:32] + 0.01
    db, ib = buf.search(q, k=10, nprobe=8)
    ds, is_ = stream.search(q, k=10, nprobe=8)
    # same centroids (same seed/sample) -> identical assignments; the
    # layouts differ only in rank bookkeeping, results must agree
    assert (ib == is_).mean() > 0.98
    np.testing.assert_allclose(np.sort(db, axis=1), np.sort(ds, axis=1),
                               rtol=1e-4, atol=1e-4)
