"""Multi-chip sharding on the virtual 8-device CPU mesh (SURVEY.md §4c)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neurondb_tpu.parallel import (ShardedFlatIndex, ShardedIVFIndex,
                                   make_mesh, sharded_kmeans_step)
from neurondb_tpu.parallel.mesh import shard_rows
from neurondb_tpu.index import FlatIndex


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def corpus(rng_mod):
    rng = rng_mod
    return rng.standard_normal((1000, 24)).astype(np.float32)


def test_sharded_flat_matches_single(mesh, corpus, rng):
    q = rng.standard_normal((7, 24)).astype(np.float32)
    sharded = ShardedFlatIndex(corpus, mesh=mesh)
    single = FlatIndex(corpus)
    ds, iss = sharded.search(q, k=5)
    d1, i1 = single.search(q, k=5)
    np.testing.assert_array_equal(iss, i1)
    np.testing.assert_allclose(ds, d1, rtol=1e-4, atol=1e-4)


def test_sharded_flat_uneven_rows(mesh, rng):
    x = rng.standard_normal((997, 8)).astype(np.float32)  # not divisible by 8
    idx = ShardedFlatIndex(x, mesh=mesh)
    d, ids = idx.search(x[996], k=1)
    assert ids[0, 0] == 996


def test_sharded_kmeans_step_matches_host(mesh, corpus):
    c0 = corpus[:10]
    xs = shard_rows(mesh, jnp.asarray(corpus))
    c1, inertia = sharded_kmeans_step(mesh, xs, jnp.asarray(c0))
    # host oracle
    d = ((corpus[:, None, :] - c0[None, :, :]) ** 2).sum(-1)
    lab = d.argmin(1)
    ref = np.stack([corpus[lab == j].mean(0) if (lab == j).any() else c0[j]
                    for j in range(10)])
    np.testing.assert_allclose(np.asarray(c1), ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(inertia), d.min(1).sum(), rtol=1e-3)


def test_sharded_ivf_recall(mesh, corpus, rng):
    q = corpus[:20] + 0.05 * rng.standard_normal((20, 24)).astype(np.float32)
    idx = ShardedIVFIndex(corpus, nlists=16, mesh=mesh, seed=0)
    d, ids = idx.search(q, k=5, nprobe=16)  # all lists -> exact
    single = FlatIndex(corpus)
    _, ref_ids = single.search(q, k=5)
    hits = sum(len(set(a.tolist()) & set(b.tolist()))
               for a, b in zip(ids, ref_ids))
    assert hits / ref_ids.size > 0.99
    # queries are corpus + 0.05*N(0,1) in 24-d: E[dist] ~ 0.05*sqrt(24)
    np.testing.assert_allclose(d[:, 0], 0.0, atol=0.6)


def test_sharded_ivf_partial_probes(mesh, corpus):
    idx = ShardedIVFIndex(corpus, nlists=16, mesh=mesh, seed=0)
    d, ids = idx.search(corpus[:10], k=1, nprobe=4)
    assert (ids[:, 0] == np.arange(10)).mean() > 0.9


def test_sharded_ivf_int64_external_ids(mesh, corpus):
    """External ids beyond int32 must round-trip (ADVICE r1: device ids
    were int32 and silently truncated)."""
    big = np.arange(len(corpus), dtype=np.int64) + (1 << 40)
    idx = ShardedIVFIndex(corpus, nlists=16, mesh=mesh, seed=0, ids=big)
    d, ids = idx.search(corpus[:8], k=3, nprobe=16)
    assert ids.dtype == np.int64
    assert (ids[:, 0] == big[:8]).all()
