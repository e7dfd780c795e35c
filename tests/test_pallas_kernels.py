"""Pallas kernels vs their jnp oracles (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from neurondb_tpu.ops.pallas.ivf_scan import (ivf_probe_scan,
                                              ivf_probe_scan_reference, SEG)


@pytest.fixture(scope="module")
def ivf_layout(rng):
    # 6 lists with varying (odd) lengths; starts 32-aligned per the
    # kernel contract (Mosaic sublane tiling), ends ragged
    lens = [700, 512, 100, 1024, 3, 200]
    aligned = [(-(-l // 32)) * 32 for l in lens]
    offsets = np.cumsum([0] + aligned[:-1]).astype(np.int32)
    total = sum(aligned)
    npad = -(-total // SEG) * SEG + SEG   # +SEG: DMA in-bounds contract
    vecs = rng.standard_normal((npad, 128)).astype(np.float32)
    counts = np.asarray(lens, np.int32)
    return vecs, offsets, counts


def test_probe_scan_matches_reference(ivf_layout, rng):
    vecs, offsets, counts = ivf_layout
    B, nprobe, k = 4, 3, 10
    q = rng.standard_normal((B, 128)).astype(np.float32)
    qsq = (q * q).sum(1)
    pr = rng.integers(0, len(counts), (B, nprobe))
    poff = offsets[pr]
    pcnt = counts[pr]
    # dedupe probes per row (same list twice would duplicate candidates)
    for b in range(B):
        seen = set()
        for j in range(nprobe):
            if int(pr[b, j]) in seen:
                pcnt[b, j] = 0
            seen.add(int(pr[b, j]))
    d, ids = ivf_probe_scan(jnp.asarray(q), jnp.asarray(qsq),
                            jnp.asarray(vecs), jnp.asarray(poff),
                            jnp.asarray(pcnt), k=k,
                            max_segs=-(-int(counts.max()) // SEG),
                            interpret=True)
    rd, ri = ivf_probe_scan_reference(q, qsq, vecs, poff, pcnt, k=k)
    np.testing.assert_allclose(np.asarray(d), rd, rtol=1e-3, atol=1e-3)
    # id agreement modulo exact-tie ordering: compare distance of chosen ids
    for b in range(4):
        got = np.asarray(ids[b])
        want = ri[b]
        dd = ((vecs[got[got >= 0]] - q[b]) ** 2).sum(1)
        dw = ((vecs[want[want >= 0]] - q[b]) ** 2).sum(1)
        np.testing.assert_allclose(np.sort(dd), np.sort(dw), rtol=1e-3)


def test_probe_scan_empty_list(ivf_layout, rng):
    vecs, offsets, counts = ivf_layout
    q = rng.standard_normal((2, 128)).astype(np.float32)
    qsq = (q * q).sum(1)
    poff = np.zeros((2, 2), np.int32)
    pcnt = np.zeros((2, 2), np.int32)      # all-empty probes
    d, ids = ivf_probe_scan(jnp.asarray(q), jnp.asarray(qsq),
                            jnp.asarray(vecs), jnp.asarray(poff),
                            jnp.asarray(pcnt), k=5, max_segs=2,
                            interpret=True)
    assert (np.asarray(ids) == -1).all()


def test_probe_scan_ip_metric(ivf_layout, rng):
    vecs, offsets, counts = ivf_layout
    B, k = 3, 5
    q = rng.standard_normal((B, 128)).astype(np.float32)
    qsq = (q * q).sum(1)
    poff = np.stack([offsets[:2]] * B)
    pcnt = np.stack([counts[:2]] * B)
    d, ids = ivf_probe_scan(jnp.asarray(q), jnp.asarray(qsq),
                            jnp.asarray(vecs), jnp.asarray(poff),
                            jnp.asarray(pcnt), k=k,
                            max_segs=-(-int(counts.max()) // SEG),
                            metric="ip", interpret=True)
    rd, ri = ivf_probe_scan_reference(q, qsq, vecs, poff, pcnt, k=k,
                                      metric="ip")
    np.testing.assert_allclose(np.asarray(d), rd, rtol=1e-3, atol=1e-3)
