"""Pallas kernels vs their jnp oracles (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from neurondb_tpu.ops.pallas.ivf_scan import (ivf_probe_scan,
                                              ivf_probe_scan_reference, SEG)


@pytest.fixture(scope="module")
def ivf_layout(rng_mod):
    rng = rng_mod
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


# ---- round-2 list-grouped kernel (ops/pallas/ivf_scan_grouped.py) ----

from neurondb_tpu.ops.pallas.ivf_scan_grouped import (
    ivf_grouped_search, ivf_grouped_search_reference, group_probes,
    tiles_for, QT)
from neurondb_tpu.ops.pallas.ivf_scan_grouped import SEG as GSEG


@pytest.fixture(scope="module")
def grouped_layout(rng_mod):
    rng = rng_mod
    lens = [700, 512, 100, 1500, 3, 200, 0, 64]
    aligned = [(-(-l // 32)) * 32 for l in lens]
    offsets = np.cumsum([0] + aligned[:-1]).astype(np.int32)
    total = sum(aligned)
    npad = -(-total // GSEG) * GSEG + GSEG
    vecs = rng.standard_normal((npad, 128)).astype(np.float32)
    return vecs, offsets, np.asarray(lens, np.int32)


def _mk_probes(rng, B, npadp, nlists):
    probes = rng.integers(0, nlists, (B, npadp)).astype(np.int32)
    for b in range(B):            # dedupe; dupes would double candidates
        seen = set()
        for j in range(npadp):
            if int(probes[b, j]) in seen:
                probes[b, j] = nlists       # sentinel
            seen.add(int(probes[b, j]))
    return probes


def test_grouped_scan_matches_reference(grouped_layout, rng):
    vecs, offsets, counts = grouped_layout
    B, npadp, k = 24, 4, 10
    nlists = len(counts)
    q = rng.standard_normal((B, 128)).astype(np.float32)
    probes = _mk_probes(rng, B, npadp, nlists)
    probes[5, 2:] = nlists                 # padded probe slots
    d, rows = ivf_grouped_search(
        jnp.asarray(q), jnp.asarray(probes), jnp.asarray(vecs),
        jnp.asarray(offsets), jnp.asarray(counts), k=k, interpret=True)
    rd, ri = ivf_grouped_search_reference(q, probes, vecs, offsets,
                                          counts, k=k)
    d, rows = np.asarray(d), np.asarray(rows)
    live = rd < 1e30
    np.testing.assert_allclose(d[live], rd[live], rtol=1e-3, atol=1e-3)
    assert (rows == ri).all()


@pytest.mark.parametrize("qt", [32, 64])
def test_grouped_scan_wide_tiles(grouped_layout, rng, qt):
    """qt=32/64 tiles (auto-selected at high batch density) must match
    the oracle exactly like the default qt=16."""
    vecs, offsets, counts = grouped_layout
    B, npadp, k = 48, 4, 10
    nlists = len(counts)
    q = rng.standard_normal((B, 128)).astype(np.float32)
    probes = _mk_probes(rng, B, npadp, nlists)
    d, rows = ivf_grouped_search(
        jnp.asarray(q), jnp.asarray(probes), jnp.asarray(vecs),
        jnp.asarray(offsets), jnp.asarray(counts), k=k, qt=qt,
        interpret=True)
    rd, ri = ivf_grouped_search_reference(q, probes, vecs, offsets,
                                          counts, k=k)
    d, rows = np.asarray(d), np.asarray(rows)
    live = rd < 1e30
    np.testing.assert_allclose(d[live], rd[live], rtol=1e-3, atol=1e-3)
    assert (rows == ri).all()


@pytest.mark.parametrize("metric", ["sqeuclidean", "ip"])
def test_grouped_scan_packed_selection(grouped_layout, rng, metric):
    """pos_bits>0 packs (distance, in-list position) into one int32 key
    so top-kp extraction is min+mask instead of argmin+onehot.

    Selection is legally approximate at the k boundary: the packed key
    rounds distances by <= 2**(pos_bits-24) relative, and the kernel's
    GEMM-expansion distances themselves carry the rtol=1e-3 the whole
    suite grants (different summation order than the oracle's direct
    form). Candidates whose exact-distance gap is inside that combined
    window may swap across the boundary — the r4 snapshot's exact-set
    assertion was over-strict and failed on a 2.6e-4-relative near-tie
    (r5 root cause). So: every swap must be a near-tie — any row the
    kernel returns that the oracle didn't (and vice versa) must have an
    EXACT distance within the legal window of the oracle's kth."""
    vecs, offsets, counts = grouped_layout
    B, npadp, k = 24, 4, 10
    nlists = len(counts)
    q = rng.standard_normal((B, 128)).astype(np.float32)
    probes = _mk_probes(rng, B, npadp, nlists)
    pb = max(11, int(counts.max() - 1).bit_length())
    d, rows = ivf_grouped_search(
        jnp.asarray(q), jnp.asarray(probes), jnp.asarray(vecs),
        jnp.asarray(offsets), jnp.asarray(counts), k=k, metric=metric,
        interpret=True, pos_bits=pb)
    rd, ri = ivf_grouped_search_reference(q, probes, vecs, offsets,
                                          counts, k=k, metric=metric)
    d, rows = np.asarray(d), np.asarray(rows)
    live = rd < 1e30
    # distances of agreeing rows match to suite tolerance + rounding step
    step = 2.0 ** (pb - 24)
    np.testing.assert_allclose(d[live], rd[live], rtol=1e-3 + 2 * step,
                               atol=1e-3)
    n_swaps = 0
    for b in range(B):
        got, want = set(rows[b].tolist()), set(ri[b].tolist())
        got.discard(-1), want.discard(-1)
        assert len(got) == len(want)
        kth = rd[b][rd[b] < 1e30]
        if not len(kth):
            continue
        kth = float(kth[-1])
        tol = (2 * step + 1e-3) * max(1.0, abs(kth))
        for r in got.symmetric_difference(want):
            if metric == "ip":
                dist = -float(vecs[r] @ q[b])
            else:
                dist = float(((vecs[r] - q[b]) ** 2).sum())
            n_swaps += 1
            assert abs(dist - kth) <= tol, (
                f"b={b} row {r}: swap gap {abs(dist - kth):.3e} exceeds "
                f"legal window {tol:.3e}")
    # swaps are the exception, not the rule: selection must still be
    # essentially exact (one near-tie flip per ~10 queries at most)
    assert n_swaps <= max(2, B // 8), n_swaps


def test_grouped_scan_blockmin_selection(grouped_layout, rng):
    """block_min=True (r5 lane-class tournament): LEGALLY APPROXIMATE
    — at most one candidate per (query, segment, lane-class), so the
    per-(query,probes) top-k set may drop same-class runners-up. The
    contract: high set recall vs the exact oracle, and every returned
    row's distance decodes correctly (within the packed rounding)."""
    vecs, offsets, counts = grouped_layout
    B, npad, k, pb = 24, 4, 10, 12
    nlists = len(counts)
    q = rng.standard_normal((B, 128)).astype(np.float32)
    probes = _mk_probes(rng, B, npad, nlists)
    rd, ri = ivf_grouped_search_reference(q, probes, vecs, offsets,
                                          counts, k=k)
    d, rows = ivf_grouped_search(
        jnp.asarray(q), jnp.asarray(probes), jnp.asarray(vecs),
        jnp.asarray(offsets), jnp.asarray(counts), k=k, interpret=True,
        pos_bits=pb, block_min=True)
    d, rows = np.asarray(d), np.asarray(rows)
    recs = []
    for b in range(B):
        got = set(x for x in rows[b].tolist() if x >= 0)
        want = set(x for x in ri[b].tolist() if x >= 0)
        recs.append(len(got & want) / max(len(want), 1))
    assert np.mean(recs) >= 0.9, np.mean(recs)
    step = 2.0 ** (pb - 24)
    for b in range(B):
        for j, r in enumerate(rows[b]):
            if r < 0:
                continue
            true = float(((vecs[r] - q[b]) ** 2).sum())
            assert abs(d[b, j] - true) <= step * max(true, 1.0) + 1e-3


def test_grouped_scan_ip(grouped_layout, rng):
    vecs, offsets, counts = grouped_layout
    B, k = 16, 5
    nlists = len(counts)
    q = rng.standard_normal((B, 128)).astype(np.float32)
    probes = _mk_probes(rng, B, 4, nlists)
    d, rows = ivf_grouped_search(
        jnp.asarray(q), jnp.asarray(probes), jnp.asarray(vecs),
        jnp.asarray(offsets), jnp.asarray(counts), k=k, metric="ip",
        interpret=True)
    rd, ri = ivf_grouped_search_reference(q, probes, vecs, offsets,
                                          counts, k=k, metric="ip")
    live = rd < 1e30
    np.testing.assert_allclose(np.asarray(d)[live], rd[live],
                               rtol=1e-3, atol=1e-3)


def test_grouped_scan_all_sentinel(grouped_layout, rng):
    vecs, offsets, counts = grouped_layout
    nlists = len(counts)
    q = rng.standard_normal((4, 128)).astype(np.float32)
    probes = np.full((4, 4), nlists, np.int32)
    d, rows = ivf_grouped_search(
        jnp.asarray(q), jnp.asarray(probes), jnp.asarray(vecs),
        jnp.asarray(offsets), jnp.asarray(counts), k=5, interpret=True)
    assert (np.asarray(rows) == -1).all()


def test_group_probes_tiling_invariants(grouped_layout, rng):
    """Every tuple gets a unique padded slot; a tile never mixes lists."""
    _, offsets, counts = grouped_layout
    nlists = len(counts)
    B, npadp = 64, 8
    probes = rng.integers(0, nlists + 1, (B, npadp)).astype(np.int32)
    t_max = tiles_for(B, npadp, nlists)
    tile_off, tile_cnt, pos = group_probes(
        jnp.asarray(probes), jnp.asarray(offsets), jnp.asarray(counts),
        qt=QT, t_max=t_max)
    pos = np.asarray(pos)
    assert len(np.unique(pos)) == pos.size          # unique slots
    tile_of = pos // QT
    flat = probes.reshape(-1)
    tile_off = np.asarray(tile_off)
    off_ext = np.concatenate([offsets, [0]])
    for i in range(len(flat)):                      # tile serves my list
        if flat[i] < nlists:
            assert tile_off[tile_of[i]] == offsets[flat[i]]
            assert np.asarray(tile_cnt)[tile_of[i]] == counts[flat[i]]
        else:
            assert np.asarray(tile_cnt)[tile_of[i]] == 0
