"""IVF-PQ: compressed posting lists with on-the-fly residual decode."""

import numpy as np
import pytest

from neurondb_tpu.index import FlatIndex, IVFPQIndex


@pytest.fixture(scope="module")
def corpus(rng_mod):
    rng = rng_mod
    centers = rng.standard_normal((64, 64)).astype(np.float32)
    lab = rng.integers(0, 64, 20000)
    return centers[lab] + 0.25 * rng.standard_normal(
        (20000, 64)).astype(np.float32)


@pytest.fixture(scope="module")
def queries(corpus, rng_mod):
    rng = rng_mod
    q = corpus[rng.choice(len(corpus), 128, replace=False)]
    return q + 0.02 * rng.standard_normal(q.shape).astype(np.float32)


def recall(ids, gt):
    return np.mean([len(set(a) & set(b)) / gt.shape[1]
                    for a, b in zip(ids, gt)])


def test_ivfpq_recall_l2(corpus, queries):
    _, gt = FlatIndex(corpus).search(queries, k=10)
    idx = IVFPQIndex(corpus, nlists=64, n_sub=16, seed=0)
    _, ids = idx.search(queries, k=10, nprobe=16)
    # coarse ADC on residuals. Bar at 0.55: the same build measured
    # 0.587-0.63 across runs (XLA:CPU oneDNN thread partitioning varies
    # k-means reduction order under load); rerank tests pin the >=0.95
    # quality bar, this one only guards the coarse path's sanity
    assert recall(ids, gt) > 0.55
    assert idx.stats()["compression"] == 16.0


def test_ivfpq_rerank_recovers_exact(corpus, queries):
    _, gt = FlatIndex(corpus).search(queries, k=10)
    idx = IVFPQIndex(corpus, nlists=64, n_sub=16, seed=0,
                     keep_originals=True)
    _, ids = idx.search(queries, k=10, nprobe=16, rerank=8)
    assert recall(ids, gt) > 0.95


def test_ivfpq_int8_originals_rerank(corpus, queries):
    """orig_dtype="int8" (the 30-50M-in-one-chip config, VERDICT r3
    item 4): device-resident int8 corpus store + per-row scales feeds
    both the build (labels/encode via on-device dequant) and the exact
    rerank. Recall must match the bf16-originals path; the store is
    1 B/dim."""
    import jax.numpy as jnp
    _, gt = FlatIndex(corpus).search(queries, k=10)
    idx = IVFPQIndex(corpus, nlists=64, n_sub=16, seed=0,
                     keep_originals=True, orig_dtype="int8")
    assert idx._orig.dtype == jnp.int8
    assert idx._orig_scale.shape == (len(corpus),)
    _, ids = idx.search(queries, k=10, nprobe=16, rerank=8)
    assert recall(ids, gt) > 0.95


def test_ivfpq_int8_originals_save_load(tmp_path, corpus, queries):
    import jax.numpy as jnp
    idx = IVFPQIndex(corpus[:5000], nlists=32, n_sub=16, seed=0,
                     keep_originals=True, orig_dtype="int8")
    d0, i0 = idx.search(queries, k=5, nprobe=8, rerank=4)
    idx.save(str(tmp_path / "ivfpq8"))
    back = IVFPQIndex.load(str(tmp_path / "ivfpq8"))
    assert back._orig.dtype == jnp.int8
    d1, i1 = back.search(queries, k=5, nprobe=8, rerank=4)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-5)


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


def test_grouped_pq_kernel_matches_oracle(rng):
    """Interpret-mode parity: the grouped ADC-LUT kernel must reproduce
    brute-force squared-L2 over the probed lists exactly (f32 LUT sums)."""
    import jax.numpy as jnp
    from neurondb_tpu.index.ivfpq import IVFPQIndex
    from neurondb_tpu.ops.pallas import ivfpq_scan as PQS

    x = rng.standard_normal((3000, 32)).astype(np.float32)
    idx = IVFPQIndex(x, nlists=8, n_sub=8, seed=0)
    # force the transposed layout regardless of backend
    if idx._codes_t is None:
        codes_t = jnp.asarray(np.ascontiguousarray(np.asarray(idx._codes).T))
    else:
        codes_t = idx._codes_t
    q = x[:32] + 0.01
    nlists = idx.nlists
    cd = ((q[:, None, :] - np.asarray(idx.centroids)[None]) ** 2).sum(-1)
    probes = np.argsort(cd, axis=1)[:, :4].astype(np.int32)
    vals, rows = PQS.ivfpq_grouped_search(
        jnp.asarray(q), jnp.asarray(probes), idx.centroids, idx.codebooks,
        codes_t, idx._offsets, idx._counts, k=10, interpret=True)
    vals, rows = np.asarray(vals), np.asarray(rows)

    # oracle: decode every probed row, exact squared L2
    from neurondb_tpu.index.pq import pq_decode
    offsets = np.asarray(idx._offsets)
    counts = np.asarray(idx._counts)
    codes_rm = np.asarray(codes_t).T
    cent = np.asarray(idx.centroids)
    rid = np.asarray(idx._row_ids)
    for b in range(8):
        ds, rs = [], []
        for lid in probes[b]:
            o, c = int(offsets[lid]), int(counts[lid])
            dec = np.asarray(pq_decode(idx.codebooks,
                                       jnp.asarray(codes_rm[o:o + c])))
            xa = dec + cent[lid]
            ds.append(((xa - q[b]) ** 2).sum(1))
            rs.append(np.arange(o, o + c))
        d = np.concatenate(ds)
        r = np.concatenate(rs)
        o_ = np.argsort(d, kind="stable")[:10]
        got_rows = rows[b][rows[b] >= 0]
        np.testing.assert_allclose(np.sort(vals[b][:len(o_)]),
                                   np.sort(d[o_]), rtol=1e-4, atol=1e-4)
        assert set(np.asarray(rid)[got_rows]) == set(np.asarray(rid)[r[o_]])


def test_grouped_pq_kernel_packed_selection(rng):
    """pos_bits>0 packed-key selection vs the exact extraction.

    Selection is legally approximate at the k boundary (same contract
    as the IVF grouped kernel, tests/test_pallas_kernels.py): the
    packed key rounds ADC distances by <= 2**(pos_bits-24) relative,
    so candidates whose gap is inside that window may swap across the
    boundary. Every swap must be such a near-tie; swaps must be rare."""
    import jax.numpy as jnp
    from neurondb_tpu.index.ivfpq import IVFPQIndex
    from neurondb_tpu.ops.pallas import ivfpq_scan as PQS

    x = rng.standard_normal((3000, 32)).astype(np.float32)
    idx = IVFPQIndex(x, nlists=8, n_sub=8, seed=0)
    if idx._codes_t is None:
        codes_t = jnp.asarray(np.ascontiguousarray(np.asarray(idx._codes).T))
    else:
        codes_t = idx._codes_t
    q = x[:32] + 0.01
    cd = ((q[:, None, :] - np.asarray(idx.centroids)[None]) ** 2).sum(-1)
    probes = np.argsort(cd, axis=1)[:, :4].astype(np.int32)
    pb = max(11, (int(np.asarray(idx._counts).max()) - 1).bit_length())
    v0, r0 = PQS.ivfpq_grouped_search(
        jnp.asarray(q), jnp.asarray(probes), idx.centroids, idx.codebooks,
        codes_t, idx._offsets, idx._counts, k=10, interpret=True)
    v1, r1 = PQS.ivfpq_grouped_search(
        jnp.asarray(q), jnp.asarray(probes), idx.centroids, idx.codebooks,
        codes_t, idx._offsets, idx._counts, k=10, interpret=True,
        pos_bits=pb)
    v0, r0, v1, r1 = (np.asarray(a) for a in (v0, r0, v1, r1))
    step = 2.0 ** (pb - 24)
    np.testing.assert_allclose(np.sort(v1, axis=1), np.sort(v0, axis=1),
                               rtol=1e-3 + 2 * step, atol=1e-3)
    n_swaps = 0
    for b in range(len(q)):
        got, want = set(r1[b].tolist()), set(r0[b].tolist())
        got.discard(-1), want.discard(-1)
        assert len(got) == len(want)
        kth = float(np.sort(v0[b])[-1])
        tol = (2 * step + 1e-3) * max(1.0, abs(kth))
        for rr in got.symmetric_difference(want):
            # the swapped row's distance (from whichever side holds it)
            side_v, side_r = (v1[b], r1[b]) if rr in got else (v0[b], r0[b])
            dist = float(side_v[list(side_r).index(rr)])
            n_swaps += 1
            assert abs(dist - kth) <= tol, (
                f"b={b} row {rr}: swap gap {abs(dist - kth):.3e} exceeds "
                f"legal window {tol:.3e}")
    assert n_swaps <= max(2, len(q) // 8), n_swaps


def test_grouped_pq_kernel_nsub32_sub128(rng):
    """n_sub=32 routes the kernel to SUB=128 inner blocks (the [ns*KS,
    SUB] one-hot is the VMEM limiter); interpret-mode parity with the
    XLA decode path at that geometry (the recall>=0.95 1M config)."""
    import jax.numpy as jnp
    from neurondb_tpu.index.ivfpq import IVFPQIndex
    from neurondb_tpu.ops.pallas import ivfpq_scan as PQS

    assert PQS._sub_for(16) == 256 and PQS._sub_for(32) == 128
    x = rng.standard_normal((2000, 64)).astype(np.float32)
    idx = IVFPQIndex(x, nlists=8, n_sub=32, seed=0)
    codes_t = (jnp.asarray(np.ascontiguousarray(np.asarray(idx._codes).T))
               if idx._codes_t is None else idx._codes_t)
    q = x[:16] + 0.01
    cd = ((q[:, None, :] - np.asarray(idx.centroids)[None]) ** 2).sum(-1)
    probes = np.argsort(cd, axis=1)[:, :4].astype(np.int32)
    vals, rows = PQS.ivfpq_grouped_search(
        jnp.asarray(q), jnp.asarray(probes), idx.centroids, idx.codebooks,
        codes_t, idx._offsets, idx._counts, k=10, interpret=True)
    # oracle: XLA segment-scan path on the same index
    ov, orows = idx.search(q, k=10, nprobe=4)
    got = np.asarray(rows)
    ids = np.where(got >= 0,
                   np.asarray(idx._row_ids)[np.maximum(got, 0)], -1)
    overlap = np.mean([len(set(a) & set(b)) / 10
                       for a, b in zip(ids, orows)])
    assert overlap >= 0.95, overlap
    np.testing.assert_allclose(np.sort(np.asarray(vals), axis=1)[:, :10],
                               np.sort(ov ** 2, axis=1)[:, :10],
                               rtol=1e-3, atol=1e-3)


def test_ivfpq_opq_rotation(corpus, queries):
    """OPQ residual rotation: coarse ADC recall must not degrade (it
    balances subspace distortion), ip is rejected, and R round-trips
    through checkpoints."""
    _, gt = FlatIndex(corpus).search(queries, k=10)
    base = IVFPQIndex(corpus, nlists=64, n_sub=16, seed=0)
    rot = IVFPQIndex(corpus, nlists=64, n_sub=16, seed=0, opq=True)
    _, ib = base.search(queries, k=10, nprobe=16)
    _, ir = rot.search(queries, k=10, nprobe=16)
    rb, rr = recall(ib, gt), recall(ir, gt)
    assert rr > rb - 0.03, (rb, rr)

    with pytest.raises(ValueError, match="opq"):
        IVFPQIndex(corpus[:1000], nlists=8, n_sub=16, metric="ip",
                   opq=True)


def test_ivfpq_opq_save_load(tmp_path, corpus, queries):
    idx = IVFPQIndex(corpus[:5000], nlists=32, n_sub=16, seed=0, opq=True)
    d0, i0 = idx.search(queries, k=5, nprobe=8)
    idx.save(str(tmp_path / "opq"))
    back = IVFPQIndex.load(str(tmp_path / "opq"))
    assert back.R is not None
    d1, i1 = back.search(queries, k=5, nprobe=8)
    np.testing.assert_array_equal(i0, i1)
