#!/usr/bin/env python
"""Stage-level timing of the fused IVF grouped-search path on TPU.

The headline batch (B=16384, 1M x 128, nprobe=4) spends ~0.153 s per
batch of which the Pallas kernel window is ~14 ms (BASELINE.md bandwidth
note) — this script attributes the rest. Each stage runs as its own jit,
timed over R dispatched repeats with a VALUE FETCH (np.asarray) as the
barrier (block_until_ready returns early through the tunnel; see
IMPLEMENTATION_NOTES round-3 finding 4).

Usage: python scripts/profile_ivf.py [N] (default 1_000_000)
Env: NDB_PROFILE_NPROBE (default 4) — profile the r4 operating point
with NDB_PROFILE_NPROBE=8; NDB_PROFILE_QT overrides the stage-level
tile width (the full-search qt sweep always runs 16/32/64).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(label, fn, fetch, r=8):
    fetch(fn())                # warm/compile + value-fetch barrier
    t0 = time.time()
    for _ in range(r):
        out = fn()
    fetch(out)                 # dispatch r times, fetch once (pipelined)
    dt = (time.time() - t0) / r
    print(f"{label:34s} {dt*1e3:9.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from bench import make_corpus
    from neurondb_tpu.index import IVFFlatIndex
    from neurondb_tpu.index.ivf import _ivf_search_grouped, _ivf_post
    from neurondb_tpu.ops.pallas import ivf_scan_grouped as G
    from neurondb_tpu.ops import distance as D
    from neurondb_tpu.ops import topk as TK

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d, B, k = 128, 16384, 10
    nprobe = int(os.environ.get("NDB_PROFILE_NPROBE", 4))
    nlists = 1024
    x = make_corpus(n, d)
    rng = np.random.default_rng(1)
    q = x[rng.choice(n, B, replace=False)] + \
        0.05 * rng.standard_normal((B, d)).astype(np.float32)

    t0 = time.time()
    index = IVFFlatIndex(x, nlists=nlists, metric="l2", seed=0)
    jax.block_until_ready(index._vecs)
    print(f"build {time.time()-t0:.1f}s  backend={jax.default_backend()}")

    qj = jnp.asarray(q)
    cent, vecs = index.centroids, index._vecs
    offsets, counts = index._offsets, index._counts
    ext_ids = index._ext_ids
    npad = nprobe
    qt_stage = int(os.environ.get("NDB_PROFILE_QT",
                                  G.auto_qt(B, npad, nlists)))
    pb_full = max(11, (int(index.max_list) - 1).bit_length())
    if pb_full > 14:
        pb_full = 0                     # matches index.search's gate
    print(f"nprobe={nprobe} stage qt={qt_stage} pos_bits={pb_full}")

    # full fused search (the production path)
    full = jax.jit(lambda qq: _ivf_search_grouped(
        qq, cent, vecs, ext_ids, offsets, counts, jnp.int32(nprobe),
        k=k, metric="l2", nprobe_pad=npad, pos_bits=pb_full,
        coarse_rt=0.99))
    timed("full fused search", lambda: full(qj),
          lambda o: np.asarray(o[0][:1]))

    # stage 1: coarse pairwise + topk (exact vs PartialReduce)
    @jax.jit
    def coarse(qq):
        cd = D.pairwise_distance(qq, cent, "sqeuclidean")
        _, probes = TK.topk_smallest(cd, npad)
        return probes.astype(jnp.int32)
    probes = coarse(qj)
    timed("  coarse GEMM+topk (exact)", lambda: coarse(qj),
          lambda o: np.asarray(o[:1]))

    @jax.jit
    def coarse_a(qq):
        cd = D.pairwise_distance(qq, cent, "sqeuclidean")
        _, probes = TK.topk_smallest(cd, npad, recall_target=0.99)
        return probes.astype(jnp.int32)
    coarse_a(qj)
    timed("  coarse GEMM+topk (approx)", lambda: coarse_a(qj),
          lambda o: np.asarray(o[:1]))

    # stage 2: group_probes (argsort + cummax + scatter)
    t_max = G.tiles_for(B, npad, nlists, qt=qt_stage)
    grp = jax.jit(lambda p: G.group_probes(p, offsets, counts,
                                           qt=qt_stage, t_max=t_max))
    tile_off, tile_cnt, pos = grp(probes)
    timed("  group_probes", lambda: grp(probes),
          lambda o: np.asarray(o[0][:1]))

    # stage 3: scatter query rows into padded tiles
    sct = jax.jit(lambda qq, p: G._scatter_tuples(
        qq, p, npad=npad, qt=qt_stage, t_max=t_max))
    qpad = sct(qj, pos)
    timed("  scatter_tuples", lambda: sct(qj, pos),
          lambda o: np.asarray(o[:1]))

    # stage 4: the Pallas kernel — exact vs packed-key selection
    kp = max(8, min(k, G.SEG))
    kern = jax.jit(lambda qp: G.grouped_probe_scan(
        qp, vecs, tile_off, tile_cnt, kp=kp, metric="sqeuclidean"))
    out_d, out_i = kern(qpad)
    timed("  pallas grouped scan (exact)", lambda: kern(qpad),
          lambda o: np.asarray(o[0][:1]))
    pb = max(11, (int(index.max_list) - 1).bit_length())
    kern_p = jax.jit(lambda qp: G.grouped_probe_scan(
        qp, vecs, tile_off, tile_cnt, kp=kp, metric="sqeuclidean",
        pos_bits=pb))
    t_kern = timed(f"  pallas grouped scan (packed pb={pb})",
                   lambda: kern_p(qpad),
                   lambda o: np.asarray(o[0][:1]))

    # kernel-window HBM roofline: each live tile DMAs its list in
    # SEG-row double-buffered segments of bf16 rows (2*d bytes/row)
    tc = np.asarray(tile_cnt)
    live = tc > 0
    segs = np.ceil(tc[live] / G.SEG).astype(np.int64)
    bytes_lists = int(segs.sum()) * G.SEG * d * 2
    bytes_q = int(live.sum()) * qt_stage * d * 4      # f32 query tiles
    gbs = (bytes_lists + bytes_q) / t_kern / 1e9
    print(f"  kernel traffic: {live.sum()} live tiles, "
          f"{(bytes_lists + bytes_q)/1e9:.2f} GB/batch -> "
          f"{gbs:,.0f} GB/s in-window "
          f"({gbs/819*100:.0f}% of v5e HBM)")

    # stage 5: merge partials + post
    posr = pos.reshape(B, npad)
    mrg = jax.jit(lambda od, oi: _ivf_post(
        *G.merge_partials(od, oi, posr, k=k), ext_ids, metric="l2"))
    timed("  merge+post", lambda: mrg(out_d, out_i),
          lambda o: np.asarray(o[0][:1]))

    # pipelined QPS (the headline protocol): dispatch 8 sub-batches,
    # fetch once
    def pipelined():
        outs = [full(qj) for _ in range(8)]
        return outs
    outs = pipelined()
    _ = [np.asarray(o[0][:1]) for o in outs]
    t0 = time.time()
    outs = pipelined()
    _ = [np.asarray(o[0][:1]) for o in outs]
    dt = time.time() - t0
    print(f"pipelined 8x{B}: {8*B/dt:,.0f} QPS  ({dt/8*1e3:.1f} ms/batch)")

    # qt sweep: wider tiles cut DMA traffic and sequential grid cells
    # ~qt-fold at high batch density (B*nprobe/nlists queries per list)
    for qt in (16, 32, 64):
        f = jax.jit(lambda qq, _qt=qt: _ivf_search_grouped(
            qq, cent, vecs, ext_ids, offsets, counts, jnp.int32(nprobe),
            k=k, metric="l2", nprobe_pad=npad, qt=_qt,
            pos_bits=pb_full))
        dtq = timed(f"full search qt={qt}", lambda: f(qj),
                    lambda o: np.asarray(o[0][:1]))
        print(f"  -> {B/dtq:,.0f} QPS dispatched-pipelined")


if __name__ == "__main__":
    main()
