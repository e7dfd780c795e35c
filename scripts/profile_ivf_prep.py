#!/usr/bin/env python
"""Micro-profile of the IVF grouped-search prep/merge stages (no corpus
build needed): coarse centroid GEMM + top-nprobe selection variants,
group_probes, scatter_tuples, and merge_partials, at the headline shape
(B=16384, nlists=1024, npad=4, D=128).

Timing protocol: dispatch R times, value-fetch once (np.asarray barrier;
block_until_ready returns early through the tunnel — see
IMPLEMENTATION_NOTES round-3 finding 4).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(label, fn, fetch, r=16):
    fetch(fn())
    t0 = time.time()
    for _ in range(r):
        out = fn()
    fetch(out)
    dt = (time.time() - t0) / r
    print(f"{label:40s} {dt*1e3:9.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from neurondb_tpu.ops import distance as D
    from neurondb_tpu.ops.pallas import ivf_scan_grouped as G

    B, d, nlists, npad, k, kp = 16384, 128, 1024, 4, 10, 10
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    cent = jnp.asarray(rng.standard_normal((nlists, d)).astype(np.float32))
    counts = jnp.asarray(
        rng.integers(900, 1100, nlists).astype(np.int32))
    offsets = jnp.asarray(
        np.cumsum(np.concatenate([[0], np.asarray(counts)[:-1]]))
        .astype(np.int32))
    print(f"backend={jax.default_backend()}  B={B} nlists={nlists}")

    gemm = jax.jit(lambda: D.pairwise_distance(q, cent, "sqeuclidean"))
    timed("coarse GEMM only", gemm, lambda o: np.asarray(o[:1, :1]))

    topk = jax.jit(lambda: jax.lax.top_k(
        -D.pairwise_distance(q, cent, "sqeuclidean"), npad)[1])
    timed("GEMM + lax.top_k", topk, lambda o: np.asarray(o[:1]))

    def iter_argmin():
        cd = D.pairwise_distance(q, cent, "sqeuclidean")
        outs = []
        iota = jax.lax.broadcasted_iota(jnp.int32, cd.shape, 1)
        for _ in range(npad):
            p = jnp.argmin(cd, axis=1)
            outs.append(p)
            cd = jnp.where(iota == p[:, None], jnp.inf, cd)
        return jnp.stack(outs, 1)
    ia = jax.jit(iter_argmin)
    timed("GEMM + 4x argmin", ia, lambda o: np.asarray(o[:1]))

    amk = jax.jit(lambda: jax.lax.approx_min_k(
        D.pairwise_distance(q, cent, "sqeuclidean"), npad,
        recall_target=0.99, aggregate_to_topk=True)[1])
    timed("GEMM + approx_min_k(.99)", amk, lambda o: np.asarray(o[:1]))

    probes = topk().astype(jnp.int32)
    for qt in (16, 64):
        t_max = G.tiles_for(B, npad, nlists, qt)
        grp = jax.jit(lambda p, _qt=qt, _tm=t_max: G.group_probes(
            p, offsets, counts, qt=_qt, t_max=_tm))
        tile_off, tile_cnt, pos = grp(probes)
        timed(f"group_probes qt={qt}", lambda: grp(probes),
              lambda o: np.asarray(o[0][:1]))
        sct = jax.jit(lambda pp, _qt=qt, _tm=t_max: G._scatter_tuples(
            q, pp, npad=npad, qt=_qt, t_max=_tm))
        timed(f"scatter_tuples qt={qt}", lambda: sct(pos),
              lambda o: np.asarray(o[:1, :1]))
        T = t_max
        od = jnp.asarray(rng.standard_normal((T, qt, kp)).astype(np.float32))
        oi = jnp.asarray(rng.integers(0, 10 ** 6, (T, qt, kp))
                         .astype(np.int32))
        posr = pos.reshape(B, npad)
        mrg = jax.jit(lambda a, b: G.merge_partials(a, b, posr, k=k))
        timed(f"merge_partials qt={qt}", lambda: mrg(od, oi),
              lambda o: np.asarray(o[0][:1]))

    # gather-free scatter alternative: build qpad by inverse-gather
    t_max = G.tiles_for(B, npad, nlists, 64)
    grp = jax.jit(lambda p: G.group_probes(p, offsets, counts, qt=64,
                                           t_max=t_max))
    _, _, pos = grp(probes)

    @jax.jit
    def qpad_gather(pp):
        Gn = pp.shape[0]
        inv = jnp.full(t_max * 64, Gn, jnp.int32).at[pp].set(
            jnp.arange(Gn, dtype=jnp.int32))
        tuple_q = jnp.minimum(inv // npad, B - 1)
        qp = q[tuple_q]
        return jnp.where((inv < Gn)[:, None], qp, 0.0)
    timed("qpad via int-scatter + row gather", lambda: qpad_gather(pos),
          lambda o: np.asarray(o[:1, :1]))


if __name__ == "__main__":
    main()
