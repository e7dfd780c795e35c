#!/usr/bin/env python
"""Microbench of the grouped-scan kernel's selection variants.

Builds a synthetic cluster-contiguous layout directly (no k-means) so
kernel A/Bs iterate in seconds: 1M bf16 rows in 1024 equal lists,
random probes at the headline density (B=16384, nprobe=8, qt=64).

Usage: python scripts/bench_kernel_sel.py [pos_bits ...]
(default: 0 12 — exact vs packed)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from neurondb_tpu.ops.pallas import ivf_scan_grouped as G

    n, d, nlists, B, npad, k = 1_000_000, 128, 1024, 16384, 8, 10
    qt = 64
    rng = np.random.default_rng(0)
    per = n // nlists                        # 976 rows, 32-aligned lists
    per = (per // 32) * 32
    offsets = (np.arange(nlists, dtype=np.int64) * per).astype(np.int32)
    counts = np.full(nlists, per, np.int32)
    npad_rows = nlists * per + G.SEG
    vecs = jnp.asarray(
        rng.standard_normal((npad_rows, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    q = rng.standard_normal((B, d)).astype(np.float32)
    probes = np.argsort(rng.random((B, nlists)), axis=1)[:, :npad]
    probes = probes.astype(np.int32)

    t_max = G.tiles_for(B, npad, nlists, qt)
    kp = max(8, min(k, G.SEG))
    tile_off, tile_cnt, pos = G.group_probes(
        jnp.asarray(probes), jnp.asarray(offsets), jnp.asarray(counts),
        qt=qt, t_max=t_max)
    qpad = G._scatter_tuples(jnp.asarray(q), pos, npad=npad, qt=qt,
                             t_max=t_max)
    jax.block_until_ready(qpad)
    live = int((np.asarray(tile_cnt) > 0).sum())
    print(f"layout: {live} live tiles, {per} rows/list, qt={qt}",
          flush=True)

    variants = [int(a) for a in sys.argv[1:]] or [0, 12]
    for pb in variants:
        f = jax.jit(lambda qp, _pb=pb: G.grouped_probe_scan(
            qp, vecs, tile_off, tile_cnt, kp=kp, metric="sqeuclidean",
            qt=qt, pos_bits=_pb))
        out = f(qpad)
        np.asarray(out[0][:1])               # compile + barrier
        t0 = time.time()
        r = 8
        for _ in range(r):
            out = f(qpad)
        np.asarray(out[0][:1])
        dt = (time.time() - t0) / r
        print(f"pos_bits={pb:>2}: {dt*1e3:8.2f} ms "
              f"({dt/live*1e6:.2f} us/tile)", flush=True)


if __name__ == "__main__":
    main()
