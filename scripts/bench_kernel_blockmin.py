#!/usr/bin/env python
"""Interleaved same-slot A/B of the grouped-kernel selection variants
at the headline operating point: packed (r4 default) vs blockmin (r5
lane-class tournament — at most one candidate per (query, segment,
lane-class), ~4x fewer selection passes; ivf_scan_grouped.py).

Reports through-wire QPS and recall@10 per variant so bench.py's
argmax sweep can adopt blockmin only if it clears 0.95.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from bench import make_corpus
    from neurondb_tpu.index import IVFFlatIndex
    from neurondb_tpu.index.base import quantize_queries_int8
    from neurondb_tpu.ops import topk as TK

    n, d, B, k, nlists = 1_000_000, 128, 16384, 10, 1024
    x = make_corpus(n, d)
    rng = np.random.default_rng(1)
    nq = 2048
    q = x[rng.choice(n, nq, replace=False)] + \
        0.05 * rng.standard_normal((nq, d)).astype(np.float32)
    t0 = time.time()
    index = IVFFlatIndex(x, nlists=nlists, metric="l2", seed=0)
    jax.block_until_ready(index._vecs)
    print(f"build {time.time()-t0:.1f}s", flush=True)
    _, gti = TK.chunked_knn(jnp.asarray(q), jnp.asarray(x), k,
                            metric="l2", chunk=131072)
    gt = np.asarray(gti)

    def recall(ids):
        return float(np.mean([len(set(a) & set(b)) / k
                              for a, b in zip(ids, gt)]))

    wq = quantize_queries_int8(q)
    qbig_f32 = np.concatenate([q] * (8 * B // nq + 1))[: 8 * B]
    wbig = quantize_queries_int8(qbig_f32)

    def timed(sel, nprobe, reps=4):
        index.search(tuple(p[:B] for p in wbig), k=k, nprobe=nprobe,
                     select=sel)                       # warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            outs = []
            for s in range(0, 8 * B, B):
                outs.append(index.search(
                    tuple(p[s:s + B] for p in wbig), k=k, nprobe=nprobe,
                    out="device", select=sel))
            np.asarray(outs[-1][0][:1])
            ts.append(8 * B / (time.time() - t0))
        return sorted(ts[1:])[1]

    import json
    out = {}
    for nprobe in (4, 8):
        for sel in ("packed", "blockmin", "packed", "blockmin"):
            key = f"{sel}@{nprobe}"
            _, ids = index.search(wq, k=k, nprobe=nprobe, select=sel)
            r = recall(ids)
            qps = timed(sel, nprobe)
            out.setdefault(key, []).append(
                {"recall": round(r, 4), "qps": round(qps, 1)})
            print(key, out[key][-1], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
