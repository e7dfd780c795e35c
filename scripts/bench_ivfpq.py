#!/usr/bin/env python
"""IVF-PQ benchmark: compressed posting lists at 1M scale.

Prints one JSON line per config (coarse ADC and exact-rerank variants)
with QPS, recall@10 vs brute force, and the compression ratio.

Usage: python scripts/bench_ivfpq.py  [env: NDB_BENCH_N, NDB_BENCH_Q]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from bench import make_corpus
    from neurondb_tpu.index import FlatIndex, IVFPQIndex
    from neurondb_tpu.ml.metrics import recall_at_k

    n = int(os.environ.get("NDB_BENCH_N", 1_000_000))
    nq = int(os.environ.get("NDB_BENCH_Q", 1024))
    d, k = 128, 10
    x = make_corpus(n, d)
    rng = np.random.default_rng(1)
    q = x[rng.choice(n, nq, replace=False)] + \
        0.02 * rng.standard_normal((nq, d)).astype(np.float32)

    flat = FlatIndex(x)
    _, gt = flat.search(q, k=k)
    del flat

    t0 = time.time()
    idx = IVFPQIndex(x, nlists=min(1024, n), n_sub=16, seed=0,
                     keep_originals=True)
    build_s = time.time() - t0

    for nprobe, rerank in ((4, 0), (4, 8), (16, 8)):
        idx.search(q, k=k, nprobe=nprobe, rerank=rerank)   # warm
        t0 = time.time()
        _, ids = idx.search(q, k=k, nprobe=nprobe, rerank=rerank)
        wall = time.time() - t0
        print(json.dumps({
            "metric": "ivfpq_qps", "value": round(nq / wall, 1),
            "unit": "qps", "recall_at_10": round(recall_at_k(ids, gt), 4),
            "nprobe": nprobe, "rerank": rerank, "n": n,
            "build_seconds": round(build_s, 1),
            "code_bytes": idx.code_bytes,
            "compression": idx.stats()["compression"]}))


if __name__ == "__main__":
    main()
