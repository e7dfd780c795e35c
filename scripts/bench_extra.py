#!/usr/bin/env python
"""Extra benchmark configs (BASELINE.json #3/#4): quantized+rerank and
hybrid vector+BM25 fusion. Prints one JSON line per config."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    from bench import make_corpus
    from neurondb_tpu.index import FlatIndex, PQIndex
    from neurondb_tpu.index.flat import QuantizedFlatIndex
    from neurondb_tpu.ml.metrics import recall_at_k, ndcg_at_k
    from neurondb_tpu.search.bm25 import BM25Index
    from neurondb_tpu.search.hybrid import hybrid_search, hybrid_search_batch

    n = int(os.environ.get("NDB_BENCH_N", 200_000))
    d = 128
    nq = 512
    k = 10
    x = make_corpus(n, d)
    rng = np.random.default_rng(1)
    q = x[rng.choice(n, nq, replace=False)] + \
        0.05 * rng.standard_normal((nq, d)).astype(np.float32)

    # ground truth (ip metric for config #3)
    flat = FlatIndex(x, metric="ip")
    _, gt = flat.search(q, k=k)

    # config #3: int8 store + exact rerank, inner product
    idx8 = QuantizedFlatIndex(x, fmt="int8", metric="ip")
    idx8.search(q, k=k, rerank=4)          # warm
    t0 = time.time()
    for _ in range(4):
        _, ids8 = idx8.search(q, k=k, rerank=4)
    wall = (time.time() - t0) / 4
    r8 = recall_at_k(ids8, gt)
    print(json.dumps({
        "metric": "int8_rerank_ip_qps", "value": round(nq / wall, 1),
        "unit": "qps", "recall_at_10": round(r8, 4), "n": n,
        "code_bytes": int(idx8.compression_bytes),
        "raw_bytes": int(n * d * 4)}))

    # config #4: hybrid vector + BM25 (synthetic docs aligned to clusters)
    nd_ = min(int(os.environ.get("NDB_BENCH_DOCS", 20000)), n)
    docs = [f"topic{i % 64} item {i} cluster word{i % 64}"
            for i in range(nd_)]
    xd = x[:nd_]
    # the deployment path pairs BM25 with an ANN index, not brute force
    if nd_ >= 50_000:
        from neurondb_tpu.index import IVFFlatIndex
        fidx = IVFFlatIndex(xd, nlists=512, metric="l2", seed=0)
        fkw = {"nprobe": 8}
    else:
        fidx = FlatIndex(xd, metric="l2")
        fkw = {}
    bm = BM25Index(docs)
    n_hq = 512
    qis = rng.integers(0, nd_, n_hq)
    texts = [f"topic{int(qi) % 64} item {int(qi)}" for qi in qis]
    hybrid_search_batch(fidx, bm, xd[qis], texts, k=k, **fkw)     # warm
    t0 = time.time()
    scores, ids = hybrid_search_batch(fidx, bm, xd[qis], texts, k=k, **fkw)
    wall = time.time() - t0
    hits = sum(int(qi in row) for qi, row in zip(qis, ids))
    print(json.dumps({
        "metric": "hybrid_vec_bm25_qps", "value": round(n_hq / wall, 1),
        "unit": "qps", "self_hit_rate": round(hits / n_hq, 3),
        "n_docs": nd_}), flush=True)

    # config #4b: pipelined HybridSearcher (serving path) — dispatch-all
    # sub-batches, one barrier; median of 3 in-process repeats
    from neurondb_tpu.search.hybrid import HybridSearcher
    if not hasattr(fidx, "_ext_ids"):
        from neurondb_tpu.index import IVFFlatIndex
        fidx = IVFFlatIndex(xd, nlists=min(512, nd_ // 8 or 1),
                            metric="l2", seed=0)
        fkw = {"nprobe": 8}
    hs = HybridSearcher(fidx, bm, candidates=100)
    nbig = 8 * n_hq
    qbig = xd[np.tile(qis, 8)]
    if os.environ.get("NDB_WIRE", "bfloat16") == "bfloat16":
        import ml_dtypes
        qbig = qbig.astype(ml_dtypes.bfloat16)   # 2-byte query wire
    tbig = texts * 8
    hs.search_batch(qbig[:n_hq], tbig[:n_hq], k=k, **fkw)  # warm
    samples = []
    for _ in range(3):
        t0 = time.time()
        _, ids_p = hs.search_batch(qbig, tbig, k=k, **fkw)
        samples.append(nbig / (time.time() - t0))
    samples.sort()
    hits = sum(int(qi in row) for qi, row in zip(np.tile(qis, 8), ids_p))
    print(json.dumps({
        "metric": "hybrid_pipelined_qps", "value": round(samples[1], 1),
        "unit": "qps", "self_hit_rate": round(hits / nbig, 3),
        "n_docs": nd_, "qps_samples": [round(s, 1) for s in samples]}),
        flush=True)


if __name__ == "__main__":
    main()
