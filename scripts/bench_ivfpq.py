#!/usr/bin/env python
"""IVF-PQ benchmark: compressed posting lists at 1M scale.

Finds the recall@10 >= 0.95 operating point by sweeping (n_sub, nprobe,
rerank) with the fused in-jit exact rerank, then times each point with
serving-style pipelined dispatch (all sub-batches dispatched, one
barrier), median of 3 in-process repeats. Prints one JSON line per
measured config.

Operating points (measured round 3): n_sub=16 (32x compression, 16 MB
codes) is ADC-quality-limited to ~0.70 recall at rerank=8; n_sub=32
(16x, 32 MB codes — dsub=4 quarters the per-subspace distortion) is the
recall>=0.95 configuration. Memory envelope: the scattered LUT buffer is
[~B*nprobe, n_sub*256] f32, so the batch is 8192 to keep nprobe=16 at
n_sub=32 under ~5 GB.

Usage: python scripts/bench_ivfpq.py  [env: NDB_BENCH_N, NDB_BENCH_Q]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _streaming_gt(x, q, k, cache_tag):
    """Exact top-k over a corpus too big for device-resident f32
    (>~2 GB): stream 512k-row f32 blocks through the chip, merge a
    running top-k per block. One pass = n*d*4 bytes h2d; cached on
    disk keyed by (n, d, tag) so bench re-runs skip it."""
    import jax
    import jax.numpy as jnp
    from neurondb_tpu.ops import distance as D
    from neurondb_tpu.ops import topk as TK
    path = f"/tmp/ndb_gt_{cache_tag}_{x.shape[0]}x{x.shape[1]}_k{k}.npz"
    if os.path.exists(path):
        return np.load(path)["gt"]
    qj = jnp.asarray(q)
    bv = jnp.full((len(q), k), TK.NEG_FILL, jnp.float32)
    bi = jnp.full((len(q), k), -1, jnp.int32)

    @jax.jit
    def step(bv, bi, xb, base):
        d2 = D.pairwise_distance(qj, xb, "sqeuclidean")
        cv, cpos = TK.topk_smallest(d2, k)
        return TK.merge_topk(bv, bi, cv, base + cpos.astype(jnp.int32), k)

    blk = 1 << 19
    for s in range(0, x.shape[0], blk):
        e = min(s + blk, x.shape[0])
        xb = x[s:e]
        if e - s < blk:                    # one compile shape
            xb = np.concatenate(
                [xb, np.full((blk - (e - s), x.shape[1]), 1e30,
                             np.float32)])
        bv, bi = step(bv, bi, jnp.asarray(xb), jnp.int32(s))
    gt = np.asarray(bi)
    np.savez(path, gt=gt)
    return gt


def main():
    import jax
    from bench import make_corpus
    from neurondb_tpu.index import FlatIndex, IVFPQIndex
    from neurondb_tpu.ml.metrics import recall_at_k

    n = int(os.environ.get("NDB_BENCH_N", 1_000_000))
    nq = int(os.environ.get("NDB_BENCH_Q", 1024))
    batch = int(os.environ.get("NDB_BENCH_BATCH", 8192))
    nlists = int(os.environ.get("NDB_BENCH_NLISTS", min(1024, n)))
    # >=16M rows: int8 rerank originals (1 B/dim + per-row scale) —
    # bf16 at 40M x 128 would be 10.2 GB of HBM for the store alone
    orig_dt = os.environ.get(
        "NDB_PQ_ORIG", "int8" if n >= 16_000_000 else "bf16")
    d, k = 128, 10
    x = make_corpus(n, d)
    rng = np.random.default_rng(1)
    q = x[rng.choice(n, nq, replace=False)] + \
        0.02 * rng.standard_normal((nq, d)).astype(np.float32)

    if n * d * 4 > 2e9:
        gt = _streaming_gt(x, q, k, cache_tag="clustered")
    else:
        flat = FlatIndex(x)
        _, gt = flat.search(q, k=k)
        del flat

    qpad = np.concatenate([q] * max(1, batch // nq + 1))[:batch]
    if os.environ.get("NDB_WIRE", "bfloat16") == "bfloat16":
        import ml_dtypes
        qpad = qpad.astype(ml_dtypes.bfloat16)   # 2-byte query wire;
        # recall below is measured through the same wire

    def measure(idx, build_s, nprobe, rerank):
        # recall on the padded batch (one compile shape throughout)
        _, ids = idx.search(qpad, k=k, nprobe=nprobe, rerank=rerank)
        r = recall_at_k(ids[:nq], gt)
        # pipelined QPS, median of 3 in-process repeats (VERDICT item 8)
        nbatches = 4
        samples = []
        for _ in range(3):
            t0 = time.time()
            outs = [idx.search(qpad, k=k, nprobe=nprobe, rerank=rerank,
                               out="device") for _ in range(nbatches)]
            # value fetch: block_until_ready returns early through the
            # tunnel (notes, round-3 finding 4); the LAST output forces
            # every earlier batch (in-order execution)
            np.asarray(outs[-1][0][:1])
            samples.append(nbatches * batch / (time.time() - t0))
        samples.sort()
        ob = 1 if orig_dt == "int8" else 2
        return {
            "metric": "ivfpq_qps", "value": round(samples[1], 1),
            "unit": "qps", "recall_at_10": round(r, 4), "nprobe": nprobe,
            "rerank": rerank, "n": n, "n_sub": idx.n_sub,
            "build_seconds": round(build_s, 1),
            "code_bytes": idx.code_bytes,
            "orig_dtype": orig_dt,
            "rerank_store_mb": round(n * (d * ob + (4 if ob == 1 else 0))
                                     / 1e6, 1),
            "hbm_resident_mb": round(
                (idx.code_bytes + n * (d * ob + (4 if ob == 1 else 0))
                 + n * 4 + nlists * d * 4) / 1e6, 1),
            "compression": idx.stats()["compression"],
            "qps_samples": [round(s, 1) for s in samples]}

    # headline config: n_sub=32 (16x) + OPQ to the recall>=0.95 point
    t0 = time.time()
    idx = IVFPQIndex(x, nlists=nlists, n_sub=32, seed=0,
                     keep_originals=True, opq=True, orig_dtype=orig_dt)
    build_s = time.time() - t0
    chosen = None
    # sweep override, e.g. NDB_PQ_SWEEP="16:16,16:24,24:24" — at >=10M
    # the right (nprobe, rerank) ladder depends on nlists (coverage of
    # a natural cluster is nprobe/(nlists/256) on the clustered corpus)
    sweep_env = os.environ.get("NDB_PQ_SWEEP")
    sweep = (tuple(tuple(int(v) for v in p.split(":"))
                   for p in sweep_env.split(",")) if sweep_env
             else ((8, 8), (8, 16), (16, 16), (16, 24)))
    for nprobe, rerank in sweep:
        row = measure(idx, build_s, nprobe, rerank)
        print(json.dumps(row), flush=True)
        if row["recall_at_10"] >= 0.95:
            chosen = dict(row)
            break
    if chosen is not None:
        chosen["metric"] = "ivfpq_qps_at_recall95"
        print(json.dumps(chosen), flush=True)
    del idx

    # compression-story config: n_sub=16 (32x, 16 MB codes)
    if os.environ.get("NDB_PQ_SKIP16", "0") != "1":
        t0 = time.time()
        idx16 = IVFPQIndex(x, nlists=nlists, n_sub=16, seed=0,
                           keep_originals=True)
        build16 = time.time() - t0
        for nprobe, rerank in ((4, 0), (4, 8)):
            print(json.dumps(measure(idx16, build16, nprobe, rerank)),
                  flush=True)


if __name__ == "__main__":
    main()
