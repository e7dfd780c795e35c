#!/usr/bin/env python
"""End-to-end IVF serving-wall decomposition at the headline operating
point (r4 verdict item 3: device-resident r3 measured 697k QPS where the
through-wire number is 217-312k — find where the 2-3x lives).

Interleaved same-process measurements on ONE built 1M index (the only
trustworthy protocol on the shared backend — IMPLEMENTATION_NOTES r3
finding "slot bimodality"), all with value-fetch barriers:

  dev_resident   queries pre-staged on device  -> pure kernel window
  wire_h2d       jnp.asarray of the host wire arrays only (codes+scales)
  host_quant     quantize_queries_int8/int12/int4 on the host, no device
  through_wire   the exact bench.py serving loop (pipelined dispatch)
  fetch_dk       d2h of the [B, k] result pair

If through_wire ~ dev_resident + wire_h2d, transfers serialize with
compute and the attack is bytes-on-the-wire (int4) or true overlap; if
through_wire ~ max(...), the pipeline already overlaps and the kernel
window is the wall.

Usage: python scripts/profile_ivf_wall.py [N]   (default 1_000_000)
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

    def recall_at_k(ids, gt):
        return float(np.mean([len(set(a) & set(b)) / len(b)
                              for a, b in zip(ids, gt)]))
    from neurondb_tpu.index import IVFFlatIndex
    from neurondb_tpu.index.base import (quantize_queries_int4,
                                         quantize_queries_int8,
                                         quantize_queries_int12)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d, B, k = 128, 16384, 10
    nlists = 1024
    depth = 8                       # pipelined sub-batches per rep
    x = make_corpus(n, d)
    rng = np.random.default_rng(1)
    nq = 10000
    q = x[rng.choice(n, nq, replace=False)] + \
        0.05 * rng.standard_normal((nq, d)).astype(np.float32)
    qbig_f32 = np.concatenate([q] * (depth * B // nq + 1))[: depth * B]

    t0 = time.time()
    index = IVFFlatIndex(x, nlists=nlists, metric="l2", seed=0)
    jax.block_until_ready(index._vecs)
    print(f"build {time.time()-t0:.1f}s backend={jax.default_backend()}",
          flush=True)

    # ground truth on the first 2048 queries for recall-through-wire
    # (against the ORIGINAL row order — index._vecs is cluster-reordered)
    from neurondb_tpu.ops import topk as TK
    xj = jnp.asarray(x)
    gt = []
    for s in range(0, 2048, 1024):
        _, ids = TK.chunked_knn(jnp.asarray(q[s:s + 1024]), xj, k,
                                metric="l2", chunk=131072)
        gt.append(np.asarray(ids))
    gt_ids = np.concatenate(gt)

    wires = {
        "int8": quantize_queries_int8,
        "int12": quantize_queries_int12,
        "int4": quantize_queries_int4,
    }

    def wire_bytes(wq):
        return sum(np.asarray(p).nbytes for p in
                   (wq if isinstance(wq, tuple) else (wq,)))

    def _slice(qq, s, e):
        if isinstance(qq, tuple):
            return tuple(p[s:e] for p in qq)
        return qq[s:e]

    def timed_reps(fn, reps=4):
        out = fn()                   # warm
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    results = {}
    for wname, wfn in wires.items():
        for nprobe in (4, 8, 16):
            wq = wfn(q[:2048])
            _, ids = index.search(wq, k=k, nprobe=nprobe)
            r = recall_at_k(ids[:2048], gt_ids)
            if r >= 0.95:
                break
        else:
            print(f"-- {wname}: recall {r:.4f} even at nprobe=16, "
                  f"skipping", flush=True)
            continue
        print(f"== {wname} @ nprobe={nprobe}: recall {r:.4f}", flush=True)
        wbig = wfn(qbig_f32)
        bytes_per_b = wire_bytes(_slice(wbig, 0, B))

        # host quantize cost (per full depth*B block)
        t0 = time.time()
        for _ in range(3):
            wfn(qbig_f32)
        t_quant = (time.time() - t0) / 3

        # h2d wire transfer alone (per sub-batch, pipelined like serving)
        def h2d():
            outs = [jnp.asarray(p) for s in range(0, depth * B, B)
                    for p in ((lambda w: w if isinstance(w, tuple)
                               else (w,))(_slice(wbig, s, s + B)))]
            return outs[-1]
        t_h2d = timed_reps(h2d) / depth

        # device-resident search (stage wire once, search from device)
        wdev = tuple(jnp.asarray(p) for p in (
            wbig if isinstance(wbig, tuple) else (wbig,)))
        wdev = wdev if isinstance(wbig, tuple) else wdev[0]
        jax.block_until_ready(jax.tree.leaves(wdev))

        def dev_res():
            outs = []
            for s in range(0, depth * B, B):
                outs.append(index.search(_slice(wdev, s, s + B), k=k,
                                         nprobe=nprobe, out="device"))
            return outs[-1][0]
        t_dev = timed_reps(dev_res) / depth

        # through-wire (bench.py protocol)
        def through():
            outs = []
            for s in range(0, depth * B, B):
                outs.append(index.search(_slice(wbig, s, s + B), k=k,
                                         nprobe=nprobe, out="device"))
            return outs[-1][0]
        t_wire = timed_reps(through) / depth

        # result fetch cost (d2h of [B,k] x2 per sub-batch)
        outs = [index.search(_slice(wdev, s, s + B), k=k, nprobe=nprobe,
                             out="device") for s in range(0, depth * B, B)]
        np.asarray(outs[-1][0][:1])
        t0 = time.time()
        for o in outs:
            np.asarray(o[0]), np.asarray(o[1])
        t_fetch = (time.time() - t0) / depth

        row = {
            "nprobe": nprobe, "recall": round(float(r), 4),
            "wire_mb_per_batch": round(bytes_per_b / 1e6, 3),
            "host_quant_ms": round(t_quant / depth * 1e3, 2),
            "h2d_ms": round(t_h2d * 1e3, 2),
            "dev_resident_ms": round(t_dev * 1e3, 2),
            "through_wire_ms": round(t_wire * 1e3, 2),
            "fetch_ms": round(t_fetch * 1e3, 2),
            "dev_qps": round(B / t_dev, 1),
            "wire_qps": round(B / t_wire, 1),
            "h2d_gbps": round(bytes_per_b / t_h2d / 1e9, 3),
        }
        results[wname] = row
        print("  " + " ".join(f"{kk}={vv}" for kk, vv in row.items()),
              flush=True)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
