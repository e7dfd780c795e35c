#!/usr/bin/env python
"""BM25 scorer A/B on a Zipf-vocabulary corpus — the workload the tiled
one-hot-GEMM scorer exists for (VERDICT r4 item 7): real corpora have a
long mid-df band (256 < df < n_docs/256) that is too sparse for the
heavy dense tier and too long for the narrow scatter, where the legacy
scatter path paid ~60 ms per 2048-posting segment per 512-query batch
AND truncated postings at seg_cap.

Synthetic-but-honest shape: vocabulary sampled Zipf(1.2) over 50k terms
at ~20 tokens/doc, queries of 4 terms drawn from ranks 100-5000 (the
mid band). Interleaved same-slot A/B, value-fetch barriers; also
reports each mode's max relative error vs the exact host oracle (the
scatter mode truncates, so its error is the honesty headline here).

Usage: NDB_BENCH_DOCS=1000000 python scripts/bench_bm25_zipf.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    from neurondb_tpu.config import configure
    from neurondb_tpu.search.bm25 import BM25Index

    nd = int(os.environ.get("NDB_BENCH_DOCS", 1_000_000))
    nv, dlen, B = 50_000, 20, 512
    rng = np.random.default_rng(11)
    # Zipf(1.2) over nv ranks
    ranks = np.arange(1, nv + 1, dtype=np.float64)
    pz = ranks ** -1.2
    pz /= pz.sum()
    toks = rng.choice(nv, size=(nd, dlen), p=pz)
    docs = [" ".join(f"t{t}" for t in row) for row in toks]
    t0 = time.time()
    bm = BM25Index(docs)
    print(f"build {time.time()-t0:.1f}s n_docs={nd} "
          f"vocab={len(bm.df)}", flush=True)
    dev = bm._ensure_device_tiled()
    print("mid stream:", tuple(dev["s_term"].shape), "pad_factor:",
          dev["pad_factor"], "tiny nnz:", int(dev["tiny_doc"].shape[0]),
          flush=True)
    # mid-band queries (ranks 100-5000): df between ~nd/2000 and ~nd/40
    qr = rng.integers(100, 5000, (B, 4))
    texts = [" ".join(f"t{t}" for t in row) for row in qr]

    host = np.stack([bm.scores(q) for q in texts[:8]])
    out = {}
    import json
    for mode in ("tiled", "scatter", "tiled", "scatter"):
        configure(bm25_scorer=mode)
        try:
            o = bm.scores_batch(texts, device=True, return_device=True)
            np.asarray(o[:1, :1])
            t0 = time.time()
            o = bm.scores_batch(texts, device=True, return_device=True)
            np.asarray(o[:1, :1])
            ms = (time.time() - t0) * 1e3
            a = np.asarray(bm.scores_batch(texts[:8], device=True),
                           np.float32)
            rel = float((np.abs(a - host)
                         / np.maximum(np.abs(host), 1.0)).max())
            out.setdefault(mode, []).append(
                {"ms_per_batch": round(ms, 1),
                 "qps": round(B / ms * 1e3, 1),
                 "max_rel_err_vs_oracle": round(rel, 5)})
            print(mode, out[mode][-1], flush=True)
        except Exception as e:  # noqa: BLE001 — e.g. the legacy
            # scatter mode exhausts HBM at 4M docs (its f32 operands
            # and per-op full-buffer rewrites); one arm failing must
            # not lose the other arm's measurements
            out.setdefault(mode, []).append({"error": str(e)[:160]})
            print(mode, "FAILED:", str(e)[:160], flush=True)
    configure(bm25_scorer="tiled")
    print(json.dumps({"n_docs": nd, "modes": out}))


if __name__ == "__main__":
    main()
