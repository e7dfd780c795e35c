#!/usr/bin/env python
"""Phase-timed HNSW bulk build.

Sets NEURONDB_TPU_BUILD_PROFILE=1 (index/hnsw.py emits per-phase wall
times with value-fetch barriers — block_until_ready returns early
through the axon tunnel) and builds the GloVe-class angular corpus used
by scripts/bench_hnsw.py.

Usage: python scripts/profile_hnsw_build.py   [env: NDB_BENCH_N=250000,
       NDB_HNSW_REFINE=1]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["NEURONDB_TPU_BUILD_PROFILE"] = "1"


def main():
    from neurondb_tpu.index import HNSWIndex

    n = int(os.environ.get("NDB_BENCH_N", 250_000))
    refine = int(os.environ.get("NDB_HNSW_REFINE", 1))
    d = 128
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((512, d)).astype(np.float32)
    cl = rng.integers(0, 512, n)
    x = centers[cl] + 0.6 * rng.standard_normal((n, d)).astype(np.float32)

    t0 = time.time()
    idx = HNSWIndex(None, dim=d, m=16, ef_construction=200,
                    metric="cosine", seed=0)
    idx.build_bulk(x, refine=refine)
    total = time.time() - t0
    print(f"total build: {total:.1f}s  n={n} refine={refine} "
          f"entry_level={idx.entry_level}")


if __name__ == "__main__":
    main()
