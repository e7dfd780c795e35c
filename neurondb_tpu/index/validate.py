"""Index validation / diagnostics — neurondb_validate() / neurondb_diag().

Reference: NeuronDB/src/index/index_validator.c (graph connectivity
checks, centroid quality metrics, 1664 LoC). Returns structured reports
instead of SQL rows.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def validate_index(index) -> Dict[str, Any]:
    kind = getattr(index, "kind", "unknown")
    if kind == "hnsw":
        return _validate_hnsw(index)
    if kind == "ivfflat":
        return _validate_ivf(index)
    report = {"kind": kind, "valid": True, "checks": []}
    if hasattr(index, "n"):
        report["n"] = index.n
    return report


def _validate_hnsw(idx) -> Dict[str, Any]:
    checks = []
    nbr = np.asarray(idx._nbr0[: idx.n])
    n = idx.n
    # 1. neighbor ids in range
    in_range = bool(((nbr >= -1) & (nbr < n)).all())
    checks.append({"check": "neighbor_ids_in_range", "ok": in_range})
    # 2. no self loops
    self_loops = int((nbr == np.arange(n)[:, None]).sum())
    checks.append({"check": "no_self_loops", "ok": self_loops == 0,
                   "count": self_loops})
    # 3. entry point valid
    entry_ok = 0 <= idx.entry < n
    checks.append({"check": "entry_point_valid", "ok": bool(entry_ok)})
    # 4. reachability from entry (BFS over the level-0 graph); corrupt
    # out-of-range ids are excluded here — check 1 already flags them
    reach = np.zeros(n, bool)
    frontier = [idx.entry] if entry_ok else []
    reach[frontier] = True
    while frontier:
        nxt = nbr[frontier].ravel()
        nxt = nxt[(nxt >= 0) & (nxt < n)]
        new = nxt[~reach[nxt]]
        reach[new] = True
        frontier = np.unique(new).tolist()
    reachable = float(reach.mean()) if n else 1.0
    checks.append({"check": "connectivity_from_entry",
                   "ok": reachable > 0.99, "reachable_fraction": reachable})
    # 5. degree stats
    deg = (nbr >= 0).sum(1)
    checks.append({"check": "degree_bounds",
                   "ok": bool((deg <= 2 * idx.m).all()),
                   "mean_degree": float(deg.mean())})
    return {"kind": "hnsw", "n": n,
            "valid": all(c["ok"] for c in checks), "checks": checks}


def _validate_ivf(idx) -> Dict[str, Any]:
    checks = []
    counts = np.asarray(idx._counts)
    offsets = np.asarray(idx._offsets)
    # 1. offsets monotone and consistent with counts
    ends = offsets + counts
    mono = bool((offsets[1:] >= ends[:-1]).all()) if len(offsets) > 1 else True
    checks.append({"check": "csr_layout_consistent", "ok": mono})
    # 2. total rows match
    total_ok = int(counts.sum()) == idx.n
    checks.append({"check": "row_count_matches", "ok": total_ok,
                   "rows": int(counts.sum()), "expected": idx.n})
    # 3. centroid quality: quantization error + balance
    imb = float(counts.max() / max(counts.mean(), 1e-9)) if len(counts) else 1.0
    checks.append({"check": "list_balance", "ok": imb < 8.0,
                   "imbalance": imb,
                   "empty_lists": int((counts == 0).sum())})
    # 4. assignment sanity on a sample: rows belong to their nearest
    # centroid (reconstruct original order through the aligned CSR map)
    n_sample = min(256, idx.n)
    if n_sample:
        rng = np.random.default_rng(0)
        rows = rng.choice(idx.n, n_sample, replace=False)
        import jax.numpy as jnp
        from neurondb_tpu.ml.kmeans import kmeans_predict
        rid = np.asarray(idx._row_ids)
        live = rid >= 0
        x = np.zeros((idx.n, idx.dim), np.float32)
        x[rid[live]] = np.asarray(idx._vecs, np.float32)[live]
        lab = np.asarray(kmeans_predict(idx.centroids,
                                        jnp.asarray(x[rows])))
        ok = bool((lab == np.asarray(idx._labels)[rows]).mean() > 0.99)
        checks.append({"check": "assignment_consistency", "ok": ok})
    return {"kind": "ivfflat", "n": idx.n,
            "valid": all(c["ok"] for c in checks), "checks": checks}
