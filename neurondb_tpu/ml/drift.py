"""Drift detection — distribution shift between reference & live data.

Reference: NeuronDB/src/ml/ml_drift_detection.c + ml_drift_time.c and the
drift_detection / model_monitoring catalog tables. Implements PSI,
KS statistic, mean/std shift, and embedding-drift (centroid distance)
detectors with threshold-based alerts.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def population_stability_index(ref, live, bins: int = 10) -> float:
    """PSI per standard banding; >0.2 = significant drift."""
    ref = np.asarray(ref, np.float32).ravel()
    live = np.asarray(live, np.float32).ravel()
    qs = np.quantile(ref, np.linspace(0, 1, bins + 1))
    qs[0], qs[-1] = -np.inf, np.inf
    r, _ = np.histogram(ref, qs)
    l, _ = np.histogram(live, qs)
    rp = np.maximum(r / max(len(ref), 1), 1e-6)
    lp = np.maximum(l / max(len(live), 1), 1e-6)
    return float(np.sum((lp - rp) * np.log(lp / rp)))


def ks_statistic(ref, live) -> float:
    """Two-sample Kolmogorov-Smirnov statistic."""
    ref = np.sort(np.asarray(ref, np.float32).ravel())
    live = np.sort(np.asarray(live, np.float32).ravel())
    allv = np.concatenate([ref, live])
    cdf_r = np.searchsorted(ref, allv, side="right") / len(ref)
    cdf_l = np.searchsorted(live, allv, side="right") / len(live)
    return float(np.max(np.abs(cdf_r - cdf_l)))


def feature_drift_report(ref, live, *, psi_threshold: float = 0.2
                         ) -> Dict:
    """Per-feature drift metrics over [N, F] matrices."""
    ref = np.asarray(ref, np.float32)
    live = np.asarray(live, np.float32)
    feats = []
    for f in range(ref.shape[1]):
        psi = population_stability_index(ref[:, f], live[:, f])
        feats.append({
            "feature": f,
            "psi": round(psi, 4),
            "ks": round(ks_statistic(ref[:, f], live[:, f]), 4),
            "mean_shift": float(live[:, f].mean() - ref[:, f].mean()),
            "std_ratio": float(live[:, f].std() /
                               max(ref[:, f].std(), 1e-9)),
            "drifted": psi > psi_threshold,
        })
    return {"features": feats,
            "any_drift": any(x["drifted"] for x in feats),
            "max_psi": max(x["psi"] for x in feats)}


def embedding_drift(ref_emb, live_emb) -> Dict:
    """Centroid cosine distance + dispersion change for embedding spaces
    (the vector-native drift the reference monitors)."""
    r = np.asarray(ref_emb, np.float32)
    l = np.asarray(live_emb, np.float32)
    cr, cl = r.mean(0), l.mean(0)
    cos = 1.0 - float(cr @ cl / (np.linalg.norm(cr) * np.linalg.norm(cl)
                                 + 1e-12))
    disp_r = float(np.linalg.norm(r - cr, axis=1).mean())
    disp_l = float(np.linalg.norm(l - cl, axis=1).mean())
    return {"centroid_cosine_distance": cos,
            "dispersion_ratio": disp_l / max(disp_r, 1e-9),
            "drifted": cos > 0.1 or not 0.5 < disp_l / max(disp_r, 1e-9) < 2.0}
