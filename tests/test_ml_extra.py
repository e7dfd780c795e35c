"""Timeseries, recommender, drift, AutoML, maintenance workers."""

import numpy as np
import pytest

from neurondb_tpu.ml import automl as AM
from neurondb_tpu.ml import drift as DR
from neurondb_tpu.ml import recommender as RC
from neurondb_tpu.ml import timeseries as TS
from neurondb_tpu.service.workers import AutoTuner, DefragWorker, QueueWorker


# ---- timeseries ----

def test_ar_fit_forecast(rng):
    # AR(2) process
    n = 500
    y = np.zeros(n, np.float32)
    for t in range(2, n):
        y[t] = 0.6 * y[t - 1] - 0.2 * y[t - 2] + \
            0.1 * rng.standard_normal()
    m = TS.ar_fit(y, order=2)
    coef = np.asarray(m["coef"])
    # lag matrix columns are [t-2, t-1] -> coef[1] ~ 0.6, coef[0] ~ -0.2
    assert abs(coef[1] - 0.6) < 0.15
    assert abs(coef[0] + 0.2) < 0.15
    f = TS.ar_forecast(m, y, steps=5)
    assert f.shape == (5,)
    assert np.isfinite(np.asarray(f)).all()


def test_holt_winters(rng):
    t = np.arange(240, dtype=np.float32)
    y = 0.05 * t + 3 * np.sin(2 * np.pi * t / 12) + \
        0.1 * rng.standard_normal(240).astype(np.float32)
    m = TS.holt_winters_fit(y, season=12)
    f = np.asarray(TS.holt_winters_forecast(m, steps=12))
    expected = 0.05 * (t[-1] + np.arange(1, 13)) + \
        3 * np.sin(2 * np.pi * (t[-1] + np.arange(1, 13)) / 12)
    assert np.abs(f - expected).mean() < 1.0


def test_seasonal_decompose(rng):
    t = np.arange(120, dtype=np.float32)
    y = t * 0.1 + 2 * np.sin(2 * np.pi * t / 12)
    out = TS.seasonal_decompose(y, season=12)
    assert np.abs(np.asarray(out["residual"])).mean() < 0.5


def test_ts_anomaly(rng):
    y = rng.standard_normal(200).astype(np.float32)
    y[150] = 25.0
    flags = np.asarray(TS.ts_anomaly_windows(y, window=20))
    assert flags[150]
    assert flags.mean() < 0.05


# ---- recommender ----

def test_als_recovers_structure(rng):
    U, I, F = 30, 40, 4
    P = rng.standard_normal((U, F)).astype(np.float32)
    Q = rng.standard_normal((I, F)).astype(np.float32)
    R = P @ Q.T
    mask = (rng.random((U, I)) < 0.5).astype(np.float32)
    m = RC.als_fit(R * mask, mask, factors=F, iters=15, seed=0)
    pred = np.asarray(RC.predict_ratings(m))
    unobs = mask == 0
    corr = np.corrcoef(pred[unobs], R[unobs])[0, 1]
    assert corr > 0.8  # generalizes to held-out cells


def test_recommend_excludes_seen(rng):
    m = {"user_factors": np.eye(3, dtype=np.float32),
         "item_factors": np.asarray(
             [[1, 0, 0], [0.9, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)}
    seen = np.array([True, False, False, False])
    scores, items = RC.recommend(m, 0, k=2, exclude_mask=seen)
    assert 0 not in items
    assert items[0] == 1
    _, sims = RC.similar_items(m, 0, k=1)
    assert sims[0] == 1


# ---- drift ----

def test_drift_detects_shift(rng):
    ref = rng.standard_normal((2000, 3)).astype(np.float32)
    same = rng.standard_normal((2000, 3)).astype(np.float32)
    shifted = same.copy()
    shifted[:, 1] += 3.0
    rep_same = DR.feature_drift_report(ref, same)
    rep_shift = DR.feature_drift_report(ref, shifted)
    assert not rep_same["any_drift"]
    assert rep_shift["features"][1]["drifted"]
    assert rep_shift["features"][1]["psi"] > rep_same["features"][1]["psi"]


def test_ks_statistic(rng):
    a = rng.standard_normal(1000)
    b = rng.standard_normal(1000) + 2.0
    assert DR.ks_statistic(a, a) < 0.05
    assert DR.ks_statistic(a, b) > 0.5


def test_embedding_drift(rng):
    ref = rng.standard_normal((500, 16)).astype(np.float32) + 5.0
    live_ok = rng.standard_normal((500, 16)).astype(np.float32) + 5.0
    live_bad = -ref
    assert not DR.embedding_drift(ref, live_ok)["drifted"]
    assert DR.embedding_drift(ref, live_bad)["drifted"]


# ---- automl ----

def test_automl_classify(rng):
    X = np.concatenate([
        rng.standard_normal((80, 4)).astype(np.float32),
        rng.standard_normal((80, 4)).astype(np.float32) + 3.0])
    y = np.repeat([0, 1], 80).astype(np.int32)
    out = AM.automl("aml", X, y, task="classify",
                    algorithms=["logistic_regression", "naive_bayes"],
                    folds=2, register=True)
    assert out["best_score"] > 0.9
    assert "model_id" in out
    assert len(out["leaderboard"]) == 2


def test_hyperparameter_search(rng):
    X = rng.standard_normal((100, 3)).astype(np.float32)
    y = X @ np.array([1.0, -1.0, 0.5], np.float32)
    hp, score, trials = AM.hyperparameter_search(
        "ridge", X, y, {"alpha": [0.01, 100.0]}, task="regress", folds=2)
    assert hp["alpha"] == 0.01     # low reg wins on noiseless data
    assert len(trials) == 2


# ---- workers ----

def test_queue_worker_retry():
    calls = {"n": 0}

    def flaky(payload):
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("transient")
        return "ok"

    w = QueueWorker({"call": flaky})
    w.start()
    jid = w.enqueue("call", {})
    w.drain(10)
    assert w.status(jid).status == "done"
    assert calls["n"] == 2
    w.stop()


def test_queue_worker_failure():
    w = QueueWorker({"bad": lambda p: 1 / 0})
    w.start()
    jid = w.enqueue("bad", {})
    w.drain(10)
    assert w.status(jid).status == "failed"
    assert w.status(jid).attempts == 3    # worker_queue_retry_max default
    w.stop()


def test_autotuner_control_law():
    t = AutoTuner(target_recall=0.95, target_latency_ms=10.0,
                  ef_min=16, ef_max=512)
    assert t.step(100, 0.90, 5.0) == 120       # recall low -> +20%
    assert t.step(100, 0.97, 50.0) == 80       # latency high -> -20%
    assert t.step(100, 0.97, 5.0) == 100       # both SLOs met -> hold
    assert t.step(500, 0.5, 5.0) == 512        # clamp to envelope
    assert t.step(17, 0.99, 99.0) == 16


def test_autotuner_closed_loop(rng):
    from neurondb_tpu.index import HNSWIndex, FlatIndex
    x = rng.standard_normal((800, 16)).astype(np.float32)
    q = x[:20]
    flat = FlatIndex(x)
    _, gt = flat.search(q, k=5)
    idx = HNSWIndex(x, m=8, ef_construction=40, ef_search=16, seed=0,
                    wave=256)
    tuner = AutoTuner(target_recall=0.98, target_latency_ms=1e9,
                      ef_min=16, ef_max=256)
    ef = tuner.tune_index(idx, q, gt, k=5, iters=6)
    _, ids = idx.search(q, k=5, ef=ef)
    from neurondb_tpu.ml.metrics import recall_at_k
    assert recall_at_k(ids, gt) >= 0.9


def test_defrag_worker(rng):
    from neurondb_tpu.store import VectorStore
    st = VectorStore(8)
    ids = st.add(rng.standard_normal((100, 8)).astype(np.float32))
    st.delete(ids[:30])
    d = DefragWorker(tombstone_ratio=0.2)
    assert d.maybe_compact(st)
    assert st.size == 70
    assert not d.maybe_compact(st)   # nothing left to reclaim
