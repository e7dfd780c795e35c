"""Time-series models — AR/forecasting, decomposition, anomaly windows.

Reference: NeuronDB/src/ml/ml_timeseries.c (2361 LoC: train/forecast/
evaluate time-series models with trend/seasonality) and the timeseries_
models catalog table (sql/ml_schema.sql). TPU shapes: AR fitting is one
least-squares solve over a lagged design matrix (GEMM + Cholesky);
Holt-Winters is a lax.scan; seasonal decomposition uses convolution
moving averages.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _lag_matrix(y: jax.Array, p: int) -> Tuple[jax.Array, jax.Array]:
    n = y.shape[0]
    rows = n - p
    idx = jnp.arange(rows)[:, None] + jnp.arange(p)[None, :]
    return y[idx], y[p:]


@functools.partial(jax.jit, static_argnames=("order",))
def ar_fit(y, order: int = 4, l2: float = 1e-6) -> Dict:
    """Autoregressive AR(p) by ridge least squares."""
    y = jnp.asarray(y, jnp.float32)
    mu = jnp.mean(y)
    yc = y - mu
    X, t = _lag_matrix(yc, order)
    G = X.T @ X + l2 * jnp.eye(order)
    w = jax.scipy.linalg.solve(G, X.T @ t, assume_a="pos")
    resid = t - X @ w
    return {"coef": w, "mean": mu, "sigma2": jnp.var(resid),
            "order": jnp.asarray(order)}


def ar_forecast(model: Dict, y, steps: int = 8) -> jax.Array:
    y = jnp.asarray(y, jnp.float32) - model["mean"]
    p = int(model["order"])
    hist = y[-p:]

    def step(hist, _):
        nxt = jnp.dot(hist, model["coef"])
        return jnp.concatenate([hist[1:], nxt[None]]), nxt

    _, preds = jax.lax.scan(step, hist, None, length=steps)
    return preds + model["mean"]


@functools.partial(jax.jit, static_argnames=("season",))
def holt_winters_fit(y, *, season: int = 12, alpha: float = 0.3,
                     beta: float = 0.1, gamma: float = 0.1) -> Dict:
    """Additive Holt-Winters smoothing state."""
    y = jnp.asarray(y, jnp.float32)
    level0 = jnp.mean(y[:season])
    trend0 = (jnp.mean(y[season:2 * season]) - level0) / season
    seas0 = y[:season] - level0

    def step(carry, yt):
        level, trend, seas = carry
        s0 = seas[0]
        new_level = alpha * (yt - s0) + (1 - alpha) * (level + trend)
        new_trend = beta * (new_level - level) + (1 - beta) * trend
        new_s = gamma * (yt - new_level) + (1 - gamma) * s0
        seas = jnp.concatenate([seas[1:], new_s[None]])
        fitted = level + trend + s0
        return (new_level, new_trend, seas), fitted

    (level, trend, seas), fitted = jax.lax.scan(
        step, (level0, trend0, seas0), y)
    return {"level": level, "trend": trend, "seasonal": seas,
            "fitted": fitted, "season": jnp.asarray(season)}


def holt_winters_forecast(model: Dict, steps: int = 8) -> jax.Array:
    season = int(model["season"])
    h = jnp.arange(1, steps + 1, dtype=jnp.float32)
    seas = jnp.tile(model["seasonal"], (steps // season + 1,))[:steps]
    return model["level"] + h * model["trend"] + seas


def moving_average(y, window: int = 5) -> jax.Array:
    y = jnp.asarray(y, jnp.float32)
    kernel = jnp.ones(window) / window
    return jnp.convolve(y, kernel, mode="valid")


def seasonal_decompose(y, season: int = 12) -> Dict:
    """Additive decomposition: trend (centered MA), seasonal, residual."""
    y = jnp.asarray(y, jnp.float32)
    trend = moving_average(y, season)
    pad = (len(y) - len(trend))
    lo = pad // 2
    trend_full = jnp.concatenate([
        jnp.full(lo, trend[0]), trend,
        jnp.full(pad - lo, trend[-1])])
    detr = y - trend_full
    n_season = len(y) // season
    seas_mat = detr[: n_season * season].reshape(n_season, season)
    seas_prof = jnp.mean(seas_mat, axis=0)
    seas_prof = seas_prof - jnp.mean(seas_prof)
    seasonal = jnp.tile(seas_prof, (len(y) // season + 1,))[: len(y)]
    return {"trend": trend_full, "seasonal": seasonal,
            "residual": y - trend_full - seasonal}


def ts_anomaly_windows(y, window: int = 12, z: float = 3.0) -> jax.Array:
    """Rolling z-score anomaly flags."""
    y = jnp.asarray(y, jnp.float32)
    n = len(y)
    idx = jnp.arange(n - window)[:, None] + jnp.arange(window)[None, :]
    w = y[idx]
    mu = jnp.mean(w, axis=1)
    sd = jnp.maximum(jnp.std(w, axis=1), 1e-9)
    nxt = y[window:]
    flags = jnp.abs(nxt - mu) / sd > z
    return jnp.concatenate([jnp.zeros(window, bool), flags])
