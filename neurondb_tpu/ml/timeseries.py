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


# ---------------------------------------------------------------------------
# ARIMA(p, d, q)
#
# Reference surface: NeuronDB/src/ml/ml_timeseries.c:443 (train_arima),
# :702 (forecast_arima), :957 (evaluate_arima_by_model_id). The reference
# fits only the AR part (Yule-Walker on the d-differenced series,
# ml_timeseries.c:193-334) and leaves ma_coeffs zero-initialised. Here the
# MA part is actually estimated via Hannan-Rissanen: a long-AR proxy
# recovers innovations, then one joint least-squares over [p lags, q
# lagged innovations] fits phi and theta together — strictly stronger
# than the reference while keeping the same (p, d, q) surface.
# ---------------------------------------------------------------------------


def _difference(y: jnp.ndarray, d: int) -> jnp.ndarray:
    """d-fold first differencing (ml_timeseries.c:105 compute_differences)."""
    for _ in range(d):
        if y.shape[0] < 2:
            raise ValueError("cannot difference below length 2")
        y = y[1:] - y[:-1]
    return y


def arima_fit(y, p: int = 1, d: int = 1, q: int = 1,
              l2: float = 1e-6) -> Dict:
    """Fit ARIMA(p, d, q) by Hannan-Rissanen two-stage least squares.

    Stage 1: long AR(m) on the differenced series recovers innovation
    estimates. Stage 2: regress z_t on [z_{t-1..t-p}, e_{t-1..t-q}].
    Returns a model dict mirroring the reference's arima_models row
    (p/d/q/intercept/ar_coeffs/ma_coeffs + residuals/sigma2).
    """
    y = jnp.asarray(y, jnp.float32)
    if p < 0 or p > 32 or d < 0 or d > 4 or q < 0 or q > 32:
        raise ValueError("arima order out of bounds (p,q in [0,32], d in [0,4])")
    z = _difference(y, d)
    n = int(z.shape[0])
    m = max(p + q, min(n // 4, 2 * (p + q) + 4), 1)
    if n < m + max(p, q) + 4:
        raise ValueError(f"need at least {m + max(p, q) + 4} observations "
                         f"after differencing, got {n}")
    mu = jnp.mean(z)
    zc = z - mu

    if q > 0:
        # Stage 1: innovations from a long-AR proxy.
        Xl, tl = _lag_matrix(zc, m)
        Gl = Xl.T @ Xl + l2 * jnp.eye(m)
        wl = jax.scipy.linalg.solve(Gl, Xl.T @ tl, assume_a="pos")
        e = jnp.concatenate([jnp.zeros(m), tl - Xl @ wl])
        # Stage 2: joint LS over AR lags and lagged innovations.
        lag = max(p, q)
        rows = n - lag
        cols = []
        for i in range(1, p + 1):
            cols.append(zc[lag - i: lag - i + rows])
        for j in range(1, q + 1):
            cols.append(e[lag - j: lag - j + rows])
        X = jnp.stack(cols, axis=1) if cols else jnp.zeros((rows, 0))
        t = zc[lag:]
        G = X.T @ X + l2 * jnp.eye(p + q)
        w = jax.scipy.linalg.solve(G, X.T @ t, assume_a="pos")
        phi, theta = w[:p], w[p:]
        resid = t - X @ w
        resid = jnp.concatenate([jnp.zeros(lag), resid])
    elif p > 0:
        Xl, tl = _lag_matrix(zc, p)
        G = Xl.T @ Xl + l2 * jnp.eye(p)
        phi = jax.scipy.linalg.solve(G, Xl.T @ tl, assume_a="pos")
        theta = jnp.zeros(0)
        resid = jnp.concatenate([jnp.zeros(p), tl - Xl @ phi])
    else:
        phi = jnp.zeros(0)
        theta = jnp.zeros(0)
        resid = zc
    return {"p": p, "d": d, "q": q, "intercept": mu,
            "ar_coeffs": phi, "ma_coeffs": theta,
            "residuals": resid,
            "sigma2": jnp.var(resid) if resid.size else jnp.float32(0.0),
            "last_values": y[-(max(p, 1) + d + 8):]}


def arima_forecast(model: Dict, y=None, steps: int = 8) -> jax.Array:
    """h-step forecast; AR+MA recursion on the differenced scale, then
    d-fold cumulative re-integration (ml_timeseries.c:702 forecast_arima)."""
    p, d, q = model["p"], model["d"], model["q"]
    hist = jnp.asarray(y, jnp.float32) if y is not None \
        else jnp.asarray(model["last_values"], jnp.float32)
    phi = model["ar_coeffs"]
    theta = model["ma_coeffs"]
    mu = model["intercept"]
    z = _difference(hist, d) - mu

    zp = jnp.concatenate([jnp.zeros(max(p, 1)), z])[-max(p, 1):]
    ep = jnp.concatenate([jnp.zeros(max(q, 1)),
                          jnp.asarray(model["residuals"])])[-max(q, 1):]

    def step(carry, _):
        zhist, ehist = carry
        nxt = 0.0
        if p:
            nxt = nxt + jnp.dot(zhist[-p:][::-1], phi)
        if q:
            nxt = nxt + jnp.dot(ehist[-q:][::-1], theta)
        zhist = jnp.concatenate([zhist[1:], jnp.asarray(nxt)[None]])
        ehist = jnp.concatenate([ehist[1:], jnp.zeros(1)])  # E[e]=0
        return (zhist, ehist), nxt

    _, zf = jax.lax.scan(step, (zp, ep), None, length=steps)
    zf = zf + mu
    # Re-integrate: undo each differencing level from the tail of hist.
    tails = [hist]
    for _ in range(d):
        tails.append(tails[-1][1:] - tails[-1][:-1])
    out = zf
    for lvl in range(d - 1, -1, -1):
        out = tails[lvl][-1] + jnp.cumsum(out)
    return out


def arima_evaluate(model: Dict, y, horizon: int = 8) -> Dict[str, float]:
    """Hold out the last ``horizon`` points, forecast them, report
    mse/mae/rmse/mape (ml_timeseries.c:957 evaluate_arima_by_model_id)."""
    y = jnp.asarray(y, jnp.float32)
    if y.shape[0] <= horizon + model["d"] + max(model["p"], model["q"]) + 4:
        raise ValueError("series too short for requested horizon")
    train, test = y[:-horizon], y[-horizon:]
    m = arima_fit(train, model["p"], model["d"], model["q"])
    pred = arima_forecast(m, train, steps=horizon)
    err = pred - test
    mae = float(jnp.mean(jnp.abs(err)))
    mse = float(jnp.mean(err ** 2))
    denom = jnp.maximum(jnp.abs(test), 1e-9)
    return {"mse": mse, "mae": mae, "rmse": mse ** 0.5,
            "mape": float(jnp.mean(jnp.abs(err) / denom)),
            "horizon": float(horizon)}


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
