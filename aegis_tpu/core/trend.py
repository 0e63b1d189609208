"""Device-side "financial" trend/noise filters (JAX).

Recurrent filters (EMA, Kalman, Holt-Winters, Wilder RSI, ATR hold-last,
Bollinger articulation state machine) are ``lax.scan`` recurrences; windowed
statistics (SMA, Bollinger std, Ichimoku, stochastic) are cumulative-sum /
gathered-window reductions — no per-frame Python loops (replaces the
reference's frame loops at financial_analysis.py / financial_filters.py; see
SURVEY.md §7.1).

Semantics contract is defined by the CPU oracle ``aegis_tpu.ref.trend_ref``
(including the documented Savitzky-Golay forward-fill deviation); every
function here is parity-tested against it.

NaN convention: f0 is NaN on unvoiced frames throughout, matching the
reference's librosa contract (midi_logic_financial.py:157-158).

Precision note: rolling variance uses a global-mean shift before the moment
cumsums so float32 cancellation stays benign at Hz magnitudes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aegis_tpu.ref.trend_ref import _savgol_kernel

NAN = jnp.nan

# Articulation / slide codes (shared with ref.trend_ref)
ARTIC_NONE, ARTIC_NORMAL, ARTIC_BEND, ARTIC_VIBRATO, ARTIC_NOISE = 0, 1, 2, 3, 4
SLIDE_NONE, SLIDE_UP, SLIDE_DOWN, SLIDE_NORMAL = 0, 1, 2, 3


def _isnan(x):
    return jnp.isnan(x)


def _trailing_window(x: jnp.ndarray, w: int, include_current: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gathered trailing windows.  Returns (vals (T, w), valid_pos (T, w)).

    include_current=True  -> window [i-w+1, i]
    include_current=False -> window [i-w, i-1]
    """
    T = x.shape[0]
    idx = jnp.arange(T)[:, None]
    if include_current:
        offs = jnp.arange(-w + 1, 1)[None, :]
    else:
        offs = jnp.arange(-w, 0)[None, :]
    pos = idx + offs
    in_range = pos >= 0
    vals = x[jnp.clip(pos, 0, T - 1)]
    return vals, in_range


# ---------------------------------------------------------------- moving avgs

def sma(data: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    valid = jnp.where(_isnan(data), 0.0, data)
    kernel = jnp.ones((window,)) / window
    out = jnp.convolve(valid, kernel, mode="same")
    return jnp.where(_isnan(data), NAN, out)


def ema(data: jnp.ndarray, span: int = 5) -> jnp.ndarray:
    """EMA with NaN-gap reset (scan; see ref.trend_ref.ema)."""
    alpha = 2.0 / (span + 1.0)

    def step(prev, x):
        is_nan = _isnan(x)
        blended = jnp.where(_isnan(prev), x, alpha * x + (1 - alpha) * prev)
        out = jnp.where(is_nan, NAN, blended)
        new_prev = jnp.where(is_nan, NAN, out)
        return new_prev, out

    _, out = jax.lax.scan(step, jnp.float32(NAN), data.astype(jnp.float32))
    return out


def _rolling_std_trailing(data: jnp.ndarray, window: int) -> jnp.ndarray:
    """NaN-aware std over trailing windows [i-window+1, i]; NaN when < 2 valid."""
    valid = ~_isnan(data)
    shift = jnp.nanmean(jnp.where(valid, data, NAN))
    shift = jnp.where(jnp.isnan(shift), 0.0, shift)
    v = jnp.where(valid, data - shift, 0.0)
    vals, _ = _trailing_window(v, window, include_current=True)
    mask, in_range = _trailing_window(valid.astype(jnp.float32), window, True)
    mask = mask * in_range
    cnt = jnp.sum(mask, axis=1)
    s1 = jnp.sum(vals * mask, axis=1)
    s2 = jnp.sum(vals * vals * mask, axis=1)
    c = jnp.maximum(cnt, 1.0)
    var = jnp.maximum(s2 / c - (s1 / c) ** 2, 0.0)
    return jnp.where(cnt > 1, jnp.sqrt(var), NAN)


def bollinger(data: jnp.ndarray, window: int = 20, num_std: float = 2.0):
    ma = sma(data, window)
    std = _rolling_std_trailing(data, window)
    return ma, ma + num_std * std, ma - num_std * std


# -------------------------------------------------------------- articulations

def detect_articulation_bollinger(f0: jnp.ndarray, window: int = 10,
                                  sensitivity: float = 2.0) -> jnp.ndarray:
    """(T,) int8 articulation codes; state machine as a scan."""
    _, upper, lower = bollinger(f0, window, sensitivity)
    above = (~_isnan(upper)) & (f0 > upper)
    below = (~_isnan(lower)) & (f0 < lower)
    state = jnp.where(above, 1, jnp.where(below, 2, 0)).astype(jnp.int32)
    is_nan = _isnan(f0)

    def step(carry, inp):
        prev_state, counter = carry
        s, nan = inp
        crossed = (prev_state != s) & (prev_state != 0)
        new_counter = jnp.where(crossed, counter + 1, 0)
        artic = jnp.where(
            new_counter >= 2,
            ARTIC_VIBRATO,
            jnp.where(s == 1, ARTIC_BEND, jnp.where(s == 2, ARTIC_NOISE, ARTIC_NORMAL)),
        )
        artic = jnp.where(nan, ARTIC_NONE, artic)
        # NaN frames skip both state and counter updates
        out_state = jnp.where(nan, prev_state, s)
        out_counter = jnp.where(nan, counter, new_counter)
        return (out_state, out_counter), artic

    (_, _), artics = jax.lax.scan(
        step, (jnp.int32(0), jnp.int32(0)), (state, is_nan)
    )
    return artics.astype(jnp.int8)


# ---------------------------------------------------------------------- MACD

def macd(data: jnp.ndarray, fast: int = 12, slow: int = 26, signal: int = 9):
    macd_line = ema(data, fast) - ema(data, slow)
    signal_line = ema(macd_line, signal)
    return macd_line, signal_line, macd_line - signal_line


def detect_slides_macd(f0: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    semis = 12.0 * jnp.log2(f0 / 440.0) + 69.0  # NaN propagates
    macd_line, _, hist = macd(semis, fast=5, slow=20, signal=9)
    out = jnp.where(
        (macd_line > threshold) & (hist > 0),
        SLIDE_UP,
        jnp.where((macd_line < -threshold) & (hist < 0), SLIDE_DOWN, SLIDE_NORMAL),
    )
    return jnp.where(_isnan(macd_line), SLIDE_NONE, out).astype(jnp.int8)


# ----------------------------------------------------------------------- RSI

def rsi(data: jnp.ndarray, period: int = 14) -> jnp.ndarray:
    """Wilder-smoothed RSI (scan), default 50."""
    n = data.shape[0]
    if n <= period:
        return jnp.full((n,), 50.0)
    deltas = jnp.diff(data)
    gains = jnp.maximum(deltas, 0.0)
    losses = jnp.maximum(-deltas, 0.0)

    init_g = jnp.mean(gains[:period])
    init_l = jnp.mean(losses[:period])

    def step(carry, inp):
        ag, al = carry
        g, l = inp
        ag = (ag * (period - 1) + g) / period
        al = (al * (period - 1) + l) / period
        return (ag, al), (ag, al)

    (_, _), (avg_g_tail, avg_l_tail) = jax.lax.scan(
        step, (init_g, init_l), (gains[period:], losses[period:])
    )
    avg_g = jnp.concatenate([init_g[None], avg_g_tail])
    avg_l = jnp.concatenate([init_l[None], avg_l_tail])
    vals = jnp.where(
        avg_l == 0, 100.0, 100.0 - 100.0 / (1.0 + avg_g / jnp.maximum(avg_l, 1e-30))
    )
    return jnp.concatenate([jnp.full((period,), 50.0), vals])


# -------------------------------------------------------------- noise filters

def kalman(data: jnp.ndarray, process_variance: float = 1e-5,
           measurement_variance: float = 1e-1) -> jnp.ndarray:
    valid = ~_isnan(data)
    first = jnp.argmax(valid)
    x0 = jnp.where(valid.any(), data[first], 0.0)

    def step(carry, x):
        x_est, p_est = carry
        nan = _isnan(x)
        p_pred = p_est + process_variance
        k = p_pred / (p_pred + measurement_variance)
        x_new = x_est + k * (x - x_est)
        p_new = (1 - k) * p_pred
        x_est = jnp.where(nan, x_est, x_new)
        p_est = jnp.where(nan, p_est, p_new)
        out = jnp.where(nan, NAN, x_est)
        return (x_est, p_est), out

    _, out = jax.lax.scan(step, (x0, jnp.float32(1.0)), data.astype(jnp.float32))
    return jnp.where(valid.any(), out, data)


def holt_winters(data: jnp.ndarray, alpha: float = 0.3, beta: float = 0.1) -> jnp.ndarray:
    valid = ~_isnan(data)
    idx = jnp.arange(data.shape[0])
    fv0 = jnp.argmax(valid)
    fv1 = jnp.argmax(valid & (idx > fv0))
    enough = valid.sum() >= 2
    level0 = data[fv0]
    trend0 = data[fv1] - data[fv0]

    def step(carry, x):
        level, trend = carry
        nan = _isnan(x)
        forecast = level + trend
        level_new = alpha * x + (1 - alpha) * forecast
        trend_new = beta * (level_new - level) + (1 - beta) * trend
        level = jnp.where(nan, level, level_new)
        trend = jnp.where(nan, trend, trend_new)
        out = jnp.where(nan, NAN, level)
        return (level, trend), out

    _, out = jax.lax.scan(step, (level0, trend0), data.astype(jnp.float32))
    return jnp.where(enough, out, data)


def forward_fill(data: jnp.ndarray) -> jnp.ndarray:
    """Hold-last-value fill; leading NaNs back-filled with the first valid."""
    T = data.shape[0]
    valid = ~_isnan(data)
    idx = jnp.arange(T)
    lvi = jax.lax.cummax(jnp.where(valid, idx, -1))
    first = jnp.argmax(valid)
    filled = data[jnp.clip(lvi, 0, T - 1)]
    return jnp.where(lvi >= 0, filled, data[first])


def savgol(data: jnp.ndarray, window: int = 11, polyorder: int = 3) -> jnp.ndarray:
    """Savitzky-Golay on forward-filled data, NaNs restored; all-NaN when
    fewer than `window` valid samples (see ref.trend_ref docstring)."""
    valid = ~_isnan(data)
    filled = forward_fill(data)
    half = window // 2
    padded = jnp.pad(filled, half, mode="edge")
    kernel = jnp.asarray(_savgol_kernel(window, polyorder)[::-1].copy(), jnp.float32)
    out = jnp.convolve(padded, kernel, mode="valid")
    out = jnp.where(valid, out, NAN)
    return jnp.where(valid.sum() > window, out, jnp.full_like(data, NAN))


def atr_filter(data: jnp.ndarray, window: int = 14, threshold: float = 2.0):
    """(filtered, noise_mask) — spike suppression with hold-last replacement."""
    n = data.shape[0]
    tr = jnp.abs(jnp.diff(data))  # length n-1, NaN propagates
    tr_valid = ~_isnan(tr)
    trv = jnp.where(tr_valid, tr, 0.0)
    cum = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(trv)])
    cnt = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(tr_valid.astype(jnp.float32))])
    i = jnp.arange(n)
    lo = jnp.maximum(i - window, 0)
    hi = jnp.minimum(i, n - 1)  # window tr[lo:i]
    s = cum[hi] - cum[lo]
    c = cnt[hi] - cnt[lo]
    atr = jnp.where((i >= window) & (i < n - 1) & (c > 0), s / jnp.maximum(c, 1), NAN)

    prev_vals = jnp.concatenate([data[:1], data[:-1]])
    noise = (~_isnan(atr)) & (~_isnan(data)) & (
        jnp.abs(data - prev_vals) > atr * threshold
    )
    noise = noise.at[0].set(False)

    def step(prev, inp):
        x, is_noise = inp
        out = jnp.where(is_noise, prev, x)
        return out, out

    _, filtered = jax.lax.scan(step, data[0], (data, noise))
    return filtered, noise


def ichimoku_baseline(data: jnp.ndarray, kijun: int = 26) -> jnp.ndarray:
    T = data.shape[0]
    vals, in_range = _trailing_window(data, kijun, include_current=False)
    ok = in_range & ~_isnan(vals)
    hi = jnp.max(jnp.where(ok, vals, -jnp.inf), axis=1)
    lo = jnp.min(jnp.where(ok, vals, jnp.inf), axis=1)
    has = ok.any(axis=1) & (jnp.arange(T) >= kijun)
    return jnp.where(has, (hi + lo) / 2.0, NAN)


def stochastic(data: jnp.ndarray, k_period: int = 14, smooth: int = 3) -> jnp.ndarray:
    T = data.shape[0]
    any_valid = (~_isnan(data)).any()
    vals, in_range = _trailing_window(data, k_period + 1, include_current=True)
    ok = in_range & ~_isnan(vals)
    hi = jnp.max(jnp.where(ok, vals, -jnp.inf), axis=1)
    lo = jnp.min(jnp.where(ok, vals, jnp.inf), axis=1)
    k_raw = (data - lo) / (hi - lo) * 100.0  # NaN where data NaN
    use = (jnp.arange(T) >= k_period) & ok.any(axis=1) & (hi - lo > 0)
    k_values = jnp.where(use, k_raw, 50.0)

    dvals, dir_ok = _trailing_window(k_values, smooth + 1, include_current=True)
    d_raw = jnp.sum(jnp.where(dir_ok, dvals, 0.0), axis=1) / jnp.maximum(
        jnp.sum(dir_ok, axis=1), 1
    )
    # np.mean over a window containing NaN propagates NaN
    has_nan = (dir_ok & _isnan(dvals)).any(axis=1)
    d_values = jnp.where(jnp.arange(T) >= smooth, jnp.where(has_nan, NAN, d_raw), 50.0)
    return jnp.where(any_valid, d_values, jnp.full((T,), 50.0))


# ------------------------------------------------------------------ consensus

def _nan_stats3(a, b, c):
    """(nanmedian, nanstd) across three arrays, elementwise."""
    stack = jnp.stack([a, b, c])
    valid = ~_isnan(stack)
    cnt = valid.sum(axis=0)
    big = jnp.where(valid, stack, jnp.inf)
    s = jnp.sort(big, axis=0)
    median = jnp.where(
        cnt == 3,
        s[1],
        jnp.where(cnt == 2, (s[0] + s[1]) / 2.0, jnp.where(cnt == 1, s[0], NAN)),
    )
    v = jnp.where(valid, stack, 0.0)
    c1 = jnp.maximum(cnt, 1)
    mean = v.sum(axis=0) / c1
    # two-pass variance: avoids f32 cancellation at Hz magnitudes
    dev = jnp.where(valid, stack - mean, 0.0)
    var = (dev * dev).sum(axis=0) / c1
    std = jnp.where(cnt > 0, jnp.sqrt(var), NAN)
    return median, std


def multi_filter_consensus(data: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    consensus, std = _nan_stats3(savgol(data), kalman(data), holt_winters(data))
    return consensus, 1.0 / (1.0 + std)


def bollinger_confidence(f0: jnp.ndarray, window: int = 10) -> jnp.ndarray:
    _, upper, lower = bollinger(f0, window)
    bw = upper - lower
    conf = jnp.where(bw > 0, 1.0 / (1.0 + bw), 1.0)
    return jnp.where(_isnan(f0) | _isnan(bw), 0.0, conf)


def analyze_pitch_financial(f0_clean: jnp.ndarray) -> dict:
    """Integrated device-side financial analysis (financial_analysis.py:368-423)."""
    trend, filter_conf = multi_filter_consensus(f0_clean)
    return {
        "trend": trend,
        "filter_confidence": filter_conf,
        "articulations": detect_articulation_bollinger(f0_clean, window=10),
        "slides": detect_slides_macd(f0_clean, threshold=0.3),
        "confidence": bollinger_confidence(f0_clean, window=10),
    }


def adaptive_confidence_threshold(conf: jnp.ndarray) -> jnp.ndarray:
    """Bollinger-style adaptive threshold: clip(mean - std, 0.3, 0.8)."""
    pos = conf > 0
    cnt = pos.sum()
    c = jnp.maximum(cnt, 1)
    mean = jnp.where(pos, conf, 0.0).sum() / c
    var = jnp.maximum(jnp.where(pos, conf * conf, 0.0).sum() / c - mean * mean, 0.0)
    thr = jnp.clip(mean - jnp.sqrt(var), 0.3, 0.8)
    return jnp.where(cnt > 0, thr, 0.5)
