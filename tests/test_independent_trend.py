"""A second, independently-structured consensus trend filter cross-checking
the financial oracle (VERDICT r2 next #6 — the trend-stack sibling of
test_independent_pyin.py).

The financial pipeline's pitch trend is the median consensus of
{savgol, kalman, holt} with confidence 1/(1+std) (reference
financial_filters.py:256-298).  The oracle `ref/trend_ref.py` mirrors the
reference loop-for-loop and the device `core/trend.py` re-expresses it as
log-depth scans — but both were written by the same hand, so a shared
misreading of the spec would pass parity.  This file derives each filter
AGAIN from its textbook definition with deliberately different structure:

    ref/trend_ref.py                 this file
    --------------------------       ---------------------------------
    scalar Kalman update loop        closed-form: gains precomputed from
                                     the data-independent Riccati
                                     recursion, state = weighted sum via
                                     cumulative products
    Holt level/trend scalar loop     functional fold (reduce, immutable
                                     state) from the textbook form
    pinv Savitzky-Golay kernel +     scipy.signal.savgol_filter
    manual edge-pad convolution      (mode="nearest")
    nanmedian/nanstd consensus       sort-network median of three +
                                     explicit two-pass std

Agreement on NaN-gapped, octave-jumping pitch tracks rules out the
shared-bug class parity tests cannot see.
"""

import functools

import numpy as np
import pytest
from scipy import signal as sps

from aegis_tpu.ref import trend_ref as R

# --------------------------------------------------------------------------
# naive implementations (no shared code with ref/trend_ref or core/trend)
# --------------------------------------------------------------------------


def naive_kalman(data, q=1e-5, r=1e-1):
    """The Riccati gain recursion never reads the data, so the whole filter
    collapses to a closed-form weighted sum: x_j = Σ w_{j,i} z_i with
    w built from cumulative products of (1-k)."""
    valid = ~np.isnan(data)
    idx = np.where(valid)[0]
    if len(idx) == 0:
        return data.astype(np.float64).copy()
    z = data[idx].astype(np.float64)
    m = len(z)
    k = np.empty(m)
    p = 1.0
    for j in range(m):
        p_pred = p + q
        k[j] = p_pred / (p_pred + r)
        p = (1 - k[j]) * p_pred
    # x_j = (1-k_j) x_{j-1} + k_j z_j,  x_{-1} = z_0  (ref inits x_est=z_0
    # and then still runs the j=0 update against z_0 — same value either way)
    one_minus = 1.0 - k
    # suffix products S[i, j] = prod_{m=i+1..j} (1-k_m) via log-cumsum
    logs = np.log(one_minus)
    cs = np.concatenate([[0.0], np.cumsum(logs)])  # cs[j] = sum logs[:j]
    x = np.empty(m)
    for j in range(m):
        # contribution of z_i (i<=j): k_i * prod_{m=i+1..j}(1-k_m)
        w = k[: j + 1] * np.exp(cs[j + 1] - cs[1 : j + 2])
        x[j] = np.dot(w, z[: j + 1]) + z[0] * np.exp(cs[j + 1] - cs[0])
    out = np.full(len(data), np.nan)
    out[idx] = x
    return out


def naive_holt(data, alpha=0.3, beta=0.1):
    """Holt's level/trend smoothing as a functional fold over the valid
    samples (reduce with an immutable state tuple) — written from the
    textbook forecast/update form, not the oracle's indexed loop."""
    valid = ~np.isnan(data)
    idx = np.where(valid)[0]
    if len(idx) < 2:
        return data.astype(np.float64).copy()
    z = data[idx].astype(np.float64)

    def step(state, zi):
        level, trend, outs = state
        forecast = level + trend
        level_new = alpha * zi + (1 - alpha) * forecast
        trend_new = beta * (level_new - level) + (1 - beta) * trend
        return (level_new, trend_new, outs + [level_new])

    _, _, outs = functools.reduce(step, z, (z[0], z[1] - z[0], []))
    out = np.full(len(data), np.nan)
    out[idx] = outs
    return out


def naive_savgol(data, window=11, polyorder=3):
    valid = ~np.isnan(data)
    if valid.sum() <= window:
        return np.full(len(data), np.nan)
    filled = data.astype(np.float64).copy()
    # same documented NaN policy (forward-fill interior, back-fill head)
    last = np.nan
    for i in range(len(filled)):
        if np.isnan(filled[i]):
            filled[i] = last
        else:
            last = filled[i]
    first = int(np.argmax(valid))
    filled[:first] = data[first]
    out = sps.savgol_filter(filled, window, polyorder, mode="nearest")
    out[~valid] = np.nan
    return out


def naive_consensus(data):
    s, k, h = naive_savgol(data), naive_kalman(data), naive_holt(data)
    stack = np.stack([s, k, h])
    n = (~np.isnan(stack)).sum(axis=0).astype(np.float64)
    vals = np.where(np.isnan(stack), 0.0, stack)
    mean = np.divide(vals.sum(axis=0), n, out=np.full(len(data), np.nan),
                     where=n > 0)
    # median of three by sort network: med = a+b+c - max - min (nan-aware:
    # where all three present; fewer -> mean equals nanmedian for n<=2)
    a, b, c = stack
    all3 = ~np.isnan(a) & ~np.isnan(b) & ~np.isnan(c)
    med = np.where(all3,
                   a + b + c - np.fmax(np.fmax(a, b), c)
                   - np.fmin(np.fmin(a, b), c),
                   mean)
    # population std, explicit two-pass
    dev = np.where(np.isnan(stack), 0.0, (stack - mean) ** 2)
    std = np.sqrt(np.divide(dev.sum(axis=0), n,
                            out=np.full(len(data), np.nan), where=n > 0))
    return med, 1.0 / (1.0 + std)


# --------------------------------------------------------------------------
# fixtures: realistic pitch tracks (NaN gaps, octave jump, vibrato, noise)
# --------------------------------------------------------------------------

def _pitch_track(seed=0, n=400):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 43.07
    f = np.where(t < 4.0, 110.0, 220.0) * 2 ** (
        0.3 / 12 * np.sin(2 * np.pi * 5.0 * t))
    f = f * 2 ** (rng.normal(0, 0.02, n) / 12)
    f[:7] = np.nan
    f[150:170] = np.nan
    f[rng.integers(0, n, 12)] = np.nan
    return f


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_naive_vs_oracle_filters(seed):
    """Each filter independently agrees with the oracle."""
    f = _pitch_track(seed)
    np.testing.assert_allclose(naive_kalman(f), R.kalman(f),
                               rtol=1e-9, atol=1e-9, equal_nan=True)
    np.testing.assert_allclose(naive_holt(f), R.holt_winters(f),
                               rtol=1e-9, atol=1e-9, equal_nan=True)
    np.testing.assert_allclose(naive_savgol(f), R.savgol(f),
                               rtol=1e-7, atol=1e-7, equal_nan=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_naive_vs_oracle_consensus(seed):
    f = _pitch_track(seed)
    med_n, conf_n = naive_consensus(f)
    med_r, conf_r = R.multi_filter_consensus(f)
    np.testing.assert_allclose(med_n, med_r, rtol=1e-7, atol=1e-7,
                               equal_nan=True)
    np.testing.assert_allclose(conf_n, conf_r, rtol=1e-7, atol=1e-7,
                               equal_nan=True)


def test_naive_vs_device_consensus():
    """And the DEVICE trend stack (log-depth scans, Precision.HIGHEST)
    agrees with the naive consensus end-to-end — closing the triangle
    naive == oracle == device on the same gapped track."""
    import jax.numpy as jnp

    from aegis_tpu.core import trend as T

    f = _pitch_track(3)
    med_n, conf_n = naive_consensus(f)
    out = T.analyze_pitch_financial(jnp.asarray(f))
    med_d = np.asarray(out["trend"], np.float64)
    conf_d = np.asarray(out["filter_confidence"], np.float64)
    valid = ~np.isnan(med_n)
    np.testing.assert_allclose(med_d[valid], med_n[valid],
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(conf_d[valid], conf_n[valid],
                               rtol=2e-3, atol=2e-3)
