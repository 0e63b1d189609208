"""Financial trend filters: JAX scans/reductions vs NumPy oracle."""

import numpy as np
import pytest

from aegis_tpu.core import trend as J
from aegis_tpu.ref import trend_ref as R


@pytest.fixture(scope="module")
def noisy_pitch():
    rng = np.random.default_rng(7)
    x = 220 + np.cumsum(rng.normal(0, 2, 300))
    x[40:55] = np.nan
    x[120] = np.nan
    x[200:203] = np.nan
    return x


def _cmp(a, b, tol=1e-3):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    assert (np.isnan(a) == np.isnan(b)).all(), "NaN placement mismatch"
    both = ~np.isnan(a)
    if both.any():
        assert np.max(np.abs(a[both] - b[both])) < tol


def test_sma(noisy_pitch):
    _cmp(R.sma(noisy_pitch), J.sma(noisy_pitch.astype(np.float32)))


def test_ema(noisy_pitch):
    _cmp(R.ema(noisy_pitch), J.ema(noisy_pitch.astype(np.float32)))


def test_bollinger(noisy_pitch):
    _, ur, lr = R.bollinger(noisy_pitch, 10)
    _, uj, lj = J.bollinger(noisy_pitch.astype(np.float32), 10)
    _cmp(ur, uj, 5e-3)
    _cmp(lr, lj, 5e-3)


def test_articulation_codes(noisy_pitch):
    ar = R.detect_articulation_bollinger(noisy_pitch)
    aj = np.asarray(J.detect_articulation_bollinger(noisy_pitch.astype(np.float32)))
    assert (ar == aj).mean() > 0.99  # rare band-edge float ties allowed


def test_slides(noisy_pitch):
    sr_ = R.detect_slides_macd(noisy_pitch, 0.3)
    sj = np.asarray(J.detect_slides_macd(noisy_pitch.astype(np.float32), 0.3))
    assert (sr_ == sj).mean() > 0.99


def test_kalman_holt(noisy_pitch):
    _cmp(R.kalman(noisy_pitch), J.kalman(noisy_pitch.astype(np.float32)))
    _cmp(R.holt_winters(noisy_pitch), J.holt_winters(noisy_pitch.astype(np.float32)), 5e-3)


def test_savgol(noisy_pitch):
    _cmp(R.savgol(noisy_pitch), J.savgol(noisy_pitch.astype(np.float32)), 5e-3)


def test_rsi():
    rng = np.random.default_rng(3)
    d = np.abs(rng.normal(2, 1, 120))
    _cmp(R.rsi(d), J.rsi(d.astype(np.float32)), 1e-2)


def test_atr(noisy_pitch):
    fr, nr = R.atr_filter(noisy_pitch)
    fj, nj = J.atr_filter(noisy_pitch.astype(np.float32))
    assert (nr == np.asarray(nj)).all()
    _cmp(fr, fj)


def test_ichimoku_stochastic(noisy_pitch):
    _cmp(R.ichimoku_baseline(noisy_pitch), J.ichimoku_baseline(noisy_pitch.astype(np.float32)), 5e-3)
    _cmp(R.stochastic(noisy_pitch), J.stochastic(noisy_pitch.astype(np.float32)), 1e-2)


def test_consensus_and_confidence(noisy_pitch):
    cr, confr = R.multi_filter_consensus(noisy_pitch)
    cj, confj = J.multi_filter_consensus(noisy_pitch.astype(np.float32))
    _cmp(cr, cj, 5e-3)
    _cmp(confr, confj, 1e-2)
    _cmp(R.bollinger_confidence(noisy_pitch),
         J.bollinger_confidence(noisy_pitch.astype(np.float32)), 1e-3)


def test_adaptive_threshold(noisy_pitch):
    conf = R.bollinger_confidence(noisy_pitch)
    thr_r = R.adaptive_confidence_threshold(conf)
    thr_j = float(J.adaptive_confidence_threshold(conf.astype(np.float32)))
    assert abs(thr_r - thr_j) < 1e-4
    assert 0.3 <= thr_r <= 0.8
