"""Bit-identity of core/trend_fast.py against the oracle ref/trend_ref.py.

The fast path claims BIT-IDENTICAL outputs (not tolerances): the C++
recurrences (native/trend_core.cpp) execute the same float64 expression
shapes without FMA/reassociation, and the vectorized pieces only move or
compare values.  Every assertion here is therefore ``tobytes()`` equality,
over randomized NaN-gapped corpora plus the structural edge cases (empty,
all-NaN, <2 valid, constant, gap-heavy).

The live financial engine consumes the fast path through
engine/realtime.py::_trend_full, so the realtime exactness/truth suites
exercise it end-to-end; this file pins the function-level contract.
"""

from __future__ import annotations

import numpy as np
import pytest

from aegis_tpu import native
from aegis_tpu.core import trend_fast as F
from aegis_tpu.ref import trend_ref as R

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable")


def _same(a, b):
    a, b = np.asarray(a), np.asarray(b)
    assert a.dtype == b.dtype, (a.dtype, b.dtype)
    assert a.shape == b.shape, (a.shape, b.shape)
    assert a.tobytes() == b.tobytes()


def _corpora():
    """(name, float64 array) cases: random values with NaN gaps at several
    densities, plus the structural edges."""
    rng = np.random.default_rng(20260821)
    cases = [
        ("empty", np.empty(0)),
        ("one", np.array([197.3])),
        ("one_nan", np.array([np.nan])),
        ("two", np.array([110.0, 113.1])),
        ("all_nan", np.full(64, np.nan)),
        ("single_valid", np.r_[np.full(30, np.nan), 220.0,
                               np.full(30, np.nan)]),
        ("two_valid_split", np.r_[np.nan, 82.4, np.full(40, np.nan), 96.0]),
        ("constant", np.full(200, 440.0)),
        ("leading_nans", np.r_[np.full(25, np.nan),
                               rng.uniform(80, 900, 175)]),
    ]
    for frac in (0.0, 0.1, 0.5, 0.9):
        for n in (17, 100, 757):
            x = rng.uniform(70.0, 1000.0, n)
            x[rng.random(n) < frac] = np.nan
            cases.append((f"rand_{frac}_{n}", x))
    # signed, mixed-magnitude data (the filters also run on MACD lines and
    # note-density bins, not just positive f0)
    for n in (64, 300):
        x = rng.normal(0.0, 3.0, n)
        x[rng.random(n) < 0.2] = np.nan
        cases.append((f"signed_{n}", x))
    return cases


@pytest.mark.parametrize("span", [5, 9, 20, 26])
def test_ema_bitwise(span):
    for name, x in _corpora():
        _same(F.ema(x, span), R.ema(x, span))


def test_kalman_bitwise():
    for name, x in _corpora():
        _same(F.kalman(x), R.kalman(x))


def test_holt_bitwise():
    for name, x in _corpora():
        _same(F.holt_winters(x), R.holt_winters(x))


def test_forward_fill_bitwise():
    for name, x in _corpora():
        _same(F.forward_fill(x), R.forward_fill(x))


def test_savgol_bitwise():
    for name, x in _corpora():
        _same(F.savgol(x), R.savgol(x))


def _nonempty():
    # the Bollinger-based stacks inherit the oracle's domain: np.convolve
    # raises on empty input and mode="same" mis-shapes when the data is
    # shorter than the window (10) — fast and oracle alike — so those
    # cases are excluded rather than specified
    return [(n, x) for n, x in _corpora() if len(x) >= 10]


def test_articulation_bitwise():
    for name, x in _nonempty():
        _same(F.detect_articulation_bollinger(x),
              R.detect_articulation_bollinger(x))


def test_slides_bitwise():
    for name, x in _corpora():
        for thr in (0.3, 0.5):
            _same(F.detect_slides_macd(x, thr), R.detect_slides_macd(x, thr))


def test_bollinger_confidence_bitwise():
    for name, x in _nonempty():
        _same(F.bollinger_confidence(x), R.bollinger_confidence(x))


def test_rsi_bitwise():
    # RSI runs on note-density bins (non-negative small counts, no NaN) in
    # the event filter, but pin the general contract on every corpus too
    rng = np.random.default_rng(7)
    for n in (0, 1, 13, 14, 15, 40, 500):
        d = rng.integers(0, 9, n).astype(np.float64)
        _same(F.rsi(d), R.rsi(d))
    for name, x in _corpora():
        _same(F.rsi(x), R.rsi(x))


def test_consensus_and_full_stack_bitwise():
    for name, x in _nonempty():
        cf, conf_f = F.multi_filter_consensus(x)
        cr, conf_r = R.multi_filter_consensus(x)
        _same(cf, cr)
        _same(conf_f, conf_r)
        fast = F.analyze_pitch_financial(x)
        ref = R.analyze_pitch_financial(x)
        assert fast.keys() == ref.keys()
        for k in ref:
            _same(fast[k], ref[k])


def _corpora32():
    """float32 corpora — the live engine's actual trend input dtype
    (engine/realtime.py passes f0_clean.astype(float32)); numpy's weak
    promotion runs the kalman/holt recurrences in float32 there, mirrored
    by the _f32 native variants."""
    return [(n, x.astype(np.float32)) for n, x in _corpora()]


def test_kalman_holt_float32_bitwise():
    for name, x in _corpora32():
        _same(F.kalman(x), R.kalman(x))
        _same(F.holt_winters(x), R.holt_winters(x))


def test_savgol_forward_fill_float32_bitwise():
    for name, x in _corpora32():
        _same(F.forward_fill(x), R.forward_fill(x))
        _same(F.savgol(x), R.savgol(x))


def test_full_stack_float32_bitwise():
    # the realtime hot path end to end: float32 f0 through the whole stack
    for name, x in _corpora32():
        if len(x) < 10:
            continue
        fast = F.analyze_pitch_financial(x)
        ref = R.analyze_pitch_financial(x)
        assert fast.keys() == ref.keys()
        for k in ref:
            _same(fast[k], ref[k])


def test_unsupported_dtype_falls_back_to_oracle():
    x = np.linspace(100, 200, 50, dtype=np.float16)
    out = F.ema(x, 5)
    _same(out, R.ema(x, 5))


def test_live_financial_session_native_on_off(monkeypatch):
    """End-to-end pin (the test_native_poly pattern): a live financial
    session's polled AND finalized events are dict-for-dict identical with
    the fast trend path on vs forced back to the oracle."""
    from aegis_tpu.engine.realtime import StreamingTranscriber

    sr = 22050
    t = np.arange(int(sr * 1.2)) / sr
    note = np.zeros_like(t)
    for h, a in ((1, 1.0), (2, 0.4), (3, 0.2)):
        note += a * np.sin(2 * np.pi * 196.0 * h * t)
    note = (0.5 * note * np.exp(-2.0 * t)).astype(np.float32)
    y = np.zeros(int(sr * 3.0), np.float32)
    y[int(0.3 * sr):int(0.3 * sr) + len(note)] += note
    y[int(1.7 * sr):int(1.7 * sr) + len(note)] += note * 0.9

    def run():
        rt = StreamingTranscriber(financial=True)
        chunk = int(0.1 * sr)
        polls = []
        for k, i in enumerate(range(0, len(y), chunk)):
            rt.feed(y[i:i + chunk])
            if k % 5 == 0:
                polls.append(rt.poll_events())
        return polls, rt.finalize()

    polls_fast, final_fast = run()
    monkeypatch.setattr(F, "analyze_pitch_financial",
                        R.analyze_pitch_financial)
    monkeypatch.setattr(F, "rsi", R.rsi)
    polls_ref, final_ref = run()
    assert polls_fast == polls_ref
    assert final_fast == final_ref
    assert {e["note"] for e in final_fast} == {55}
