"""Native (C++) poly recovery-chain parity: decisions identical to Python.

The four heavy raw-CQT passes (rescue_dead_fundamentals,
recover_octave_doublings, drop_leakage_ghosts, drop_straight_harmonic_ghosts)
and the shared envelope-statistics cache run natively
(aegis_tpu/native/poly_recover.cpp) when the library builds; core/poly.py's
Python implementations remain the SPEC.  Medians are bit-identical by
construction (exact k-selection, dtype-faithful even-average); line-fit
statistics are near-parity (double accumulation vs numpy pairwise/BLAS —
~1e-6 relative), so the contract asserted here is DECISION equality: the
full refined event lists must match dict-for-dict on the truth corpora,
and the stats must match to tight tolerances on random planes.
"""

import numpy as np
import pytest

import aegis_tpu.native as native
from aegis_tpu.engine.poly import AegisPolyEngine
from aegis_tpu.tools.signal_gen import generate_chord_progression

SR, HOP = 22050, 512

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native build unavailable")


def _force_python(monkeypatch):
    """Make get_lib() report the library unavailable (pure-Python paths)."""
    monkeypatch.setattr(native, "_TRIED", True)
    monkeypatch.setattr(native, "_LIB", None)


# ---------------------------------------------------------------- env stats

def test_env_median_bit_identical_f32():
    rng = np.random.default_rng(0)
    db = rng.normal(-30, 15, (200, 84)).astype(np.float32)
    h = native.EnvHandle(db, 43.066)
    for lo, hi in [(0, 200), (3, 40), (17, 18), (50, 83), (10, 10), (5, 4)]:
        win = db[lo:hi]
        n = win.shape[0]
        if n == 0:
            exp = np.full(84, np.nan)
        elif n % 2:
            exp = np.partition(win, n // 2, axis=0)[n // 2]
        else:
            p = np.partition(win, (n // 2 - 1, n // 2), axis=0)
            exp = (p[n // 2 - 1] + p[n // 2]) / 2.0
        got = h.med_row(lo, hi)
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, exp, err_msg=f"{lo}:{hi}")


def test_env_median_bit_identical_f64():
    rng = np.random.default_rng(1)
    db = rng.normal(-30, 15, (101, 84))
    h = native.EnvHandle(db, 43.066)
    win = db[4:77]
    p = np.partition(win, (win.shape[0] // 2 - 1, win.shape[0] // 2), axis=0)
    # n=73 odd
    exp = np.partition(win, 73 // 2, axis=0)[73 // 2]
    np.testing.assert_array_equal(h.med_row(4, 77), exp)


def test_env_shape_near_parity():
    from aegis_tpu.core.poly import _env_shape

    rng = np.random.default_rng(2)
    fps = 43.066
    h = None
    for trial in range(30):
        T = int(rng.integers(6, 120))
        # realistic envelope: decaying line + beat + noise
        t = np.arange(T)
        env = (-20.0 - 0.4 * t + 3.0 * np.sin(0.3 * t + trial)
               + rng.normal(0, 0.3, T)).astype(np.float32)
        db = np.tile(env[:, None], (1, 4)).astype(np.float32)
        h = native.EnvHandle(db, fps)
        r_py, c_py = _env_shape(db[:, 1], fps)
        r_c, c_c = h.shape(0, T, 1)
        assert r_c == pytest.approx(r_py, rel=1e-4, abs=1e-6), trial
        assert c_c == pytest.approx(c_py, rel=1e-4, abs=1e-5), trial


def test_env_negative_bin_wraps_like_numpy():
    rng = np.random.default_rng(3)
    db = rng.normal(-30, 5, (50, 84)).astype(np.float32)
    h = native.EnvHandle(db, 43.0)
    from aegis_tpu.core.poly import _med

    assert h.med_row(0, 50)[-2 + 84] == pytest.approx(
        _med(db[:, -2].copy()), abs=1e-6)
    out = np.empty(2, np.float64)
    # shape with b=-2 must read column 82, as numpy indexing would
    assert h.shape(0, 50, -2) == h.shape(0, 50, 82)


# ----------------------------------------------- whole-chain decision parity

@pytest.fixture(scope="module")
def chord_analyses():
    """Engine analyses for truth seeds (shared across parity tests)."""
    eng = AegisPolyEngine(sample_rate=SR)
    out = []
    for seed in (1, 7):
        y, truth = generate_chord_progression(seed, SR)
        out.append((seed, eng, eng.analyze(y)))
    return out


def test_native_refine_equals_python(chord_analyses, monkeypatch):
    """The refined event lists are dict-for-dict IDENTICAL with the native
    passes on vs off (same mints, same drops, same octave_uncertain flags,
    same order)."""
    results_native = [
        (seed, eng.extract_events(analysis))
        for seed, eng, analysis in chord_analyses
    ]
    _force_python(monkeypatch)
    for (seed, eng, analysis), (_, ev_nat) in zip(chord_analyses,
                                                  results_native):
        ev_py = eng.extract_events(analysis)
        assert ev_nat == ev_py, f"seed {seed}: native != python"
        assert len(ev_nat) > 0


def test_native_refine_equals_python_octave_family(monkeypatch):
    """Octave voicings exercise rescue + octave recovery + the +12 straight
    pass with beat scan — the native branches the standard family skips."""
    eng = AegisPolyEngine(sample_rate=SR)
    # power-chord / octave-pair voicings (the octave-family probe clips)
    y, _ = generate_chord_progression(
        5, SR, prog=[([40, 47, 52], 0.9), ([45, 52, 57], 0.8),
                     ([52, 64], 0.8), ([48, 60], 0.8)])
    analysis = eng.analyze(y)
    ev_nat = eng.extract_events(analysis)
    _force_python(monkeypatch)
    ev_py = eng.extract_events(analysis)
    assert ev_nat == ev_py
    # flags thread identically (octave_uncertain / recovered / rescued)
    for k in ("octave_uncertain", "recovered_octave", "rescued_root"):
        assert [bool(e.get(k)) for e in ev_nat] == \
            [bool(e.get(k)) for e in ev_py]


def test_native_pass_ok_preconditions():
    from aegis_tpu.core.poly import _EnvCache, _native_pass_ok

    db = np.zeros((40, 84), np.float32)
    cache = _EnvCache(db, 43.0)
    assert cache._nh is not None
    ev = [{"note": 60, "start": 0, "end": 30}]
    assert _native_pass_ok(ev, 24, 84, cache)
    # out-of-range notes (Python itself would IndexError deeper in) and
    # plane-width mismatches fall back to the Python spec path
    assert not _native_pass_ok([{"note": 120, "start": 0, "end": 3}],
                               24, 84, cache)
    assert not _native_pass_ok([{"note": 10, "start": 0, "end": 3}],
                               24, 84, cache)
    assert not _native_pass_ok(ev, 24, 80, cache)
    assert not _native_pass_ok([], 24, 84, cache)
