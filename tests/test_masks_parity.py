"""Mask kernels: vectorized JAX vs loop-style NumPy oracle."""

import numpy as np

from aegis_tpu.core import masks as J
from aegis_tpu.ref import masks_ref as R

SR, HOP = 22050, 512


def _spec(rng, T=200, mels=32):
    S = rng.normal(-50, 15, (T, mels))
    # inject broadband columns (rake candidates) of various run lengths
    for start, length in [(20, 1), (50, 2), (80, 4)]:
        S[start : start + length] = -5.0
    return S.astype(np.float32)


def test_run_length_keep():
    rng = np.random.default_rng(0)
    for _ in range(10):
        m = rng.random(80) < 0.3
        for lo, hi in [(0, 1), (1, 3), (2, 80)]:
            ref = R.run_length_keep(m, lo, hi)
            dev = np.asarray(J.run_length_keep(m, lo, hi))
            assert (ref == dev).all()


def test_detect_rake_parity():
    rng = np.random.default_rng(1)
    S = _spec(rng)
    ref = R.detect_rake(S, HOP, SR, 0.6)
    dev = np.asarray(J.detect_rake(S, HOP, SR, 0.6))
    assert (ref == dev).all()
    assert ref.any()  # the single-frame burst must be caught at this rate


def test_palm_mute_parity():
    rng = np.random.default_rng(2)
    S = rng.normal(-40, 10, (150, 32)).astype(np.float32)
    S[60:62, : 16] = -5.0  # strong low band, short duration
    ref = R.detect_palm_mute(S, HOP, SR)
    dev = np.asarray(J.detect_palm_mute(S, HOP, SR))
    assert (ref == dev).all()


def test_enhance_rake_parity():
    # Trigger requires a >10 dB jump whose following window (which includes
    # the jump itself) has a negative mean: +11 dB spike then -8 dB/frame
    # decay, with hop=128 so the 30 ms window spans ~5 frames.
    S = np.full((200, 32), -50.0, np.float32)
    S[100] = -39.0
    for i, drop in enumerate([-8.0, -16.0, -24.0, -32.0, -40.0, -48.0]):
        S[101 + i] = -39.0 + drop
    base = np.zeros(200, bool)
    ref = R.enhance_rake(S, 128, SR, base)
    dev = np.asarray(J.enhance_rake(S, 128, SR, base))
    assert (ref == dev).all()
    assert ref.any()

    # random-field parity as well
    rng = np.random.default_rng(3)
    S2 = rng.normal(-50, 8, (150, 32)).astype(np.float32)
    ref2 = R.enhance_rake(S2, HOP, SR, np.zeros(150, bool))
    dev2 = np.asarray(J.enhance_rake(S2, HOP, SR, np.zeros(150, bool)))
    assert (ref2 == dev2).all()


def test_subharmonic_parity():
    f0 = np.array([42.0, 60.0, 82.0, 110.0, 220.0, np.nan, 30.0])
    voiced = np.array([True, True, True, True, True, False, True])
    fr, vr = R.filter_subharmonic(f0, voiced)
    fj, vj = J.filter_subharmonic(f0, voiced)
    fj, vj = np.asarray(fj), np.asarray(vj)
    assert (np.isnan(fr) == np.isnan(fj)).all()
    both = ~np.isnan(fr)
    np.testing.assert_allclose(fr[both], fj[both])
    assert (vr == vj).all()
    # 42 Hz doubles into range (84 >= 82.4); 30 Hz doubles to 60 -> removed
    assert fj[0] == np.float32(84.0) and np.isnan(fj[6])


def test_distortion_score():
    rng = np.random.default_rng(4)
    S = rng.normal(-40, 5, (100, 32)).astype(np.float32)
    assert abs(R.distortion_score(S) - float(J.distortion_score(S))) < 1e-4
    assert J.classify_distortion(0.5) == "heavy"
    assert J.classify_distortion(0.3) == "light"
    assert J.classify_distortion(0.1) == "clean"
