"""String-realism floors: truth F1 under stiff-string inharmonicity.

Every truth gate used to ride ideally-harmonic Karplus-Strong physics,
while the analysis chain (comb templates, harmonic dedup, octave
recovery) hardcodes exact harmonic ratios — the closest a zero-egress
image gets to the driver's "real guitar WAV" config is stressing those
assumptions with the measured physical range of real strings
(VERDICT r2 next #3).  tools/signal_gen.py::pluck_inharmonic adds
stretched partials f_n = n·f0·√(1+B·n²), pluck-position comb
amplitudes, frequency-dependent damping, a pick transient and body
resonance; tools/inharmonic_sweep.py measured the full B sweep
(VALIDATION.md round 3, 2026-08-20):

    B       v1      financial  neural   poly(mean s1/3/7)
    0       1.0     1.0        1.0      1.0
    1e-5    0.9703  0.9703     0.9901   1.0
    3e-5    0.9796  0.9796     1.0      1.0
    1e-4    0.9714  0.9714     0.9714   1.0
    3e-4    0.9808  0.9808     1.0      1.0
    1e-3    0.9495  0.9495     0.9899   1.0

The poly comb survives the stretch outright (the ±1-bin rim absorbs the
≤54-cent h8 shift).  The mono residual is NOT pitch error: precision
stays 1.0 at every B; the misses are repeated same-pitch short plucks
that sustain-merge because the softer realistic attack (comb-shaped
spectrum, body ringing) weakens the spectral-flux onset that would split
them — a physical behavior, measured and documented rather than tuned
away on the generator.  This file pins the B=1e-4 floors on the sweep's
exact configs.
"""

import numpy as np
import pytest

from aegis_tpu.tools.signal_gen import (generate_bench_track,
                                        generate_chord_progression,
                                        pluck_inharmonic)

SR, HOP = 22050, 512
B_PIN = 1e-4


def test_partials_are_stretched():
    """Generator physics: spectral peaks land on f_n = n·f0·√(1+B·n²),
    not on the harmonic series (h5 at B=1e-3 is ~21 cents sharp)."""
    f0, B = 110.0, 1e-3
    y = pluck_inharmonic(f0, 1.5, SR, B=B, rng=np.random.default_rng(0),
                         body=False, pick_level=0.0)
    seg = y[int(0.1 * SR): int(1.3 * SR)] * np.hanning(int(1.2 * SR))
    S = np.abs(np.fft.rfft(seg, 1 << 18))
    freqs = np.fft.rfftfreq(1 << 18, 1 / SR)
    for n in (2, 3, 5, 8):
        expect = n * f0 * np.sqrt(1 + B * n * n)
        lo, hi = np.searchsorted(freqs, [expect - 15, expect + 15])
        got = freqs[lo + np.argmax(S[lo:hi])]
        assert abs(got - expect) < 1.0, (n, got, expect)
        # and clearly OFF the unstretched harmonic for the high partials
        if n >= 5:
            assert abs(got - n * f0) > 2.0, (n, got)


def test_v1_inharmonic_floor():
    """v1 pipeline on the 20 s sweep track at B=1e-4: measured 0.9714,
    precision 1.0 (the recall gap is the documented same-pitch merge
    class).  Floor 0.95 per the realism criterion."""
    from aegis_tpu.engine.engine import AegisEngine
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    y, truth = generate_bench_track(20.0, sr=SR, B=B_PIN, return_truth=True)
    eng = AegisEngine(sample_rate=SR, backend="device")
    ev = eng.extract_events(eng.audio_to_midi(y, None), None,
                            confidence_threshold=0.3)
    r = note_event_f1(truth, events_to_seconds(ev, SR, HOP))
    assert r["f1"] >= 0.95, r
    assert r["precision"] == 1.0, r


def test_neural_inharmonic_floor():
    """PitchNet was trained on harmonic additive/KS clips only; this is
    its out-of-distribution re-validation (measured 0.9714 at B=1e-4,
    0.99+ elsewhere — MORE robust than pYIN across the sweep)."""
    from aegis_tpu.engine.engine import AegisEngine
    from aegis_tpu.models.pitchnet import have_default_weights
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    if not have_default_weights():
        pytest.skip("no committed PitchNet weights")
    y, truth = generate_bench_track(20.0, sr=SR, B=B_PIN, return_truth=True)
    eng = AegisEngine(sample_rate=SR, backend="device")
    ev = eng.extract_events(
        eng.audio_to_midi(y, None, pitch_backend="neural"), None,
        confidence_threshold=0.3)
    r = note_event_f1(truth, events_to_seconds(ev, SR, HOP))
    assert r["f1"] >= 0.95, r


def test_poly_inharmonic_floor():
    """The chord peel's comb templates assume exact harmonic ratios —
    and measure F1 1.0 under the full stretch range anyway (the ±1-bin
    comb rim absorbs ≤54-cent partial shifts).  Pin seeds 1/3 at
    B=1e-4."""
    from aegis_tpu.engine.poly import AegisPolyEngine
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    eng = AegisPolyEngine(sample_rate=SR)
    for seed in (1, 3):
        y, truth = generate_chord_progression(seed, sr=SR, B=B_PIN)
        ev = eng.extract_events(eng.analyze(y))
        r = note_event_f1(truth, events_to_seconds(ev, SR, HOP))
        assert r["f1"] >= 0.99, (seed, r)
