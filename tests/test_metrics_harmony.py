"""Note metrics and harmonic analysis (mirrors the reference's inline
self-tests, harmonic_analysis.py:337-387)."""

import numpy as np

from aegis_tpu.harmony.key import HarmonicAnalyzer, apply_harmonic_filter
from aegis_tpu.verify.metrics import note_accuracy_metrics, note_event_f1


def _notes(pairs):
    return [{"note": n, "start": s, "end": s + 0.4, "velocity": 80}
            for n, s in pairs]


def test_f1_perfect_and_miss():
    ref = _notes([(60, 0.0), (62, 0.5), (64, 1.0)])
    assert note_event_f1(ref, ref)["f1"] == 1.0
    est = _notes([(60, 0.0), (62, 0.5)])
    m = note_event_f1(ref, est)
    assert m["recall"] < 1.0 and m["precision"] == 1.0


def test_f1_onset_tolerance():
    ref = _notes([(60, 0.0)])
    est = _notes([(60, 0.04)])
    assert note_event_f1(ref, est)["f1"] == 1.0
    est2 = _notes([(60, 0.2)])
    assert note_event_f1(ref, est2)["f1"] == 0.0


def test_accuracy_metrics():
    ref = _notes([(60, 0.0), (64, 1.0)])
    est = _notes([(60, 0.02), (64, 1.01), (70, 2.0)])
    m = note_accuracy_metrics(ref, est)
    assert m["matched"] == 2
    assert 0.0 < m["overall"] <= 1.0


def test_key_detection_major_minor_blues():
    an = HarmonicAnalyzer()
    c_major = np.array([60, 62, 64, 65, 67, 69, 71, 72])
    k = an.detect_key(c_major)
    assert k["key"] == "C"

    a_minor = np.array([69, 71, 72, 74, 76, 77, 79, 81])
    k2 = an.detect_key(a_minor)
    # A natural minor and C major share pitch classes; both are acceptable
    assert (k2["key"], k2["mode"]) in [("A", "minor"), ("C", "major")]

    blues = np.array([60, 63, 65, 66, 67, 70, 72])
    k3 = an.detect_key(blues)
    assert k3["key"] == "C" and k3["mode"] == "blues"


def test_out_of_scale_filter():
    an = HarmonicAnalyzer()
    key = {"key": "C", "mode": "major", "confidence": 1.0}
    noisy = np.array([60, 61, 62, 63, 64, 65, 67, 68, 69])
    conf = np.ones(len(noisy))
    filtered, fconf, mask = an.filter_out_of_scale_notes(noisy, conf, key,
                                                         tolerance=0)
    assert mask.sum() == 3  # C#, D#, G#
    assert set(filtered % 12) <= set(an.get_scale_notes("C", "major"))


def test_chord_context_penalty():
    an = HarmonicAnalyzer()
    key = {"key": "C", "mode": "major", "confidence": 1.0}
    # C-E-G chord window, plus one out-of-scale note (C#)
    notes = np.array([60, 64, 67, 61])
    times = np.array([0.0, 100.0, 200.0, 300.0])
    conf = np.ones(4)
    adj = an.adaptive_filter_by_context(notes, times, conf, key)
    assert adj[0] == 1.0 and adj[1] == 1.0 and adj[2] == 1.0
    assert adj[3] == 0.5  # out-of-scale non-chord tone


def test_apply_harmonic_filter_entry():
    out = apply_harmonic_filter(
        np.array([60, 62, 64, 65, 67, 69, 71, 61]), np.ones(8),
        times=np.arange(8) * 250.0, tolerance=0,
    )
    assert out["key_info"]["key"] == "C"
    assert out["out_of_scale_mask"].sum() >= 1


def test_validate_device_tool():
    """The on-device validation tool passes on the CPU backend too (device
    == oracle up to float reassociation)."""
    from aegis_tpu.tools.validate_device import validate

    result = validate()
    assert result["pass"], result


def test_name_chord():
    from aegis_tpu.harmony.key import name_chord

    assert name_chord([60, 64, 67]) == "C"
    assert name_chord([57, 60, 64]) == "Am"
    assert name_chord([40, 47, 52]) == "E5"          # power chord + octave
    assert name_chord([62, 66, 69, 72]) == "D7"
    assert name_chord([60, 63, 67]) == "Cm"
    assert name_chord([64, 67, 72]) == "C"           # first inversion -> C
    assert name_chord([55]) == "G"
    assert name_chord([60, 72]) == "C"               # octave pair collapses
    assert name_chord([]) == ""
    assert name_chord([60, 61, 62, 63]) == "C"       # cluster: bass fallback


def test_chord_progression_vectorized_matches_sequential():
    """The bincount chord-progression + masked adaptive filter (round 5)
    must reproduce the sequential spec exactly — including Counter's
    first-occurrence tie-break and the 0.8/0.5 penalty floats — on
    randomized event lists with negative times and unsorted order."""
    import numpy as np

    from aegis_tpu.harmony.key import HarmonicAnalyzer

    a = HarmonicAnalyzer()
    rng = np.random.default_rng(20260821)
    for _ in range(60):
        n = int(rng.integers(1, 120))
        notes = rng.integers(20, 100, n)
        times = rng.uniform(-500.0, float(rng.uniform(100, 200_000)), n)
        if rng.random() < 0.3:
            times = np.sort(times)
        conf = rng.uniform(0.0, 1.0, n)
        seq = a._chord_progression_seq(notes, times, 2000.0)
        assert a.analyze_chord_progression(notes, times) == seq
        key = a.detect_key(notes)
        scale = set(a.get_scale_notes(key["key"], key["mode"]))
        want = a._adaptive_filter_seq(
            notes, times, np.asarray(conf, np.float64).copy(),
            scale, seq, 2000.0)
        got = a.adaptive_filter_by_context(notes, times, conf, key)
        assert got.tobytes() == want.tobytes()
    # all-negative times: the sequential range() is empty
    assert a.analyze_chord_progression(
        np.array([60, 64]), np.array([-5.0, -1.0])) == []
