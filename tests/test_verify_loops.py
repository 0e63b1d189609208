"""Self-verification loops: reverse analysis, auto-match, per-note
optimization, effect learning loop, technique verification."""

import numpy as np
import pytest

from aegis_tpu.engine.engine import AegisEngine
from aegis_tpu.midi.smf import MidiFile, MidiMessage, MidiTrack
from aegis_tpu.verify.auto_match import auto_match_parameters
from aegis_tpu.verify.effect_loop import adjust_parameters, learning_loop
from aegis_tpu.verify.per_note import (generate_optimization_report,
                                       optimize_all_notes,
                                       synthesize_with_per_note_params)
from aegis_tpu.verify.reverse import compare_note_lists, reverse_analysis
from aegis_tpu.verify.similarity import audio_similarity

SR = 22050


def _midi(notes=(60, 64, 67), ticks=480):
    mid = MidiFile()
    tr = MidiTrack()
    mid.tracks.append(tr)
    for n in notes:
        tr.append(MidiMessage("note_on", note=n, velocity=100, time=0))
        tr.append(MidiMessage("note_off", note=n, velocity=0, time=ticks))
    return mid.save(None)


@pytest.fixture(scope="module")
def engine():
    return AegisEngine(sample_rate=SR, backend="device")


def test_compare_note_lists():
    orig = [{"note": 60, "start": 0.0, "end": 0.5}]
    same = [{"note": 60, "start": 0.02, "end": 0.5}]
    m = compare_note_lists(orig, same)
    assert m["note_accuracy"] == 1.0
    off = [{"note": 66, "start": 2.0, "end": 2.5}]
    m2 = compare_note_lists(orig, off)
    assert m2["note_accuracy"] == 0.0


def test_audio_similarity_self_and_other():
    t = np.arange(SR) / SR
    a = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    b = (0.5 * np.sin(2 * np.pi * 523 * t)).astype(np.float32)
    assert audio_similarity(a, a, SR) > 0.99
    assert audio_similarity(a, b, SR) < audio_similarity(a, a, SR) - 0.1


def test_reverse_analysis_roundtrip(engine):
    result = reverse_analysis(_midi((60, 64, 67)), engine, sample_rate=SR)
    assert result is not None
    assert result["original_notes"] == 3
    # clean sine-ish ADSR synthesis should round-trip well
    assert result["note_accuracy"] >= 2 / 3
    assert result["pitch_accuracy"] > 0.8


def test_per_note_optimizer(engine):
    # build audio + events from the engine itself
    from aegis_tpu.tools.signal_gen import generate_test_track

    track, _ = generate_test_track(sr=SR)
    raw = engine.audio_to_midi(track)
    events = engine.extract_events(raw, None, confidence_threshold=0.5,
                                   sustain_ms=150)
    assert events
    results = optimize_all_notes(track, events, SR, 512, mode="precise")
    assert len(results) == len(events)
    assert all(0.0 <= r["similarity_score"] <= 1.0 for r in results)
    assert all(r["waveform"] in ("sawtooth", "triangle", "square")
               for r in results)

    quick = optimize_all_notes(track, events, SR, 512, mode="quick")
    assert len(quick) == len(events)

    audio = synthesize_with_per_note_params(events, results, SR, 512)
    assert len(audio) > SR

    report = generate_optimization_report(results)
    assert report["count"] == len(events)
    assert len(report["worst_notes"]) <= 5


def test_adjust_parameters_rules():
    params = {"confidence_threshold": 0.3, "min_note_duration_ms": 50,
              "sustain_ms": 200}
    acc = {"note_accuracy": 1.0, "pitch_accuracy": 1.0,
           "timing_accuracy": 1.0, "overall": 1.0}
    few = adjust_parameters(params, acc, [1] * 10, [1] * 3)
    assert few["confidence_threshold"] < params["confidence_threshold"]
    many = adjust_parameters(params, acc, [1] * 10, [1] * 20)
    assert many["confidence_threshold"] > params["confidence_threshold"]
    bad_pitch = adjust_parameters(
        params, {**acc, "pitch_accuracy": 0.2}, [1] * 10, [1] * 10)
    assert bad_pitch["sustain_ms"] < params["sustain_ms"]


def test_effect_learning_loop(engine):
    result = learning_loop(
        _midi((60, 67)), engine, preset="light_overdrive",
        max_iterations=2, sample_rate=SR,
    )
    assert result is not None
    assert len(result["history"]) >= 1
    assert 0.0 <= result["best_accuracy"]["overall"] <= 1.0


def test_auto_match(engine):
    from aegis_tpu.tools.signal_gen import two_tone

    y = two_tone(sr=SR)
    raw = engine.audio_to_midi(y)
    result = auto_match_parameters(y, engine, raw, sample_rate=SR)
    assert result is not None
    assert 0.1 <= result["confidence_threshold"] <= 0.9
    assert result["score"] > 0.1


def test_technique_verifier_bend_discrimination():
    """A real pitch-bend is verified; a falsely-tagged steady note is
    stripped (exercises the FM probe path used when FluidSynth is absent)."""
    from aegis_tpu.verify.technique import verify_technique_by_audio_matching

    sr, hop = 22050, 512
    dur = 0.6
    n = int(sr * dur)
    t = np.arange(n) / sr
    f0 = 440.0 * 2 ** ((55 - 69) / 12)

    # bending tone: accelerating rise of 2 semitones (like a real bend)
    semis = 2.0 * (t / dur) ** 2
    phase = 2 * np.pi * np.cumsum(f0 * 2 ** (semis / 12)) / sr
    y_bend = (0.5 * (2 * ((phase / (2 * np.pi)) % 1) - 1)).astype(np.float32)
    # steady tone
    phase_s = 2 * np.pi * f0 * t
    y_steady = (0.5 * (2 * ((phase_s / (2 * np.pi)) % 1) - 1)).astype(np.float32)

    end_frame = n // hop - 1
    ev = {"note": 55, "start": 0, "end": end_frame, "velocity": 100,
          "technique": "bend", "confidence": 0.9, "track": "main"}

    out_bend = verify_technique_by_audio_matching(
        y_bend, [dict(ev)], sr, hop, min_similarity=0.3)
    out_steady = verify_technique_by_audio_matching(
        y_steady, [dict(ev)], sr, hop, min_similarity=0.3)
    assert out_bend[0]["technique"] == "bend", out_bend[0]
    assert out_steady[0]["technique"] is None, out_steady[0]


def test_technique_verifier_hammer_on_discrimination():
    """A soft legato attack keeps hammer_on; a sharp picked attack loses it
    (mel cosine is amplitude-invariant — the envelope path must decide)."""
    from aegis_tpu.verify.technique import verify_technique_by_audio_matching

    sr, hop = 22050, 512
    dur = 0.4
    n = int(sr * dur)
    t = np.arange(n) / sr
    f0 = 440.0 * 2 ** ((57 - 69) / 12)
    saw = 2 * ((f0 * t) % 1) - 1

    def clip(attack_s):
        env = np.minimum(1.0, t / attack_s) * np.exp(-1.5 * t)
        return (0.5 * saw * env).astype(np.float32)

    end_frame = n // hop - 1
    ev = {"note": 57, "start": 0, "end": end_frame, "velocity": 70,
          "technique": "hammer_on", "confidence": 0.9, "track": "main"}

    soft = verify_technique_by_audio_matching(
        clip(0.05), [dict(ev)], sr, hop, min_similarity=0.3)
    sharp = verify_technique_by_audio_matching(
        clip(0.002), [dict(ev)], sr, hop, min_similarity=0.3)
    assert soft[0]["technique"] == "hammer_on", soft[0]
    assert sharp[0]["technique"] is None, sharp[0]
