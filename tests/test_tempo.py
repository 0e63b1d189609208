"""Tempo estimation + tempo-aware MIDI export (beyond-reference feature)."""

import io

import numpy as np

from aegis_tpu.core.tempo import estimate_tempo
from aegis_tpu.midi.decode import midi_to_notes
from aegis_tpu.midi.encode import events_to_midi, events_to_midi_financial
from aegis_tpu.tools.signal_gen import karplus_strong

SR = 22050
HOP = 512


def _pluck_track(bpm: float, beats: int = 16, sr: int = SR) -> np.ndarray:
    period = 60.0 / bpm
    n = int((beats + 1) * period * sr)
    y = np.zeros(n, np.float32)
    rng = np.random.default_rng(11)
    notes = [55, 57, 60, 62]
    for b in range(beats):
        at = int(b * period * sr)
        f = 440.0 * 2 ** ((notes[b % 4] - 69) / 12)
        p = karplus_strong(f, min(0.4, period * 0.8), sr, rng=rng)
        y[at: at + len(p)] += p[: n - at]
    return (y / max(np.max(np.abs(y)), 1e-9) * 0.7).astype(np.float32)


def _onset_env(y: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    from aegis_tpu.core.cqt import onset_envelope_program

    return np.asarray(onset_envelope_program(jnp.asarray(y), SR,
                                             hop_length=HOP))


def test_estimate_tempo_known_bpm():
    for bpm in (100.0, 120.0, 150.0):
        env = _onset_env(_pluck_track(bpm))
        got = estimate_tempo(env, SR, HOP)
        assert got is not None
        assert abs(got - bpm) / bpm < 0.03, (bpm, got)


def test_estimate_tempo_degenerate():
    assert estimate_tempo(np.zeros(0), SR, HOP) is None
    assert estimate_tempo(np.zeros(500), SR, HOP) is None  # silence
    # a single sustained note: envelope is one spike, no periodicity peak
    env = np.zeros(400)
    env[3] = 1.0
    got = estimate_tempo(env, SR, HOP)
    assert got is None or 30.0 <= got <= 300.0


_EVENTS = [
    {"note": 60, "start": 0, "end": 20, "confidence": 0.9, "velocity": 90,
     "track": "main", "technique": None, "slope": 0.0, "rms_energy": -20.0},
    {"note": 64, "start": 30, "end": 55, "confidence": 0.8, "velocity": 80,
     "track": "main", "technique": None, "slope": 0.0, "rms_energy": -22.0},
    {"note": 48, "start": 60, "end": 90, "confidence": 0.4, "velocity": 70,
     "track": "safe", "technique": None, "slope": 0.0, "rms_energy": -30.0},
]


def _note_seconds(midi_bytes: bytes):
    return sorted((n["note"], round(n["start"], 3), round(n["end"], 3))
                  for n in midi_to_notes(midi_bytes))


def test_bpm_export_preserves_wall_clock_v1():
    """set_tempo changes the musical grid, not the note timing."""
    plain = events_to_midi(_EVENTS, SR, HOP)
    tempod = events_to_midi(_EVENTS, SR, HOP, bpm=93.5)
    # decoded wall-clock times match within one tick of the slower grid
    a, b = _note_seconds(plain), _note_seconds(tempod)
    for (n1, s1, e1), (n2, s2, e2) in zip(a, b):
        assert n1 == n2
        assert abs(s1 - s2) < 0.01 and abs(e1 - e2) < 0.01
    # the tempo meta event is present and carries the requested BPM
    from aegis_tpu.midi.smf import MidiFile

    mf = MidiFile.load(tempod)
    tempos = [m.tempo for t in mf.tracks for m in t if m.type == "set_tempo"]
    assert tempos and abs(60e6 / tempos[0] - 93.5) < 0.1


def test_bpm_export_preserves_wall_clock_financial():
    plain = events_to_midi_financial(_EVENTS, SR, HOP)
    tempod = events_to_midi_financial(_EVENTS, SR, HOP, bpm=140.0)
    a, b = _note_seconds(plain), _note_seconds(tempod)
    for (n1, s1, e1), (n2, s2, e2) in zip(a, b):
        assert n1 == n2
        assert abs(s1 - s2) < 0.01 and abs(e1 - e2) < 0.01


def test_engine_bpm_auto():
    """bpm='auto' through the v1 facade: estimated from the analysis onset
    envelope and written into the exported MIDI."""
    from aegis_tpu.engine.engine import AegisEngine
    from aegis_tpu.midi.smf import MidiFile

    y = _pluck_track(110.0, beats=12)
    eng = AegisEngine(sample_rate=SR, backend="device")
    raw = eng.audio_to_midi(y, None)
    est = eng.estimate_bpm(raw)
    assert est is not None and abs(est - 110.0) / 110.0 < 0.05

    buf = io.BytesIO()
    eng.extract_events(raw, buf, confidence_threshold=0.3, bpm="auto")
    mf = MidiFile.load(buf.getvalue())
    tempos = [m.tempo for t in mf.tracks for m in t if m.type == "set_tempo"]
    assert tempos and abs(60e6 / tempos[0] - est) < 1.0
