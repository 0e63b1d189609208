"""ADSR synth, effects chain, and synthesis round-trips."""

import numpy as np

from aegis_tpu.midi.smf import MidiFile, MidiMessage, MidiTrack
from aegis_tpu.io.wav import read_wav
from aegis_tpu.synth.adsr import (analyze_envelope, midi_to_wav_adsr,
                                  synthesize_midi_adsr, synthesize_note_arrays)
from aegis_tpu.synth.effects import apply_effect_chain, distortion
from aegis_tpu.synth.presets import GUITAR_ADSR_PRESETS

SR = 22050


def _simple_midi(notes=(60, 64, 67)):
    mid = MidiFile()
    tr = MidiTrack()
    mid.tracks.append(tr)
    for n in notes:
        tr.append(MidiMessage("note_on", note=n, velocity=100, time=0))
        tr.append(MidiMessage("note_off", note=n, velocity=0, time=480))
    return mid.save(None)


def test_note_render_frequency():
    notes = [{"note": 69, "start": 0.0, "end": 0.5, "velocity": 100}]
    audio = synthesize_note_arrays(notes, SR, waveform="sine", release_ms=10)
    seg = audio[int(0.05 * SR) : int(0.4 * SR)]
    zc = np.sum(np.abs(np.diff(np.signbit(seg))))
    est_freq = zc / 2 / (len(seg) / SR)
    assert abs(est_freq - 440.0) < 25  # harmonics add crossings but stay close


def test_adsr_envelope_shape():
    notes = [{"note": 60, "start": 0.0, "end": 1.0, "velocity": 127}]
    audio = synthesize_note_arrays(
        notes, SR, attack_ms=100, decay_ms=100, sustain_level=0.5,
        release_ms=100, waveform="sine",
    )
    # attack region grows, sustain region is at ~half the peak
    a = np.abs(audio[: int(0.1 * SR)])
    peak = np.abs(audio).max()
    sustain_amp = np.abs(audio[int(0.4 * SR) : int(0.8 * SR)]).max()
    assert a[: len(a) // 4].max() < a[len(a) // 2 :].max()
    assert 0.3 * peak < sustain_amp < 0.7 * peak


def test_midi_to_wav_and_presets():
    midi = _simple_midi()
    wav = midi_to_wav_adsr(midi, sample_rate=SR)
    audio, sr = read_wav(wav)
    assert sr == SR
    assert len(audio) > SR  # three 0.5s notes
    assert 0.5 < np.abs(audio).max() <= 1.0

    for preset in GUITAR_ADSR_PRESETS:
        wav2 = synthesize_midi_adsr(midi, preset=preset, sample_rate=SR)
        assert wav2 is not None and len(wav2) > 1000


def test_analyze_envelope_roundtrip():
    notes = [{"note": 64, "start": 0.0, "end": 1.0, "velocity": 127}]
    audio = synthesize_note_arrays(
        notes, SR, attack_ms=50, decay_ms=100, sustain_level=0.6,
        release_ms=150, waveform="sine",
    )
    params = analyze_envelope(audio, SR)
    assert 5 <= params["attack_ms"] <= 200
    assert 0.2 <= params["sustain_level"] <= 1.0


def test_distortion_and_chain():
    rng = np.random.default_rng(0)
    x = (0.3 * np.sin(2 * np.pi * 220 * np.arange(SR) / SR)).astype(np.float32)
    d = np.asarray(distortion(x, 0.8))
    assert np.abs(d).max() <= 1.0
    # heavy drive flattens the waveform (higher RMS for same peak)
    assert np.sqrt((d**2).mean()) > np.sqrt((x**2).mean())

    out = apply_effect_chain(
        x,
        [("distortion", {"drive": 0.4}), ("chorus", {"depth": 0.002}),
         ("reverb", {"room_size": 0.5}),
         ("delay", {"delay_ms": 100, "feedback": 0.3})],
        sr=SR,
    )
    assert out.shape == x.shape
    assert np.abs(out).max() <= 1.0 + 1e-5
    assert not np.allclose(out, x)


def test_effect_chain_unknown_skipped():
    x = np.zeros(SR, np.float32)
    out = apply_effect_chain(x, [("flanger", {})], sr=SR)
    np.testing.assert_allclose(out, x)


def test_delay_feedback_one_no_crash():
    """Review r2: feedback >= 1.0 made the echo-count formula divide by
    log(1)=0 and crash with OverflowError; it now clamps to a decaying
    loop."""
    import numpy as np

    from aegis_tpu.synth.effects import apply_effect_chain

    y = np.zeros(4096, np.float32)
    y[0] = 1.0
    out = np.asarray(apply_effect_chain(y, [("delay", {"feedback": 1.0,
                                                       "delay_ms": 20.0})]))
    assert out.shape == y.shape and np.isfinite(out).all()
    assert np.abs(out[400:]).max() > 0  # echoes actually present
