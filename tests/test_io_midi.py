"""WAV codec and SMF codec round-trip tests."""

import io

import numpy as np

from aegis_tpu.io import load_audio, read_wav, write_wav
from aegis_tpu.midi.decode import midi_to_notes
from aegis_tpu.midi.smf import MidiFile, MidiMessage, MidiTrack


def test_wav_roundtrip_int16(tmp_path):
    sr = 22050
    y = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, y, sr)
    x, sr2 = read_wav(path)
    assert sr2 == sr
    assert x.shape == y.shape
    assert np.max(np.abs(x - y)) < 1.0 / 16384


def test_wav_roundtrip_float32_bytesio():
    sr = 8000
    y = np.random.default_rng(0).normal(0, 0.1, sr).astype(np.float32)
    buf = io.BytesIO()
    write_wav(buf, y, sr, dtype="float32")
    x, sr2 = read_wav(buf.getvalue())
    assert sr2 == sr
    np.testing.assert_allclose(x, y, rtol=0, atol=0)


def test_wav_stereo_to_mono(tmp_path):
    sr = 8000
    y = np.stack([np.ones(100), -np.ones(100)], axis=1).astype(np.float32) * 0.25
    path = str(tmp_path / "st.wav")
    write_wav(path, y, sr)
    x, _ = load_audio(path, sr=sr)
    assert np.max(np.abs(x)) < 1e-4  # L/R cancel


def test_load_audio_resample(tmp_path):
    sr = 44100
    y = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
    path = str(tmp_path / "r.wav")
    write_wav(path, y, sr)
    x, sr2 = load_audio(path, sr=22050)
    assert sr2 == 22050
    assert abs(len(x) - 22050) <= 2
    # 440 Hz survives resampling: zero crossings ~ 880/s
    zc = np.sum(np.abs(np.diff(np.signbit(x[1000:-1000]))))
    assert abs(zc / (len(x[1000:-1000]) / 22050) - 880) < 20


def test_smf_roundtrip():
    mid = MidiFile()
    tr = MidiTrack()
    mid.tracks.append(tr)
    tr.append(MidiMessage("track_name", name="Test"))
    tr.append(MidiMessage("program_change", program=27, time=0))
    tr.append(MidiMessage("note_on", note=60, velocity=90, time=10))
    tr.append(MidiMessage("pitchwheel", pitch=-1234, time=5))
    tr.append(MidiMessage("note_off", note=60, velocity=0, time=485))
    blob = mid.save(None)

    mid2 = MidiFile.load(blob)
    assert mid2.ticks_per_beat == 480
    msgs = [m for m in mid2.tracks[0]]
    types = [m.type for m in msgs]
    assert types[:5] == ["track_name", "program_change", "note_on", "pitchwheel", "note_off"]
    assert msgs[2].note == 60 and msgs[2].velocity == 90 and msgs[2].time == 10
    assert msgs[3].pitch == -1234


def test_midi_to_notes_tempo():
    mid = MidiFile(ticks_per_beat=480)
    tr = MidiTrack()
    mid.tracks.append(tr)
    tr.append(MidiMessage("set_tempo", tempo=500000))  # 120 BPM
    tr.append(MidiMessage("note_on", note=64, velocity=80, time=480))  # at 0.5 s
    tr.append(MidiMessage("note_off", note=64, velocity=0, time=960))  # 1 s long
    notes = midi_to_notes(mid.save(None))
    assert len(notes) == 1
    n = notes[0]
    assert n["note"] == 64
    assert abs(n["start"] - 0.5) < 1e-9
    assert abs(n["end"] - 1.5) < 1e-9


def test_events_to_midi_random_roundtrip():
    """Property: random event lists survive encode->decode with exact note
    numbers, monotone timing, and pitch-bend curves for techniques."""
    import numpy as np

    from aegis_tpu.midi.decode import midi_to_notes
    from aegis_tpu.midi.encode import events_to_midi

    rng = np.random.default_rng(77)
    sr, hop = 22050, 512
    for trial in range(5):
        n = int(rng.integers(1, 40))
        events, t = [], 0
        for _ in range(n):
            t += int(rng.integers(1, 30))
            dur = int(rng.integers(1, 60))
            events.append({
                "note": int(rng.integers(30, 100)),
                "start": t, "end": t + dur,
                "velocity": int(rng.integers(1, 128)),
                "confidence": float(rng.random()),
                "track": "main" if rng.random() < 0.7 else "safe",
                "technique": [None, "bend", "vibrato", "hammer_on"][
                    int(rng.integers(0, 4))],
                "slope": 0.0,
            })
            t += dur
        data = events_to_midi(events, sr, hop, output=None)
        notes = midi_to_notes(data)
        assert len(notes) == len(events)
        got = sorted((x["note"] for x in notes))
        want = sorted(e["note"] for e in events)
        assert got == want
        starts = [x["start"] for x in sorted(notes, key=lambda v: v["start"])]
        assert all(b >= a for a, b in zip(starts, starts[1:]))


def test_smf_wav_decode_fuzz():
    """300 random/truncated byte blobs: decoders raise ValueError (mapped to
    HTTP 400 by the server), never struct.error/IndexError, never hang."""
    import numpy as np

    from aegis_tpu.io.wav import read_wav
    from aegis_tpu.midi.decode import midi_to_notes

    rng = np.random.default_rng(0)
    for i in range(300):
        n = int(rng.integers(0, 200))
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        if rng.random() < 0.5:
            data = (b"MThd" if i % 2 else b"RIFF") + data
        for fn in (midi_to_notes, read_wav):
            try:
                fn(data)
            except ValueError:
                pass


def test_load_audio_negative_duration_raises():
    """end_time < start_time used to become a negative-index slice that
    silently analyzed the wrong region (review finding)."""
    import io as _io

    import pytest

    from aegis_tpu.io.audio import load_audio
    from aegis_tpu.io.wav import write_wav

    buf = _io.BytesIO()
    write_wav(buf, np.zeros(22050, np.float32), 22050)
    with pytest.raises(ValueError, match="non-negative"):
        load_audio(buf.getvalue(), sr=22050, offset=2.0, duration=-1.0)
    # duration=0 stays a legal empty request
    y, _ = load_audio(buf.getvalue(), sr=22050, duration=0.0)
    assert len(y) == 0


def test_parse_bpm():
    import pytest

    from aegis_tpu.core.tempo import parse_bpm

    assert parse_bpm(None) is None
    assert parse_bpm("") is None
    assert parse_bpm("auto") == "auto"
    assert parse_bpm("120") == 120.0
    assert parse_bpm(90.5) == 90.5
    for bad in ("0", 0, "nan", "inf", "-3", "x"):
        with pytest.raises(ValueError):
            parse_bpm(bad)


def test_events_to_midi_rejects_bad_bpm():
    import pytest

    from aegis_tpu.midi.encode import events_to_midi, events_to_midi_financial

    ev = [{"note": 60, "start": 0, "end": 10, "confidence": 0.9,
           "velocity": 80, "track": "main", "technique": None,
           "slope": 0.0, "rms_energy": -20.0}]
    for enc in (events_to_midi, events_to_midi_financial):
        assert enc(ev, 22050, 512, bpm=120.0)  # valid
        for bad in (0.0, float("nan"), -60.0):
            with pytest.raises(ValueError, match="bpm"):
                enc(ev, 22050, 512, bpm=bad)


def test_velocity_clamped_both_sides_on_encode():
    """Review r2: velocity 0 and >127 are legal event values but illegal
    SMF note_on velocities (0 = note_off; 128 wraps through & 0x7F to 0):
    the encoders clamp to 1..127."""
    from aegis_tpu.midi.decode import midi_to_notes
    from aegis_tpu.midi.encode import events_to_midi, events_to_midi_financial

    events = [
        {"note": 60, "start": 0, "end": 20, "velocity": 0, "track": "main",
         "technique": None, "slope": 0.0, "confidence": 1.0},
        {"note": 64, "start": 30, "end": 50, "velocity": 128, "track": "main",
         "technique": None, "slope": 0.0, "confidence": 1.0},
    ]
    for enc in (events_to_midi, events_to_midi_financial):
        notes = midi_to_notes(enc(events, 22050, 512, output=None))
        got = {n["note"]: n["velocity"] for n in notes}
        assert got[60] == 1 and got[64] == 127, (enc.__name__, got)


def test_decode_pairs_notes_per_channel():
    """Review r2: same pitch held on two channels of one track must pair
    each note_off with ITS channel's note_on, not FIFO across channels."""
    from aegis_tpu.midi.decode import midi_to_notes
    from aegis_tpu.midi.smf import MidiFile, MidiMessage, MidiTrack

    mid = MidiFile(ticks_per_beat=480)
    tr = MidiTrack()
    mid.tracks.append(tr)
    # ch0 note 48 on @0 (long), ch1 note 48 on @120, ch1 off @240, ch0 off @480
    tr.append(MidiMessage("note_on", note=48, velocity=100, channel=0, time=0))
    tr.append(MidiMessage("note_on", note=48, velocity=50, channel=1, time=120))
    tr.append(MidiMessage("note_off", note=48, velocity=0, channel=1, time=120))
    tr.append(MidiMessage("note_off", note=48, velocity=0, channel=0, time=240))
    notes = sorted(midi_to_notes(mid.save(None)), key=lambda n: n["start"])
    assert len(notes) == 2
    # ch0's long note keeps its full duration; ch1's short note is inside it
    assert notes[0]["velocity"] == 100 and notes[1]["velocity"] == 50
    assert notes[0]["end"] > notes[1]["end"]

    # include_track=False drops the index
    assert "track_index" not in midi_to_notes(mid.save(None),
                                              include_track=False)[0]


def test_fret_filter_removes_out_of_range_in_chords():
    """Review r2: the hard range filter must catch chord-simultaneous and
    trailing out-of-range notes the pair loop used to skip."""
    from aegis_tpu.midi.fret_filter import apply_fret_filter

    events = [
        {"note": 60, "start": 0, "end": 20, "velocity": 90, "track": "main",
         "technique": None, "slope": 0.0, "confidence": 1.0},
        {"note": 30, "start": 1, "end": 20, "velocity": 90, "track": "main",
         "technique": None, "slope": 0.0, "confidence": 1.0},  # chord-sync, sub-range
        {"note": 95, "start": 40, "end": 60, "velocity": 90, "track": "main",
         "technique": None, "slope": 0.0, "confidence": 1.0},  # trailing, above range
    ]
    kept, report = apply_fret_filter(events, sr=22050, hop_length=512)
    assert {e["note"] for e in kept} == {60}
    assert {d["note"] for d in report["removed_notes"]} == {30, 95}
