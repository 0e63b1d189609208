"""Event segmentation, merging, articulation and pairing logic."""

import numpy as np

from aegis_tpu.core.events import (
    _hammer_pull_pairs,
    _sustain_merge,
    detect_articulations_v1,
    extract_events_v1,
)
from aegis_tpu.ref.dsp_ref import midi_to_hz

SR, HOP = 22050, 512


def _frames_for(notes_per_frame, rms_db=-20.0):
    """Build frame arrays for a note-id sequence (-1 = silence)."""
    T = len(notes_per_frame)
    f0 = np.array(
        [midi_to_hz(n) if n >= 0 else 0.0 for n in notes_per_frame]
    )
    voiced = np.array([n >= 0 for n in notes_per_frame])
    probs = np.where(voiced, 0.9, 0.0)
    # invert amplitude_to_db(ref=max): make rms constant so db == 0 (max ref)
    rms = np.where(voiced, 0.1, 0.001)
    rake = np.zeros(T, bool)
    return rake, f0, voiced, probs, rms


def test_basic_segmentation():
    seq = [-1] * 3 + [60] * 10 + [-1] * 2 + [64] * 8 + [-1] * 2
    events = extract_events_v1(*_frames_for(seq), SR, HOP,
                               min_note_duration_ms=0, sustain_ms=0)
    assert [e["note"] for e in events] == [60, 64]
    assert events[0]["start"] == 3 and events[0]["end"] == 12
    assert events[1]["start"] == 15 and events[1]["end"] == 22


def test_min_duration_filter():
    seq = [-1] * 2 + [60] * 2 + [-1] * 4 + [62] * 12 + [-1]
    events = extract_events_v1(*_frames_for(seq), SR, HOP,
                               min_note_duration_ms=150, sustain_ms=0)
    assert [e["note"] for e in events] == [62]


def test_note_change_splits_segment():
    seq = [60] * 6 + [62] * 6
    events = extract_events_v1(*_frames_for(seq), SR, HOP,
                               min_note_duration_ms=0, sustain_ms=0)
    assert [e["note"] for e in events] == [60, 62]


def test_rake_masks_frames():
    seq = [60] * 12
    rake, f0, voiced, probs, rms = _frames_for(seq)
    rake[5:7] = True
    events = extract_events_v1(rake, f0, voiced, probs, rms, SR, HOP,
                               min_note_duration_ms=0, sustain_ms=0)
    assert len(events) == 2  # split by the rake gap


def test_sustain_merge_and_technique_block():
    base = {"note": 60, "confidence": 0.9, "velocity": 90, "track": "main",
            "rms_energy": -20.0, "slope": 0.0}
    a = dict(base, start=0, end=10, technique=None)
    b = dict(base, start=12, end=20, technique=None)
    merged = _sustain_merge([dict(a), dict(b)], sustain_frames=3)
    assert len(merged) == 1 and merged[0]["end"] == 20

    a2 = dict(a, technique="bend")
    merged2 = _sustain_merge([dict(a2), dict(b)], sustain_frames=3)
    assert len(merged2) == 2  # technique blocks merging


def test_hammer_on_detection():
    evts = [
        {"note": 60, "start": 0, "end": 10, "velocity": 100,
         "rms_energy": -10.0, "technique": None, "slope": 0.0},
        {"note": 62, "start": 10, "end": 20, "velocity": 50,
         "rms_energy": -25.0, "technique": None, "slope": 0.0},
        {"note": 60, "start": 20, "end": 30, "velocity": 48,
         "rms_energy": -28.0, "technique": None, "slope": 0.0},
    ]
    _hammer_pull_pairs(evts, ms_per_frame=23.2)
    assert evts[1]["technique"] == "hammer_on"
    assert evts[2]["technique"] == "pull_off"


def test_articulation_vibrato_and_bend():
    # vibrato: oscillating +-0.4 semitone around note 60
    t = np.arange(30)
    vib = midi_to_hz(60 + 0.4 * np.sin(t))
    tech, _ = detect_articulations_v1(vib, 0, 29)
    assert tech == "vibrato"
    # bend: rising 1.5 semitones
    bend = midi_to_hz(60 + np.linspace(0, 1.5, 20))
    tech, slope = detect_articulations_v1(bend, 0, 19)
    assert tech == "bend" and slope > 0.05
    # stable note: nothing
    tech, _ = detect_articulations_v1(np.full(20, midi_to_hz(60)), 0, 19)
    assert tech is None


def test_snap_starts_to_onsets():
    from aegis_tpu.core.events import snap_starts_to_onsets

    T = 130
    rms = np.full(T, -20.0)
    rms[15:20] = [-38, -40, -35, -25, -21]  # attack = steepest rise 17->18
    evts = [
        {"note": 60, "start": 20, "end": 40},
        {"note": 62, "start": 50, "end": 70},
        {"note": 64, "start": 100, "end": 120},
    ]
    onsets = np.array([15, 44, 95])
    out = snap_starts_to_onsets(evts, onsets, rms, back_frames=6)
    # event 0: onset 15 in [14, 20] -> snapped to the steepest RMS rise
    # (diff max at 17->18, i.e. frame 18)
    assert out[0]["start"] == 18 and out[0]["end"] == 40
    # event 1: onset 44 in [44, 50]; flat rms -> degenerate rise at
    # onset+1; previous end 40 < 45, untouched
    assert out[1]["start"] == 45 and out[0]["end"] == 40
    # event 2: onset 95 in [94, 100], flat rms
    assert out[2]["start"] == 96
    # inputs untouched (copies returned)
    assert evts[0]["start"] == 20

    # an onset beyond the back window does not snap
    out = snap_starts_to_onsets(evts, np.array([10]), rms, back_frames=6)
    assert out[0]["start"] == 20
    # an overhanging previous tail is TRUNCATED: the attack belongs to
    # the new note
    out = snap_starts_to_onsets(
        [{"note": 60, "start": 0, "end": 48},
         {"note": 62, "start": 50, "end": 70}],
        np.array([45]), np.full(80, -20.0), back_frames=20)
    assert out[1]["start"] == 46 and out[0]["end"] == 45
    # but never past the previous note's own attack (start+1 floor)
    out = snap_starts_to_onsets(
        [{"note": 60, "start": 40, "end": 48},
         {"note": 62, "start": 50, "end": 70}],
        np.array([38]), np.full(80, -20.0), back_frames=20)
    assert out[1]["start"] == 50  # onset 38 < prev start+1 -> rejected
    # empty onsets / zero window are no-ops
    assert snap_starts_to_onsets(evts, np.array([]), rms, 6)[0]["start"] == 20
    assert snap_starts_to_onsets(evts, onsets, rms, 0)[0]["start"] == 20


def test_extract_v1_onset_snap_restores_late_lock():
    """A pluck whose pitch tracker locks late: the onset envelope peak and
    the RMS rise sit at the physical attack; the extracted start must snap
    back to the rise."""
    notes = [-1] * 10 + [60] * 30
    rake, f0, voiced, probs, rms = _frames_for(notes)
    rms = rms.copy()
    rms[7:10] = 0.1  # energy arrives at frame 7; pyin locks at 10
    onset_env = np.zeros(len(notes))
    onset_env[6] = 1.0  # attack transient before pyin locks
    ev = extract_events_v1(rake, f0, voiced, probs, rms, SR, HOP,
                           confidence_threshold=0.5, onset_env=onset_env)
    assert len(ev) == 1 and ev[0]["start"] == 7 and ev[0]["end"] == 39
    # with snapping disabled the start stays at the voiced frame
    ev = extract_events_v1(rake, f0, voiced, probs, rms, SR, HOP,
                           confidence_threshold=0.5, onset_env=onset_env,
                           onset_snap_ms=0.0)
    assert ev[0]["start"] == 10


def test_split_echo_guard():
    """An interior onset only splits an event when the local RMS rises
    (a true re-attack re-excites the string); a delay echo rides the
    sustaining tail with a flat RMS and must NOT mint an event."""
    from aegis_tpu.core.events import apply_onset_refinement

    T = 80
    rms_db = np.full(T, -20.0)
    velocity = np.full(T, 90, np.int64)
    onset_env = np.zeros(T)
    onset_env[10] = 1.0   # the note's own attack
    onset_env[40] = 0.35  # interior onset at frame 40
    events = [{"note": 60, "start": 10, "end": 75, "confidence": 0.9,
               "velocity": 90, "track": "main", "technique": "normal",
               "slope": 0.0, "rms_energy": -20.0}]

    # flat RMS at the interior onset -> echo -> no split
    out = apply_onset_refinement(
        [dict(events[0])], onset_env, velocity, rms_db, SR, HOP,
        min_frames=2, onset_snap_ms=0.0)
    assert len(out) == 1

    # a >= 2.5 dB RMS rise at the onset -> genuine re-attack -> split
    rise = rms_db.copy()
    rise[36:40] = -26.0  # decayed tail, then re-attack back to -20
    out = apply_onset_refinement(
        [dict(events[0])], onset_env, velocity, rise, SR, HOP,
        min_frames=2, onset_snap_ms=0.0)
    assert len(out) == 2 and out[1]["start"] == 40

    # guard disabled (split_min_rise_db=0): the flat-RMS onset splits
    out = apply_onset_refinement(
        [dict(events[0])], onset_env, velocity, rms_db, SR, HOP,
        min_frames=2, onset_snap_ms=0.0, split_min_rise_db=0.0)
    assert len(out) == 2


def test_drop_harmonic_tail_ghosts():
    """Neural tail guard: a brief h3-interval event riding a predecessor's
    decay (no onset at its start, RMS strictly falling) merges back into
    the predecessor; the same pitch born AT an onset with an RMS rise is a
    real note and survives.  Mirrors the measured bench-track phantom
    (220 Hz tail decoded as MIDI 76 for 6 frames, VALIDATION.md)."""
    from aegis_tpu.core.events import drop_harmonic_tail_ghosts

    base = {"confidence": 0.9, "velocity": 90, "track": "main",
            "technique": None, "slope": 0.0, "rms_energy": -30.0}
    rms_db = np.concatenate([np.linspace(-20, -33, 60),
                             np.linspace(-22, -30, 20)])
    onsets = np.asarray([2, 60])

    # phantom: +19 semitones, contiguous, short, mid-decay, no onset
    events = [dict(base, note=57, start=2, end=53),
              dict(base, note=76, start=54, end=59)]
    out = drop_harmonic_tail_ghosts(events, onsets, rms_db, SR, HOP)
    assert len(out) == 1 and out[0]["note"] == 57 and out[0]["end"] == 59

    # same interval born AT an onset (frame 60) with an attack rise: real
    events = [dict(base, note=57, start=2, end=58),
              dict(base, note=76, start=60, end=75)]
    out = drop_harmonic_tail_ghosts(events, onsets, rms_db, SR, HOP)
    assert len(out) == 2

    # non-harmonic interval in the tail survives (the guard is narrow)
    events = [dict(base, note=57, start=2, end=53),
              dict(base, note=62, start=54, end=59)]
    out = drop_harmonic_tail_ghosts(events, onsets, rms_db, SR, HOP)
    assert len(out) == 2

    # a LONG harmonic-interval continuation survives (max_ms bound)
    events = [dict(base, note=57, start=2, end=20),
              dict(base, note=76, start=21, end=59)]
    out = drop_harmonic_tail_ghosts(events, onsets, rms_db, SR, HOP)
    assert len(out) == 2


def test_snap_forward_early_firing_backend():
    """The neural-backend FORWARD snap: an event whose start precedes its
    own attack moves to the steepest RMS rise, re-reading attack dynamics
    (velocity/rms_energy) at the snapped frame — and runs even with NO
    picked onsets (the rise itself is the anchor)."""
    from aegis_tpu.core.events import snap_starts_to_onsets, velocity_from_db

    T = 60
    rms = np.full(T, -50.0)
    # pre-attack hush at -50, attack rise 20->23 to -12, decay after
    rms[21] = -40.0
    rms[22] = -20.0  # steepest rise 21->22
    rms[23:40] = -12.0
    evts = [{"note": 60, "start": 18, "end": 39, "velocity": 45,
             "rms_energy": -50.0}]

    out = snap_starts_to_onsets(evts, np.array([]), rms, back_frames=6,
                                fwd_frames=8)
    assert out[0]["start"] == 22
    assert out[0]["velocity"] == int(velocity_from_db(rms[22]))
    assert out[0]["rms_energy"] == rms[22]
    # input untouched
    assert evts[0]["start"] == 18 and evts[0]["velocity"] == 45

    # already attack-aligned (first frame at the local peak): the rise
    # guard no-ops and dynamics stay as read at the true start
    aligned = [{"note": 60, "start": 23, "end": 39, "velocity": 102,
                "rms_energy": -12.0}]
    out = snap_starts_to_onsets(aligned, np.array([]), rms, back_frames=6,
                                fwd_frames=8)
    assert out[0]["start"] == 23 and out[0]["velocity"] == 102

    # fwd_frames=0 keeps the early start (pYIN semantics)
    out = snap_starts_to_onsets(evts, np.array([]), rms, back_frames=6)
    assert out[0]["start"] == 18
