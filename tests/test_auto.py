"""The polyphony-aware routing engine (engine/auto.py).

Beyond-reference capability (the reference is monophonic-only, SURVEY.md
§0): one entry point that scores mixed chords + fast arpeggio material
neither single engine can (poly alone measures ≤0.58 on the mixed clip —
the 85 ms run is below the CQT window's resolving power; v1 alone loses
every chord to pYIN's single-voice lock).  Truth anchor: the
generate_mixed_clip generator family, same methodology as the chord
families (VALIDATION.md)."""

import numpy as np
import pytest

from aegis_tpu.tools.signal_gen import (generate_bench_track,
                                        generate_chord_progression,
                                        generate_mixed_clip)
from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

SR, HOP = 22050, 512


@pytest.fixture(scope="module")
def auto_engine():
    from aegis_tpu.engine.auto import AegisAutoEngine

    return AegisAutoEngine(sample_rate=SR)


def _f1(eng, y, truth):
    ev = eng.extract_events(eng.analyze(y))
    return note_event_f1(truth, events_to_seconds(ev, SR, HOP))["f1"]


def test_mixed_clip_through_one_entry(auto_engine):
    """The VERDICT-r2 done-criterion: a mixed chords+85 ms-arpeggio clip
    through ONE entry point.  Measured round 5 (after the strong-chord
    demotion exemption + sub-octave short-ghost drop): mean 0.968 over
    design seeds 1-10, min 0.88 (seed 10); held-out seeds 11-20 mean
    0.960, min 0.88.  The 0.88 floor is a measured upstream ceiling, not
    a routing defect: seed 10's run pluck at frame 51 produces NO onset
    pick in either stream (its attack flux is masked between the 46/54
    picks while the previous chord's same pitch still rings), so no
    downstream logic can place the event's start inside the truth
    tolerance (VALIDATION.md round 5)."""
    f1s = [
        _f1(auto_engine, *generate_mixed_clip(seed))
        for seed in range(1, 11)
    ]
    assert np.mean(f1s) >= 0.95, f1s
    assert min(f1s) >= 0.87, f1s


def test_auto_dominates_single_engines_on_mixed(auto_engine):
    """The router must strictly beat BOTH single engines on mixed
    material — the whole point of the component."""
    from aegis_tpu.engine.poly import AegisPolyEngine

    y, truth = generate_mixed_clip(1)
    auto = _f1(auto_engine, y, truth)
    peng = AegisPolyEngine(sample_rate=SR)
    pev = peng.extract_events(peng.analyze(y))
    poly = note_event_f1(truth, events_to_seconds(pev, SR, HOP))["f1"]
    assert auto > poly + 0.2, (auto, poly)
    assert auto >= 0.95


def test_pure_chords_keep_poly_quality(auto_engine):
    """Feeding pure chord progressions through the router must not cost
    the poly engine's quality (measured 0.96-1.0 on the gated seeds)."""
    for seed in (1, 3, 7):
        y, truth = generate_chord_progression(seed, sr=SR)
        assert _f1(auto_engine, y, truth) >= 0.96, seed


def test_pure_mono_floor(auto_engine):
    """A dense monophonic line through the router: the adjudication +
    region logic must suppress the peel's harmonic-ghost stream
    (measured 0.75 before the physics re-adjudication, 0.92 after it,
    1.0 after the round-4 v1-shadow group demotion — a pluck's
    line/rim ghost cluster shares its attack and marked its own chordal
    region; now a group fully explained as ONE v1 note's harmonic lines
    (h2..h10) or ±3-semitone rim is not polyphony.  Held-out: 60 s
    bench 0.9967, KS tracks + scale 1.0, mixed seeds 11-20 unchanged
    to 4 digits)."""
    y, truth = generate_bench_track(duration=20.0, sr=SR,
                                    return_truth=True)
    assert _f1(auto_engine, y, truth) >= 0.97


def test_auto_bpm_auto_resolves(auto_engine):
    """bpm="auto" must resolve through estimate_bpm before MIDI encoding
    (round-4 verify drive: the router passed the literal string through
    to events_to_midi and crashed)."""
    import io as _io

    from aegis_tpu.midi.decode import midi_to_notes

    y, _ = generate_mixed_clip(1)
    buf = _io.BytesIO()
    ev = auto_engine.extract_events(auto_engine.analyze(y), output_mid=buf,
                                    bpm="auto")
    assert len(midi_to_notes(buf.getvalue())) == len(ev)


def test_v1_shadow_group_demotion():
    """Constructed router physics: a simultaneous 'chord' whose members
    are all harmonic lines/rims of one overlapping locked v1 note marks
    NO chordal region; a true triad (+4/+7 voices) keeps its region even
    when pYIN locks onto one of its voices."""
    from aegis_tpu.engine.auto import polyphony_regions

    def mk(n, s, e, **kw):
        return {"note": n, "start": s, "end": e, "salience": 1.0, **kw}

    v1_locked = [mk(50, 10, 60)]
    ghosts = [mk(62, 12, 40), mk(69, 12, 38), mk(83, 12, 36)]
    ch = polyphony_regions(ghosts, 80, v1_events=v1_locked)
    assert not ch.any()
    # rim pair: −3 leakage ghost under the tracked note
    rim = [mk(44, 12, 40), mk(47, 12, 40)]
    ch = polyphony_regions(rim, 80, v1_events=[mk(47, 10, 60)])
    assert not ch.any()
    # a real triad survives even with pYIN locked on a chord voice
    triad = [mk(48, 12, 40), mk(52, 12, 40), mk(55, 12, 40)]
    ch = polyphony_regions(triad, 80, v1_events=[mk(55, 10, 60)])
    assert ch[15:35].all()
    # a lone pluck's +12 false "octave" (even physics-tagged) cannot
    # mark a region against a locked v1 note on its fundamental
    oct_pair = [mk(47, 12, 40), mk(59, 12, 40, recovered_octave=True)]
    ch = polyphony_regions(oct_pair, 80, v1_events=[mk(47, 10, 60)])
    assert not ch.any()


def test_folder_batch_auto(auto_engine, tmp_path):
    """transcribe_folder(engine="auto"): dispatch-ahead of the fused dual
    program per track; folder events must match the per-track facade."""
    from aegis_tpu.engine.poly import transcribe_folder
    from aegis_tpu.io import write_wav
    from aegis_tpu.midi.decode import midi_to_notes

    clips = {}
    for seed in (1, 2):
        y, truth = generate_mixed_clip(seed)
        write_wav(str(tmp_path / f"m{seed}.wav"), y, SR)
        clips[f"m{seed}.wav"] = (y, truth)
    results = transcribe_folder(str(tmp_path), sample_rate=SR,
                                engine="auto")
    assert len(results) == 2
    for wav_path, mid_path, n in results:
        y, truth = clips[wav_path.split("/")[-1]]
        facade = auto_engine.extract_events(auto_engine.analyze(y))
        assert n == len(facade), (wav_path, n, len(facade))
        notes = midi_to_notes(open(mid_path, "rb").read())
        est = [{"note": e["note"], "start": e["start"], "end": e["end"]}
               for e in notes]
        assert note_event_f1(truth, est)["f1"] >= 0.9

    with pytest.raises(ValueError):
        transcribe_folder(str(tmp_path), engine="auto",
                          pitch_backend="neural")


def test_polyphony_regions_simultaneity():
    """Only simultaneous-onset groups mark chordal frames; offset
    overlaps (a legato mono line's CQT smear) do not, and sub-minimum
    duration clusters are erased."""
    from aegis_tpu.engine.auto import polyphony_regions

    def ev(note, s, e):
        return {"note": note, "start": s, "end": e}

    # strum: two voices, same start -> chordal over the union span
    ch = polyphony_regions([ev(48, 10, 40), ev(55, 10, 38)], 60)
    assert ch[12] and ch[39] and not ch[45]
    # offset overlap (mono smear) -> never chordal
    ch = polyphony_regions([ev(48, 10, 40), ev(55, 25, 50)], 60)
    assert not ch.any()
    # short simultaneous junk cluster -> erased by the opening
    ch = polyphony_regions([ev(48, 10, 14), ev(55, 10, 13)], 60)
    assert not ch.any()


def test_route_events_regimes():
    """Span-majority routing with duplicate resolution."""
    from aegis_tpu.engine.auto import route_events

    chordal = np.zeros(100, bool)
    chordal[10:50] = True

    def ev(note, s, e, **kw):
        return {"note": note, "start": s, "end": e, "salience": 1.0, **kw}

    poly = [ev(48, 10, 45), ev(55, 10, 45), ev(60, 60, 70), ev(30, 12, 40)]
    v1 = [ev(48, 12, 44), ev(64, 60, 70), ev(62, 80, 90)]
    out = route_events(v1, poly, chordal)
    got = {(e["note"], e["source"]) for e in out}
    # chord region: poly voices kept, v1 shadow (48) dropped
    assert (48, "poly") in got and (55, "poly") in got
    assert (48, "v1") not in got
    # mono region: v1 kept, lone poly event dropped; sub-E2 junk dropped
    assert (64, "v1") in got and (62, "v1") in got
    assert (60, "poly") not in got
    assert not any(n == 30 for n, _ in got)


def test_auto_44k_floor():
    """The server's default engine rate is 44.1 kHz, so the router must
    hold its gates on the sr-proportional grid too (measured round 4 on
    chip: chords 1.0/1.0/1.0, mono 0.99, mixed seeds 1-3 all 1.0)."""
    from aegis_tpu.engine.auto import AegisAutoEngine

    sr, hop = 44100, 1024
    eng = AegisAutoEngine(sample_rate=sr)

    def f1(y, truth):
        ev = eng.extract_events(eng.analyze(y))
        return note_event_f1(truth, events_to_seconds(ev, sr, hop))["f1"]

    y, t = generate_chord_progression(3, sr=sr)
    assert f1(y, t) >= 0.96
    y, t = generate_bench_track(duration=20.0, sr=sr, return_truth=True)
    assert f1(y, t) >= 0.95
    y, t = generate_mixed_clip(1, sr=sr)
    assert f1(y, t) >= 0.95
