"""Polyphonic engine: device/oracle parity + generator ground-truth F1.

The polyphonic pipeline is a beyond-reference component (the reference is
monophonic), so its correctness anchors are (a) the NumPy oracle
ref/poly_ref.py in exact parity with the device peel, and (b) event-level
F1 against the Karplus-Strong chord-progression generator's known truth —
the same two-sided strategy as the monophonic engines (VALIDATION.md).
"""

import numpy as np
import pytest

from aegis_tpu.tools.signal_gen import generate_chord_progression

SR, HOP, NFFT, NBINS = 22050, 512, 2048, 84


def chord_progression_clip(seed, sr=SR):
    """The shared truth-clip family (five chords, repeated-pitch boundary;
    prototype measured: unrefined roll segmentation mean F1 0.34 over 20
    seeds; refined pipeline mean 0.99, 17/20 seeds perfect)."""
    return generate_chord_progression(seed, sr)


# ------------------------------------------------------------------ parity

def test_peel_parity_random():
    """Device peel == NumPy oracle on random CQT power."""
    import jax.numpy as jnp

    from aegis_tpu.core.poly import (harmonic_subtraction_matrix,
                                     harmonic_suppression_matrix,
                                     peel_voices, roll_and_confidence)
    from aegis_tpu.ref.poly_ref import (peel_voices_ref,
                                        roll_and_confidence_ref)

    rng = np.random.default_rng(0)
    cqt = (rng.random((97, NBINS), np.float32) ** 2) * 10.0
    supp = harmonic_suppression_matrix(NBINS)
    sub = harmonic_subtraction_matrix(NBINS)

    b_d, s_d = peel_voices(jnp.asarray(cqt), jnp.asarray(supp),
                           jnp.asarray(sub))
    b_r, s_r = peel_voices_ref(cqt, supp, sub)
    np.testing.assert_array_equal(np.asarray(b_d), b_r)
    np.testing.assert_allclose(np.asarray(s_d), s_r, rtol=2e-4, atol=1e-5)

    r_d, c_d, a_d = roll_and_confidence(jnp.asarray(b_d), jnp.asarray(s_d))
    r_r, c_r, a_r = roll_and_confidence_ref(np.asarray(b_d), np.asarray(s_d))
    np.testing.assert_array_equal(np.asarray(r_d), r_r)
    np.testing.assert_allclose(np.asarray(c_d), c_r, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_d), a_r, rtol=1e-5, atol=1e-6)


def test_peel_parity_chord_clip():
    """Device peel == oracle on real plucked-chord CQT (argmax ties and the
    sub-harmonic redirects must agree on realistic, near-tied saliences)."""
    import jax.numpy as jnp

    from aegis_tpu.core.cqt import pseudo_cqt_t
    from aegis_tpu.core.poly import (harmonic_subtraction_matrix,
                                     harmonic_suppression_matrix,
                                     peel_voices)
    from aegis_tpu.ref.poly_ref import peel_voices_ref

    y, _ = chord_progression_clip(7)
    cqt = np.asarray(pseudo_cqt_t(jnp.asarray(y), SR, NFFT, HOP, NBINS, 12))
    supp = harmonic_suppression_matrix(NBINS)
    sub = harmonic_subtraction_matrix(NBINS)
    b_d, s_d = peel_voices(jnp.asarray(cqt), jnp.asarray(supp),
                           jnp.asarray(sub))
    b_r, s_r = peel_voices_ref(cqt, supp, sub)
    # a genuine salience tie may legitimately break differently; demand
    # near-total agreement rather than bitwise equality on real audio
    agree = float(np.mean(np.asarray(b_d) == b_r))
    assert agree >= 0.999, f"peel pick agreement {agree}"
    np.testing.assert_allclose(np.asarray(s_d), s_r, rtol=5e-4, atol=1e-4)


def test_subtraction_matrix_flat_rim():
    from aegis_tpu.core.poly import (harmonic_subtraction_matrix,
                                     harmonic_suppression_matrix)

    supp = harmonic_suppression_matrix(NBINS)
    sub = harmonic_subtraction_matrix(NBINS)
    assert (sub >= supp - 1e-9).all()
    # the fundamental's +-1 rim carries FULL weight (not triangular 50%)
    row = sub[40]
    assert row[39] == row[40] == row[41] == 1.0


# ------------------------------------------------------------- truth gates

@pytest.mark.parametrize("seed", [1, 3, 7])
def test_poly_truth_f1_perfect_seeds(seed):
    """End-to-end refined pipeline scores F1 = 1.0 against generator truth
    on chord-progression clips (CPU execution is deterministic)."""
    from aegis_tpu.engine.poly import AegisPolyEngine
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    y, truth = chord_progression_clip(seed)
    eng = AegisPolyEngine(sample_rate=SR)
    analysis = eng.analyze(y)
    events = eng.extract_events(analysis)
    r = note_event_f1(truth, events_to_seconds(events, SR, HOP))
    assert r["f1"] == 1.0, (seed, r)


def test_poly_truth_f1_sweep():
    """Mean F1 >= 0.97 and precision == 1.0 over ten random voicing seeds —
    the aggregate quality the refinement was measured at (overfit guard:
    no seed may fall below 0.85)."""
    from aegis_tpu.engine.poly import AegisPolyEngine
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    eng = AegisPolyEngine(sample_rate=SR)
    f1s, precs = [], []
    for seed in range(1, 11):
        y, truth = chord_progression_clip(seed)
        events = eng.extract_events(eng.analyze(y))
        r = note_event_f1(truth, events_to_seconds(events, SR, HOP))
        f1s.append(r["f1"])
        precs.append(r["precision"])
    assert np.mean(f1s) >= 0.97, f1s
    assert min(f1s) >= 0.85, f1s
    assert min(precs) == 1.0, precs


def test_poly_refined_beats_unrefined():
    """The refinement must strictly dominate the plain segmentation on the
    design clip family."""
    from aegis_tpu.engine.poly import AegisPolyEngine
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    eng = AegisPolyEngine(sample_rate=SR)
    y, truth = chord_progression_clip(7)
    analysis = eng.analyze(y)
    refined = note_event_f1(truth, events_to_seconds(
        eng.extract_events(analysis), SR, HOP))
    plain = note_event_f1(truth, events_to_seconds(
        eng.extract_events(analysis, use_onsets=False), SR, HOP))
    assert refined["f1"] > plain["f1"], (refined, plain)
    assert refined["f1"] == 1.0


def test_poly_octave_family_floor():
    """Octave-doubled voicings were the peel's KNOWN-WEAK family: comb
    masking erases the doubled voice's fundamental (measured mean F1 0.67
    in round 2; 0.89-0.92 after the first recovery chain).  The round-3
    chain — dead-fundamental rescue, window-leakage drop, feeder-guarded
    octave recovery with the multi-harmonic beat scan, line-proximity
    straightness/composite drops (core/poly.py) — measures **1.000 on all
    12 seeds of both octave families at 22.05 kHz** and 0.975/1.0 on the
    held-out seeds 13-24 (VALIDATION.md round 3).  This pins the floor on
    the same four probe clips (each measured 1.0)."""
    from aegis_tpu.engine.poly import AegisPolyEngine
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    eng = AegisPolyEngine(sample_rate=SR)
    progs = [
        [([40, 47, 52], 0.9), ([45, 52, 57], 0.8), ([48, 55, 60], 0.9)],
        [([52, 64], 0.8), ([48, 60], 0.8), ([55, 67], 0.8)],
    ]
    f1s = []
    for prog in progs:
        for seed in (1, 3):
            y, truth = generate_chord_progression(seed, prog=prog)
            events = eng.extract_events(eng.analyze(y))
            r = note_event_f1(truth, events_to_seconds(events, SR, HOP))
            f1s.append(r["f1"])
    assert np.mean(f1s) >= 0.97, f1s
    assert min(f1s) >= 0.95, f1s


def test_poly_octave_family_floor_44k():
    """The 44.1 kHz octave families after the round-3 chain: B (octave
    pairs) measures 1.000 on all 24 seeds; A (power chords) 0.95 mean
    with a MEASURED ceiling — the fifth's partials (3:2) land within the
    pseudo-CQT triangle of every beat-evidence bin the doubled octave
    could prove itself at, and the 44.1 kHz string quantization makes the
    h2 beat slower than the chord (VALIDATION.md round 3).  Pins the
    measured floor on four probe clips (A s1 0.889, A s3 1.0, B s1/s3
    1.0)."""
    from aegis_tpu.engine.poly import AegisPolyEngine
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    eng = AegisPolyEngine(sample_rate=44100)
    progs = [
        [([40, 47, 52], 0.9), ([45, 52, 57], 0.8), ([48, 55, 60], 0.9)],
        [([52, 64], 0.8), ([48, 60], 0.8), ([55, 67], 0.8)],
    ]
    f1s = []
    for prog in progs:
        for seed in (1, 3):
            y, truth = generate_chord_progression(seed, sr=44100, prog=prog)
            events = eng.extract_events(eng.analyze(y))
            r = note_event_f1(truth, events_to_seconds(events, 44100, 1024))
            f1s.append(r["f1"])
    assert np.mean(f1s) >= 0.94, f1s
    assert min(f1s) >= 0.85, f1s


def test_octave_recovery_beat_vs_pure():
    """The recovery discriminator on constructed physics: a single
    exponential h2 envelope (straight dB line) must NOT recover; a
    two-component mixture with a beat (the doubled-voice signature) must."""
    from aegis_tpu.core.poly import recover_octave_doublings

    fps = SR / HOP
    T = 120
    t = np.arange(T) / fps
    fmin = 24  # CQT_FMIN_MIDI
    mag = np.full((T, NBINS), 1e-7, np.float32)
    parent = {"note": 45, "start": 10, "end": 110, "confidence": 0.9,
              "velocity": 100, "track": "main", "technique": None,
              "slope": 0.0, "rms_energy": -10.0, "salience": 1.0}
    b0, b12 = 45 - fmin, 57 - fmin
    mag[:, b0] = 1.0 * np.exp(-0.5 * t)
    # pure h2: single exponential, slightly faster
    mag[:, b12] = 0.5 * np.exp(-0.6 * t)
    out = recover_octave_doublings([dict(parent)], mag, SR, HOP)
    assert len(out) == 1, [e["note"] for e in out]
    # doubled: add an independent 2x-rate component detuned by 0.6 Hz
    mix = (0.5 * np.exp(-0.6 * t)
           + 0.5 * np.exp(-1.2 * t) * np.cos(2 * np.pi * 0.6 * t))
    mag[:, b12] = np.abs(mix).astype(np.float32) + 1e-7
    out = recover_octave_doublings([dict(parent)], mag, SR, HOP)
    assert [e["note"] for e in out] == [45, 57], out
    assert out[1].get("recovered_octave") is True


def _mk_event(note, start=10, end=110, salience=1.0):
    return {"note": note, "start": start, "end": end, "confidence": 0.9,
            "velocity": 100, "track": "main", "technique": None,
            "slope": 0.0, "rms_energy": -10.0, "salience": salience}


def test_repitch_suboctave_ghost():
    """Constructed -12-redirect overshoot: the event's own bin is dead
    (>= 28 dB under track peak) while +12 carries the real string — the
    event must re-pitch up an octave.  A mid-chord weak-fundamental note
    (a lower concurrent voice exists) must NOT re-pitch, and neither must
    an event whose own bin is live."""
    from aegis_tpu.core.poly import repitch_suboctave_ghosts

    fps = SR / HOP
    T = 120
    t = np.arange(T) / fps
    fmin = 24
    mag = np.full((T, NBINS), 1e-7, np.float32)
    mag[:, 35 - fmin] = 0.01 * np.exp(-0.5 * t)   # dead own bin (-40 dB)
    mag[:, 47 - fmin] = 0.30 * np.exp(-0.6 * t)   # the real string
    mag[:, 40 - fmin] = 1.00 * np.exp(-0.4 * t)   # track peak (true bass)
    ghost = _mk_event(35, salience=1.2)
    out = repitch_suboctave_ghosts([ghost], mag, SR, HOP)
    assert [e["note"] for e in out] == [47], out
    assert out[0].get("repitched_octave") is True
    # lowest-voice guard: same levels, but a concurrent lower note exists
    out = repitch_suboctave_ghosts([_mk_event(35), _mk_event(33)],
                                   mag, SR, HOP)
    assert 35 in [e["note"] for e in out]
    # live own bin: a true bass never re-pitches even when h2 is louder
    mag[:, 40 - fmin] = 0.50 * np.exp(-0.4 * t)
    mag[:, 52 - fmin] = 1.00 * np.exp(-0.4 * t)   # h2 louder than own
    out = repitch_suboctave_ghosts([_mk_event(40)], mag, SR, HOP)
    assert [e["note"] for e in out] == [40], out


def test_fifth_recovery_present_vs_absent():
    """Constructed power chord: sustained clean-decay energy at the bass's
    +7 bin (not in the bass's harmonic series, rim cannot leak there) must
    recover the fifth; a quiet +7 bin must not."""
    from aegis_tpu.core.poly import recover_missing_fifths

    fps = SR / HOP
    T = 120
    t = np.arange(T) / fps
    fmin = 24
    mag = np.full((T, NBINS), 1e-7, np.float32)
    bass = _mk_event(40)
    mag[:, 40 - fmin] = 1.0 * np.exp(-0.4 * t)
    out = recover_missing_fifths([dict(bass)], mag, SR, HOP)
    assert [e["note"] for e in out] == [40], out  # quiet bin: no mint
    mag[:, 47 - fmin] = 0.25 * np.exp(-0.55 * t)  # the real fifth (-12 dB)
    out = recover_missing_fifths([dict(bass)], mag, SR, HOP)
    assert [e["note"] for e in out] == [40, 47], out
    assert out[1].get("recovered_fifth") is True
    # note-rim guard: a concurrent event within 2 semitones of n+7 blocks
    out = recover_missing_fifths([dict(bass), _mk_event(45)], mag, SR, HOP)
    assert 47 not in [e["note"] for e in out], out


def test_packed_buffer_ships_cqt_plane():
    """The packed poly transport carries the f16 raw CQT magnitude plane;
    unpack must reproduce the device's own cqt within f16 precision, and
    the analysis dict must expose it to the refinement."""
    import jax.numpy as jnp

    from aegis_tpu.core.analyze import bucket_length
    from aegis_tpu.core.poly import analyze_poly_program
    from aegis_tpu.engine.poly import AegisPolyEngine

    y, _ = chord_progression_clip(4)
    # int16 transport: this test's tolerances isolate the f16 PLANE
    # quantization; the int8 default's (coarser, separately swept)
    # transport noise would drown it
    eng = AegisPolyEngine(sample_rate=SR, transport="int16")
    analysis = eng.analyze(y)
    assert "cqt_mag" in analysis
    T = analysis["roll"].shape[0]
    assert analysis["cqt_mag"].shape == (T, NBINS)
    y_pad = np.pad(y, (0, bucket_length(len(y)) - len(y)))
    direct = np.asarray(analyze_poly_program(
        jnp.asarray(y_pad), SR, NFFT, HOP, NBINS, 12, 6)["cqt_mag"])[:T]
    # int16 audio transport + f16 plane quantization
    np.testing.assert_allclose(analysis["cqt_mag"], direct,
                               rtol=2e-3, atol=2e-3)


def test_poly_hot_start_keeps_opening_chord():
    """Audio that begins directly on a chord (no leading silence — a
    trimmed upload) must keep its opening notes: spectral flux cannot emit
    an onset at frame 0, so without the virtual frame-0 onset and the
    attack-rise start exemption the birth/rise gates rejected the entire
    first chord (measured: recall 0 on the opening event)."""
    from aegis_tpu.engine.poly import AegisPolyEngine
    from aegis_tpu.tools.signal_gen import karplus_strong
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    rng = np.random.default_rng(2)
    prog = [([48, 52, 55], 0.9), ([55, 59, 62], 0.8)]
    pieces, truth, pos = [], [], 0
    for midis, dur in prog:
        n = int(SR * dur)
        yc = np.zeros(n, np.float32)
        for m in midis:
            f = 440.0 * 2 ** ((m - 69) / 12)
            yc[:n] += karplus_strong(f, dur, SR, rng=rng)[:n]
            truth.append({"note": m, "start": pos / SR,
                          "end": (pos + n) / SR})
        pieces.append(yc)
        pos += n
    y = np.concatenate(pieces)
    y = (y / np.abs(y).max() * 0.85).astype(np.float32)
    eng = AegisPolyEngine(sample_rate=SR)
    events = eng.extract_events(eng.analyze(y))
    r = note_event_f1(truth, events_to_seconds(events, SR, HOP))
    assert r["recall"] == 1.0, r
    assert {48, 52, 55} <= {e["note"] for e in events}


def test_rescue_dead_fundamental_consensus():
    """Constructed dead-fundamental physics: the peel detected only h3
    (+19) and h5 (+28) of a string whose own bin is live (−25 dB),
    straight and decaying — the rescue must mint the root, tagged.  With
    the root bin silent, nothing is minted."""
    from aegis_tpu.core.poly import rescue_dead_fundamentals

    fps = SR / HOP
    T = 120
    t = np.arange(T) / fps
    fmin = 24
    mag = np.full((T, NBINS), 1e-9, np.float32)
    h3, h5 = _mk_event(52 + 19, salience=3.0), _mk_event(52 + 28,
                                                         salience=2.7)
    mag[:, 52 + 19 - fmin] = 0.20 * np.exp(-0.5 * t)
    mag[:, 52 + 28 - fmin] = 0.15 * np.exp(-0.5 * t)
    out = rescue_dead_fundamentals([dict(h3), dict(h5)], mag, SR, HOP)
    assert [e["note"] for e in out] == [71, 80], out  # silent root: no mint
    mag[:, 52 - fmin] = 0.06 * np.exp(-0.5 * t)  # ~-25 dB, straight decay
    out = rescue_dead_fundamentals([dict(h3), dict(h5)], mag, SR, HOP)
    assert [e["note"] for e in out] == [52, 71, 80], out
    assert out[0].get("rescued_root") is True
    assert out[0]["salience"] == 3.0  # max voter salience


def test_rescue_repeated_chord_rescues_both_occurrences():
    """A repeated chord later in the progression must get its OWN rescue:
    the mint dedup is per chord occurrence (span overlap), not track-global
    by pitch (round-4 ADVICE fix — the global set silently dropped every
    repeat's rescue)."""
    from aegis_tpu.core.poly import rescue_dead_fundamentals

    fps = SR / HOP
    T = 300
    fmin = 24
    mag = np.full((T, NBINS), 1e-9, np.float32)
    spans = [(10, 110), (160, 260)]
    events = []
    for lo, hi in spans:
        t = np.arange(hi - lo) / fps
        events += [_mk_event(52 + 19, start=lo, end=hi, salience=3.0),
                   _mk_event(52 + 28, start=lo, end=hi, salience=2.7)]
        mag[lo:hi, 52 + 19 - fmin] = 0.20 * np.exp(-0.5 * t)
        mag[lo:hi, 52 + 28 - fmin] = 0.15 * np.exp(-0.5 * t)
        mag[lo:hi, 52 - fmin] = 0.06 * np.exp(-0.5 * t)  # dead-but-live root
    out = rescue_dead_fundamentals([dict(e) for e in events], mag, SR, HOP)
    roots = [e for e in out if e["note"] == 52]
    assert len(roots) == 2, out
    starts = sorted(e["start"] for e in roots)
    assert starts[0] < 150 <= starts[1], roots
    assert all(e.get("rescued_root") for e in roots)


def test_rescue_plus12_beat_exception():
    """A candidate root one octave ABOVE a detected bass collides with the
    bass's h2 — it may only be rescued when its own h2 bin (the bass's
    h4) BEATS (two detuned strings); a straight h4 is the mono case and
    must NOT mint."""
    from aegis_tpu.core.poly import rescue_dead_fundamentals

    fps = SR / HOP
    T = 120
    t = np.arange(T) / fps
    fmin = 24
    mag = np.full((T, NBINS), 1e-9, np.float32)
    bass = _mk_event(40, salience=9.0)
    voter = _mk_event(64, salience=3.0)  # h2 of the candidate 52
    mag[:, 40 - fmin] = 1.0 * np.exp(-0.4 * t)
    mag[:, 52 - fmin] = 0.30 * np.exp(-0.5 * t)   # live straight root bin
    mag[:, 64 - fmin] = 0.20 * np.exp(-0.6 * t)   # straight h4: mono case
    out = rescue_dead_fundamentals([dict(bass), dict(voter)], mag, SR, HOP)
    assert 52 not in [e["note"] for e in out], out
    # beating h4 (bass h4 x octave-string h2): the octave is real
    mix = (0.2 * np.exp(-0.6 * t)
           + 0.2 * np.exp(-1.0 * t) * np.cos(2 * np.pi * 0.9 * t))
    mag[:, 64 - fmin] = np.abs(mix).astype(np.float32) + 1e-9
    out = rescue_dead_fundamentals([dict(bass), dict(voter)], mag, SR, HOP)
    assert 52 in [e["note"] for e in out], out


def test_octave_uncertain_flag():
    """Constructed 44.1 kHz power-chord ambiguity: a bass whose +12 bin is
    live and STRAIGHT, with every aux beat bin dead, inside a window too
    short for the minimum quantization beat (δf ≈ f₁₂²/2sr) to complete
    half a cycle — the doubling is unprovable, so the parent is tagged
    ``octave_uncertain`` instead of silently deciding (VERDICT r3 #4).
    A live, foreign-free aux bin reading straight is a REAL measurement
    (confident no): no tag.  At 22.05 kHz the same geometry is provable
    (the quantization beat is twice as fast): no tag."""
    from aegis_tpu.core.poly import recover_octave_doublings

    sr44, hop44 = 44100, 1024
    fps = sr44 / hop44
    T = 80
    t = np.arange(T) / fps
    fmin = 24
    bass = _mk_event(45, start=10, end=38, salience=5.0)
    mag = np.full((T, NBINS), 1e-9, np.float32)
    mag[:, 45 - fmin] = 1.0 * np.exp(-0.4 * t)
    mag[:, 57 - fmin] = 0.30 * np.exp(-0.5 * t)   # live straight +12 bin
    out = recover_octave_doublings([dict(bass)], mag, sr44, hop44)
    assert [e["note"] for e in out] == [45]
    assert out[0].get("octave_uncertain") is True
    # a live aux bin (45+31) reading straight = confident no -> no tag
    mag2 = mag.copy()
    mag2[:, 45 + 31 - fmin] = 0.2 * np.exp(-0.45 * t)
    out = recover_octave_doublings([dict(bass)], mag2, sr44, hop44)
    assert not out[0].get("octave_uncertain"), out[0]
    # 22.05 kHz: quantization beats are provable inside the window
    out = recover_octave_doublings([dict(bass)], mag, SR, HOP)
    assert not out[0].get("octave_uncertain"), out[0]


def test_octave_uncertain_threads_to_consumers():
    """The flag must reach the user surfaces: tabs ('?' marker), chord
    labels ('(oct?)'), and the server event JSON."""
    from aegis_tpu.engine.poly import label_chords
    from aegis_tpu.midi.tabs import generate_tabs_chords, render_ascii_tab
    from aegis_tpu.serve.server import _events_json

    evs = [dict(_mk_event(45, salience=5.0), velocity=90,
                octave_uncertain=True),
           dict(_mk_event(52, salience=4.0), velocity=90)]
    tab = generate_tabs_chords(evs, SR, HOP)
    assert any(t["octave_uncertain"] for t in tab)
    assert "?" in render_ascii_tab(tab)
    labels = label_chords(evs, SR, HOP)
    assert any("(oct?)" in c["name"] for c in labels)
    j = _events_json(evs)
    assert j[0].get("octave_uncertain") is True
    assert "octave_uncertain" not in j[1]


def test_leakage_ghost_drop():
    """Low-register FFT window leakage: a phantom within two FFT bins of
    a stronger string, quieter by the distance-ramped margin, is dropped;
    an event at the same distance but LOUDER than the neighbor is kept."""
    from aegis_tpu.core.poly import drop_leakage_ghosts

    fps = SR / HOP
    T = 120
    t = np.arange(T) / fps
    fmin = 24
    mag = np.full((T, NBINS), 1e-9, np.float32)
    # 42 is 17.5 Hz (1.63 FFT bins) below 45; phantom at -9 dB
    mag[:, 45 - fmin] = 1.0 * np.exp(-0.4 * t)
    mag[:, 42 - fmin] = 0.35 * np.exp(-0.4 * t)
    ev45, ev42 = _mk_event(45, salience=9.0), _mk_event(42, salience=2.0)
    out = drop_leakage_ghosts([dict(ev42), dict(ev45)], mag, SR, HOP)
    assert [e["note"] for e in out] == [45], out
    # comparable level (inside the distance-ramped margin): a genuinely
    # close pair is unresolvable either way — both kept
    mag[:, 42 - fmin] = 0.9 * np.exp(-0.4 * t)
    out = drop_leakage_ghosts([dict(ev42), dict(ev45)], mag, SR, HOP)
    assert {e["note"] for e in out} == {42, 45}, out
    # far (>2 FFT bins): untouched even when quiet
    mag[:, 42 - fmin] = 1e-9
    mag[:, 52 - fmin] = 0.05 * np.exp(-0.4 * t)
    out = drop_leakage_ghosts([_mk_event(52), dict(ev45)], mag, SR, HOP)
    assert {e["note"] for e in out} == {45, 52}, out


def test_composite_line_ghost_drop():
    """A pitch on the partial LINES of two distinct lower voices (69 =
    45's h4 ≡ 57's h2) with sub-parent salience is a composite-bin ghost;
    comparable salience (its own comb) keeps it."""
    from aegis_tpu.core.poly import drop_composite_harmonic_ghosts

    e45 = _mk_event(45, salience=8.0)
    e57 = _mk_event(57, salience=7.0)
    ghost = _mk_event(69, salience=2.0)
    out = drop_composite_harmonic_ghosts([dict(e45), dict(e57),
                                          dict(ghost)])
    assert [e["note"] for e in out] == [45, 57], out
    real = _mk_event(69, salience=9.0)
    out = drop_composite_harmonic_ghosts([dict(e45), dict(e57), dict(real)])
    assert [e["note"] for e in out] == [45, 57, 69], out
    # a single parent line is NOT composite (the straightness pass's job)
    out = drop_composite_harmonic_ghosts([dict(e45), dict(ghost)])
    assert 69 in [e["note"] for e in out], out


def test_octave_recovery_feeder_guard():
    """A LIVE raw-CQT bin a harmonic interval below the would-be n+12 —
    an UNDETECTED sounding string — makes the octave recovery skip: its
    partial feeds the bin and fakes the beat (measured: a rolled-off 48
    feeding 67 = 48+19 minted a false octave over a 55 bass)."""
    from aegis_tpu.core.poly import recover_octave_doublings

    fps = SR / HOP
    T = 120
    t = np.arange(T) / fps
    fmin = 24
    mag = np.full((T, NBINS), 1e-9, np.float32)
    parent = _mk_event(55, salience=6.0)
    mag[:, 55 - fmin] = 1.0 * np.exp(-0.4 * t)
    mix = (0.3 * np.exp(-0.5 * t)
           + 0.3 * np.exp(-0.9 * t) * np.cos(2 * np.pi * 0.8 * t))
    mag[:, 67 - fmin] = np.abs(mix).astype(np.float32) + 1e-9
    out = recover_octave_doublings([dict(parent)], mag, SR, HOP)
    assert [e["note"] for e in out] == [55, 67], out  # clean: recovered
    # light the feeder bin 48 (= 67 - 19): recovery must now skip
    mag[:, 48 - fmin] = 0.05 * np.exp(-0.45 * t)
    out = recover_octave_doublings([dict(parent)], mag, SR, HOP)
    assert [e["note"] for e in out] == [55], out


def test_harmonic_dedup_covers_h8():
    """The 3-octave (36-semitone) 8th harmonic is deduped like h2..h7."""
    from aegis_tpu.core.poly import harmonic_dedup

    base = {"start": 10, "end": 50, "salience": 1.0}
    events = [dict(base, note=48),
              dict(base, note=84, salience=0.1)]   # 48 + 36 = h8 ghost
    kept = harmonic_dedup(events)
    assert [e["note"] for e in kept] == [48]
    # a comparably-salient 3-octave voice survives (ratio gate)
    events = [dict(base, note=48), dict(base, note=84, salience=0.9)]
    assert len(harmonic_dedup(events)) == 2


def test_reconstruct_confidence_batched():
    """The one shared reconstruction helper normalizes the LAST axis, so
    both (T,128) engine unpacking and (B,T,128) turbo unpacking agree."""
    from aegis_tpu.core.poly import reconstruct_confidence

    rng = np.random.default_rng(0)
    sal = rng.random((3, 17, 128)).astype(np.float32)
    batched = reconstruct_confidence(sal)
    for b in range(3):
        np.testing.assert_allclose(batched[b], reconstruct_confidence(sal[b]))
    assert batched.max() <= 1.0 + 1e-6


def test_confidence_reconstruction():
    """The packed buffer ships salience only; the facade's confidence must
    equal the device's own conf plane exactly."""
    import jax.numpy as jnp

    from aegis_tpu.core.poly import analyze_poly_program
    from aegis_tpu.engine.poly import AegisPolyEngine

    from aegis_tpu.core.analyze import bucket_length

    y, _ = chord_progression_clip(2)
    # int16: isolate the reconstruction identity from transport noise
    # (the int8 default is gated by the 32-case truth sweep instead)
    eng = AegisPolyEngine(sample_rate=SR, transport="int16")
    analysis = eng.analyze(y)
    T = analysis["roll"].shape[0]
    # same padded input as the engine's packed dispatch (tail frames see
    # the bucket padding) — but float32, so allow int16 transport noise
    y_pad = np.pad(y, (0, bucket_length(len(y)) - len(y)))
    out = analyze_poly_program(jnp.asarray(y_pad), SR, NFFT, HOP, NBINS,
                               12, 6)
    sal = np.asarray(out["salience"])[:T]
    conf = sal / np.maximum(sal.max(axis=1, keepdims=True), 1e-10)
    np.testing.assert_allclose(analysis["confidence"], conf,
                               rtol=0.02, atol=0.02)
    # and the reconstruction identity itself is exact on the dict program
    np.testing.assert_allclose(
        np.asarray(out["confidence"]),
        np.asarray(out["salience"]) / np.maximum(
            np.asarray(out["salience"]).max(axis=1, keepdims=True), 1e-10),
        rtol=1e-6, atol=1e-7)


def test_poly_truth_44k():
    """The engine's sr-proportional window (4096/1024 at 44.1 kHz) keeps
    chord truth at F1 1.0; a fixed 2048 window measured 0.5-0.79 there
    (bin spacing 21.5 Hz exceeds a low-string semitone)."""
    from aegis_tpu.engine.poly import AegisPolyEngine
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    eng = AegisPolyEngine(sample_rate=44100)
    assert (eng.n_fft, eng.hop_length) == (4096, 1024)
    # Seeds measured 1.0 under the floored comb normalization
    # (core/poly.py::COMB_NORM_FLOOR, swept 2026-08-18: 44.1 kHz mean
    # 0.945 -> 0.960 over seeds 1-12; seed 3 moved 1.0 -> 0.96 while
    # seeds 7/8/10/11 hold 1.0).
    for seed in (7, 8):
        y, truth = generate_chord_progression(seed, sr=44100)
        events = eng.extract_events(eng.analyze(y))
        r = note_event_f1(truth, events_to_seconds(events, 44100, 1024))
        assert r["f1"] == 1.0, (seed, r)


def test_lazy_plane_fetch_equivalence(tmp_path):
    """The fused fetch's background-thread CQT plane (engine.poly._LazyPlane)
    is transparent: same values as an eager unpack, array-protocol
    properties served without joining, and the npz Phase-1 cache contract
    round-trips it as a concrete array."""
    import os

    import numpy as np

    from aegis_tpu.engine.poly import AegisPolyEngine

    y, _ = chord_progression_clip(4)
    eng = AegisPolyEngine(sample_rate=SR)
    analysis = eng.analyze(y)
    plane = analysis["cqt_mag"]
    T = analysis["roll"].shape[0]
    assert plane.shape == (T, NBINS) and plane.dtype == np.float32
    arr = np.asarray(plane)
    assert arr.shape == (T, NBINS)
    # second coercion returns the same concrete array (memoized join)
    assert np.asarray(plane) is arr
    # __getitem__ matches the coerced array
    np.testing.assert_array_equal(plane[3:7, 10:20], arr[3:7, 10:20])
    # npz round trip stores the concrete plane
    path = os.path.join(tmp_path, "a.npz")
    np.savez(path, cqt_mag=plane)
    np.testing.assert_array_equal(dict(np.load(path))["cqt_mag"], arr)
    # and the refined events are identical to an extraction fed the eager
    # ndarray in place of the lazy handle
    ev_lazy = eng.extract_events(analysis)
    analysis2 = dict(analysis)
    analysis2["cqt_mag"] = arr
    ev_eager = eng.extract_events(analysis2)
    assert ev_lazy == ev_eager and len(ev_lazy) > 0
