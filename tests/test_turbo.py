"""Turbo sharded execution: seam consistency and multichip dry-run."""

import numpy as np

from aegis_tpu.config import AudioConfig, PyinConfig, TurboConfig
from aegis_tpu.core.analyze import run_analyze
from aegis_tpu.engine.turbo import run_analyze_batch, run_analyze_turbo
from aegis_tpu.tools.signal_gen import generate_test_track

SR = 22050
AUDIO = AudioConfig(sample_rate=SR)
PYIN = PyinConfig()


def test_turbo_matches_single_device():
    track, _ = generate_test_track(sr=SR)
    tc = TurboConfig(tile_frames=48, halo_frames=24)
    out_t = run_analyze_turbo(track, AUDIO, PYIN, 0.6, turbo=tc,
                              transport="float32")
    # float32 transport: this test checks tile/halo seam consistency, so the
    # single-device side must ingest bit-identical audio (int16 transport
    # quantization would show up as ~0.5 dB deltas in low-energy mel bins)
    out_s = run_analyze(track, AUDIO, PYIN, 0.6, transport="float32")

    assert out_t["f0"].shape == out_s["f0"].shape
    vf_t, vf_s = out_t["voiced_flag"], out_s["voiced_flag"]
    assert (vf_t == vf_s).mean() > 0.98  # rare seam flips allowed
    m = vf_t & vf_s
    rel = np.abs(out_t["f0"][m] - out_s["f0"][m]) / out_s["f0"][m]
    assert np.nanmax(rel) < 0.01
    np.testing.assert_allclose(out_t["rms"], out_s["rms"], atol=1e-5)
    assert np.abs(out_t["mel_db"] - out_s["mel_db"]).max() < 1e-3


def test_batch_two_tracks():
    t = np.arange(SR // 2) / SR
    ys = np.stack([
        (0.4 * np.sin(2 * np.pi * 196.0 * t)).astype(np.float32),
        (0.4 * np.sin(2 * np.pi * 261.63 * t)).astype(np.float32),
    ])
    tc = TurboConfig(tile_frames=16, halo_frames=8)
    out = run_analyze_batch(ys, AUDIO, PYIN, 0.6, turbo=tc)
    assert out["f0"].shape[0] == 2
    # each track's dominant pitch is correct
    for b, expect in enumerate((196.0, 261.63)):
        f0 = out["f0"][b][out["voiced_flag"][b]]
        assert abs(np.median(f0) - expect) / expect < 0.01


def test_graft_entry_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__
    import jax

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out["f0"].shape[0] > 0


# ---------------------------------------------------------------- event-level
# The user-visible multi-chip contract (VERDICT r1 #5): the same track through
# the sharded and unsharded pipelines must produce IDENTICAL note events.

def _v1_events(raw):
    from aegis_tpu.core.events import extract_events_v1

    return extract_events_v1(
        rake_mask=raw["rake_mask"], f0=np.nan_to_num(raw["f0"]),
        voiced_flag=raw["voiced_flag"], active_probs=raw["voiced_probs"],
        rms=raw["rms"], sr=SR, hop_length=AUDIO.hop_length,
        confidence_threshold=0.55, onset_env=raw.get("onset_env"))


def test_turbo_event_parity_v1():
    import pytest as _pytest

    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    track, truth = generate_test_track(sr=SR)
    ref_raw = run_analyze(track, AUDIO, PYIN, 0.6, transport="float32")
    ref_ev = _v1_events(ref_raw)
    assert ref_ev, "fixture produced no events"
    ref_sec = events_to_seconds(ref_ev, SR, AUDIO.hop_length)

    # several tile/halo configs, incl. a tile count that does not divide the
    # track and a deliberately tiny tile
    for tile, halo in [(48, 24), (40, 16), (96, 32)]:
        tc = TurboConfig(tile_frames=tile, halo_frames=halo)
        raw = run_analyze_turbo(track, AUDIO, PYIN, 0.6, turbo=tc,
                                transport="float32")
        got = events_to_seconds(_v1_events(raw), SR, AUDIO.hop_length)
        m = note_event_f1(ref_sec, got)
        assert m["f1"] == 1.0, (tile, halo, m, ref_sec, got)


def test_turbo_event_parity_financial():
    """Sharded v2 (guitar filters per haloed tile + replicated trend stack)
    vs the single-device financial program, compared on extracted events —
    the contract the VERDICT r1 #2 asks for."""
    from aegis_tpu.core.events import extract_events_financial
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    track, truth = generate_test_track(sr=SR)

    def fin_events(raw):
        ev, _ = extract_events_financial(
            rake_mask=raw["rake_mask"], f0=raw["f0"],
            voiced_flag=raw["voiced_flag"], active_probs=raw["voiced_probs"],
            rms=raw["rms"], sr=SR, hop_length=AUDIO.hop_length,
            trend=raw["trend"], artic_codes=raw["artic_codes"],
            slide_codes=raw["slide_codes"],
            financial_confidence=raw["financial_confidence"],
            confidence_threshold=0.45)
        return events_to_seconds(ev, SR, AUDIO.hop_length)

    ref_raw = run_analyze(track, AUDIO, PYIN, 0.6, financial=True,
                          transport="float32")
    ref_sec = fin_events(ref_raw)
    assert ref_sec, "fixture produced no financial events"

    tc = TurboConfig(tile_frames=48, halo_frames=24)
    raw = run_analyze_turbo(track, AUDIO, PYIN, 0.6, turbo=tc,
                            transport="float32", financial=True)
    # frame rows agree (guitar filters on haloed tiles are exact)
    T = len(ref_raw["f0"])
    assert (raw["mute_mask"][:T] == ref_raw["mute_mask"]).mean() > 0.99
    assert (raw["voiced_flag"][:T] == ref_raw["voiced_flag"]).mean() > 0.98

    got = fin_events(raw)
    m = note_event_f1(ref_sec, got)
    assert m["f1"] == 1.0, (m, ref_sec, got)


def test_batch_financial_per_track_scalars():
    """Batched financial turbo: adaptive threshold / distortion score come
    back per track, not batch-global."""
    t = np.arange(SR) / SR
    loud = (0.7 * np.sin(2 * np.pi * 196.0 * t) * np.exp(-t)).astype(np.float32)
    quiet = (0.02 * np.sin(2 * np.pi * 392.0 * t)).astype(np.float32)
    out = run_analyze_batch(np.stack([loud, quiet]), AUDIO, PYIN,
                            financial=True)
    assert out["adaptive_threshold"].shape == (2,)
    assert out["distortion_score"].shape == (2,)
    assert out["trend"].shape[0] == 2


# ------------------------------------------------------------------ poly
def test_poly_turbo_matches_single_device():
    """Sharded polyphonic program (CQT peeling over the mesh) vs the fused
    single-device program: same roll, same events (the last §5.7 pipeline)."""
    from aegis_tpu.engine.poly import AegisPolyEngine
    from aegis_tpu.engine.turbo import run_analyze_poly_turbo
    from aegis_tpu.tools.signal_gen import karplus_strong
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    rng = np.random.default_rng(7)
    n = int(SR * 2.5)
    y = np.zeros(n, np.float32)
    for i, m in enumerate((60, 64, 67, 55)):  # staggered chord
        f = 440.0 * 2 ** ((m - 69) / 12)
        s = int(i * 0.4 * SR)
        p = karplus_strong(f, 1.2, SR, rng=rng)
        y[s: s + len(p)] += p[: n - s]
    y = (y / max(np.max(np.abs(y)), 1e-9) * 0.8).astype(np.float32)

    # int16: the tiled path uploads int16 slabs, so the fused baseline
    # must too — this test isolates tile-seam effects, not transport
    # noise (the int8 default is gated by the 32-case truth sweep)
    eng = AegisPolyEngine(sample_rate=SR, transport="int16")
    ref = eng.analyze(y)
    ref_ev = eng.extract_events(ref)
    assert ref_ev, "fixture produced no polyphonic events"
    ref_sec = events_to_seconds(ref_ev, SR, eng.hop_length)

    # several tile/halo configs, incl. a tile count that does not divide
    for tile, halo in [(32, 8), (24, 4)]:
        tc = TurboConfig(tile_frames=tile, halo_frames=halo)
        out = run_analyze_poly_turbo(y, sr=SR, turbo=tc)
        T = ref["roll"].shape[0]
        assert out["roll"].shape[0] == T
        assert (out["roll"] == ref["roll"]).mean() > 0.9999, (tile, halo)
        np.testing.assert_allclose(out["rms"], ref["rms"],
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(out["onset_env"], ref["onset_env"],
                                   atol=1e-3)
        got = eng.extract_events({**ref, **out})
        m = note_event_f1(ref_sec,
                          events_to_seconds(got, SR, eng.hop_length))
        assert m["f1"] == 1.0, (tile, halo, m)


def test_poly_turbo_batch():
    """Batched sharded poly over (data, time): per-track scalars stay
    per-track (quiet track's voice floor isn't referenced to the loud one)."""
    from aegis_tpu.engine.turbo import run_analyze_poly_turbo

    t = np.arange(SR) / SR
    loud = (0.8 * np.sin(2 * np.pi * 261.63 * t)).astype(np.float32)
    quiet = (0.01 * np.sin(2 * np.pi * 392.0 * t)).astype(np.float32)
    tc = TurboConfig(tile_frames=16, halo_frames=4)
    out = run_analyze_poly_turbo(np.stack([loud, quiet]), sr=SR, turbo=tc)
    assert out["roll"].shape[0] == 2
    # each track's pitch is active in its own roll despite the level gap
    assert out["roll"][0][:, 60].mean() > 0.5   # C4
    assert out["roll"][1][:, 67].mean() > 0.5   # G4


# ------------------------------------------------------------------ streaming
def test_streamed_matches_turbo_v1():
    """run_analyze_streamed == run_analyze_turbo BIT-EXACTLY for the v1 rows:
    slab edges splice real audio via edge16 and the dB reference comes from
    pass-1, so every tile computes on identical inputs (VERDICT r1 #7)."""
    from aegis_tpu.engine.turbo import run_analyze_streamed

    track, _ = generate_test_track(sr=SR)
    tc = TurboConfig(tile_frames=16, halo_frames=8)
    tr = run_analyze_turbo(track, AUDIO, PYIN, 0.6, turbo=tc)
    # slab_tiles chosen NOT to divide the track's 12 tiles; int16 pins the
    # bitwise contract (the tiled comparison path uploads int16)
    st = run_analyze_streamed(track, AUDIO, PYIN, 0.6, turbo=tc, slab_tiles=8,
                              transport="int16")
    # pYIN rows are bit-exact (identical haloed frames in, identical program)
    assert (st["voiced_flag"] == tr["voiced_flag"]).all()
    m = st["voiced_flag"]
    assert np.array_equal(st["f0"][m], tr["f0"][m])
    np.testing.assert_array_equal(st["rms"], tr["rms"])
    # dB-derived rows: the pass-1 peak program and the fused program round
    # the mel matmuls differently (separate XLA fusions), so the dB
    # reference can differ in the last ulps — tolerance, not equality
    assert (st["rake_mask"] == tr["rake_mask"]).mean() > 0.999
    np.testing.assert_allclose(st["onset_env"], tr["onset_env"], atol=1e-3)


def test_streamed_financial_events():
    """Streamed financial pipeline (guitar filters per slab + one full-track
    trend pass) produces the same events as the sharded financial program."""
    from aegis_tpu.core.events import extract_events_financial
    from aegis_tpu.engine.turbo import run_analyze_streamed
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    track, _ = generate_test_track(sr=SR)
    tc = TurboConfig(tile_frames=16, halo_frames=8)

    def fin_events(raw):
        ev, _ = extract_events_financial(
            rake_mask=raw["rake_mask"], f0=raw["f0"],
            voiced_flag=raw["voiced_flag"], active_probs=raw["voiced_probs"],
            rms=raw["rms"], sr=SR, hop_length=AUDIO.hop_length,
            trend=raw["trend"], artic_codes=raw["artic_codes"],
            slide_codes=raw["slide_codes"],
            financial_confidence=raw["financial_confidence"],
            confidence_threshold=0.45)
        return events_to_seconds(ev, SR, AUDIO.hop_length)

    tr = run_analyze_turbo(track, AUDIO, PYIN, 0.6, turbo=tc, financial=True)
    st = run_analyze_streamed(track, AUDIO, PYIN, 0.6, turbo=tc,
                              slab_tiles=8, financial=True,
                              transport="int16")
    assert (st["mute_mask"] == tr["mute_mask"]).all()
    m = note_event_f1(fin_events(tr), fin_events(st))
    assert m["f1"] == 1.0, m
    # trend rows identical where both voiced
    both = st["voiced_flag"] & tr["voiced_flag"]
    assert np.nanmax(np.abs(st["trend"][both] - tr["trend"][both])) < 1e-3


def test_streamed_int8_default():
    """The int8 streamed default (the upload IS the streamed bottleneck:
    33.6 MB int16 for a 10-min track): the dequantized slab audio is
    bit-identical to the fused int8 path's (same PCM8_BLOCK grid from
    sample 0 — tested directly), and the full streamed pipeline agrees
    with the int16 stream on voicing/pitch and event-for-event."""
    import numpy as np

    from aegis_tpu.core.analyze import bucket_length, quantize_pcm8
    from aegis_tpu.core.events import extract_events_v1
    from aegis_tpu.engine.turbo import run_analyze_streamed
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    track, _ = generate_test_track(sr=SR)
    # dequant-grid identity: slab padding vs bucket padding share every
    # complete block of the true-length prefix
    n_true = len(track)
    slab_pad = np.zeros(-(-n_true // 65536) * 65536, np.float32)
    slab_pad[:n_true] = track
    buck_pad = np.zeros(bucket_length(n_true), np.float32)
    buck_pad[:n_true] = track
    q_s, s_s = quantize_pcm8(slab_pad)
    q_b, s_b = quantize_pcm8(buck_pad)
    nfull = (n_true // 1024) * 1024
    np.testing.assert_array_equal(q_s[:nfull], q_b[:nfull])
    np.testing.assert_array_equal(s_s[: nfull // 1024], s_b[: nfull // 1024])

    tc = TurboConfig(tile_frames=16, halo_frames=8)
    st8 = run_analyze_streamed(track, AUDIO, PYIN, 0.6, turbo=tc,
                               slab_tiles=8)  # int8 default
    st16 = run_analyze_streamed(track, AUDIO, PYIN, 0.6, turbo=tc,
                                slab_tiles=8, transport="int16")
    assert (st8["voiced_flag"] == st16["voiced_flag"]).mean() > 0.99
    both = st8["voiced_flag"] & st16["voiced_flag"]
    np.testing.assert_allclose(st8["f0"][both], st16["f0"][both], rtol=1e-3)

    def ev(raw):
        return events_to_seconds(extract_events_v1(
            rake_mask=raw["rake_mask"], f0=np.nan_to_num(raw["f0"]),
            voiced_flag=raw["voiced_flag"], active_probs=raw["voiced_probs"],
            rms=raw["rms"], sr=SR, hop_length=AUDIO.hop_length,
            onset_env=raw["onset_env"]), SR, AUDIO.hop_length)

    m = note_event_f1(ev(st16), ev(st8))
    assert m["f1"] == 1.0, m


def test_stream_mode_via_facades():
    """turbo_mode='stream' through both engine facades (the product surface
    for multi-minute uploads)."""
    from aegis_tpu.engine.engine import AegisEngine
    from aegis_tpu.engine.financial import AegisFinancialEngine

    track, _ = generate_test_track(sr=SR)
    tc = TurboConfig(tile_frames=16, halo_frames=8)
    eng = AegisEngine(sample_rate=SR, backend="device")
    raw_s = eng.audio_to_midi(track, None, turbo_mode="stream",
                              turbo_config=tc)
    raw_d = eng.audio_to_midi(track, None)
    ev_s = eng.extract_events(raw_s, None, confidence_threshold=0.5)
    ev_d = eng.extract_events(raw_d, None, confidence_threshold=0.5)
    assert {e["note"] for e in ev_s} == {e["note"] for e in ev_d}

    fin = AegisFinancialEngine(sample_rate=SR, backend="device")
    a = fin.analyze(track, turbo_mode="stream", turbo_config=tc)
    ev, info = fin.extract_events(a)
    assert ev and "adaptive_threshold" in a
