"""API server: full session lifecycle over real HTTP."""

import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from aegis_tpu.engine.engine import AegisEngine
from aegis_tpu.io.wav import write_wav
from aegis_tpu.serve.http import make_handler
from aegis_tpu.serve.server import AegisServer
from aegis_tpu.tools.signal_gen import two_tone

SR = 22050


@pytest.fixture(scope="module")
def server_url():
    srv = AegisServer(engine=AegisEngine(sample_rate=SR, backend="device"))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv.router))
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _req(url, method="GET", body=None):
    req = urllib.request.Request(url, data=body, method=method)
    with urllib.request.urlopen(req, timeout=600) as resp:
        data = resp.read()
        ctype = resp.headers.get("Content-Type", "")
        return resp.status, ctype, data


def test_full_session_lifecycle(server_url):
    # presets
    status, _, data = _req(f"{server_url}/api/presets")
    assert status == 200
    presets = json.loads(data)
    assert "electric_clean" in presets["adsr_presets"]

    # root SPA
    status, ctype, data = _req(server_url + "/")
    assert status == 200 and b"Aegis" in data

    # upload
    buf = io.BytesIO()
    write_wav(buf, two_tone(sr=SR), SR)
    status, _, data = _req(f"{server_url}/api/upload?name=test.wav",
                           "POST", buf.getvalue())
    assert status == 200
    sid = json.loads(data)["session_id"]

    # analyze
    status, _, data = _req(
        f"{server_url}/api/analyze/{sid}?confidence_threshold=0.5", "POST")
    assert status == 200
    j = json.loads(data)
    assert j["num_events"] >= 2
    notes = {e["note"] for e in j["events"]}
    assert {55, 62} <= notes  # G3, D4

    # refilter with stricter duration
    status, _, data = _req(
        f"{server_url}/api/refilter/{sid}?confidence_threshold=0.5"
        f"&min_note_duration_ms=100", "POST")
    assert status == 200
    assert json.loads(data)["num_events"] >= 1

    # use_onsets=false (the reference's merge/lag semantics) is a valid
    # extraction param on the v1 path too, as on poly
    status, _, data = _req(
        f"{server_url}/api/refilter/{sid}?confidence_threshold=0.5"
        f"&use_onsets=false", "POST")
    assert status == 200
    assert json.loads(data)["num_events"] >= 1

    # refilter with tempo-aware export: bpm riding in the response, a
    # set_tempo meta in the MIDI, malformed value rejected
    status, _, data = _req(
        f"{server_url}/api/refilter/{sid}?confidence_threshold=0.5&bpm=96.5",
        "POST")
    assert status == 200
    j = json.loads(data)
    assert j["bpm"] == 96.5
    import base64 as _b64

    from aegis_tpu.midi.smf import MidiFile

    mf = MidiFile.load(_b64.b64decode(j["midi_base64"]))
    tempos = [m.tempo for t in mf.tracks for m in t if m.type == "set_tempo"]
    assert tempos and abs(60e6 / tempos[0] - 96.5) < 0.1
    with pytest.raises(urllib.error.HTTPError) as err:
        _req(f"{server_url}/api/refilter/{sid}?bpm=fast", "POST")
    assert err.value.code == 400
    status, _, data = _req(
        f"{server_url}/api/refilter/{sid}?confidence_threshold=0.5&bpm=auto",
        "POST")
    assert status == 200
    got = json.loads(data)["bpm"]
    assert got is None or 30.0 <= got <= 300.0

    # MIDI download
    status, ctype, data = _req(f"{server_url}/api/midi/{sid}")
    assert status == 200 and ctype == "audio/midi" and data[:4] == b"MThd"

    # tabs
    status, _, data = _req(f"{server_url}/api/tabs/{sid}")
    assert status == 200
    tabs = json.loads(data)
    assert tabs["total_notes"] >= 1 and "ascii" in tabs

    # fret filter
    status, _, data = _req(f"{server_url}/api/fret-filter/{sid}", "POST")
    assert status == 200
    j = json.loads(data)
    assert "report" in j and j["midi_base64"]

    # ADSR synth
    status, _, data = _req(
        f"{server_url}/api/adsr-synth/{sid}?preset=electric_clean", "POST")
    assert status == 200
    assert json.loads(data)["wav_base64"]

    # crossfade audio
    status, ctype, data = _req(f"{server_url}/api/crossfade/{sid}?crossfade=0.5",
                               "POST")
    assert status == 200 and ctype == "audio/wav" and data[:4] == b"RIFF"

    # spectrogram underlay grid
    status, _, data = _req(f"{server_url}/api/spectrogram/{sid}")
    assert status == 200
    spec = json.loads(data)
    import base64
    grid = base64.b64decode(spec["grid_base64"])
    assert len(grid) == spec["frames"] * spec["n_mels"]
    assert spec["db_range"][0] < spec["db_range"][1]

    # push client-side edits: MIDI download must reflect the edited events
    edited = [{"note": 64, "start": 0, "end": 40, "velocity": 90,
               "track": "main", "technique": "normal"}]
    status, _, data = _req(f"{server_url}/api/events/{sid}", "POST",
                           json.dumps(edited).encode())
    assert status == 200
    j = json.loads(data)
    assert j["num_events"] == 1 and j["events"][0]["note"] == 64
    status, _, data = _req(f"{server_url}/api/midi/{sid}")
    assert status == 200 and data[:4] == b"MThd"
    from aegis_tpu.midi.decode import midi_to_notes
    assert {n["note"] for n in midi_to_notes(data)} == {64}

    # single-frame events (end == start) are valid: extraction emits them
    # when min-duration is below one frame
    status, _, data = _req(f"{server_url}/api/events/{sid}", "POST",
                           b'[{"note": 64, "start": 5, "end": 5}]')
    assert status == 200 and json.loads(data)["num_events"] == 1

    # invalid edits rejected
    for bad in (b"not json", b"{}", b'[{"note": 200, "start": 0, "end": 1}]',
                b'[{"note": 64, "start": 5, "end": 4}]'):
        try:
            _req(f"{server_url}/api/events/{sid}", "POST", bad)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400


def test_polyphonic_endpoints(server_url):
    from aegis_tpu.tools.signal_gen import karplus_strong

    rng = np.random.default_rng(4)
    n = SR
    y = np.zeros(n, np.float32)
    for m in (60, 64, 67):
        f = 440.0 * 2 ** ((m - 69) / 12)
        y[:n] += karplus_strong(f, 1.0, SR, rng=rng)[:n]
    y = (y / np.max(np.abs(y)) * 0.8).astype(np.float32)

    buf = io.BytesIO()
    write_wav(buf, y, SR)
    status, _, data = _req(f"{server_url}/api/upload?name=chord.wav", "POST",
                           buf.getvalue())
    sid = json.loads(data)["session_id"]

    status, _, data = _req(
        f"{server_url}/api/analyze-poly/{sid}?confidence_threshold=0.3"
        f"&use_onsets=false", "POST")
    assert status == 200
    j = json.loads(data)
    notes = {e["note"] for e in j["events"]}
    assert {60, 64, 67} <= notes, notes

    # poly refilter with a stricter duration still works on cached analysis
    status, _, data = _req(
        f"{server_url}/api/refilter-poly/{sid}?min_note_duration_ms=100"
        f"&use_onsets=false", "POST")
    assert status == 200 and json.loads(data)["num_events"] >= 3

    # MIDI download reflects the polyphonic events
    status, _, data = _req(f"{server_url}/api/midi/{sid}")
    assert status == 200 and data[:4] == b"MThd"

    # the routed (auto) endpoint transcribes the same chord session
    status, _, data = _req(f"{server_url}/api/analyze-auto/{sid}", "POST")
    assert status == 200
    j = json.loads(data)
    assert {60, 64, 67} <= {e["note"] for e in j["events"]}, j["events"]
    assert j["hop_length"] in (512, 1024)

    # Phase-2-only instant re-route from the cached dual analysis
    status, _, data = _req(
        f"{server_url}/api/refilter-auto/{sid}?bpm=auto", "POST")
    assert status == 200
    j2 = json.loads(data)
    assert {60, 64, 67} <= {e["note"] for e in j2["events"]}
    assert j2["midi_base64"]

    # refilter-poly without poly analysis -> 400
    status, _, data = _req(f"{server_url}/api/upload?name=x.wav", "POST",
                           buf.getvalue())
    sid2 = json.loads(data)["session_id"]
    try:
        _req(f"{server_url}/api/refilter-poly/{sid2}", "POST")
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_error_paths(server_url):
    # unknown session
    try:
        _req(f"{server_url}/api/analyze/zzzzzzzz", "POST")
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
    # refilter before analyze
    status, _, data = _req(f"{server_url}/api/upload?name=x.wav", "POST",
                           b"RIFF")  # invalid wav: upload ok, analyze fails
    sid = json.loads(data)["session_id"]
    try:
        _req(f"{server_url}/api/refilter/{sid}", "POST")
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # unknown route
    try:
        _req(f"{server_url}/api/nope")
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_verify_endpoints_over_http(server_url):
    """The four heavy self-verification endpoints driven through the live
    server (VERDICT r1 #6): param coercion, session interaction, and one
    malformed/precondition error case each.  Tiny clip + ADSR synth path so
    no FluidSynth is needed."""
    import urllib.error

    buf = io.BytesIO()
    write_wav(buf, two_tone(sr=SR), SR)
    status, _, data = _req(f"{server_url}/api/upload?name=v.wav", "POST",
                           buf.getvalue())
    sid = json.loads(data)["session_id"]

    # precondition errors BEFORE analyze: all four demand prior state
    for ep in ("reverse-analysis", "auto-match", "effect-loop",
               "per-note-optimize"):
        try:
            _req(f"{server_url}/api/{ep}/{sid}", "POST")
            assert False, f"expected 400 from {ep} before analyze"
        except urllib.error.HTTPError as e:
            assert e.code == 400, ep

    status, _, data = _req(
        f"{server_url}/api/analyze/{sid}?confidence_threshold=0.5", "POST")
    assert status == 200

    # reverse analysis: metrics in [0, 1], note counts sane
    status, _, data = _req(f"{server_url}/api/reverse-analysis/{sid}", "POST")
    assert status == 200
    j = json.loads(data)
    assert j["original_notes"] >= 2 and j["reversed_notes"] >= 1
    for k in ("note_accuracy", "pitch_accuracy", "timing_accuracy"):
        assert 0.0 <= j[k] <= 1.0, (k, j)

    # auto-match: returns the winning extraction params
    status, _, data = _req(f"{server_url}/api/auto-match/{sid}", "POST")
    assert status == 200
    j = json.loads(data)
    assert 0.1 <= j["confidence_threshold"] <= 0.95
    assert j["min_note_duration_ms"] > 0 and "score" in j

    # effect loop: bounded iterations, history shape, accuracy float
    status, _, data = _req(
        f"{server_url}/api/effect-loop/{sid}?preset=clean&max_iterations=1",
        "POST")
    assert status == 200
    j = json.loads(data)
    assert isinstance(j["best_accuracy"], float) and j["iterations"] >= 1
    assert j["history"] and "overall" in j["history"][0]
    # unknown preset quietly falls back to clean (reference behavior)
    status, _, data = _req(
        f"{server_url}/api/effect-loop/{sid}?preset=nope&max_iterations=1",
        "POST")
    assert status == 200

    # per-note optimizer: quick mode report + rendered audio
    status, _, data = _req(
        f"{server_url}/api/per-note-optimize/{sid}?quick_mode=true", "POST")
    assert status == 200
    j = json.loads(data)
    assert j["report"]["count"] >= 1 and j["wav_base64"]

    # malformed params: non-numeric coercion -> 400
    try:
        _req(f"{server_url}/api/effect-loop/{sid}?max_iterations=abc", "POST")
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_analyze_turbo_modes(server_url):
    """turbo=off|stream|auto param: mode is reported, streamed analysis
    matches the fused path on a short clip, auto engages streaming past
    the (test-lowered) duration threshold."""
    import urllib.error

    buf = io.BytesIO()
    write_wav(buf, two_tone(sr=SR), SR)
    status, _, data = _req(f"{server_url}/api/upload?name=m.wav", "POST",
                           buf.getvalue())
    sid = json.loads(data)["session_id"]

    status, _, data = _req(
        f"{server_url}/api/analyze/{sid}?turbo=off&confidence_threshold=0.5",
        "POST")
    base = json.loads(data)
    assert base["analysis_mode"] == "fused"

    status, _, data = _req(
        f"{server_url}/api/analyze/{sid}?turbo=auto&stream_threshold_s=0.5"
        f"&confidence_threshold=0.5", "POST")
    j = json.loads(data)
    assert j["analysis_mode"] == "stream"
    assert ({e["note"] for e in j["events"]}
            == {e["note"] for e in base["events"]})

    try:
        _req(f"{server_url}/api/analyze/{sid}?turbo=bogus", "POST")
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_streaming_endpoints(server_url):
    """Live-source streaming over HTTP: start -> feed int16 chunks ->
    poll -> finalize."""
    import urllib.error

    status, _, data = _req(
        f"{server_url}/api/stream-start?tile_frames=16&halo_frames=8"
        f"&confidence_threshold=0.5", "POST")
    j = json.loads(data)
    sid = j["session_id"]
    assert j["lookahead_s"] > 0 and j["sample_rate"] == SR

    y = two_tone(sr=SR)
    pcm = np.round(np.clip(y, -1, 1) * 32767).astype("<i2").tobytes()
    third = len(pcm) // 3 // 2 * 2
    total_tiles = 0
    for i in range(3):
        status, _, data = _req(f"{server_url}/api/stream-feed/{sid}", "POST",
                               pcm[i * third: (i + 1) * third])
        assert status == 200
        total_tiles += json.loads(data)["tiles_analyzed"]
    assert total_tiles >= 1

    status, _, data = _req(f"{server_url}/api/stream-events/{sid}")
    assert status == 200  # live view is callable mid-stream

    status, _, data = _req(f"{server_url}/api/stream-finalize/{sid}", "POST")
    j = json.loads(data)
    assert {e["note"] for e in j["events"]} >= {55, 62}
    assert j["midi_base64"]

    # the stream is terminal after finalize: more audio would corrupt
    # event timing (pad-shifted) — must be a 400, not silent acceptance
    try:
        _req(f"{server_url}/api/stream-feed/{sid}", "POST", pcm[:third])
        assert False, "expected 400 for feed-after-finalize"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # polling and re-finalizing the finalized session stays valid
    status, _, data = _req(f"{server_url}/api/stream-events/{sid}")
    assert status == 200
    assert {e["note"] for e in json.loads(data)["events"]} >= {55, 62}

    # feeding a non-streaming session -> 400
    buf = io.BytesIO()
    write_wav(buf, y, SR)
    status, _, data = _req(f"{server_url}/api/upload?name=n.wav", "POST",
                           buf.getvalue())
    sid2 = json.loads(data)["session_id"]
    try:
        _req(f"{server_url}/api/stream-feed/{sid2}", "POST", b"\x00\x00")
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_analyze_neural_backend(server_url):
    """pitch_backend=neural routes analysis through PitchNet; bad backend
    names are a 400."""
    import urllib.error

    from aegis_tpu.models.pitchnet import have_default_weights

    buf = io.BytesIO()
    write_wav(buf, two_tone(sr=SR), SR)
    status, _, data = _req(f"{server_url}/api/upload?name=nn.wav", "POST",
                           buf.getvalue())
    sid = json.loads(data)["session_id"]

    try:
        _req(f"{server_url}/api/analyze/{sid}?pitch_backend=psychic", "POST")
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400

    if not have_default_weights():
        pytest.skip("no committed PitchNet checkpoint")
    status, _, data = _req(
        f"{server_url}/api/analyze/{sid}?pitch_backend=neural"
        f"&confidence_threshold=0.5", "POST")
    assert status == 200
    j = json.loads(data)
    assert {e["note"] for e in j["events"]} >= {55, 62}


def test_health(server_url):
    status, _, data = _req(f"{server_url}/api/health")
    assert status == 200
    j = json.loads(data)
    assert j["status"] == "ok"
    assert isinstance(j["sessions"], int)
    assert isinstance(j["neural_backend"], bool)
    # probe_device=1 forces backend reporting (the default never initializes
    # the backend on the request thread)
    status, _, data = _req(f"{server_url}/api/health?probe_device=1")
    j = json.loads(data)
    assert j["platform"] == "cpu" and j["n_devices"] == 8  # test mesh


def test_event_edit_validation_and_filename_sanitization(server_url):
    """Round-2 review fixes: bad track/velocity -> 400; unicode/CRLF file
    names can't break the Content-Disposition header."""
    import urllib.error
    import urllib.parse

    buf = io.BytesIO()
    write_wav(buf, two_tone(sr=SR), SR)
    name = urllib.parse.quote("ギター\r\nSet-Cookie:x.wav")
    status, _, data = _req(f"{server_url}/api/upload?name={name}", "POST",
                           buf.getvalue())
    sid = json.loads(data)["session_id"]
    _req(f"{server_url}/api/analyze/{sid}?confidence_threshold=0.5", "POST")

    # the download header survives the hostile name (sanitized)
    status, _, data = _req(f"{server_url}/api/midi/{sid}")
    assert status == 200 and data[:4] == b"MThd"

    for bad in ([{"note": 60, "start": 0, "end": 4, "track": "Main"}],
                [{"note": 60, "start": 0, "end": 4, "velocity": 128}],
                [{"note": 60, "start": 0, "end": 4, "velocity": -1}]):
        try:
            _req(f"{server_url}/api/events/{sid}", "POST",
                 json.dumps(bad).encode())
            assert False, f"expected 400 for {bad}"
        except urllib.error.HTTPError as e:
            assert e.code == 400

    # velocity 0 is a LEGAL event (velocity_from_db emits it at <= -80 dB)
    # — the extractor's own output must round-trip through edit-sync; the
    # encoder clamps it to note_on velocity 1 (0 = note_off in SMF)
    ok = [{"note": 60, "start": 0, "end": 4, "velocity": 0}]
    status, _, data = _req(f"{server_url}/api/events/{sid}", "POST",
                           json.dumps(ok).encode())
    assert status == 200
    status, _, data = _req(f"{server_url}/api/midi/{sid}")
    assert status == 200 and data[:4] == b"MThd"


def test_param_validation_400s(server_url):
    """Review findings: bpm=0/nan passed float() but crashed the MIDI tick
    math as a 500; end_time <= start_time silently analyzed the WRONG
    region (negative-duration Python slice).  All must be 400s now."""
    buf = io.BytesIO()
    write_wav(buf, two_tone(sr=SR), SR)
    status, _, data = _req(f"{server_url}/api/upload?name=val.wav",
                           "POST", buf.getvalue())
    sid = json.loads(data)["session_id"]
    status, _, _ = _req(f"{server_url}/api/analyze/{sid}", "POST")
    assert status == 200

    for bad in ("0", "nan", "-120", "inf", "abc"):
        try:
            _req(f"{server_url}/api/refilter/{sid}?bpm={bad}", "POST")
            assert False, f"expected 400 for bpm={bad}"
        except urllib.error.HTTPError as e:
            assert e.code == 400, (bad, e.code)
            assert b"bpm" in e.read()

    # valid bpm still works after the validation tightening
    status, _, data = _req(f"{server_url}/api/refilter/{sid}?bpm=90", "POST")
    assert status == 200 and json.loads(data)["bpm"] == 90.0

    # inverted / empty analysis region is a client error, not wrong output
    for rng in ("start_time=1.0&end_time=0.5", "start_time=1&end_time=1"):
        try:
            _req(f"{server_url}/api/analyze/{sid}?{rng}", "POST")
            assert False, f"expected 400 for {rng}"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert b"start_time" in e.read()

    # coerce() hardening: 'inf' through an int cast raised an uncaught
    # OverflowError (500) and non-finite floats crashed downstream — both
    # must be 400s naming the parameter
    for qp in ("sustain_ms=inf", "sustain_ms=nan", "noise_gate_db=inf",
               "noise_gate_db=nan"):
        try:
            _req(f"{server_url}/api/refilter/{sid}?{qp}", "POST")
            assert False, f"expected 400 for {qp}"
        except urllib.error.HTTPError as e:
            assert e.code == 400, (qp, e.code)
            assert qp.split("=")[0].encode() in e.read()


def test_streaming_poly_endpoints(server_url):
    """engine=poly live streaming over HTTP: chords come out, the MIDI is
    returned, and chord-aware tabs render from the finalized session."""
    import urllib.error

    from aegis_tpu.tools.signal_gen import generate_chord_progression

    status, _, data = _req(
        f"{server_url}/api/stream-start?engine=poly", "POST")
    j = json.loads(data)
    sid = j["session_id"]
    assert j["engine"] == "poly" and j["lookahead_s"] > 0

    y, truth = generate_chord_progression(7, sr=SR)
    pcm = np.round(np.clip(y, -1, 1) * 32767).astype("<i2").tobytes()
    half = len(pcm) // 2 // 2 * 2
    for i in range(2):
        status, _, data = _req(f"{server_url}/api/stream-feed/{sid}", "POST",
                               pcm[i * half: (i + 1) * half])
        assert status == 200

    status, _, data = _req(f"{server_url}/api/stream-events/{sid}")
    assert status == 200  # live view callable mid-stream
    live = json.loads(data)
    assert "chords" in live  # live chord symbols ride the poly poll
    if live["events"]:
        assert all("name" in c for c in live["chords"])

    status, _, data = _req(f"{server_url}/api/stream-finalize/{sid}", "POST")
    j = json.loads(data)
    truth_notes = {t["note"] for t in truth}
    got_notes = {e["note"] for e in j["events"]}
    assert got_notes & truth_notes, (got_notes, truth_notes)
    assert j["midi_base64"]

    # chord-aware tabs work on the live poly session, with chord labels
    status, _, data = _req(f"{server_url}/api/tabs/{sid}")
    assert status == 200
    tabs_j = json.loads(data)
    assert tabs_j["total_notes"] >= len(j["events"]) // 2
    assert tabs_j["chords"], tabs_j  # named chord groups ride along
    assert all("name" in c and "time_sec" in c and c["notes"]
               for c in tabs_j["chords"])

    # re-filter endpoints reject live poly sessions cleanly
    try:
        _req(f"{server_url}/api/refilter-poly/{sid}", "POST")
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400

    # bad engine name -> 400
    try:
        _req(f"{server_url}/api/stream-start?engine=nope", "POST")
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_streaming_financial_endpoint(server_url):
    """engine=financial live streaming over HTTP: notes come out with the
    financial extractor's adaptive threshold, MIDI is returned."""
    status, _, data = _req(
        f"{server_url}/api/stream-start?engine=financial"
        f"&tile_frames=16&halo_frames=8", "POST")
    j = json.loads(data)
    sid = j["session_id"]
    assert j["engine"] == "financial"

    y = two_tone(sr=SR)
    pcm = np.round(np.clip(y, -1, 1) * 32767).astype("<i2").tobytes()
    status, _, _ = _req(f"{server_url}/api/stream-feed/{sid}", "POST", pcm)
    assert status == 200
    status, _, data = _req(f"{server_url}/api/stream-finalize/{sid}", "POST")
    j = json.loads(data)
    assert {e["note"] for e in j["events"]} >= {55, 62}
    assert j["midi_base64"]


def test_poly_session_hop_consistency_44k():
    """Review r2: at 44.1 kHz the poly engine runs its VALIDATED
    sr-proportional grid (hop 1024) while the v1 engine uses 512 — tabs,
    edit-sync re-encodes, and responses must use the session's own hop.
    Before the fix, /api/tabs halved every live/offline poly time and
    /api/events re-encoded poly MIDI at double speed with the v1 patch."""
    import urllib.parse

    from aegis_tpu.tools.signal_gen import generate_chord_progression

    srv = AegisServer(engine=AegisEngine(sample_rate=44100,
                                         backend="device"))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv.router))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        y, truth = generate_chord_progression(7, sr=44100)
        buf = io.BytesIO()
        write_wav(buf, y, 44100)
        status, _, data = _req(f"{base}/api/upload?name=c.wav", "POST",
                               buf.getvalue())
        sid = json.loads(data)["session_id"]
        status, _, data = _req(f"{base}/api/analyze-poly/{sid}", "POST")
        j = json.loads(data)
        assert status == 200 and j["num_events"] > 0
        # the response declares the poly grid (the SPA adopts it)
        assert j["hop_length"] == srv.poly_engine.hop_length == 1024
        assert j["sample_rate"] == 44100

        # tabs convert frames -> seconds with the poly hop: the first
        # chord's truth onset is ~0 s, the second ~0.8 s (generator grid);
        # with the engine hop the times would come out halved
        status, _, data = _req(f"{base}/api/tabs/{sid}")
        tabs = json.loads(data)["tabs"]
        assert tabs
        spf = 1024 / 44100
        for t in tabs:
            # time_sec is rounded to 4 decimals server-side
            assert abs(t["time_sec"] - t["m_start"] * spf) < 5e-5

        # edit-sync round-trip: re-encoded MIDI must match the poly MIDI
        # (same hop, same program), not a double-speed v1 re-encode
        status, _, midi_pre = _req(f"{base}/api/midi/{sid}")
        events = j["events"]
        status, _, data = _req(
            f"{base}/api/events/{sid}", "POST",
            json.dumps(events).encode())
        assert status == 200
        status, _, midi_post = _req(f"{base}/api/midi/{sid}")
        from aegis_tpu.midi.decode import midi_to_notes

        n_pre = midi_to_notes(midi_pre)
        n_post = midi_to_notes(midi_post)
        assert len(n_pre) == len(n_post)
        for a, b in zip(sorted(n_pre, key=lambda n: (n["start"], n["note"])),
                        sorted(n_post, key=lambda n: (n["start"], n["note"]))):
            assert a["note"] == b["note"]
            assert abs(a["start"] - b["start"]) < 0.01, (a, b)
    finally:
        httpd.shutdown()


def test_session_store_update_touches_and_ids_unique():
    """Review r2: update() must count as activity (a long analysis that
    only writes could be swept mid-processing), and ids are 16-hex."""
    import time as _time

    from aegis_tpu.serve.sessions import SessionStore

    store = SessionStore(ttl=0.2)
    sid = store.create(file_name="x.wav")
    assert len(sid) == 16
    _time.sleep(0.15)
    store.update(sid, events=[1])   # write activity refreshes the TTL
    _time.sleep(0.15)
    assert store.sweep() == 0       # still alive: updated 0.15s ago
    assert store.get(sid)["events"] == [1]
    _time.sleep(0.25)
    assert store.sweep() == 1       # now genuinely idle


def test_stream_client_rate(server_url):
    """stream-start?sr= runs the session at the CLIENT's PCM rate: a
    44.1 kHz source against a 22.05 kHz server engine must come out at
    true pitch (feeding mismatched PCM used to pitch-shift an octave),
    with frame->time conversion on the session's own sr+hop grid."""
    sr = 44100
    status, _, data = _req(f"{server_url}/api/stream-start?engine=v1&sr={sr}",
                           "POST")
    j = json.loads(data)
    assert j["sample_rate"] == sr
    sid = j["session_id"]

    t = np.arange(int(sr * 1.5)) / sr
    y = (0.4 * np.sin(2 * np.pi * 196.0 * t) * np.exp(-0.5 * t))
    pcm = (y * 32767).astype("<i2").tobytes()
    half = (len(pcm) // 4) * 2
    for i in range(0, len(pcm), half):
        _req(f"{server_url}/api/stream-feed/{sid}", "POST", pcm[i:i + half])
    status, _, data = _req(f"{server_url}/api/stream-finalize/{sid}", "POST")
    j = json.loads(data)
    notes = {e["note"] for e in j["events"]}
    assert 55 in notes, j["events"]  # G3, not the octave-shifted 67
    # MIDI times encode through the session grid: ~0 s start, ~1 s+ length
    from aegis_tpu.midi.decode import midi_to_notes
    import base64

    parsed = midi_to_notes(base64.b64decode(j["midi_base64"]))
    g3 = [n for n in parsed if n["note"] == 55][0]
    assert g3["start"] < 0.3 and g3["end"] > 0.7, g3

    # out-of-range client rate -> 400
    try:
        _req(f"{server_url}/api/stream-start?engine=v1&sr=4000", "POST")
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_spa_live_tab_call_sequence(server_url):
    """The SPA's live-tab flow, exactly as index.html issues it (VERDICT r4
    #5): stream-start?engine&sr=<AudioContext rate> (response carries the
    session's OWN hop_length for the client's frame->time axis), ordered
    ~250 ms int16 feed posts, interleaved stream-events polls (the rolling
    roll), finalize?midi_program=<patch>, then the offline buttons the SPA
    re-enables afterwards (/api/midi, /api/tabs) against the same session."""
    mic_sr = 48000  # a typical AudioContext rate, not the engine default
    status, _, data = _req(
        f"{server_url}/api/stream-start?engine=v1&sr={mic_sr}", "POST")
    j = json.loads(data)
    sid = j["session_id"]
    assert j["sample_rate"] == mic_sr
    assert j["hop_length"] > 0  # the SPA's setGrid() input

    y = two_tone(sr=mic_sr)
    pcm = np.round(np.clip(y, -1, 1) * 32767).astype("<i2").tobytes()
    chunk = int(mic_sr * 0.25) * 2  # the SPA's ~250 ms cadence
    for i in range(0, len(pcm), chunk):
        status, _, data = _req(f"{server_url}/api/stream-feed/{sid}",
                               "POST", pcm[i:i + chunk])
        assert status == 200
        if i // chunk % 2 == 1:  # the SPA polls every other chunk (~500 ms)
            status, _, data = _req(f"{server_url}/api/stream-events/{sid}")
            assert status == 200
            json.loads(data)["events"]

    status, _, data = _req(
        f"{server_url}/api/stream-finalize/{sid}?midi_program=27", "POST")
    j = json.loads(data)
    assert {e["note"] for e in j["events"]} >= {55, 62}
    # frame->time must ride the SESSION grid: at 48 kHz the hop scales, so
    # the notes land at the true wall-clock positions (0.0 s and 0.6 s)
    hop = json.loads(_req(
        f"{server_url}/api/stream-start?engine=v1&sr={mic_sr}",
        "POST")[2])["hop_length"]
    first_55 = min(e["start"] for e in j["events"] if e["note"] == 55)
    first_62 = min(e["start"] for e in j["events"] if e["note"] == 62)
    assert abs(first_62 * hop / mic_sr - 0.6) < 0.15, (first_62, hop)
    assert first_55 * hop / mic_sr < 0.2

    # the SPA's post-finalize buttons work on the same session
    status, ctype, data = _req(f"{server_url}/api/midi/{sid}")
    assert status == 200 and data[:4] == b"MThd"
    status, _, data = _req(f"{server_url}/api/tabs/{sid}")
    assert status == 200


def test_spa_toplevel_js_declarations_unique():
    """A duplicate top-level const/let/var in the SPA's single script block
    is a SyntaxError that kills ALL of its JavaScript (found live in round
    5: `const DIRTY` for the slider set vs `let DIRTY` for the editor flag
    — every button dead).  No JS engine ships in this image, so pin the
    declaration names unique by scan."""
    import os
    import re

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "aegis_tpu", "serve", "static",
        "index.html")
    src = open(path, encoding="utf-8").read()
    m = re.search(r"<script>(.*)</script>", src, re.S)
    assert m, "SPA lost its script block"
    names = []
    for decl in re.finditer(
            r"^(?:const|let|var)\s+([A-Za-z_$][\w$]*(?:\s*=[^,;]*)?"
            r"(?:\s*,\s*[A-Za-z_$][\w$]*(?:\s*=[^,;]*)?)*)",
            m.group(1), re.M):
        for part in decl.group(1).split(","):
            names.append(part.split("=")[0].strip())
    dupes = {n for n in names if names.count(n) > 1}
    assert not dupes, f"duplicate top-level JS declarations: {dupes}"
