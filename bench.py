"""Headline benchmark: every pipeline's on-chip speed, ONE JSON line.

The headline metric stays the financial two-phase realtime factor on a 60 s
synthetic guitar-style track (device analyze = fused mel+rake+pYIN+RMS+trend
program; host event extraction + MIDI encode).  Additional fields substantiate
the other pipelines' claims (VERDICT r1 #4/#9) without breaking the one-line
contract:

    {"metric": "realtime_factor", "value": N, "unit": "x_realtime",
     "vs_baseline": N/4.8,
     "v1_rtf": ..., "neural_rtf": ..., "poly_rtf": ..., "folder_sweep_s": ...,
     "folder_rtf_aggregate": ..., "auto_match_s": ..., "reverse_s": ...,
     "per_note_s": ..., "technique_s": ...}

Baselines (BASELINE.md): financial engine 4.8x realtime on an M1; auto-match
~30 s for a 30 s clip (54 grid evals); reverse analysis ~13 s for a 10 s clip.
Driver target: >= 50x per chip.

Timing convention: the tunneled backend's block_until_ready doesn't reliably
sync, so every timed section ends in the np.asarray() fetch that the host
pipeline needs anyway (CLAUDE.md).  Medians, not means: transfer jitter is
±30%.
"""

from __future__ import annotations

import io
import json
import logging
import subprocess
import sys
import time

import numpy as np

# The aegis logger mirrors the reference's stdout tags; under the bench's
# ONE-JSON-line stdout contract every log line must go to stderr instead.
from aegis_tpu.utils.logging import get_logger

get_logger("bench")  # force handler setup, then retarget it
for _h in logging.getLogger("aegis").handlers:
    if isinstance(_h, logging.StreamHandler):
        _h.setStream(sys.stderr)


def _median_time(fn, n: int) -> float:
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    print(f"#   iters: {[round(t, 3) for t in times]}", file=sys.stderr)
    return sorted(times)[n // 2]


def _probe_device(timeout_s: float = 300.0,
                  waits_s: tuple = (0, 90, 210, 390, 540)) -> bool:
    """True if the tunneled TPU backend is reachable.

    When the axon device service is down, jax backend init HANGS instead of
    erroring, so the probe runs in a disposable child process under a hard
    timeout — the bench process itself never touches the backend until the
    probe passes.  (Killing a child stuck in backend *init* is safe; the
    CLAUDE.md orphaned-compile hazard applies to in-flight XLA compiles,
    which a down service never starts.)

    The tunnel FLAPS (observed 2026-08-19: init hung >300 s, succeeded in
    20 s eight minutes later, hung again two minutes after that; the
    round-4 driver capture lost its on-chip artifact to a flap that
    outlasted the old 3x150 s retry budget).  CLAUDE.md's measured
    recovery is ~8-10 min, so the escalating waits here total ~20.5 min
    (plus probe timeouts) before the caller may demote the round artifact
    to the CPU fallback.
    """
    code = ("import jax, jax.numpy as jnp, numpy as np; "
            "np.asarray(jnp.add(jnp.float32(1), jnp.float32(1)))")
    for attempt, wait in enumerate(waits_s):
        if attempt:
            print(f"# TPU probe attempt {attempt} failed; retrying in "
                  f"{wait:.0f}s (tunnel flap? measured recovery ~8-10 min)",
                  file=sys.stderr)
            time.sleep(wait)
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s,
                               stdout=subprocess.DEVNULL,
                               stderr=subprocess.DEVNULL)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def _cpu_fallback_bench() -> None:
    """Device unreachable: emit a valid one-line artifact from the XLA CPU
    backend instead of hanging the driver.  Only the headline pipeline is
    measured (the CPU box has one core; the full suite would take hours);
    the ``device`` field records the degradation so the number is never
    mistaken for a chip result."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    duration, sr = 60.0, 22050
    from aegis_tpu.engine.financial import AegisFinancialEngine
    from aegis_tpu.tools.signal_gen import generate_bench_track

    y = generate_bench_track(duration, sr)
    engine = AegisFinancialEngine(sample_rate=sr, backend="device")

    def fin_iter():
        a = engine.analyze(y, fetch_mel=False)
        engine.extract_events(a)

    fin_iter()  # compile
    print("# financial 60s two-phase (CPU fallback):", file=sys.stderr)
    rtf = duration / _median_time(fin_iter, 3)
    print(json.dumps(_fallback_record(rtf)))


def _fallback_record(rtf: float) -> dict:
    """VERDICT r4 #6: the degraded artifact must carry an explicit note so
    no downstream consumer mistakes the row for a chip regression."""
    return {
        "metric": "realtime_factor", "value": round(rtf, 1),
        "unit": "x_realtime", "vs_baseline": round(rtf / 4.8, 2),
        "device": "cpu_fallback",
        "note": "tunnel down; XLA-CPU measurement, not a TPU result",
    }


def _run_measured(timeout_s: float) -> bool:
    """Run the measured bench in a child process under a hard timeout.

    A tunnel flap MID-RUN used to hang the bench process itself (a blocked
    np.asarray fetch has no Python-level timeout), so the round-4 driver
    capture had only probe-level resilience.  Running the measured body in
    a child bounds a mid-run hang: the parent kills the child, waits out
    the flap, re-probes, and retries a warm run (the persistent XLA compile
    cache makes the retry cheap).  The child's stderr streams through; the
    parent re-prints only the child's final JSON line, preserving the
    one-line stdout contract.

    Killing the child is safe for warm dispatches; the orphaned-compile
    hazard (CLAUDE.md) applies to in-flight XLA compiles, which is why the
    first attempt's timeout must comfortably cover cold compiles.
    """
    try:
        r = subprocess.run([sys.executable, "-u", __file__, "--measure"],
                           timeout=timeout_s, stdout=subprocess.PIPE)
        out = (r.stdout or b"").decode(errors="replace")
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"").decode(errors="replace") if e.stdout else ""
        print(f"# measured run hung past {timeout_s:.0f}s (tunnel flap "
              "mid-run?) -- child killed", file=sys.stderr)
    line = _final_json_line(out)
    if line:
        print(line)
        return True
    return False


def _final_json_line(out: str) -> str | None:
    """The child's one-line artifact, or None if it died before printing
    a complete valid record."""
    for ln in reversed(out.splitlines()):
        if ln.startswith("{"):
            try:
                json.loads(ln)
            except ValueError:
                continue
            return ln
    return None


def _warm_compiles(timeout_s: float = 3600.0) -> None:
    """Precompile every big fused program BEFORE the timed child runs.

    The measured child runs under a hard timeout, and timeout-killing a
    process mid-REMOTE-COMPILE orphans the compile and stalls the device
    service ~30 min (CLAUDE.md) — so the compiles must be bounded the
    sanctioned way: pay them here via the warmup command (persistent XLA
    cache), under a budget generous enough that only a pathological
    service ever hits it.  With a warm cache this child returns in
    seconds; the measured child then only dispatches warm programs, which
    are safe to kill."""
    cmd = [sys.executable, "-u", "-m", "aegis_tpu", "warmup",
           "--seconds", "10,30,60,600",
           "--pipelines", "v1,neural,financial,neural-financial,poly,"
                          "stream,neural-stream,"
                          "live-v1,live-financial,live-poly"]
    try:
        subprocess.run(cmd, timeout=timeout_s,
                       stdout=sys.stderr, stderr=sys.stderr)
    except subprocess.TimeoutExpired:
        print(f"# warmup exceeded {timeout_s:.0f}s -- service pathological; "
              "waiting out the possible orphaned compile", file=sys.stderr)
        time.sleep(600.0)


def main() -> None:
    if "--measure" in sys.argv[1:]:
        measure()
        return
    if not _probe_device():
        print("# TPU backend unreachable -- falling back to XLA CPU",
              file=sys.stderr)
        _cpu_fallback_bench()
        return
    _warm_compiles()
    # First attempt: generous timeout (cold compiles are already paid by
    # _warm_compiles, so a hang here is a tunnel flap, not a compile —
    # killing the child is safe).  On a mid-run hang, wait out the
    # measured ~8-10 min flap recovery, re-probe, and retry warm before
    # demoting the round artifact to the CPU fallback.
    for attempt, timeout_s in enumerate((2700.0, 2100.0)):
        if attempt:
            print("# waiting 540s for tunnel recovery before the retry",
                  file=sys.stderr)
            time.sleep(540.0)
            if not _probe_device(waits_s=(0, 120, 300)):
                break
        if _run_measured(timeout_s):
            return
    print("# measured TPU bench failed twice -- falling back to XLA CPU",
          file=sys.stderr)
    _cpu_fallback_bench()


def measure() -> None:
    duration = 60.0
    sr = 22050
    from aegis_tpu.tools.signal_gen import (generate_bench_track,
                                            generate_scale_benchmark,
                                            generate_test_track)

    y = generate_bench_track(duration, sr)

    from aegis_tpu.engine.engine import AegisEngine
    from aegis_tpu.engine.financial import AegisFinancialEngine

    engine = AegisFinancialEngine(sample_rate=sr, backend="device")

    # ---------------- headline: financial two-phase (compile + warm) -------
    t0 = time.time()
    analysis = engine.analyze(y, fetch_mel=False)
    events, _ = engine.extract_events(analysis)
    warm = time.time() - t0
    print(f"# warmup (incl. compile): {warm:.1f}s, events={len(events)}",
          file=sys.stderr)

    def fin_iter():
        a = engine.analyze(y, fetch_mel=False)
        engine.extract_events(a)

    # a couple of throwaway iterations AFTER compile: the first measured
    # block repeatedly catches the tunnel's cold phase (observed: the
    # first block at 120-220x while a later identical-cost block in the
    # same run holds 380x)
    fin_iter()
    fin_iter()
    print("# financial 60s two-phase:", file=sys.stderr)
    # median of 15: the tunnel's jitter band is wide (same warm program
    # measured 604x and 777x medians-of-7 on the same day); at ~0.1 s per
    # iter the wider sample is free and the recorded headline stabler
    elapsed = _median_time(fin_iter, 15)
    rtf = duration / elapsed
    print(f"# steady-state (median): {elapsed:.3f}s per {duration:.0f}s audio",
          file=sys.stderr)

    # ---------------- v1 two-phase on the same track ------------------------
    v1 = AegisEngine(sample_rate=sr, backend="device")

    def v1_iter():
        raw = v1.audio_to_midi(y, None, fetch_mel=False)
        v1.extract_events(raw, None)

    v1_iter()  # compile; MEASURED below interleaved with the 60 s poly
    # loop — the tunnel's phase drift between separated blocks used to
    # dominate the poly/v1 ratio (same warm programs measured 0.55-0.95
    # across phases), so the ratio's two legs share iterations now

    # ---------------- neural (PitchNet) backend on the same track -----------
    from aegis_tpu.models.pitchnet import have_default_weights

    neural_rtf = 0.0
    if have_default_weights():
        def neural_iter():
            raw = v1.audio_to_midi(y, None, fetch_mel=False,
                                   pitch_backend="neural")
            v1.extract_events(raw, None)

        neural_iter()  # compile
        print("# neural (PitchNet) 60s two-phase:", file=sys.stderr)
        neural_rtf = duration / _median_time(neural_iter, 3)

    # ---------------- polyphonic CQT engine (10 s chord track) --------------
    from aegis_tpu.engine.poly import AegisPolyEngine

    rng = np.random.default_rng(7)
    from aegis_tpu.tools.signal_gen import karplus_strong

    tpoly = 10.0
    yp = np.zeros(int(sr * tpoly), np.float32)
    for k, chord in enumerate([(60, 64, 67), (57, 60, 64), (55, 59, 62)] * 4):
        at = int(k * 0.8 * sr)
        for m in chord:
            f = 440.0 * 2 ** ((m - 69) / 12)
            seg = karplus_strong(f, 0.7, sr, rng=rng)
            end = min(at + len(seg), len(yp))
            yp[at:end] += seg[: end - at]
    yp = (yp / max(np.max(np.abs(yp)), 1e-9) * 0.8).astype(np.float32)

    poly = AegisPolyEngine(sample_rate=sr)

    def poly_iter():
        poly.extract_events(poly.analyze(yp))

    poly_iter()  # compile
    print("# poly 10s:", file=sys.stderr)
    poly_rtf = tpoly / _median_time(poly_iter, 3)

    # 60 s chord loop: the 10 s clip is fixed-cost-bound (two tunnel round
    # trips + host refinement dominate a 10 s denominator); this row is the
    # engine's AMORTIZED throughput on track-length material, comparable
    # with the v1/financial/neural 60 s rows.
    yp60_off = np.tile(yp, 6)[: int(60 * sr)]

    def poly60_iter():
        poly.extract_events(poly.analyze(yp60_off))

    poly60_iter()  # compile
    print("# v1 60s + poly 60s (interleaved, same tunnel phase):",
          file=sys.stderr)
    tv, tp = [], []
    for _ in range(7):
        t0 = time.time()
        v1_iter()
        tv.append(time.time() - t0)
        t0 = time.time()
        poly60_iter()
        tp.append(time.time() - t0)
    print(f"#   v1 iters: {[round(t, 3) for t in tv]}", file=sys.stderr)
    print(f"#   poly iters: {[round(t, 3) for t in tp]}", file=sys.stderr)
    v1_rtf = duration / sorted(tv)[3]
    poly_rtf_60s = 60.0 / sorted(tp)[3]

    # ---------------- folder sweep: 4 x 60 s dispatch-all-then-fetch --------
    from aegis_tpu.core.analyze import dispatch_analyze, fetch_analyze
    from aegis_tpu.core.events import extract_events_financial

    tracks = [y, y[::-1].copy(), np.roll(y, sr), np.roll(y, -sr)]

    def folder_iter():
        handles = [dispatch_analyze(tr, engine.audio, engine.pyin_cfg,
                                    financial=True, fetch_mel=False)
                   for tr in tracks]
        for h in handles:
            raw = fetch_analyze(h)
            extract_events_financial(
                rake_mask=raw["rake_mask"], f0=raw["f0"],
                voiced_flag=raw["voiced_flag"],
                active_probs=raw["voiced_probs"], rms=raw["rms"],
                sr=sr, hop_length=512, trend=raw["trend"],
                artic_codes=raw["artic_codes"], slide_codes=raw["slide_codes"],
                financial_confidence=raw["financial_confidence"])

    folder_iter()  # compile (reversed/rolled tracks share the bucket)
    print("# folder sweep 4x60s:", file=sys.stderr)
    folder_s = _median_time(folder_iter, 3)
    folder_rtf = 4 * duration / folder_s

    # ---------------- neural folder sweep: same 4 tracks, PitchNet ---------
    from aegis_tpu.core.events import extract_events_v1

    neural_folder_rtf = 0.0
    if have_default_weights():
        from aegis_tpu.models.pitchnet import default_params_device, \
            dispatch_analyze_neural, fetch_analyze_neural

        nparams = default_params_device()

        def neural_folder_iter():
            handles = [dispatch_analyze_neural(
                tr, sr, 512, nparams, fetch_mel=False) for tr in tracks]
            for h in handles:
                raw = fetch_analyze_neural(h)
                extract_events_v1(
                    rake_mask=raw["rake_mask"], f0=np.nan_to_num(raw["f0"]),
                    voiced_flag=raw["voiced_flag"],
                    active_probs=raw["voiced_probs"], rms=raw["rms"],
                    sr=sr, hop_length=512, onset_env=raw["onset_env"],
                    onset_fwd_snap_ms=100.0)

        neural_folder_iter()  # compile
        print("# neural folder sweep 4x60s:", file=sys.stderr)
        neural_folder_rtf = 4 * duration / _median_time(neural_folder_iter, 3)

    # ---------------- warm auto-match (54-combo batched sweep) -------------
    from aegis_tpu.verify.auto_match import auto_match_parameters

    y30 = y[: int(30 * sr)]
    raw30 = v1.audio_to_midi(y30, None, fetch_mel=False)
    auto_match_parameters(y30, v1, raw30, sample_rate=sr, batched=True)
    print("# auto-match 30s, 54 combos:", file=sys.stderr)
    auto_match_s = _median_time(
        lambda: auto_match_parameters(y30, v1, raw30, sample_rate=sr,
                                      batched=True), 3)

    # ---------------- reverse analysis (10 s scale clip, ADSR synth) -------
    from aegis_tpu.verify.reverse import reverse_analysis

    _, midi_bytes, _ = generate_scale_benchmark(sr=sr)
    reverse_analysis(midi_bytes, v1, sample_rate=sr)  # compile
    print("# reverse analysis:", file=sys.stderr)
    reverse_s = _median_time(
        lambda: reverse_analysis(midi_bytes, v1, sample_rate=sr), 3)

    # ---------------- per-note ADSR optimizer (precise 27-combo grid) ------
    from aegis_tpu.verify.per_note import optimize_all_notes

    ytest, _ = generate_test_track(sr=sr)
    raw_t = v1.audio_to_midi(ytest, None, fetch_mel=False)
    ev_t = v1.extract_events(raw_t, None, confidence_threshold=0.3)
    optimize_all_notes(ytest, ev_t, sr, 512, mode="precise")  # compile
    print(f"# per-note optimizer ({len(ev_t)} notes x 27 combos):",
          file=sys.stderr)
    per_note_s = _median_time(
        lambda: optimize_all_notes(ytest, ev_t, sr, 512, mode="precise"), 3)

    # ---------------- effect learning loop (1 iteration, clean preset) ------
    from aegis_tpu.verify.effect_loop import learning_loop

    learning_loop(midi_bytes, v1, preset="clean", max_iterations=1,
                  sample_rate=sr)  # compile
    print("# effect loop (1 iteration):", file=sys.stderr)
    effect_loop_s = _median_time(
        lambda: learning_loop(midi_bytes, v1, preset="clean",
                              max_iterations=1, sample_rate=sr), 3)

    # ---------------- streamed 10-minute track (bounded memory) -------------
    from aegis_tpu.engine.turbo import run_analyze_streamed

    ylong = generate_bench_track(600.0, sr)

    def stream_iter():
        raw = run_analyze_streamed(ylong, engine.audio, engine.pyin_cfg,
                                   financial=True)
        extract_events_financial(
            rake_mask=raw["rake_mask"], f0=raw["f0"],
            voiced_flag=raw["voiced_flag"], active_probs=raw["voiced_probs"],
            rms=raw["rms"], sr=sr, hop_length=512, trend=raw["trend"],
            artic_codes=raw["artic_codes"], slide_codes=raw["slide_codes"],
            financial_confidence=raw["financial_confidence"])

    stream_iter()  # compile
    print("# streamed 600s financial:", file=sys.stderr)
    stream_rtf = 600.0 / _median_time(stream_iter, 3)

    # ---------------- streamed 10-minute track, neural backend --------------
    neural_stream_rtf = 0.0
    if have_default_weights():
        from aegis_tpu.engine.engine import AegisEngine as _V1
        from aegis_tpu.models.pitchnet import load_params, \
            run_analyze_neural_streamed

        _params = load_params()

        def neural_stream_iter():
            raw = run_analyze_neural_streamed(ylong, sr, 512, _params,
                                              fetch_mel=False)
            raw["f0"] = np.nan_to_num(raw["f0"])
            _v1ex.extract_events(raw, None)

        _v1ex = _V1(sample_rate=sr, backend="device")
        neural_stream_iter()  # compile
        print("# streamed 600s neural:", file=sys.stderr)
        neural_stream_rtf = 600.0 / _median_time(neural_stream_iter, 3)

    # ---------------- device-bound RTF probe (resident buffers) -------------
    # Everything above is TRANSPORT-bound (CLAUDE.md: ~60 ms upload + 2x
    # ~27 ms tunnel latency vs ~50 ms device compute on 60 s) — this probe
    # makes the kernel headroom a tracked number (VERDICT r2 #9): upload
    # once, enqueue N dispatches against the resident buffer, fetch only
    # the last output.  Dispatches pipeline through the async runtime, so
    # (t_N - t_1)/(N-1) isolates per-iteration device compute.
    import jax.numpy as jnp

    from aegis_tpu.core.analyze import (analyze_financial_program_packed,
                                        analyze_program_packed,
                                        pad_to_bucket, quantize_pcm8)

    y_pad = pad_to_bucket(y)
    y8, s8 = quantize_pcm8(y_pad)
    y_dev, s_dev = jnp.asarray(y8), jnp.asarray(s8)
    rs_dev = jnp.float32(0.6)

    def _device_rtf(call, audio_s: float) -> float:
        np.asarray(call())  # compile + warm

        def probe(k):
            outs = [call() for _ in range(k)]
            np.asarray(outs[-1])

        # adaptive iteration count: a fast kernel's 8 extra dispatches sit
        # below tunnel jitter and the old fixed n=9 clamp reported a bogus
        # 1e7x (round-4 artifact check); grow n until the delta is
        # measurable, and floor per-iter at the jitter bound so the row
        # reports a CAP, not noise
        for n in (9, 33, 129):
            t1 = _median_time(lambda: probe(1), 3)
            tn = _median_time(lambda: probe(n), 3)
            delta = tn - t1
            if delta >= 0.01:
                break
        per_iter = max(delta / (n - 1), 0.01 / (n - 1))
        return audio_s / per_iter

    print("# device-bound probe: financial", file=sys.stderr)
    device_rtf_fin = _device_rtf(
        lambda: analyze_financial_program_packed(
            y_dev, s_dev, rs_dev, engine.audio, engine.pyin_cfg, True,
            False), duration)
    print("# device-bound probe: v1", file=sys.stderr)
    device_rtf_v1 = _device_rtf(
        lambda: analyze_program_packed(y_dev, s_dev, rs_dev, engine.audio,
                                       engine.pyin_cfg, False), duration)
    from aegis_tpu.core.analyze import quantize_pcm16 as _q16

    yp_pad = pad_to_bucket(yp)
    yp16, sp = _q16(yp_pad)
    yp_dev, sp_dev = jnp.asarray(yp16), jnp.float32(sp)
    print("# device-bound probe: poly", file=sys.stderr)
    from aegis_tpu.core.poly import analyze_poly_program_packed

    device_rtf_poly = _device_rtf(
        lambda: analyze_poly_program_packed(yp_dev, sp_dev, sr, poly.n_fft,
                                            poly.hop_length, poly.n_bins,
                                            poly.bins_per_octave,
                                            poly.max_voices), tpoly)

    # ---------------- live streaming: feed->first-event latency + poll ------
    # The live path's whole point is latency, yet no artifact captured it
    # (VERDICT r2 weak #4).  Latency = audio time fed when poll_events()
    # first returns a note, minus that note's onset — the intrinsic tile+
    # halo lookahead plus detection physics.  Poll cost = median wall per
    # poll_events() at steady state on a 60 s session.
    from aegis_tpu.engine.realtime import (StreamingPolyTranscriber,
                                           StreamingTranscriber)

    def _live_bench(make, y_src, hop, poll_every_s: float = 0.5,
                    chunk_s: float = 0.1):
        rt = make()
        chunk = int(chunk_s * sr)
        poll_every = max(1, int(poll_every_s / chunk_s))
        latency = None
        polls = []
        for k, i in enumerate(range(0, len(y_src), chunk)):
            rt.feed(y_src[i:i + chunk])
            if k % poll_every:
                continue
            t0 = time.time()
            ev = rt.poll_events()
            polls.append(time.time() - t0)
            if ev and latency is None:
                onset = min(e["start"] for e in ev) * hop / sr
                latency = (i + chunk) / sr - onset
        steady = sorted(polls[len(polls) // 2:])
        return latency, 1e3 * steady[len(steady) // 2]

    y60 = y[: int(60 * sr)]
    print("# live v1 60s:", file=sys.stderr)
    lat_v1, poll_v1 = _live_bench(lambda: StreamingTranscriber(), y60, 512)
    print("# live financial 60s:", file=sys.stderr)
    lat_fin, poll_fin = _live_bench(
        lambda: StreamingTranscriber(financial=True), y60, 512)
    print("# live poly 60s (chord loop):", file=sys.stderr)
    yp60 = np.tile(yp, 6)[: int(60 * sr)]
    lat_poly, poll_poly = _live_bench(
        lambda: StreamingPolyTranscriber(sample_rate=sr), yp60, 512)
    # 10-minute sessions: does the poll cost stay bounded as history
    # grows?  (VERDICT r2 #5 asks all three engines at both lengths.)
    print("# live v1 10min (poll scaling):", file=sys.stderr)
    _, poll_v1_10m = _live_bench(lambda: StreamingTranscriber(), ylong,
                                 512, poll_every_s=5.0)
    print("# live financial 10min (poll scaling):", file=sys.stderr)
    _, poll_fin_10m = _live_bench(
        lambda: StreamingTranscriber(financial=True), ylong,
        512, poll_every_s=5.0)
    print("# live poly 10min (poll scaling):", file=sys.stderr)
    yp10 = np.tile(yp, 60)[: len(ylong)]
    _, poll_poly_10m = _live_bench(
        lambda: StreamingPolyTranscriber(sample_rate=sr), yp10,
        512, poll_every_s=5.0)

    # ---------------- technique verifier ------------------------------------
    # the KS test track has no bends — craft a vibrato+bend clip so the
    # verifier actually exercises its with/without synthesis comparison
    from aegis_tpu.verify.technique import verify_technique_by_audio_matching

    tv = np.arange(int(sr * 1.6)) / sr
    vib = 220.0 * 2 ** (0.3 / 12 * np.sin(2 * np.pi * 5.0 * tv))
    ph = 2 * np.pi * np.cumsum(vib) / sr
    ytech = (0.4 * np.sin(ph) * np.exp(-0.8 * tv)).astype(np.float32)
    fpb = 512 / sr
    ev_tech = [
        {"note": 57, "start": 2, "end": int(0.7 / fpb), "confidence": 0.9,
         "velocity": 100, "track": "main", "technique": "vibrato",
         "slope": 0.0, "rms_energy": 0.2},
        {"note": 57, "start": int(0.8 / fpb), "end": int(1.5 / fpb),
         "confidence": 0.9, "velocity": 100, "track": "main",
         "technique": "bend", "slope": 1.0, "rms_energy": 0.2},
    ]
    verify_technique_by_audio_matching(ytech, ev_tech, sr, 512)  # compile
    print("# technique verifier (2 technique events):", file=sys.stderr)
    technique_s = _median_time(
        lambda: verify_technique_by_audio_matching(ytech, ev_tech, sr, 512), 3)

    print(json.dumps({
        "metric": "realtime_factor",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 4.8, 2),
        "v1_rtf": round(v1_rtf, 1),
        "neural_rtf": round(neural_rtf, 1),
        "poly_rtf": round(poly_rtf, 1),
        "poly_rtf_60s": round(poly_rtf_60s, 1),
        "folder_sweep_s": round(folder_s, 3),
        "folder_rtf_aggregate": round(folder_rtf, 1),
        "neural_folder_rtf": round(neural_folder_rtf, 1),
        "auto_match_s": round(auto_match_s, 3),
        "reverse_s": round(reverse_s, 3),
        "per_note_s": round(per_note_s, 3),
        "technique_s": round(technique_s, 3),
        "effect_loop_s": round(effect_loop_s, 3),
        "stream_10min_rtf": round(stream_rtf, 1),
        "neural_stream_10min_rtf": round(neural_stream_rtf, 1),
        "device_rtf_fin": round(device_rtf_fin, 1),
        "device_rtf_v1": round(device_rtf_v1, 1),
        "device_rtf_poly": round(device_rtf_poly, 1),
        "live_latency_s_v1": round(lat_v1, 3) if lat_v1 else None,
        "live_latency_s_fin": round(lat_fin, 3) if lat_fin else None,
        "live_latency_s_poly": round(lat_poly, 3) if lat_poly else None,
        "live_poll_ms_v1": round(poll_v1, 1),
        "live_poll_ms_fin": round(poll_fin, 1),
        "live_poll_ms_poly": round(poll_poly, 1),
        "live_poll_ms_v1_10min": round(poll_v1_10m, 1),
        "live_poll_ms_fin_10min": round(poll_fin_10m, 1),
        "live_poll_ms_poly_10min": round(poll_poly_10m, 1),
        "device": "tpu",
    }))


if __name__ == "__main__":
    main()
