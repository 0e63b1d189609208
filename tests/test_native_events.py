"""C++ event-segmentation core vs the NumPy implementation: exact parity.

The native module (aegis_tpu/native/) is the framework's host-side runtime
accelerator for the reference's midi_logic layer; its contract is IDENTICAL
output to the NumPy path for every input.
"""

import numpy as np
import pytest

from aegis_tpu.core.events import (_build_events, _segment, _sustain_merge,
                                   detect_articulations_v1, velocity_from_db)
from aegis_tpu.native import get_lib, segment_events_v1_native


def _numpy_reference(f0_smooth, voiced, probs, rms_db, rake,
                     conf_thr, gate_db, min_frames, sustain_frames):
    """The pure-NumPy pipeline portion the native core replaces (verbatim
    from extract_events_v1)."""
    from aegis_tpu.ref.dsp_ref import hz_to_midi

    active = (voiced.astype(bool) & (rms_db >= gate_db)
              & (f0_smooth > 0) & ~rake.astype(bool))
    with np.errstate(divide="ignore", invalid="ignore"):
        notes = np.where(active,
                         np.round(hz_to_midi(np.maximum(f0_smooth, 1e-6))), -1)
    velocity = velocity_from_db(rms_db)
    starts, ends = _segment(active, notes)
    events = _build_events(starts, ends, notes, probs, velocity, rms_db,
                           conf_thr)
    for evt in events:
        t, s = detect_articulations_v1(f0_smooth, evt["start"], evt["end"])
        evt["technique"], evt["slope"] = t, s
    events = [e for e in events if (e["end"] - e["start"]) >= min_frames]
    return _sustain_merge(events, sustain_frames)


def _compare(f0, voiced, probs, rms_db, rake, **kw):
    kw.setdefault("conf_thr", 0.6)
    kw.setdefault("gate_db", -40.0)
    kw.setdefault("min_frames", 2)
    kw.setdefault("sustain_frames", 3)
    ref = _numpy_reference(f0, voiced, probs, rms_db, rake, **kw)
    got = segment_events_v1_native(
        f0, voiced, probs, rms_db, rake, kw["conf_thr"], kw["gate_db"],
        kw["min_frames"], kw["sustain_frames"])
    assert got is not None
    assert len(got) == len(ref), (len(got), len(ref))
    for g, r in zip(got, ref):
        for k in ("note", "start", "end", "velocity", "track", "technique"):
            assert g[k] == r[k], (k, g, r)
        assert abs(g["confidence"] - r["confidence"]) < 1e-12
        assert abs(g["rms_energy"] - r["rms_energy"]) < 1e-12
        assert abs(g["slope"] - r["slope"]) < 1e-9
    return ref


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no C++ toolchain available")


def test_native_parity_fuzz():
    rng = np.random.default_rng(0)
    for seed in range(8):
        rng = np.random.default_rng(seed)
        T = int(rng.integers(5, 400))
        # piecewise-constant pitch with vibrato/glide segments + silence
        f0 = np.zeros(T)
        t0 = 0
        while t0 < T:
            n = int(rng.integers(1, 25))
            kind = rng.integers(0, 4)
            base = float(rng.uniform(80, 900))
            seg = np.full(n, base)
            if kind == 1:
                seg *= 2 ** (0.4 / 12 * np.sin(np.arange(n)))   # vibrato
            elif kind == 2:
                seg *= 2 ** (0.06 * np.arange(n) / 12)          # glide
            elif kind == 3:
                seg[:] = 0.0                                    # silence
            f0[t0:t0 + n] = seg[: T - t0]
            t0 += n
        voiced = (f0 > 0) & (rng.random(T) > 0.1)
        probs = rng.random(T)
        rms_db = rng.uniform(-70, -10, T)
        rake = rng.random(T) < 0.05
        _compare(f0, voiced, probs, rms_db, rake,
                 min_frames=int(rng.integers(1, 4)),
                 sustain_frames=int(rng.integers(0, 6)))


def test_native_parity_real_track():
    from aegis_tpu.config import AudioConfig, PyinConfig
    from aegis_tpu.ref.dsp_ref import amplitude_to_db
    from aegis_tpu.ref.pipeline_ref import run_analyze_ref
    from aegis_tpu.tools.signal_gen import generate_test_track
    from scipy.signal import medfilt

    y, _ = generate_test_track(sr=22050)
    raw = run_analyze_ref(y, AudioConfig(), PyinConfig())
    f0s = medfilt(np.nan_to_num(raw["f0"]), kernel_size=3)
    events = _compare(f0s, raw["voiced_flag"], raw["voiced_probs"],
                      amplitude_to_db(raw["rms"]), raw["rake_mask"],
                      conf_thr=0.5, min_frames=2, sustain_frames=4)
    assert {e["note"] for e in events} >= {40, 45, 50}


def test_native_edge_cases():
    z = np.zeros(0)
    got = segment_events_v1_native(z, z.astype(bool), z, z, z.astype(bool),
                                   0.5, -40.0, 2, 3)
    assert got == []
    # single active frame with min_frames=0
    f0 = np.array([196.0])
    got = segment_events_v1_native(
        f0, np.array([True]), np.array([0.9]), np.array([-20.0]),
        np.array([False]), 0.5, -40.0, 0, 3)
    assert len(got) == 1 and got[0]["start"] == got[0]["end"] == 0


def test_native_end_to_end_in_extract():
    """extract_events_v1 must produce identical events with the native core
    enabled and disabled (AEGIS_NATIVE toggles the fallback)."""
    import importlib

    import aegis_tpu.native as native_mod
    from aegis_tpu.core.events import extract_events_v1
    from aegis_tpu.config import AudioConfig, PyinConfig
    from aegis_tpu.ref.pipeline_ref import run_analyze_ref
    from aegis_tpu.tools.signal_gen import generate_test_track

    y, _ = generate_test_track(sr=22050)
    raw = run_analyze_ref(y, AudioConfig(), PyinConfig())

    def run():
        return extract_events_v1(
            rake_mask=raw["rake_mask"], f0=np.nan_to_num(raw["f0"]),
            voiced_flag=raw["voiced_flag"], active_probs=raw["voiced_probs"],
            rms=raw["rms"], sr=22050, hop_length=512,
            confidence_threshold=0.5, onset_env=raw.get("onset_env"))

    with_native = run()
    lib, tried = native_mod._LIB, native_mod._TRIED
    try:
        native_mod._LIB, native_mod._TRIED = None, True
        without = run()
    finally:
        native_mod._LIB, native_mod._TRIED = lib, tried
    assert with_native == without
