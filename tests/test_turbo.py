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
