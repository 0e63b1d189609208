"""Property fuzz for the finalized-event horizon (engine/realtime.py).

The horizon's contract is poll_events == the cache-free full
re-extraction on EVERY poll of a growing session, for ANY input — not
just musical audio.  The clip-driven tests (test_realtime.py) cover the
real pipelines end-to-end; this file drives the poll machinery directly
on RANDOMIZED synthetic row streams (no device), hunting boundary cases
the clips can't reach: onset churn near the stream head/tail, fingerprint
invalidation mid-session, cuts landing against dense/sparse event mixes,
empty stretches, and garbage the recovery chain prunes aggressively.
"""

import numpy as np

from aegis_tpu.core.analyze import _GTR_ROWS, _V1_ROWS
from aegis_tpu.engine.realtime import (StreamingPolyTranscriber,
                                       StreamingTranscriber)

SR, HOP = 22050, 512
TILE = 24  # the live default


def _key(e):
    return tuple(sorted((k, str(v)) for k, v in e.items()))


def _assert_poll_equals_full(rt, tag):
    got = rt.poll_events()
    full = rt._poll_full()
    assert [_key(e) for e in got] == [_key(e) for e in full], (
        tag, len(got), len(full),
        [(a, b) for a, b in zip(got, full) if a != b][:2])


def _mono_rows(rng, n_frames, louder_at=None):
    """Plausible-but-random v1/financial rows: piecewise note holds with
    decaying rms, onset spikes at note starts, scattered rake frames."""
    f0 = np.zeros(n_frames, np.float32)
    voiced = np.zeros(n_frames, np.float32)
    rms = np.full(n_frames, 1e-4, np.float32)
    onset = np.zeros(n_frames, np.float32)
    rake = (rng.random(n_frames) < 0.01).astype(np.float32)
    t = 0
    while t < n_frames:
        if rng.random() < 0.2:          # silence stretch
            t += int(rng.integers(2, 30))
            continue
        dur = int(rng.integers(3, 40))
        note = float(rng.integers(40, 80))
        hz = 440.0 * 2 ** ((note - 69) / 12)
        amp = float(rng.uniform(0.05, 1.0))
        if louder_at is not None and t >= louder_at:
            amp *= 4.0
            louder_at = None            # one spike is enough
        e = min(t + dur, n_frames)
        f0[t:e] = hz * (1 + rng.normal(0, 0.002, e - t)).astype(np.float32)
        voiced[t:e] = 1.0
        rms[t:e] = amp * np.exp(-0.05 * np.arange(e - t))
        onset[t] = amp * float(rng.uniform(0.5, 2.0))
        t = e + int(rng.integers(0, 6))
    return f0, voiced, rms, onset, rake


def _feed_tiles(rt, cols, n_cols):
    """Append the synthetic rows as analyzed tiles (bypasses the device —
    the horizon operates purely on accumulated rows)."""
    T = len(cols[0])
    buf = np.stack([np.asarray(c, np.float32) for c in cols], axis=1)
    rt._rows = [buf[i:i + TILE] for i in range(0, T - T % TILE, TILE)]
    rt._n_fed = (T - T % TILE) * HOP


def test_horizon_fuzz_v1():
    for seed in range(4):
        rng = np.random.default_rng(seed)
        rt = StreamingTranscriber(tile_frames=TILE, halo_frames=8,
                                  confidence_threshold=0.5)
        T = 2400
        f0, voiced, rms, onset, rake = _mono_rows(
            rng, T, louder_at=1200 if seed % 2 else None)
        probs = np.where(voiced > 0, rng.uniform(0.6, 1.0, T), 0.0)
        for upto in (600, 1100, 1600, 2000, 2400):
            _feed_tiles(rt, [f0[:upto], voiced[:upto], probs[:upto],
                             rms[:upto], rake[:upto], onset[:upto]],
                        len(_V1_ROWS))
            _assert_poll_equals_full(rt, ("v1", seed, upto))


def test_horizon_fuzz_financial():
    for seed in range(3):
        rng = np.random.default_rng(100 + seed)
        rt = StreamingTranscriber(tile_frames=TILE, halo_frames=8,
                                  financial=True)
        T = 2400
        f0, voiced, rms, onset, rake = _mono_rows(rng, T)
        probs = np.where(voiced > 0, rng.uniform(0.6, 1.0, T), 0.0)
        mute = (rng.random(T) < 0.02).astype(np.float32)
        dhi = rng.uniform(0, 1e-3, T).astype(np.float32)
        dtot = dhi + rng.uniform(0, 1e-3, T).astype(np.float32)
        for upto in (800, 1400, 2000, 2400):
            _feed_tiles(rt, [f0[:upto], voiced[:upto], probs[:upto],
                             rms[:upto], rake[:upto], onset[:upto],
                             mute[:upto], dhi[:upto], dtot[:upto]],
                        len(_GTR_ROWS))
            # growing feeds invalidate the trend cache tail exactly as a
            # live session would
            _assert_poll_equals_full(rt, ("fin", seed, upto))


def test_horizon_fuzz_poly():
    import jax.numpy as jnp

    from aegis_tpu.core.poly import pack_cqt_f16

    for seed in range(3):
        rng = np.random.default_rng(200 + seed)
        rt = StreamingPolyTranscriber(sample_rate=SR, tile_frames=TILE,
                                      halo_frames=8)
        V, NB = rt.max_voices, rt.n_bins
        T = 1600
        # sparse plausible voices: one strong pick + weak junk picks, so
        # acceptance keeps the event count bounded; the raw CQT plane is
        # random decaying magnitudes the recovery chain will judge hard
        bins = rng.integers(0, NB, size=(T, V)).astype(np.float32)
        sals = rng.uniform(0.0, 0.05, size=(T, V)).astype(np.float32)
        strong = rng.integers(0, V, size=T)
        note_walk = np.clip(np.cumsum(rng.integers(-2, 3, T)) + 40, 16, 70)
        bins[np.arange(T), strong] = note_walk
        sals[np.arange(T), strong] = rng.uniform(0.5, 3.0, T)
        rms = np.abs(np.sin(np.arange(T) / 9)) * 0.5 + 0.01
        onset = (rng.random(T) < 0.06) * rng.uniform(0.5, 2.0, T)
        mag = rng.uniform(0, 1, size=(T, NB)).astype(np.float32) \
            * np.exp(-((np.arange(NB) - 40) / 25.0) ** 2)[None, :]
        plane = np.asarray(pack_cqt_f16(jnp.asarray(mag)))
        buf = np.concatenate(
            [bins, sals, rms[:, None].astype(np.float32),
             onset[:, None].astype(np.float32), plane], axis=1)
        for upto in (700, 1100, 1600):
            k = upto - upto % TILE
            rt._rows = [buf[i:i + TILE] for i in range(0, k, TILE)]
            rt._n_fed = k * rt.hop
            _assert_poll_equals_full(rt, ("poly", seed, upto))
