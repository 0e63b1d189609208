"""pick_onsets_incremental == pick_onsets at every appended step.

The live transcribers re-pick onsets per poll over the whole accumulated
envelope; the incremental form freezes results behind T_prev - post and
recomputes only the tail (core/cqt.py).  Its exactness claim is
ELEMENT-IDENTICAL output, so every case here asserts array equality
against the full recomputation — across random growth patterns, late
new-global-max events (which must invalidate the normalization), silence
stretches, and impulse trains denser than the debounce."""

from __future__ import annotations

import numpy as np

from aegis_tpu.core.cqt import pick_onsets, pick_onsets_incremental

SR, HOP = 22050, 512


def _stream_check(env_full: np.ndarray, chunks: list, **kw):
    state = None
    pos = 0
    for c in chunks:
        pos += c
        env = env_full[:pos]
        got, state = pick_onsets_incremental(env, SR, HOP, state, **kw)
        want = pick_onsets(env, SR, HOP, **kw)
        np.testing.assert_array_equal(got, want)
    return state


def _chunks(rng, total):
    out = []
    while sum(out) < total:
        out.append(int(rng.integers(1, 120)))
    out[-1] -= sum(out) - total
    return [c for c in out if c > 0]


def test_incremental_matches_full_random_streams():
    rng = np.random.default_rng(20260821)
    for trial in range(8):
        T = int(rng.integers(300, 3000))
        env = np.abs(rng.normal(0.0, 1.0, T))
        # sparse strong attacks over a noise floor
        for i in rng.integers(0, T, T // 40):
            env[i] += rng.uniform(3.0, 10.0)
        env[rng.random(T) < 0.2] = 0.0
        _stream_check(env, _chunks(rng, T))


def test_incremental_survives_new_global_max():
    rng = np.random.default_rng(7)
    T = 2000
    env = np.abs(rng.normal(0.0, 1.0, T))
    env[150] += 5.0
    env[1200] += 20.0   # new global max mid-stream: full recompute path
    env[1800] += 40.0   # and again
    _stream_check(env, _chunks(rng, T))


def test_incremental_edge_shapes():
    rng = np.random.default_rng(3)
    # silence-only, tiny streams, single frames, repeated no-growth polls
    for env in (np.zeros(50), np.zeros(1), np.abs(rng.normal(0, 1, 7))):
        _stream_check(env, [len(env)])
    env = np.abs(rng.normal(0, 1, 400))
    env[44] += 6.0
    state = None
    for pos in (100, 100, 250, 250, 250, 400, 400):
        got, state = pick_onsets_incremental(env[:pos], SR, HOP, state)
        np.testing.assert_array_equal(got, pick_onsets(env[:pos], SR, HOP))


def test_incremental_dense_impulses_debounce():
    # candidates denser than `wait`: the debounce seed across the splice
    # point is the sharpest edge
    rng = np.random.default_rng(11)
    T = 1500
    env = np.abs(rng.normal(0.0, 0.05, T))
    env[::3] += np.abs(rng.normal(2.0, 1.0, len(env[::3])))
    _stream_check(env, _chunks(rng, T))


def test_incremental_param_change_invalidates():
    rng = np.random.default_rng(5)
    env = np.abs(rng.normal(0, 1, 600))
    env[100] += 8.0
    state = None
    got, state = pick_onsets_incremental(env[:400], SR, HOP, state)
    # different wait: the params fingerprint must force a full recompute
    got2, _ = pick_onsets_incremental(env, SR, HOP, state, wait_ms=200.0)
    np.testing.assert_array_equal(
        got2, pick_onsets(env, SR, HOP, wait_ms=200.0))
