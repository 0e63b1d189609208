"""The recovery chain's vectorized concurrency scans == the naive predicates.

Round 3 replaced every recovery pass's O(E^2) Python generator scan with
one shared vectorized pair sweep (core/poly.py::_overlap_rows) after the
bench's 10-minute poll-scaling artifact measured 2.7 s/poll live poly
sessions (VALIDATION.md "Long-session live poll cost").  These tests pin
the equivalence with the naive definitions so the candidate sets can
never drift from the scans they replaced:

  * _overlap_rows rows == [j for j, o in enumerate(events) if o is not e
    and o["start"] <= e["end"] and e["start"] <= o["end"]]
  * harmonic_dedup (fully broadcast) == a literal reimplementation of the
    original generator predicate.

The passes themselves are gated by tests/test_poly_truth.py; this file
guards the shared indexing layer on randomized event sets, including the
chunk boundary (chunk=4 forces multi-chunk assembly).
"""

import numpy as np

from aegis_tpu.core.poly import HARMONIC_INTERVALS, _overlap_rows, harmonic_dedup


def _rand_events(rng, n, T=400):
    evs = []
    for _ in range(n):
        s = int(rng.integers(0, max(T - 8, 1)))
        e = int(min(T - 1, s + rng.integers(0, 90)))
        d = {
            "note": int(rng.integers(36, 90)),
            "start": s,
            "end": e,
            "salience": float(rng.uniform(0.0, 1.0)),
        }
        if rng.random() < 0.1:
            d["rescued_root"] = True
        evs.append(d)
    return evs


def test_overlap_rows_matches_naive_scan():
    rng = np.random.default_rng(42)
    for _ in range(60):
        evs = _rand_events(rng, int(rng.integers(0, 25)))
        rows = _overlap_rows(evs)
        assert len(rows) == len(evs)
        for i, e in enumerate(evs):
            naive = [
                j
                for j, o in enumerate(evs)
                if j != i and o["start"] <= e["end"] and e["start"] <= o["end"]
            ]
            assert list(rows[i]) == naive


def test_overlap_rows_chunk_boundary():
    rng = np.random.default_rng(7)
    evs = _rand_events(rng, 11)
    # chunk smaller than the list forces the multi-chunk assembly path
    rows_chunked = _overlap_rows(evs, chunk=4)
    rows_full = _overlap_rows(evs)
    assert all(
        list(a) == list(b) for a, b in zip(rows_chunked, rows_full)
    )


def test_overlap_rows_empty():
    assert _overlap_rows([]) == []


def _harmonic_dedup_naive(events, sal_ratio=0.55, start_tol=4):
    # the pre-round-3 generator scan, verbatim semantics
    out = []
    for e in events:
        if e.get("rescued_root"):
            out.append(e)
            continue
        dominated = any(
            (o is not e)
            and (e["note"] - o["note"]) in HARMONIC_INTERVALS
            and o["start"] - start_tol <= e["start"] <= o["end"]
            and e.get("salience", 0.0) < sal_ratio * o.get("salience", 0.0)
            for o in events
        )
        if not dominated:
            out.append(e)
    return out


def _route_short_ghost_naive(poly_events):
    # the generator-scan form of route_events' short_ghost, kept in
    # lockstep with its semantics (round 5 added the sub-octave redirect
    # clause: a short event whose +12 bin holds a stronger concurrent
    # voice); the equivalence pinned here is the _overlap_rows
    # candidate-set rewrite, not the predicate itself
    from aegis_tpu.config import midi_to_hz

    def ghost(e):
        if e["end"] - e["start"] + 1 >= 12:
            return False
        f_e = midi_to_hz(e["note"])
        return any(
            o is not e
            and o["start"] <= e["end"] and e["start"] <= o["end"]
            and e.get("salience", 0.0) < o.get("salience", 0.0)
            and (o["note"] == e["note"] + 12
                 or (o["note"] < e["note"]
                     and any(abs(12.0 * np.log2(
                         f_e / (h * midi_to_hz(o["note"])))) <= 1.2
                         for h in range(2, 11))))
            for o in poly_events)

    return [ghost(e) for e in poly_events]


def test_route_short_ghost_matches_naive():
    """route_events keeps exactly the poly events the naive O(E^2) ghost
    scan kept — the round-4 _overlap_rows rewrite is candidate-set
    equivalent (ADVICE r3: routing must ride the shared sweep too)."""
    from aegis_tpu.engine.auto import route_events

    rng = np.random.default_rng(11)
    for _ in range(40):
        evs = _rand_events(rng, int(rng.integers(0, 30)))
        for e in evs:
            e["note"] = int(np.clip(e["note"], 40, 88))
            if rng.random() < 0.4:
                e["note"] = 45 + int(rng.choice([0, 12, 19, 24, 28]))
            if rng.random() < 0.5:  # force the short-event regime
                e["end"] = e["start"] + int(rng.integers(0, 10))
        T = 500
        chordal = np.ones(T, bool)  # all-chordal: every poly event routes
        kept = route_events([], [dict(e) for e in evs], chordal)
        ghosts = _route_short_ghost_naive(evs)
        expect = sorted(
            ((e["start"], e["note"]) for e, g in zip(evs, ghosts) if not g),
        )
        got = sorted((e["start"], e["note"]) for e in kept)
        assert got == expect


def test_harmonic_dedup_matches_naive():
    rng = np.random.default_rng(3)
    for _ in range(60):
        evs = _rand_events(rng, int(rng.integers(0, 30)))
        # give harmonic pairs a real chance to occur
        for e in evs:
            if rng.random() < 0.4:
                e["note"] = 40 + int(rng.choice([0, 12, 19, 24]))
        assert harmonic_dedup([dict(e) for e in evs]) == _harmonic_dedup_naive(
            [dict(e) for e in evs]
        )
