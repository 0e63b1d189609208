"""Realism sweep: truth F1 per engine vs string inharmonicity B.

The driver's BASELINE config 2 is "real guitar WAV" — unreachable in a
zero-egress image, so every truth gate rides generator physics.  Until
round 3 that physics was IDEALLY harmonic (Karplus-Strong, after the
reference's generate_test_signal.py:5-42) while real strings have
stiffness-stretched partials (f_n = n·f0·√(1+B·n²), B ≈ 1e-5 wound ..
1e-3 plain), body resonance and pick noise — exactly the assumptions the
poly recovery chain and the comb templates hardcode (VERDICT r2 missing
#2).  This sweep measures how each engine's truth F1 degrades as B walks
through the physical range with the full realism model ON (pick
transient + body modes; tools/signal_gen.py::pluck_inharmonic), and the
floors it measures are pinned in tests/test_inharmonic.py.

Clips per B:
  * mono 20 s pentatonic bench melody (seed 42) -> v1(pyin), financial,
    neural truth F1;
  * chord progressions seeds 1/3/7 -> poly truth F1 (mean + min).

Usage:  python -m aegis_tpu.tools.inharmonic_sweep [--cpu] [--quick]
Prints one JSON document on stdout; progress rows on stderr.
"""

from __future__ import annotations

import json
import sys

B_VALUES = (0.0, 1e-5, 3e-5, 1e-4, 3e-4, 1e-3)


def sweep(b_values=B_VALUES, mono_duration: float = 20.0,
          poly_seeds=(1, 3, 7), quiet: bool = False) -> dict:
    from aegis_tpu.engine.engine import AegisEngine
    from aegis_tpu.engine.financial import AegisFinancialEngine
    from aegis_tpu.engine.poly import AegisPolyEngine
    from aegis_tpu.models.pitchnet import have_default_weights
    from aegis_tpu.tools.signal_gen import (generate_bench_track,
                                            generate_chord_progression)
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    sr, hop = 22050, 512
    v1 = AegisEngine(sample_rate=sr, backend="device")
    fin = AegisFinancialEngine(sample_rate=sr, backend="device")
    poly = AegisPolyEngine(sample_rate=sr)
    neural = have_default_weights()

    def tf1(truth, events, hop_used=hop):
        return round(note_event_f1(
            truth, events_to_seconds(events, sr, hop_used))["f1"], 4)

    rows = {}
    for B in b_values:
        y, truth = generate_bench_track(mono_duration, sr=sr, B=B,
                                        return_truth=True)
        row = {}
        row["v1"] = tf1(truth, v1.extract_events(
            v1.audio_to_midi(y, None), None, confidence_threshold=0.3))
        fa = fin.analyze(y, fetch_mel=False)
        row["financial"] = tf1(truth, fin.extract_events(fa)[0])
        if neural:
            row["neural"] = tf1(truth, v1.extract_events(
                v1.audio_to_midi(y, None, pitch_backend="neural"), None,
                confidence_threshold=0.3))
        pf1 = []
        for seed in poly_seeds:
            yc, tc = generate_chord_progression(seed, sr=sr, B=B)
            pf1.append(tf1(tc, poly.extract_events(poly.analyze(yc)),
                           poly.hop_length))
        row["poly_mean"] = round(sum(pf1) / len(pf1), 4)
        row["poly_min"] = min(pf1)
        rows[f"{B:g}"] = row
        if not quiet:
            print(f"# B={B:g}: {row}", file=sys.stderr)
    return {"sr": sr, "mono_duration_s": mono_duration,
            "poly_seeds": list(poly_seeds), "f1_by_B": rows}


def main() -> None:
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    quick = "--quick" in sys.argv
    out = sweep(b_values=(0.0, 1e-4) if quick else B_VALUES,
                mono_duration=10.0 if quick else 20.0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
