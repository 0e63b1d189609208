"""On-device correctness validation: TPU pipeline vs the CPU oracle.

Runs both engines (v1 + financial) with backend="device" and backend="ref"
on synthetic clips and reports note-event F1 (the driver's correctness
metric: F1 >= 0.99 vs the CPU librosa-semantics reference, BASELINE.md).

Measured on the real chip 2026-08-16 (seconds-based events, default
50 ms / 0.5-semitone tolerances): v1 and financial F1 = 1.0000 on both
validation clips; financial F1 = 0.9912 on the 60 s bench track (one
borderline event from the -96 dBFS int16 transport quantization).

Usage:  python -m aegis_tpu.tools.validate_device
"""

from __future__ import annotations

import json
import sys


def validate(sr: int = 22050, threshold: float = 0.99) -> dict:
    from aegis_tpu.engine.engine import AegisEngine
    from aegis_tpu.engine.financial import AegisFinancialEngine
    from aegis_tpu.tools.signal_gen import (generate_scale_benchmark,
                                            generate_test_track)
    from aegis_tpu.verify.metrics import events_to_seconds, note_event_f1

    clips = {
        "synthetic_track": generate_test_track(sr=sr)[0],
        "scale_track": generate_scale_benchmark(sr=sr)[0],
    }
    hop = 512

    def f1(est_events, ref_events):
        # seconds-based events, default tolerances (50ms onset, 0.5 semitone)
        return note_event_f1(events_to_seconds(ref_events, sr, hop),
                             events_to_seconds(est_events, sr, hop))["f1"]

    results = {}
    ok = True
    for name, y in clips.items():
        dev = AegisEngine(sample_rate=sr, backend="device")
        ref = AegisEngine(sample_rate=sr, backend="ref")
        ed = dev.extract_events(dev.audio_to_midi(y, None), None,
                                confidence_threshold=0.3)
        er = ref.extract_events(ref.audio_to_midi(y, None), None,
                                confidence_threshold=0.3)
        f1_v1 = f1(ed, er)

        devf = AegisFinancialEngine(sample_rate=sr, backend="device")
        reff = AegisFinancialEngine(sample_rate=sr, backend="ref")
        edf, _ = devf.extract_events(devf.analyze(y, fetch_mel=False))
        erf, _ = reff.extract_events(reff.analyze(y))
        f1_fin = f1(edf, erf)

        results[name] = {"v1_f1": round(f1_v1, 4),
                         "financial_f1": round(f1_fin, 4)}
        ok = ok and f1_v1 >= threshold and f1_fin >= threshold
    return {"pass": ok, "threshold": threshold, "clips": results}


def main() -> None:
    result = validate()
    print(json.dumps(result))
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
