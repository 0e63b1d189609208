"""Auto parameter matcher: coarse-to-fine grid search over extraction
parameters, scored by synthesized-audio similarity.

Grid structure mirrors the reference (auto_matcher.py:92-269): 3x3x3 coarse
over (confidence, min-duration, sustain), then 3x3x3 fine around the winner.
Phase 2 extraction is host-vectorized and the similarity objective runs on
device (verify.similarity), so the 54 evaluations are dominated by the ADSR
synth + two STFTs each — all device work.
"""

from __future__ import annotations

import io
from typing import Callable, Dict, List, Optional

import numpy as np

from aegis_tpu.io.audio import to_mono
from aegis_tpu.io.wav import read_wav
from aegis_tpu.synth.fluidsynth import synthesize_midi
from aegis_tpu.utils.logging import get_logger
from aegis_tpu.verify.similarity import audio_similarity

log = get_logger("AutoMatcher")

COARSE_GRID = {
    "confidence_threshold": [0.2, 0.4, 0.6],
    "min_note_duration_ms": [50, 150, 250],
    "sustain_ms": [100, 300, 500],
}


def _fine_grid(best: Dict) -> Dict[str, List]:
    return {
        "confidence_threshold": [
            max(0.1, best["confidence_threshold"] - 0.1),
            best["confidence_threshold"],
            min(0.9, best["confidence_threshold"] + 0.1),
        ],
        "min_note_duration_ms": [
            max(10, best["min_note_duration_ms"] - 50),
            best["min_note_duration_ms"],
            min(500, best["min_note_duration_ms"] + 50),
        ],
        "sustain_ms": [
            max(0, best["sustain_ms"] - 100),
            best["sustain_ms"],
            min(1000, best["sustain_ms"] + 100),
        ],
    }


def _evaluate(engine, raw_data, y_orig: np.ndarray, sample_rate: int,
              conf: float, min_dur: int, sustain: int) -> float:
    buf = io.BytesIO()
    engine.extract_events(
        raw_data, buf,
        confidence_threshold=conf,
        min_note_duration_ms=int(min_dur),
        sustain_ms=int(sustain),
        midi_program=27,
    )
    midi_data = buf.getvalue()
    if len(midi_data) < 60:  # effectively empty output
        return -1.0
    wav_data = synthesize_midi(midi_data, sample_rate=sample_rate)
    if wav_data is None:
        return -1.0
    y_synth, sr = read_wav(wav_data)
    y_synth = to_mono(y_synth)
    if sr != sample_rate:
        from aegis_tpu.io.audio import resample

        y_synth = resample(y_synth, sr, sample_rate)
    return audio_similarity(y_orig, y_synth, sample_rate)


def auto_match_parameters(
    original_audio, engine, raw_data,
    sample_rate: int = 44100,
    progress_callback: Optional[Callable] = None,
) -> Optional[Dict]:
    """Returns {confidence_threshold, min_note_duration_ms, sustain_ms,
    score} or None when no combination produced usable output.

    ``original_audio`` may be a path or a mono float array at engine.sr.
    """
    if isinstance(original_audio, np.ndarray):
        y_orig = original_audio[: int(sample_rate * 30)]
    else:
        from aegis_tpu.io.audio import load_audio

        y_orig, _ = load_audio(original_audio, sr=sample_rate, duration=30)

    log.info("coarse grid search (27 combos)")
    best_score, best_params = -1.0, None

    def sweep(grid, phase):
        nonlocal best_score, best_params
        combos = [
            (c, d, s)
            for c in grid["confidence_threshold"]
            for d in grid["min_note_duration_ms"]
            for s in grid["sustain_ms"]
        ]
        for i, (conf, min_dur, sustain) in enumerate(combos):
            if progress_callback:
                progress_callback((i + 1) / len(combos),
                                  f"{phase} {i + 1}/{len(combos)}")
            try:
                score = _evaluate(engine, raw_data, y_orig, sample_rate,
                                  conf, min_dur, sustain)
            except Exception as e:
                log.warning(f"combo failed ({conf},{min_dur},{sustain}): {e}")
                continue
            if score > best_score:
                best_score = score
                best_params = {
                    "confidence_threshold": conf,
                    "min_note_duration_ms": int(min_dur),
                    "sustain_ms": int(sustain),
                }

    sweep(COARSE_GRID, "coarse")
    if best_params is None:
        log.warning("no valid combination found")
        return None
    log.info(f"coarse best: {best_params} score={best_score:.3f}")

    sweep(_fine_grid(best_params), "fine")
    log.info(f"final best: {best_params} score={best_score:.3f}")
    return {**best_params, "score": best_score}
