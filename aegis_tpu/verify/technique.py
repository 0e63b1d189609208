"""Technique verification by audio matching.

For each articulated event (bend / vibrato / hammer_on / pull_off), render a
mini-MIDI twice — with and without the technique — and keep the technique
only when the with-version is more mel-similar to the original audio slice
and the similarity clears 0.6 (reference technique_verifier.py:58-99,
mini-MIDI builder :111-179, mel cosine :204-234).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from aegis_tpu.core import dsp
from aegis_tpu.core.filters import mel_filterbank
from aegis_tpu.midi.encode import events_to_midi
from aegis_tpu.io.audio import to_mono
from aegis_tpu.io.wav import read_wav
from aegis_tpu.synth.fluidsynth import synthesize_midi
from aegis_tpu.utils.logging import get_logger

log = get_logger("TechniqueVerifier")

_VERIFIABLE = {"bend", "vibrato", "hammer_on", "pull_off"}


@functools.partial(jax.jit, static_argnames=("sr",))
def _mel_cosine(y_a: jnp.ndarray, y_b: jnp.ndarray, sr: int) -> jnp.ndarray:
    pa = dsp.stft_power(y_a, 2048, 512)
    pb = dsp.stft_power(y_b, 2048, 512)
    fb = jnp.asarray(mel_filterbank(sr, 2048, 128).T)
    a = jnp.dot(pa, fb, preferred_element_type=jnp.float32).ravel()
    b = jnp.dot(pb, fb, preferred_element_type=jnp.float32).ravel()
    return a @ b / (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-8)


def _mini_midi(event: Dict, sr: int, hop_length: int, with_technique: bool) -> bytes:
    spf = hop_length / sr
    evt = dict(event)
    evt["start"], evt["end"] = 0, max(1, event["end"] - event["start"])
    if not with_technique:
        evt["technique"] = None
    return events_to_midi([evt], sr, hop_length, output=None)


def _synth_audio(midi_bytes: bytes, sr: int) -> np.ndarray:
    wav = synthesize_midi(midi_bytes, sample_rate=sr)
    if wav is None:
        return np.zeros(sr // 2, np.float32)
    audio, native_sr = read_wav(wav)
    audio = to_mono(audio)
    if native_sr != sr:
        from aegis_tpu.io.audio import resample

        audio = resample(audio, native_sr, sr)
    return audio


def verify_technique_by_audio_matching(
    y: np.ndarray,
    events: List[Dict],
    sr: int,
    hop_length: int,
    min_similarity: float = 0.6,
) -> List[Dict]:
    """Returns events with unsupported techniques stripped; each checked
    event gains {technique_verified, technique_similarity}."""
    out = []
    checked = kept = 0
    for event in events:
        technique = event.get("technique")
        if technique not in _VERIFIABLE:
            out.append(event)
            continue
        checked += 1
        evt = dict(event)
        try:
            pad = int(sr * 0.05)
            start = max(0, event["start"] * hop_length - pad)
            end = min(len(y), event["end"] * hop_length + pad)
            orig = y[start:end]
            if len(orig) < sr * 0.05:
                out.append(evt)
                continue

            with_audio = _synth_audio(_mini_midi(event, sr, hop_length, True), sr)
            without_audio = _synth_audio(_mini_midi(event, sr, hop_length, False), sr)

            n = 1 << 12
            while n < max(len(orig), len(with_audio), len(without_audio)):
                n <<= 1

            def pad_to(x):
                b = np.zeros(n, np.float32)
                b[: len(x)] = x[:n]
                return jnp.asarray(b)

            o = pad_to(orig)
            sim_with = float(_mel_cosine(o, pad_to(with_audio), sr))
            sim_without = float(_mel_cosine(o, pad_to(without_audio), sr))

            verified = sim_with > sim_without and sim_with > min_similarity
            evt["technique_similarity"] = round(sim_with, 4)
            evt["technique_verified"] = verified
            if not verified:
                evt["technique"] = None
            else:
                kept += 1
        except Exception as e:
            log.warning(f"verification failed for {technique}: {e}")
        out.append(evt)
    log.info(f"verified {kept}/{checked} technique events")
    return out
