"""ADSR software synthesizer — batched JAX formulation.

The reference's ADSRSynthesizer (synthesizer.py:204-485) synthesizes each
note in a Python loop (oscillator -> harmonics -> concatenated-linspace
envelope -> mixdown +=).  Here the whole score is ONE device program:

  * notes are arrays (freq, start, dur, velocity, per-note ADSR params,
    per-note waveform code) — per-note parameters are first-class, which is
    what turns the per-note optimizer (reference per_note_optimizer.py) from
    a process pool into a single vmapped sweep;
  * each note renders into a fixed (max_note_samples,) buffer under vmap:
    closed-form piecewise ADSR envelope (same truncate-from-end semantics as
    the reference's concatenate-then-truncate), branchless 4-waveform
    oscillator, 2nd-5th harmonics at 0.5/0.25/0.125/0.0625 with a Nyquist
    guard, per-note peak normalization;
  * mixdown is a scatter-add at the start offsets plus a master 0.9-peak
    normalization.

Host wrappers parse SMF bytes into note arrays and emit WAV bytes.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aegis_tpu.io.wav import write_wav
from aegis_tpu.midi.decode import midi_to_notes
from aegis_tpu.synth.presets import GUITAR_ADSR_PRESETS, WAVEFORM_CODES

_HARMONIC_AMPS = (0.5, 0.25, 0.125, 0.0625)  # 2nd..5th


def _oscillator(phase: jnp.ndarray, code: jnp.ndarray) -> jnp.ndarray:
    """Branchless waveform select.  phase = (freq * t) mod 1."""
    sine = jnp.sin(2.0 * jnp.pi * phase)
    saw = 2.0 * phase - 1.0
    square = jnp.sign(sine)
    triangle = 2.0 * jnp.abs(saw) - 1.0
    return jnp.where(
        code == 0, sine,
        jnp.where(code == 1, saw, jnp.where(code == 2, square, triangle)),
    )


def _envelope(k: jnp.ndarray, n: jnp.ndarray, sr: int, attack_ms: jnp.ndarray,
              decay_ms: jnp.ndarray, sustain: jnp.ndarray,
              release_ms: jnp.ndarray) -> jnp.ndarray:
    """Closed-form ADSR at sample index k for an n-sample note."""
    a = jnp.floor(sr * attack_ms / 1000.0)
    d = jnp.floor(sr * decay_ms / 1000.0)
    r = jnp.floor(sr * release_ms / 1000.0)
    s_len = jnp.maximum(0.0, n - a - d - r)

    in_attack = k < a
    in_decay = k < a + d
    in_sustain = k < a + d + s_len
    in_release = k < a + d + s_len + r

    attack_v = k / jnp.maximum(a, 1.0)
    decay_v = 1.0 + (sustain - 1.0) * (k - a) / jnp.maximum(d, 1.0)
    rel_j = k - a - d - s_len
    release_v = sustain * (1.0 - rel_j / jnp.maximum(r - 1.0, 1.0))

    env = jnp.where(
        in_attack, attack_v,
        jnp.where(in_decay, decay_v,
                  jnp.where(in_sustain, sustain,
                            jnp.where(in_release, release_v, 0.0))),
    )
    return jnp.clip(env, 0.0, 1.0) * (k < n)


def _render_note(freq, n_samples, velocity, attack_ms, decay_ms, sustain,
                 release_ms, wave_code, sr: int, max_len: int) -> jnp.ndarray:
    """One note into a (max_len,) buffer (zero beyond n_samples)."""
    k = jnp.arange(max_len, dtype=jnp.float32)
    t = k / sr
    active = k < n_samples

    sig = _oscillator((freq * t) % 1.0, wave_code)
    nyquist = sr / 2.0
    for i, amp in enumerate(_HARMONIC_AMPS):
        h = float(i + 2)
        keep = (freq * h) < nyquist
        sig = sig + jnp.where(keep, amp, 0.0) * _oscillator((freq * h * t) % 1.0,
                                                            wave_code)
    peak = jnp.max(jnp.abs(sig * active))
    sig = sig / jnp.maximum(peak, 1e-9)

    env = _envelope(k, n_samples, sr, attack_ms, decay_ms, sustain, release_ms)
    return sig * env * active * jnp.clip(velocity / 127.0, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("sr", "max_len", "total_samples"))
def render_notes(
    freqs: jnp.ndarray,          # (N,)
    starts: jnp.ndarray,         # (N,) sample offsets
    lengths: jnp.ndarray,        # (N,) note length in samples (incl. release)
    velocities: jnp.ndarray,     # (N,)
    attack_ms: jnp.ndarray,      # (N,)
    decay_ms: jnp.ndarray,       # (N,)
    sustain: jnp.ndarray,        # (N,)
    release_ms: jnp.ndarray,     # (N,)
    wave_codes: jnp.ndarray,     # (N,) int32
    sr: int,
    max_len: int,
    total_samples: int,
) -> jnp.ndarray:
    """Whole-score synthesis: vmapped note render + block-aligned mixdown,
    normalized to 0.9 peak.

    The mixdown used to be ``out.at[idx].add(buffers)`` — an arbitrary
    (N, max_len)-element scatter-add, which serializes on TPU and dominated
    the whole auto-match sweep (~3 s where the rest of the math is ~100 ms).
    Instead: shift each note into block alignment with ONE contiguous
    dynamic-slice (a note spans at most two max_len-sized blocks), then
    accumulate blocks with a one-hot matmul on the MXU.
    """
    buffers = jax.vmap(
        lambda f, n, v, a, d, s, r, w: _render_note(f, n, v, a, d, s, r, w,
                                                    sr, max_len)
    )(freqs, lengths.astype(jnp.float32), velocities, attack_ms, decay_ms,
      sustain, release_ms, wave_codes)

    n = buffers.shape[0]
    blk = max_len
    # ceil so a trailing partial block still receives audio (all current
    # callers pass powers of two where this is exact anyway); the final
    # [:total_samples] crop drops the padding
    n_blocks = max(-(-total_samples // blk), 1)
    rem = (starts % blk).astype(jnp.int32)
    b0 = (starts // blk).astype(jnp.int32)

    padded = jnp.concatenate(
        [jnp.zeros((n, blk), jnp.float32), buffers,
         jnp.zeros((n, blk), jnp.float32)], axis=1)  # (N, 3*blk)
    aligned = jax.vmap(
        lambda p, r: jax.lax.dynamic_slice(p, (blk - r,), (2 * blk,))
    )(padded, rem)                                   # (N, 2*blk)

    rows = aligned.reshape(2 * n, blk)
    bids = jnp.stack([b0, b0 + 1], axis=1).reshape(2 * n)
    keep = (bids < n_blocks).astype(jnp.float32)
    bids = jnp.minimum(bids, n_blocks - 1)
    onehot = jax.nn.one_hot(bids, n_blocks, dtype=jnp.float32)
    mixed = jnp.einsum("nb,nk->bk", onehot, rows * keep[:, None],
                       precision=jax.lax.Precision.HIGHEST)
    mixed = mixed.reshape(n_blocks * blk)[:total_samples]

    peak = jnp.max(jnp.abs(mixed))
    return mixed / jnp.maximum(peak, 1e-9) * 0.9


def _pow2(n: int, floor: int = 1024) -> int:
    b = floor
    while b < n:
        b <<= 1
    return b


def synthesize_note_arrays(
    notes: list, sr: int,
    attack_ms=10.0, decay_ms=50.0, sustain_level=0.7, release_ms=100.0,
    waveform: str = "sawtooth",
    per_note: Optional[Dict[str, np.ndarray]] = None,
) -> np.ndarray:
    """Render a note list [{note, start, end, velocity}] (seconds) to audio.

    ``per_note`` may carry arrays overriding any of attack_ms/decay_ms/
    sustain_level/release_ms/waveform_code per note.
    """
    if not notes:
        return np.zeros(int(sr * 0.5), np.float32)
    N = len(notes)

    def arr(key, default):
        if per_note and key in per_note:
            return np.asarray(per_note[key], np.float32)
        return np.full(N, default, np.float32)

    freqs = np.array([440.0 * 2 ** ((n["note"] - 69) / 12.0) for n in notes],
                     np.float32)
    starts = np.array([int(n["start"] * sr) for n in notes], np.int32)
    rel = arr("release_ms", release_ms)
    durs = np.array(
        [max(0.01, n["end"] - n["start"]) for n in notes], np.float32
    ) + rel / 1000.0
    lengths = (durs * sr).astype(np.int32)
    velocities = np.array([n.get("velocity", 100) for n in notes], np.float32)

    if per_note and "waveform_code" in per_note:
        codes = np.asarray(per_note["waveform_code"], np.int32)
    else:
        codes = np.full(N, WAVEFORM_CODES.get(waveform, 1), np.int32)

    end_time = max(n["end"] for n in notes) + float(np.max(rel)) / 1000.0 + 0.5
    total = _pow2(int(end_time * sr))
    max_len = _pow2(int(np.max(lengths)) + 1)

    out = render_notes(
        jnp.asarray(freqs), jnp.asarray(starts), jnp.asarray(lengths),
        jnp.asarray(velocities), jnp.asarray(arr("attack_ms", attack_ms)),
        jnp.asarray(arr("decay_ms", decay_ms)),
        jnp.asarray(arr("sustain_level", sustain_level)),
        jnp.asarray(rel), jnp.asarray(codes),
        sr=sr, max_len=max_len, total_samples=total,
    )
    return np.asarray(out)[: int(end_time * sr)]


def midi_to_wav_adsr(midi_data, attack_ms=10.0, decay_ms=50.0,
                     sustain_level=0.7, release_ms=100.0,
                     waveform: str = "sawtooth", sample_rate: int = 44100) -> bytes:
    """SMF bytes -> WAV bytes through the batched ADSR synth."""
    notes = midi_to_notes(midi_data)
    audio = synthesize_note_arrays(
        notes, sample_rate, attack_ms=attack_ms, decay_ms=decay_ms,
        sustain_level=sustain_level, release_ms=release_ms, waveform=waveform,
    )
    import io

    buf = io.BytesIO()
    write_wav(buf, audio, sample_rate)
    return buf.getvalue()


def synthesize_midi_adsr(midi_data, preset: str = "electric_clean",
                         sample_rate: int = 44100, **adsr_overrides) -> bytes:
    """Preset-based convenience entry (reference synthesizer.py:642-699)."""
    params = dict(GUITAR_ADSR_PRESETS.get(preset,
                                          GUITAR_ADSR_PRESETS["electric_clean"]))
    params.update(adsr_overrides)
    return midi_to_wav_adsr(
        midi_data,
        attack_ms=params.get("attack_ms", 10),
        decay_ms=params.get("decay_ms", 50),
        sustain_level=params.get("sustain_level", 0.7),
        release_ms=params.get("release_ms", 100),
        waveform=params.get("waveform", "sawtooth"),
        sample_rate=sample_rate,
    )


# --------------------------------------------------------------------------
# Envelope analysis (host): estimate ADSR params from real audio
# (reference synthesizer.py:512-627)
# --------------------------------------------------------------------------

def analyze_envelope(audio_data: np.ndarray, sr: int = 44100) -> Dict[str, float]:
    audio = np.asarray(audio_data)
    if audio.dtype == np.int16:
        audio = audio.astype(np.float64) / 32768.0
    if audio.ndim == 2:
        audio = audio.mean(axis=1)

    frame = int(sr * 0.005)
    hop = max(frame // 2, 1)
    n_frames = max(1, (len(audio) - frame) // hop + 1)
    if n_frames < 1 or len(audio) < frame:
        return {"attack_ms": 10.0, "decay_ms": 50.0, "sustain_level": 0.7,
                "release_ms": 100.0}
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame)[None, :]
    idx = np.minimum(idx, len(audio) - 1)
    rms = np.sqrt(np.mean(audio[idx] ** 2, axis=1))
    if rms.max() == 0:
        return {"attack_ms": 10.0, "decay_ms": 50.0, "sustain_level": 0.7,
                "release_ms": 100.0}
    rms_n = rms / rms.max()

    peak = int(np.argmax(rms_n))
    attack_ms = max(1, peak) * hop / sr * 1000.0

    total = len(rms_n)
    if peak < total - 1:
        s0 = peak + max(1, int((total - peak) * 0.2))
        s1 = min(peak + max(2, int((total - peak) * 0.7)), total)
        sustain = float(np.mean(rms_n[s0:s1])) if s0 < s1 else 0.7
    else:
        sustain = 0.7
    sustain = float(np.clip(sustain, 0.05, 1.0))

    after = rms_n[peak:]
    below = np.where(after <= sustain * 1.05)[0]
    decay_frames = int(below[0]) if len(below) else max(1, int((total - peak) * 0.15))
    decay_ms = max(decay_frames, 1) * hop / sr * 1000.0

    above = np.where(rms_n > 0.05)[0]
    release_frames = (total - 1 - int(above[-1])) if len(above) else 0
    if release_frames <= 0:
        release_frames = max(1, int(total * 0.1))
    release_ms = release_frames * hop / sr * 1000.0

    return {
        "attack_ms": round(float(np.clip(attack_ms, 1.0, 500.0)), 1),
        "decay_ms": round(float(np.clip(decay_ms, 1.0, 1000.0)), 1),
        "sustain_level": round(sustain, 3),
        "release_ms": round(float(np.clip(release_ms, 5.0, 2000.0)), 1),
    }
