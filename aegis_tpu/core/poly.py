"""Polyphonic transcription: CQT harmonic salience peeling (JAX device core).

Driver bench config 4 ("polyphonic chord transcription via CQT +
harmonic-analysis salience peeling + tabs fingering") has no reference
implementation — the reference engine is monophonic (SURVEY.md §0) — so this
is a TPU-first design from scratch:

  * Pseudo-CQT power (core.cqt) feeds an iterative **peeling** loop: per
    frame, take the strongest bin, record (bin, salience), then subtract
    that pitch's full harmonic comb before the next iteration so harmonics
    aren't re-detected as voices.  The subtraction uses a precomputed
    (n_bins, n_bins) harmonic-suppression matrix, turning each peel step
    into a one-hot MXU matmul over all frames at once — max_voices
    iterations total, fully batched over time (no per-frame Python).
  * Voice acceptance is relative (>= rel_threshold * frame's first-voice
    salience) plus an absolute floor (>= abs_threshold * global max), which
    keeps the voice count per frame data-dependent while every shape stays
    static.
  * Host side segments the resulting (T, 128) MIDI activation into
    overlapping note events (same event-dict currency as the monophonic
    engines) and groups simultaneous notes into chords for the chord-aware
    tab fingering in midi.tabs.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aegis_tpu.core import dsp
from aegis_tpu.core.cqt import CQT_FMIN_MIDI, onset_strength_t, pseudo_cqt_t
from aegis_tpu.core.events import velocity_from_db
from aegis_tpu.ref.dsp_ref import amplitude_to_db

MIDI_BINS = 128


def harmonic_suppression_matrix(n_bins: int, bins_per_octave: int = 12,
                                n_harmonics: int = 8,
                                decay: float = 0.75,
                                spread: int = 1) -> np.ndarray:
    """(n_bins, n_bins) H where row i is the harmonic comb of a fundamental
    at bin i: weight decay^(h-1) at bin i + round(bpo*log2 h), spread over
    +-`spread` neighbor bins (triangular)."""
    H = np.zeros((n_bins, n_bins), np.float32)
    for h in range(1, n_harmonics + 1):
        offset = int(round(bins_per_octave * np.log2(h)))
        weight = decay ** (h - 1)
        for d in range(-spread, spread + 1):
            w = weight * (1.0 - abs(d) / (spread + 1))
            j = np.arange(n_bins) + offset + d
            ok = (j >= 0) & (j < n_bins)
            H[np.arange(n_bins)[ok], j[ok]] = np.maximum(
                H[np.arange(n_bins)[ok], j[ok]], w)
    return H


def peel_voices(cqt_power: jnp.ndarray, supp: jnp.ndarray,
                max_voices: int = 6,
                over_subtract: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Iterative harmonic peeling.  cqt_power: (T, n_bins) non-negative.

    Returns (bins (T, V) int32, saliences (T, V) f32), strongest first.
    """
    T, n_bins = cqt_power.shape
    mag = jnp.sqrt(jnp.maximum(cqt_power, 0.0))  # magnitude domain peels
    bins_out = []
    sal_out = []
    for _ in range(max_voices):
        sal = jnp.max(mag, axis=1)
        peak = jnp.argmax(mag, axis=1).astype(jnp.int32)
        bins_out.append(peak)
        sal_out.append(sal)
        onehot = jax.nn.one_hot(peak, n_bins, dtype=mag.dtype)
        comb = jnp.dot(onehot, supp, preferred_element_type=jnp.float32)
        mag = jnp.maximum(mag - over_subtract * sal[:, None] * comb, 0.0)
    return jnp.stack(bins_out, axis=1), jnp.stack(sal_out, axis=1)


def roll_and_confidence(bins: jnp.ndarray, sals: jnp.ndarray,
                        bins_per_octave: int = 12,
                        rel_threshold: float = 0.25,
                        abs_threshold: float = 0.02,
                        global_peak: jnp.ndarray | None = None,
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(T, V) voices -> ((T, 128) bool MIDI activation, (T, 128) confidence).

    ``global_peak`` lets a sharded caller supply the track-global salience
    maximum (a pmax over the mesh time axis); per-frame acceptance is
    otherwise purely local, so tiled execution is exact."""
    T, V = bins.shape
    lead = jnp.maximum(sals[:, :1], 1e-10)
    if global_peak is None:
        global_peak = jnp.max(sals)
    keep = (sals >= rel_threshold * lead) & (
        sals >= abs_threshold * jnp.maximum(global_peak, 1e-10))
    midi = jnp.round(CQT_FMIN_MIDI + 12.0 * bins.astype(jnp.float32)
                     / bins_per_octave).astype(jnp.int32)
    midi = jnp.clip(midi, 0, MIDI_BINS - 1)
    rows = jnp.broadcast_to(jnp.arange(T)[:, None], (T, V))
    roll = jnp.zeros((T, MIDI_BINS), bool).at[rows, midi].max(keep)
    conf = jnp.zeros((T, MIDI_BINS), jnp.float32).at[rows, midi].max(
        sals / lead)
    return roll, conf


def voices_to_piano_roll(bins: jnp.ndarray, sals: jnp.ndarray,
                         bins_per_octave: int = 12,
                         rel_threshold: float = 0.25,
                         abs_threshold: float = 0.02) -> jnp.ndarray:
    """(T, V) voices -> (T, 128) bool MIDI activation."""
    return roll_and_confidence(bins, sals, bins_per_octave, rel_threshold,
                               abs_threshold)[0]


@functools.partial(jax.jit, static_argnames=(
    "sr", "n_fft", "hop_length", "n_bins", "bins_per_octave", "max_voices"))
def analyze_poly_program(y: jnp.ndarray, sr: int, n_fft: int = 2048,
                         hop_length: int = 512, n_bins: int = 84,
                         bins_per_octave: int = 12, max_voices: int = 6):
    """Fused polyphonic Perception Phase: CQT -> peel -> piano roll (+RMS,
    +onset envelope) in one device program."""
    y = y.astype(jnp.float32)
    cqt = pseudo_cqt_t(y, sr, n_fft, hop_length, n_bins, bins_per_octave)
    supp = jnp.asarray(harmonic_suppression_matrix(n_bins, bins_per_octave))
    bins, sals = peel_voices(cqt, supp, max_voices)
    roll, conf = roll_and_confidence(bins, sals, bins_per_octave)
    rms_ = dsp.rms(y, n_fft, hop_length)
    mel = dsp.melspectrogram_t(y, sr, n_fft, hop_length, 128)
    onset_env = onset_strength_t(mel)
    return {"roll": roll, "confidence": conf, "rms": rms_,
            "onset_env": onset_env}


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length",
                                             "n_bins", "bins_per_octave",
                                             "max_voices"))
def analyze_poly_program_packed(y: jnp.ndarray, scale: jnp.ndarray,
                                sr: int, n_fft: int = 2048,
                                hop_length: int = 512, n_bins: int = 84,
                                bins_per_octave: int = 12,
                                max_voices: int = 6) -> jnp.ndarray:
    """One packed (T, 2*MIDI_BINS + 2) buffer: [roll | confidence | rms |
    onset_env] — a tunneled backend pays ~25 ms PER device->host transfer,
    so fetching the four poly outputs separately cost more than the program
    itself on short clips.  ``y`` may be int16 PCM (half the upload bytes);
    ``scale`` dequantizes on device."""
    out = analyze_poly_program(y.astype(jnp.float32) * scale, sr, n_fft,
                               hop_length, n_bins, bins_per_octave,
                               max_voices)
    return jnp.concatenate(
        [out["roll"].astype(jnp.float32),
         out["confidence"].astype(jnp.float32),
         out["rms"].astype(jnp.float32)[:, None],
         out["onset_env"].astype(jnp.float32)[:, None]], axis=1)


# --------------------------------------------------------------------------
# Host: piano roll -> polyphonic events -> chords
# --------------------------------------------------------------------------

def roll_to_events(roll: np.ndarray, confidence: np.ndarray, rms: np.ndarray,
                   sr: int, hop_length: int,
                   min_note_duration_ms: float = 60.0,
                   sustain_ms: float = 40.0,
                   confidence_threshold: float = 0.5) -> List[dict]:
    """Segment a (T, 128) activation into overlapping note events."""
    T = roll.shape[0]
    rms_db = amplitude_to_db(np.asarray(rms)[:T])
    velocity = velocity_from_db(rms_db)
    min_frames = max(int((min_note_duration_ms / 1000.0) * sr / hop_length), 1)
    gap_frames = int((sustain_ms / 1000.0) * sr / hop_length)

    events: List[dict] = []
    for note in range(MIDI_BINS):
        col = roll[:, note]
        if not col.any():
            continue
        idx = np.where(col)[0]
        # merge runs separated by <= gap_frames
        splits = np.where(np.diff(idx) > gap_frames + 1)[0]
        run_starts = np.concatenate([[0], splits + 1])
        run_ends = np.concatenate([splits, [len(idx) - 1]])
        for rs, re_ in zip(run_starts, run_ends):
            s, e = int(idx[rs]), int(idx[re_])
            if e - s + 1 < min_frames:
                continue
            conf = float(confidence[s:e + 1, note].max())
            events.append({
                "note": note,
                "start": s,
                "end": e,
                "confidence": round(conf, 3),
                "velocity": int(velocity[s]),
                "track": "main" if conf >= confidence_threshold else "safe",
                "technique": None,
                "slope": 0.0,
                "rms_energy": float(rms_db[s]),
            })
    events.sort(key=lambda ev: (ev["start"], ev["note"]))
    return events


def group_chords(events: List[dict], sr: int, hop_length: int,
                 window_ms: float = 50.0) -> List[dict]:
    """Group events whose onsets fall within window_ms into chords.

    Returns [{start, end, notes: [midi...], events: [...]}] sorted by time.
    """
    if not events:
        return []
    win = max(int((window_ms / 1000.0) * sr / hop_length), 1)
    ordered = sorted(events, key=lambda e: e["start"])
    chords = []
    current = [ordered[0]]
    for e in ordered[1:]:
        if e["start"] - current[0]["start"] <= win:
            current.append(e)
        else:
            chords.append(current)
            current = [e]
    chords.append(current)
    return [{
        "start": min(e["start"] for e in grp),
        "end": max(e["end"] for e in grp),
        "notes": sorted({e["note"] for e in grp}),
        "events": grp,
    } for grp in chords]
