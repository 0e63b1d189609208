"""Device-side mask kernels: rake detection, run-length gating, palm mute,
sub-harmonic correction, distortion classification.

The reference implements these as per-column / per-frame Python loops
(aegis_engine_core/vision.py:3-38, aegis_engine_core_v2/guitar_specific.py).
Here each is a fixed-shape vectorized program:

  * run-length gating uses cummax/cummin index propagation instead of a
    sequential run scan;
  * rake-enhancement's "fast rise then decay" test uses cumulative sums for
    the windowed means and a windowed-any dilation.

Semantics note: the reference's run-length scan silently drops a run that is
still open at the end of the signal (vision.py:26-35).  We treat a trailing
run like any other run — the cleaner contract — and the CPU oracle
(ref/masks_ref.py) matches this.

Spectrogram layout is time-major (T, n_mels).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def run_length_keep(mask: jnp.ndarray, min_len: int, max_len: int) -> jnp.ndarray:
    """Keep only True-runs whose length is within [min_len, max_len].

    Vectorized: propagate each run's start index forward (cummax) and its end
    index backward (reverse cummin), then gate on run length.
    """
    T = mask.shape[0]
    idx = jnp.arange(T)
    prev = jnp.concatenate([jnp.zeros((1,), bool), mask[:-1]])
    nxt = jnp.concatenate([mask[1:], jnp.zeros((1,), bool)])
    starts = mask & ~prev
    ends = mask & ~nxt
    start_idx = jax.lax.cummax(jnp.where(starts, idx, -1))
    end_idx = jax.lax.cummin(jnp.where(ends, idx, T), reverse=True)
    length = end_idx - start_idx + 1
    return mask & (length >= min_len) & (length <= max_len)


def detect_rake(
    S_db_t: jnp.ndarray,
    hop_length: int,
    sr: int,
    broadband_threshold_ratio: float = 0.6,
) -> jnp.ndarray:
    """Rake ("Vision AI") detection — broadband columns lasting 10-30 ms.

    Per column: active-bin ratio (bins within 20 dB of the column max) above
    the threshold marks a rake candidate; columns quieter than -60 dB are
    skipped; candidates are then gated to 10-30 ms runs.
    Mirrors reference vision.py:3-38 (vectorized).
    """
    T, n_mels = S_db_t.shape
    col_max = jnp.max(S_db_t, axis=1)
    active = jnp.sum(S_db_t > (col_max[:, None] - 20.0), axis=1)
    ratio = active.astype(jnp.float32) / n_mels
    candidate = (ratio > broadband_threshold_ratio) & (col_max >= -60.0)

    ms_per_frame = (hop_length / sr) * 1000.0
    min_frames = int(10.0 / ms_per_frame)
    max_frames = int(30.0 / ms_per_frame)
    return run_length_keep(candidate, min_frames, max_frames)


def detect_palm_mute(
    S_db_t: jnp.ndarray, hop_length: int, sr: int, duration_ms: float = 50.0
) -> jnp.ndarray:
    """Palm-mute mask: strong low band vs high band (ratio > 2) for runs no
    longer than duration_ms.  Mirrors guitar_specific.py:62-109."""
    T, n_mels = S_db_t.shape
    mid = n_mels // 2
    low = jnp.mean(S_db_t[:, :mid], axis=1)
    high = jnp.mean(S_db_t[:, mid:], axis=1)
    ratio = low / (high + 1e-6)
    candidate = ratio > 2.0

    ms_per_frame = (hop_length / sr) * 1000.0
    max_frames = int(duration_ms / ms_per_frame)
    return run_length_keep(candidate, 0, max_frames)


def enhance_rake(
    S_db_t: jnp.ndarray, hop_length: int, sr: int, rake_mask: jnp.ndarray
) -> jnp.ndarray:
    """Rake enhancement: a +10 dB energy jump followed by a (windowed-mean)
    decay extends the rake mask forward for the 30 ms window.
    Mirrors guitar_specific.py:111-149."""
    T = S_db_t.shape[0]
    total = jnp.mean(S_db_t, axis=1)
    ediff = jnp.diff(total, prepend=total[:1])

    ms_per_frame = (hop_length / sr) * 1000.0
    w = max(int(30.0 / ms_per_frame), 1)

    # windowed mean of ediff[i : i+w] via cumsum
    cum = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(ediff)])
    has_window = jnp.arange(T) + w < T  # reference requires the full window
    upper = jnp.minimum(jnp.arange(T) + w, T)
    win_mean = (cum[upper] - cum[jnp.arange(T)]) / jnp.maximum(upper - jnp.arange(T), 1)

    trigger = (ediff > 10.0) & (win_mean < 0.0) & has_window
    # dilate each trigger forward by w frames: any trigger in (i-w, i]
    tcum = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(trigger.astype(jnp.int32))])
    lower = jnp.maximum(jnp.arange(T) + 1 - w, 0)
    dilated = (tcum[jnp.arange(T) + 1] - tcum[lower]) > 0
    return rake_mask | dilated


def filter_subharmonic(
    f0: jnp.ndarray, voiced: jnp.ndarray, fmin_hz: float = 82.4
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Remove sub-E2 pitches; attempt one-octave-up correction for plausible
    octave errors.  Mirrors guitar_specific.py:23-60."""
    sub = f0 < fmin_hz  # NaN compares False
    corrected = f0 * 2.0
    correctable = sub & (corrected >= fmin_hz) & (corrected < fmin_hz * 4.0)
    new_f0 = jnp.where(correctable, corrected, jnp.where(sub, jnp.nan, f0))
    new_voiced = jnp.where(correctable, True, jnp.where(sub, False, voiced))
    return new_f0, new_voiced


def distortion_score(S_db_t: jnp.ndarray) -> jnp.ndarray:
    """High-band energy ratio used to classify clean/light/heavy distortion
    (guitar_specific.py:208-233).  Returns the scalar ratio; thresholding to a
    label happens on host (classify_distortion)."""
    n_mels = S_db_t.shape[1]
    high_start = int(n_mels * 0.7)
    high = jnp.mean(S_db_t[:, high_start:])
    total = jnp.mean(S_db_t)
    return high / (total + 1e-6)


def classify_distortion(ratio: float) -> str:
    if ratio > 0.4:
        return "heavy"
    if ratio > 0.25:
        return "light"
    return "clean"
