"""Audio effect chain as JAX device ops.

Behavioral mirror of the reference's pure-NumPy effects
(effect_learning_loop.py:56-275), re-expressed fixed-shape:

  * distortion — tanh soft clipping with drive->gain mapping
  * reverb — convolution with a seeded exponential-decay IR, done as an FFT
    product instead of O(n*ir) direct convolution
  * delay — the reference's feedforward echo sum (gain = feedback**i,
    up to 20 echoes or gain < 0.01) as one vectorized scatter-sum
  * chorus — LFO-modulated fractional delay with linear interpolation

All effects normalize to <= 1.0 peak exactly like the reference.  The IR's
random diffusion uses the same fixed seed (42) sequence semantics via host
numpy so chains are reproducible.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aegis_tpu.synth.presets import EFFECT_PRESETS  # noqa: F401 (re-export)


def _limit(x: jnp.ndarray) -> jnp.ndarray:
    peak = jnp.max(jnp.abs(x))
    return jnp.where(peak > 1.0, x / peak, x)


@jax.jit
def distortion(audio: jnp.ndarray, drive: jnp.ndarray) -> jnp.ndarray:
    gain = 1.0 + drive * 19.0
    d = jnp.tanh(audio * gain)
    d = d / jnp.maximum(jnp.max(jnp.abs(d)), 1e-6)
    return jnp.clip(d, -1.0, 1.0)


def _reverb_ir(room_size: float, sr: int) -> np.ndarray:
    duration = room_size * 3.0
    ir_length = int(sr * duration)
    if ir_length <= 0:
        return np.zeros(0, np.float32)
    t = np.arange(ir_length, dtype=np.float64)
    decay_rate = 5.0 / max(duration, 0.01)
    ir = np.exp(-decay_rate * t / sr)
    rng = np.random.RandomState(42)
    ir *= rng.uniform(0.8, 1.0, size=ir_length)
    ir /= max(np.sum(np.abs(ir)), 1e-6)
    return ir.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_fft",))
def _fft_convolve_head(audio: jnp.ndarray, ir: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    A = jnp.fft.rfft(audio, n_fft)
    B = jnp.fft.rfft(ir, n_fft)
    return jnp.fft.irfft(A * B, n_fft)[: audio.shape[0]]


def reverb(audio: jnp.ndarray, room_size: float = 0.5, sr: int = 44100) -> jnp.ndarray:
    ir = _reverb_ir(room_size, sr)
    if len(ir) == 0:
        return jnp.asarray(audio)
    n = int(audio.shape[0])
    n_fft = 1
    while n_fft < n + len(ir):
        n_fft <<= 1
    wet = _fft_convolve_head(jnp.asarray(audio), jnp.asarray(ir), n_fft)
    wet_ratio = room_size * 0.6
    dry_ratio = 1.0 - wet_ratio * 0.5
    return _limit(dry_ratio * jnp.asarray(audio) + wet_ratio * wet)


@functools.partial(jax.jit, static_argnames=("delay_samples", "n_echoes"))
def _delay_sum(audio: jnp.ndarray, feedback: jnp.ndarray, delay_samples: int,
               n_echoes: int) -> jnp.ndarray:
    n = audio.shape[0]
    out = audio
    for i in range(1, n_echoes + 1):
        offset = delay_samples * i
        if offset >= n:
            break
        gain = feedback**i
        shifted = jnp.concatenate([jnp.zeros(offset, audio.dtype),
                                   audio[: n - offset]])
        out = out + shifted * gain
    return _limit(out)


def delay(audio: jnp.ndarray, delay_ms: float = 300.0, feedback: float = 0.3,
          sr: int = 44100) -> jnp.ndarray:
    delay_samples = int(delay_ms / 1000.0 * sr)
    if delay_samples <= 0 or feedback <= 0:
        return jnp.asarray(audio)
    # feedback >= 1 would never decay below the -40 dB echo cutoff
    # (log(1)=0 made the count formula blow up); clamp to a stable loop
    # and let the 20-echo cap bound the tail
    feedback = min(float(feedback), 0.99)
    n_echoes = min(int(np.log(0.01) / np.log(max(feedback, 0.01))), 20)
    # echoes with gain < 0.01 are dropped (matches the reference's early break)
    n_echoes = max(1, min(n_echoes,
                          int(np.ceil(audio.shape[0] / delay_samples))))
    return _delay_sum(jnp.asarray(audio), jnp.float32(feedback), delay_samples,
                      n_echoes)


@functools.partial(jax.jit, static_argnames=("sr",))
def chorus(audio: jnp.ndarray, depth: jnp.ndarray = 0.003,
           rate: jnp.ndarray = 1.5, sr: int = 44100) -> jnp.ndarray:
    n = audio.shape[0]
    t = jnp.arange(n, dtype=jnp.float32)
    base_delay = int(0.007 * sr)
    lfo = jnp.sin(2.0 * jnp.pi * rate * t / sr)
    indices = jnp.clip(t - (base_delay + depth * sr * lfo), 0, n - 1)
    lo = jnp.floor(indices).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    frac = indices - lo
    wet = audio[lo] * (1.0 - frac) + audio[hi] * frac
    return _limit(0.7 * audio + 0.3 * wet)


def apply_effect_chain(audio: np.ndarray, effects_config: List[Tuple[str, dict]],
                       sr: int = 44100) -> np.ndarray:
    """Chain effects in order; unknown names are skipped (reference
    effect_learning_loop.py:234-275)."""
    x = jnp.asarray(np.asarray(audio, np.float32))
    for name, params in effects_config:
        if name == "distortion":
            x = distortion(x, jnp.float32(params.get("drive", 0.5)))
        elif name == "reverb":
            x = reverb(x, float(params.get("room_size", 0.5)), sr)
        elif name == "delay":
            x = delay(x, float(params.get("delay_ms", 300)),
                      float(params.get("feedback", 0.3)), sr)
        elif name == "chorus":
            x = chorus(x, jnp.float32(params.get("depth", 0.003)),
                       jnp.float32(params.get("rate", 1.5)), sr)
    return np.asarray(x)
