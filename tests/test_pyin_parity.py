"""pYIN: JAX device implementation vs NumPy oracle, and absolute accuracy."""

import numpy as np
import pytest

from aegis_tpu.core.pyin import pyin as jpyin
from aegis_tpu.ref.pyin_ref import pyin as rpyin


def test_pyin_parity(two_tone_22k):
    y, sr = two_tone_22k
    f0r, vfr, vpr = rpyin(y, sr)
    f0j, vfj, vpj = (np.asarray(a) for a in jpyin(y, sr))

    assert (vfr == vfj).mean() == 1.0
    m = vfr & vfj
    assert np.max(np.abs(f0r[m] - f0j[m]) / f0r[m]) < 1e-4
    assert np.max(np.abs(vpr - vpj)) < 1e-4


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0, 880.0])
def test_pyin_absolute_accuracy(freq):
    sr = 22050
    t = np.arange(int(sr * 0.5)) / sr
    y = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    f0, vf, vp = rpyin(y, sr)
    # ignore attack/decay edges
    inner = slice(4, len(f0) - 4)
    assert vf[inner].mean() > 0.9
    med = np.nanmedian(f0[inner])
    # within half a pitch bin (0.05 semitone)
    cents = 1200 * np.log2(med / freq)
    assert abs(cents) < 10


def test_pyin_silence_is_unvoiced():
    sr = 22050
    y = np.zeros(sr // 2, dtype=np.float32)
    f0, vf, vp = rpyin(y, sr)
    assert vf.mean() < 0.1
    assert np.all(np.isnan(f0[~vf]))

    f0j, vfj, _ = (np.asarray(a) for a in jpyin(y, sr))
    assert np.asarray(vfj).mean() < 0.1


def test_pyin_noise_low_confidence(rng):
    sr = 22050
    y = rng.normal(0, 0.1, sr // 2).astype(np.float32)
    _, _, vp = rpyin(y, sr)
    assert vp.mean() < 0.55


def test_viterbi_pallas_matches_scan():
    """Banded Pallas Viterbi (interpret mode) vs the lax.scan decode."""
    import jax.numpy as jnp

    from aegis_tpu.config import PyinConfig
    from aegis_tpu.core import pyin_pallas as vp
    from aegis_tpu.core.pyin import viterbi_decode
    from aegis_tpu.ref.pyin_ref import local_transition

    cfg = PyinConfig()
    n = cfg.n_pitch_bins
    width = cfg.transition_width(22050, 512)
    T = 40
    rng = np.random.default_rng(11)
    # realistic observations: sparse trough mass around a wandering pitch
    obs = np.zeros((T, n), np.float32)
    center = 200
    for t in range(T):
        center = int(np.clip(center + rng.integers(-8, 9), 5, n - 6))
        for d in (-2, -1, 0, 1, 2):
            obs[t, center + d] = rng.random() * 0.4
        # occasional huge jump to exercise the out-of-band path
        if t % 13 == 7:
            obs[t, (center + 230) % n] = 0.9
    voiced_prob = np.clip(obs.sum(axis=1), 0.0, 1.0).astype(np.float32)

    trans = local_transition(n, width)
    log_local = jnp.asarray(np.log(trans + 1e-30), jnp.float32)
    ref_states = np.asarray(viterbi_decode(
        jnp.asarray(obs), jnp.asarray(voiced_prob), log_local,
        cfg.switch_prob))

    band = jnp.asarray(vp.build_banded_log_transition(trans, width))
    eps = 1e-30
    got = np.asarray(vp.viterbi_decode_pallas(
        jnp.log(jnp.asarray(obs) + eps),
        jnp.log((1.0 - jnp.asarray(voiced_prob)) / n + eps),
        band, n, width,
        float(np.log1p(-cfg.switch_prob)), float(np.log(cfg.switch_prob)),
        interpret=True))

    assert got.shape == ref_states.shape
    assert (got == ref_states).mean() > 0.99, (
        f"state mismatch {np.mean(got != ref_states):.3f}")


def test_viterbi_pallas_44k_band():
    """Same parity at sr=44100, where the transition half-width differs
    (51 vs 101 at 22050) — the server's default sample rate."""
    import jax.numpy as jnp

    from aegis_tpu.config import PyinConfig
    from aegis_tpu.core import pyin_pallas as vp
    from aegis_tpu.core.pyin import viterbi_decode
    from aegis_tpu.ref.pyin_ref import local_transition

    cfg = PyinConfig()
    n = cfg.n_pitch_bins
    width = cfg.transition_width(44100, 512)
    T = 32
    rng = np.random.default_rng(21)
    obs = np.zeros((T, n), np.float32)
    center = 150
    for t in range(T):
        center = int(np.clip(center + rng.integers(-4, 5), 5, n - 6))
        obs[t, center] = rng.random() * 0.5
    vp_prob = np.clip(obs.sum(axis=1), 0.0, 1.0).astype(np.float32)

    trans = local_transition(n, width)
    ref = np.asarray(viterbi_decode(
        jnp.asarray(obs), jnp.asarray(vp_prob),
        jnp.asarray(np.log(trans + 1e-30), jnp.float32), cfg.switch_prob))
    band = jnp.asarray(vp.build_banded_log_transition(trans, width))
    eps = 1e-30
    got = np.asarray(vp.viterbi_decode_pallas(
        jnp.log(jnp.asarray(obs) + eps),
        jnp.log((1.0 - jnp.asarray(vp_prob)) / n + eps),
        band, n, width,
        float(np.log1p(-cfg.switch_prob)), float(np.log(cfg.switch_prob)),
        interpret=True))
    assert (got == ref).mean() > 0.99
