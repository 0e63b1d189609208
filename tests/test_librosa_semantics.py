"""In-image anchors for librosa-semantics details (VERDICT r1 #1).

librosa itself is absent from the image, but the semantic details the
VERDICT flags as drift risks — the threshold distribution, the Boltzmann
ranking, the mel filterbank, boundary/NaN handling — are each pinned here to
an EXTERNAL artifact that is available: scipy's distributions (which librosa
itself calls for pyin), an independently-derived Slaney filterbank formula,
and analytic signal truths.  test_golden.py completes the chain with real
librosa arrays once fixtures are generated outside the image.
"""

import numpy as np
import pytest
from scipy import stats

from aegis_tpu.config import PyinConfig

CFG = PyinConfig()


def test_beta_thresholds_match_scipy():
    """librosa.pyin builds its threshold prior as interval masses of
    scipy.stats.beta(2, 18) over 100 thresholds — ours must be the same."""
    from aegis_tpu.ref.pyin_ref import beta_threshold_probs

    thresholds, mass = beta_threshold_probs(CFG)
    edges = np.linspace(0.0, 1.0, CFG.n_thresholds + 1)
    expect = np.diff(stats.beta(CFG.beta_a, CFG.beta_b).cdf(edges))
    np.testing.assert_allclose(mass, expect, atol=1e-12)
    np.testing.assert_allclose(thresholds, edges[1:], atol=0)
    assert abs(mass.sum() - 1.0) < 1e-9


def test_boltzmann_ranking_matches_scipy():
    """Trough ranking weights == scipy.stats.boltzmann.pmf (librosa's call)."""
    from aegis_tpu.ref.pyin_ref import trough_probabilities

    # one frame, three troughs below every threshold: the accumulated mass
    # ratio between ranks must equal the Boltzmann pmf ratio exactly
    yin = np.array([[0.001, 1.0, 0.002, 1.0, 0.003, 1.0, 0.9]])
    mask = np.array([[True, False, True, False, True, False, False]])
    probs = trough_probabilities(yin, mask, CFG)[0]
    got = probs[[0, 2, 4]]
    pmf = stats.boltzmann.pmf(np.arange(3), CFG.boltzmann_parameter, 3)
    np.testing.assert_allclose(got / got.sum(), pmf, atol=1e-9)


def test_mel_filterbank_matches_slaney_formula():
    """Independent derivation of the Slaney-normalized mel filterbank
    (librosa.filters.mel defaults: htk=False, norm='slaney')."""
    from aegis_tpu.core.filters import mel_filterbank

    sr, n_fft, n_mels = 22050, 2048, 128
    fb = mel_filterbank(sr, n_fft, n_mels)  # (n_mels, 1+n_fft//2)

    # Slaney mel scale: linear below 1 kHz, log above
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = f / (200.0 / 3)
        log_step = np.log(6.4) / 27.0
        above = f >= 1000.0
        return np.where(above, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0)
                        / log_step, mel)

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = m * (200.0 / 3)
        log_step = np.log(6.4) / 27.0
        above = m >= 15.0
        return np.where(above, 1000.0 * np.exp(log_step * (m - 15.0)), f)

    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
    f_pts = mel_to_hz(mels)
    fft_f = np.linspace(0, sr / 2, 1 + n_fft // 2)
    expect = np.zeros_like(fb, np.float64)
    for m in range(n_mels):
        lo, ctr, hi = f_pts[m], f_pts[m + 1], f_pts[m + 2]
        up = (fft_f - lo) / (ctr - lo)
        dn = (hi - fft_f) / (hi - ctr)
        tri = np.maximum(0.0, np.minimum(up, dn))
        expect[m] = tri * 2.0 / (hi - lo)  # slaney norm
    np.testing.assert_allclose(fb, expect, atol=2e-7)


def test_pyin_nan_and_boundary_semantics():
    """librosa.pyin contracts the reference relies on
    (midi_logic_financial.py:157-158): fill_na=NaN on unvoiced frames,
    frame count = 1 + len(y)//hop with centered padding."""
    from aegis_tpu.ref.pyin_ref import pyin

    sr = 22050
    y = np.zeros(sr // 2, np.float32)
    f0, vf, vp = pyin(y, sr)
    assert len(f0) == 1 + len(y) // 512
    assert np.isnan(f0[~vf]).all()
    assert not np.isnan(f0[vf]).any() if vf.any() else True
    # f0 range respects [fmin, fmax]
    t = np.arange(sr) / sr
    f0, vf, _ = pyin((0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32),
                     sr)
    v = f0[vf]
    assert (v >= CFG.fmin - 1e-6).all() and (v <= CFG.fmax + 1e-6).all()


def test_resample_preserves_tone_frequency():
    """Polyphase resampling (librosa.load equivalent): an analytic tone's
    frequency must survive 44.1k -> 22.05k within a tenth of a Hz."""
    from aegis_tpu.io.audio import resample

    sr0, sr1, f = 44100, 22050, 439.37
    t = np.arange(sr0) / sr0
    y = np.sin(2 * np.pi * f * t).astype(np.float32)
    z = resample(y, sr0, sr1)
    assert abs(len(z) - sr1) <= 1
    spec = np.abs(np.fft.rfft(z * np.hanning(len(z))))
    k = int(np.argmax(spec))
    # parabolic peak interpolation for sub-bin accuracy
    a, b, c = np.log(spec[k - 1: k + 2] + 1e-30)
    shift = 0.5 * (a - c) / (a - 2 * b + c)
    freq = (k + shift) * sr1 / len(z)
    assert abs(freq - f) < 0.1


def test_chirp_instantaneous_frequency():
    """Analytic ground truth with NO oracle in the loop: a slow linear chirp's
    tracked f0 must follow the known instantaneous frequency."""
    from aegis_tpu.ref.pyin_ref import pyin

    sr, dur = 22050, 1.0
    t = np.arange(int(sr * dur)) / sr
    f0_t = 150.0 + 80.0 * t  # 150 -> 230 Hz
    phase = 2 * np.pi * (150.0 * t + 40.0 * t * t)
    y = (0.4 * np.sin(phase)).astype(np.float32)
    f0, vf, _ = pyin(y, sr)
    frames = np.arange(len(f0)) * 512 / sr
    inner = (frames > 0.1) & (frames < dur - 0.1) & vf
    assert inner.mean() > 0.6
    cents = 1200 * np.log2(f0[inner] / (150.0 + 80.0 * frames[inner]))
    # a 93 ms analysis window + HMM inertia lag a moving target by ~15
    # cents; the anchor is that NO octave/semitone-class error occurs
    assert np.nanmedian(np.abs(cents)) < 25
    assert np.nanmax(np.abs(cents)) < 60


def test_stft_matches_torch():
    """External cross-check with a fully independent implementation: the
    oracle's |STFT|^2 (centered, reflect-padded, periodic Hann) against
    torch.stft with the same conventions."""
    torch = pytest.importorskip("torch")

    sr, n_fft, hop = 22050, 2048, 512
    rng = np.random.default_rng(5)
    t = np.arange(sr // 2) / sr
    y = (0.4 * np.sin(2 * np.pi * 220 * t)
         + 0.05 * rng.normal(size=len(t))).astype(np.float32)

    win = torch.hann_window(n_fft, periodic=True, dtype=torch.float64)
    spec = torch.stft(torch.tensor(y, dtype=torch.float64), n_fft=n_fft,
                      hop_length=hop, window=win, center=True,
                      pad_mode="reflect", return_complex=True)
    p_torch = (spec.real ** 2 + spec.imag ** 2).numpy()  # (bins, T)

    # our oracle exposes mel; recover the raw power via its own stft helper
    from aegis_tpu.ref import dsp_ref

    p_ours = dsp_ref.stft_power(y, n_fft, hop)  # (T, bins) or (bins, T)?
    if p_ours.shape[0] != p_torch.shape[0]:
        p_ours = p_ours.T
    n = min(p_ours.shape[1], p_torch.shape[1])
    a, b = p_ours[:, :n], p_torch[:, :n]
    denom = np.maximum(np.abs(b).max(), 1e-12)
    assert np.max(np.abs(a - b)) / denom < 1e-6


def test_mel_path_matches_transformers():
    """External cross-check #2: HuggingFace transformers ships its own
    librosa-mirroring mel stack (transformers.audio_utils — an
    independent reimplementation of librosa's slaney filterbank and
    centered/reflect spectrogram).  Pinning the oracle's FULL mel path
    (framing, periodic Hann, FFT, power, slaney mel) to it at both
    production rates rules out any shared-bug hypothesis with the
    in-repo torch.stft check (which covers only the STFT)."""
    audio_utils = pytest.importorskip("transformers.audio_utils")

    from aegis_tpu.ref.dsp_ref import mel_filterbank, melspectrogram

    rng = np.random.default_rng(0)
    for sr in (22050, 44100):
        n_fft, hop, n_mels = 2048, 512, 128
        fb = audio_utils.mel_filter_bank(
            num_frequency_bins=n_fft // 2 + 1, num_mel_filters=n_mels,
            min_frequency=0.0, max_frequency=sr / 2, sampling_rate=sr,
            norm="slaney", mel_scale="slaney")
        assert np.abs(np.asarray(mel_filterbank(sr, n_fft, n_mels))
                      - fb.T).max() < 1e-8

        y = (rng.standard_normal(sr)
             * np.exp(-np.arange(sr) / sr * 3)).astype(np.float32)
        win = audio_utils.window_function(n_fft, "hann")
        S = audio_utils.spectrogram(y, win, frame_length=n_fft,
                                    hop_length=hop, power=2.0, center=True,
                                    pad_mode="reflect", mel_filters=fb)
        ours = np.asarray(melspectrogram(y, sr, n_fft, hop, n_mels))
        assert np.abs(ours - S).max() / max(S.max(), 1e-12) < 1e-6


def test_power_to_db_matches_transformers():
    """The dB conversion (ref=max, amin 1e-10, top_db 80 -- velocity and
    every noise-gate threshold ride on it) against transformers'
    independent librosa-equivalent power_to_db."""
    audio_utils = pytest.importorskip("transformers.audio_utils")

    from aegis_tpu.ref.dsp_ref import power_to_db

    rng = np.random.default_rng(1)
    S = rng.random((128, 50)) ** 4 * 300
    theirs = audio_utils.power_to_db(S, reference=float(S.max()),
                                     min_value=1e-10, db_range=80.0)
    assert np.abs(np.asarray(power_to_db(S)) - theirs).max() < 1e-5
