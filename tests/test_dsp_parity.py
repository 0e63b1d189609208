"""Device DSP kernels vs the NumPy CPU oracle."""

import numpy as np

from aegis_tpu.core import dsp as jdsp
from aegis_tpu.ref import dsp_ref as rdsp


def test_stft_power_parity(two_tone_22k):
    y, sr = two_tone_22k
    ref = rdsp.stft_power(y, 2048, 512)
    dev = np.asarray(jdsp.stft_power(y, 2048, 512))
    assert dev.shape == ref.shape
    scale = np.max(ref)
    np.testing.assert_allclose(dev / scale, ref / scale, atol=2e-3)


def test_stft_fft_vs_matmul(two_tone_22k):
    y, sr = two_tone_22k
    a = np.asarray(jdsp.stft_power(y, 2048, 512, use_matmul_dft=True))
    b = np.asarray(jdsp.stft_power(y, 2048, 512, use_matmul_dft=False))
    scale = np.max(b)
    np.testing.assert_allclose(a / scale, b / scale, atol=2e-3)


def test_melspectrogram_parity(two_tone_22k):
    y, sr = two_tone_22k
    ref = rdsp.melspectrogram(y, sr, 2048, 512)  # (mels, T)
    dev = np.asarray(jdsp.melspectrogram_t(y, sr, 2048, 512)).T
    assert dev.shape == ref.shape
    scale = np.max(ref)
    np.testing.assert_allclose(dev / scale, ref / scale, atol=5e-3)


def test_power_to_db_parity(two_tone_22k):
    y, sr = two_tone_22k
    S = rdsp.melspectrogram(y, sr, 2048, 512)
    ref = rdsp.power_to_db(S)
    dev = np.asarray(jdsp.power_to_db(S))
    np.testing.assert_allclose(dev, ref, atol=1e-3)
    assert abs(ref.max()) < 1e-4  # ref=max convention
    assert ref.min() >= -80.0 - 1e-6  # top_db clamp


def test_rms_parity(two_tone_22k):
    y, sr = two_tone_22k
    ref = rdsp.rms(y)
    dev = np.asarray(jdsp.rms(y))
    np.testing.assert_allclose(dev, ref, atol=1e-6)


def test_frame_count_contract(two_tone_22k):
    y, sr = two_tone_22k
    T = 1 + len(y) // 512
    assert rdsp.stft_power(y, 2048, 512).shape[0] == T
    assert rdsp.rms(y).shape[0] == T
