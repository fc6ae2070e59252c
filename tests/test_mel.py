"""Golden tests for the Slaney mel filterbank against closed-form values and
the documented librosa outputs quoted in the reference's vendored fork."""

import numpy as np

from semi_tts_tpu.ops import mel


def test_hz_mel_roundtrip():
    f = np.array([0.0, 60.0, 110.0, 220.0, 440.0, 999.0, 1000.0, 4000.0, 11025.0])
    m = mel.hz_to_mel(f)
    back = mel.mel_to_hz(m)
    np.testing.assert_allclose(back, f, rtol=1e-10, atol=1e-8)


def test_hz_to_mel_documented_values():
    # librosa docstring values (lib/filters.py:246-249)
    assert abs(mel.hz_to_mel(60.0) - 0.9) < 1e-12
    np.testing.assert_allclose(mel.hz_to_mel([110, 220, 440]), [1.65, 3.3, 6.6], atol=1e-12)
    assert abs(mel.mel_to_hz(3.0) - 200.0) < 1e-9


def test_mel_frequencies_documented_values():
    # librosa docstring (lib/filters.py:218-228): n_mels=40, fmin=0, fmax=11025
    got = mel.mel_frequencies(40, 0.0, 11025.0)
    expect_head = [0.0, 85.317, 170.635, 255.952]
    expect_tail = [8467.272, 9246.028, 10096.408, 11025.0]
    np.testing.assert_allclose(got[:4], expect_head, atol=1e-3)
    np.testing.assert_allclose(got[-4:], expect_tail, atol=1e-3)


def test_filterbank_shape_and_norm():
    fb = mel.mel_filterbank(22050, 2048, n_mels=80)
    assert fb.shape == (80, 1025)
    assert fb.dtype == np.float32
    assert (fb >= 0).all()
    # every filter is non-empty
    assert (fb.max(axis=1) > 0).all()
    # Slaney area normalization: integral over Hz of each triangle ~ 1
    # triangle area = width/2 * peak; enorm = 2/width => area*enorm = peak_rel
    mel_f = mel.mel_frequencies(82, 0.0, 11025.0)
    widths = mel_f[2:] - mel_f[:-2]
    df = 22050 / 2 / 1024  # Hz per fft bin
    areas = fb.sum(axis=1) * df
    # each normalized triangle integrates to ~1 (coarse due to bin quantization)
    np.testing.assert_allclose(areas, np.ones(80), rtol=0.1)
    assert widths.shape == (80,)


def test_filterbank_matches_manual_triangle():
    # verify a single filter against the direct formula
    sr, n_fft, n_mels = 22050, 2048, 80
    fb = mel.mel_filterbank(sr, n_fft, n_mels=n_mels)
    fftfreqs = mel.fft_frequencies(sr, n_fft)
    mel_f = mel.mel_frequencies(n_mels + 2, 0.0, sr / 2)
    i = 40
    lower = (fftfreqs - mel_f[i]) / (mel_f[i + 1] - mel_f[i])
    upper = (mel_f[i + 2] - fftfreqs) / (mel_f[i + 2] - mel_f[i + 1])
    tri = np.maximum(0, np.minimum(lower, upper)) * 2.0 / (mel_f[i + 2] - mel_f[i])
    np.testing.assert_allclose(fb[i], tri, atol=1e-6)


def test_pinv_reconstruction():
    fb = mel.mel_filterbank(22050, 2048, n_mels=80)
    pinv = mel.mel_pinv(fb)
    assert pinv.shape == (1025, 80)
    # fb @ pinv ~ identity on the mel space
    eye = fb @ pinv
    np.testing.assert_allclose(eye, np.eye(80), atol=2e-2)


def test_dct_matches_scipy():
    from scipy.fftpack import dct as sp_dct

    x = np.random.RandomState(0).randn(80).astype(np.float32)
    mat = mel.dct_matrix(13, 80)
    got = mat @ x
    want = sp_dct(x.astype(np.float64), type=2, norm="ortho")[:13]
    np.testing.assert_allclose(got, want, atol=1e-4)
