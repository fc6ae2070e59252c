"""End-to-end featurization parity vs a torch re-statement of the reference
pipeline (src/audio.py): preemphasis -> |STFT| -> mel -> dB -> normalize."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from semi_tts_tpu.ops import mel as melmod
from semi_tts_tpu.ops.features import (
    AudioConfig,
    AudioFeaturizer,
    amp_to_db,
    db_to_amp,
    denormalize_db,
    inv_preemphasis,
    normalize_db,
    preemphasis,
)

CFG = AudioConfig(dft_precision="highest")  # strict-parity knob


def _ref_features(wave_np, cfg=CFG):
    """Literal torch transcription of src/audio.py:156-177 (clean path)."""
    x = torch.from_numpy(wave_np.astype(np.float64))[None]
    x = torch.cat([x[:, :1], x[:, 1:] - cfg.preemphasis_coeff * x[:, :-1]], dim=-1)
    w = torch.hann_window(cfg.win_length, dtype=torch.float64)
    y = torch.stft(x, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                   win_length=cfg.win_length, window=w, center=True,
                   pad_mode="reflect", onesided=True, return_complex=True)
    spec = y.abs()[0]  # (F, T)
    fb = torch.from_numpy(melmod.mel_filterbank(cfg.sample_rate, cfg.n_fft, n_mels=cfg.num_mels).astype(np.float64))
    melspec = fb @ spec
    def fin(a):
        db = 20 * torch.log10(torch.clamp(a, min=1e-5)) - 20
        return torch.clamp((db + 100) / 100, 0, 1)
    return fin(melspec).T.numpy(), fin(spec).T.numpy()  # (T, M), (T, F)


def test_scalar_transforms_roundtrip():
    x = jnp.linspace(0.0, 1.0, 11)
    np.testing.assert_allclose(np.asarray(normalize_db(denormalize_db(x))), np.asarray(x), atol=1e-6)
    a = jnp.array([1e-4, 0.1, 1.0, 10.0])
    np.testing.assert_allclose(np.asarray(db_to_amp(amp_to_db(a))), np.asarray(a), rtol=1e-4)


def test_preemphasis_matches_reference():
    x = np.random.RandomState(0).randn(100).astype(np.float32)
    got = np.asarray(preemphasis(jnp.asarray(x), 0.97))
    want = np.concatenate([x[:1], x[1:] - 0.97 * x[:-1]])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_inv_preemphasis_matches_scipy():
    from scipy import signal
    x = np.random.RandomState(1).randn(2, 500).astype(np.float32)
    got = np.asarray(inv_preemphasis(jnp.asarray(x), 0.97))
    want = signal.lfilter([1], [1, -0.97], x, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_clean_features_match_reference_pipeline():
    feat = AudioFeaturizer(CFG)
    rng = np.random.RandomState(2)
    L1, L2 = 30011, 22051
    Spad = 33000
    waves = np.zeros((2, Spad), np.float32)
    waves[0, :L1] = rng.randn(L1).astype(np.float32) * 0.2
    waves[1, :L2] = rng.randn(L2).astype(np.float32) * 0.2
    mel_b, lin_b, flen = feat.featurize(jnp.asarray(waves), jnp.array([L1, L2]))
    mel_b, lin_b, flen = np.asarray(mel_b), np.asarray(lin_b), np.asarray(flen)

    for b, L in [(0, L1), (1, L2)]:
        want_mel, want_lin = _ref_features(waves[b, :L])
        T = want_mel.shape[0]
        assert flen[b] == T
        np.testing.assert_allclose(mel_b[b, :T], want_mel, atol=5e-4)
        np.testing.assert_allclose(lin_b[b, :T], want_lin, atol=5e-4)
        assert (mel_b[b, T:] == 0).all() and (lin_b[b, T:] == 0).all()


def test_augmented_features_shapes_and_masking():
    feat = AudioFeaturizer(CFG)
    rng = np.random.RandomState(3)
    L = 28000
    Spad = 30000
    waves = np.zeros((2, Spad), np.float32)
    waves[0, :L] = rng.randn(L).astype(np.float32) * 0.2
    waves[1, :L] = waves[0, :L]
    aug, alen = feat.featurize_augmented(jnp.asarray(waves), jnp.array([L, L]), jax.random.PRNGKey(0))
    aug, alen = np.asarray(aug), np.asarray(alen)
    T_max = 1 + Spad // CFG.min_stretch_hop
    assert aug.shape == (2, T_max, CFG.num_mels)
    for b in range(2):
        assert 0 < alen[b] <= T_max
        assert (aug[b, alen[b]:] == 0).all()
        assert np.isfinite(aug[b]).all()
    # different per-item draws -> different features
    assert not np.allclose(aug[0, :50], aug[1, :50])


def test_augmented_matches_reference_at_fixed_draw():
    """Bit-level check of the stretch path: fix rate/snr, compare to a torch
    transcription of src/audio.py:358-383."""
    cfg = AudioConfig(snr_range=(-1, -1))  # disable noise for determinism
    feat = AudioFeaturizer(cfg)
    rng = np.random.RandomState(4)
    L = 26000
    wave = rng.randn(L).astype(np.float32) * 0.2
    rate = 1.04
    got_mel, got_len = feat.featurize_augmented_at(
        jnp.asarray(np.pad(wave, (0, 2000)))[None], jnp.asarray([L]),
        jnp.zeros((1,)), jnp.float32(rate), jax.random.PRNGKey(0))
    got_mel, got_len = np.asarray(got_mel)[0], int(got_len[0])

    stretch_sr = int(22050 * rate)
    win, hop = int(0.05 * stretch_sr), int(0.0125 * stretch_sr)
    x = torch.from_numpy(np.concatenate([wave[:1], wave[1:] - 0.97 * wave[:-1]]).astype(np.float64))[None]
    w = torch.hann_window(win, dtype=torch.float64)
    y = torch.stft(x, n_fft=2048, hop_length=hop, win_length=win, window=w,
                   center=True, pad_mode="reflect", onesided=True, return_complex=True)
    sp = y.abs()[0]
    fb = torch.from_numpy(melmod.mel_filterbank(22050, 2048, n_mels=80).astype(np.float64))
    msp = fb @ sp
    db = 20 * torch.log10(torch.clamp(msp, min=1e-5)) - 20
    want = torch.clamp((db + 100) / 100, 0, 1).T.numpy()
    assert got_len == want.shape[0]
    np.testing.assert_allclose(got_mel[:got_len], want, atol=5e-4)


def test_mel_to_linear_pinv():
    feat = AudioFeaturizer(CFG)
    rng = np.random.RandomState(5)
    spec_amp = np.abs(rng.randn(40, 1025)).astype(np.float32)
    melspec = np.asarray(feat.mel_fb) @ spec_amp.T  # (M, T)
    mel_norm = np.asarray(normalize_db(amp_to_db(jnp.asarray(melspec.T)) - 20))
    lin_amp = np.asarray(feat.mel_to_linear_amp(jnp.asarray(mel_norm)))
    assert lin_amp.shape == (40, 1025)
    # the pinv is a least-squares inverse: re-projecting the reconstructed
    # linear through the filterbank must recover the mel amplitudes
    mel_back = lin_amp @ np.asarray(feat.mel_fb).T  # (T, M)
    np.testing.assert_allclose(mel_back, melspec.T, rtol=5e-2, atol=1e-3)


def test_mfcc_shape():
    feat = AudioFeaturizer(CFG)
    x = jnp.asarray(np.random.RandomState(6).rand(2, 30, 80).astype(np.float32))
    out = np.asarray(feat.mfcc(x))
    assert out.shape == (2, 30, 39)
    assert np.isfinite(out).all()
