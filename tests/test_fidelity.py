"""The driver's north-star fidelity check: MCD of our featurizer vs the
PyTorch-reference math must be well within 0.1 dB (BASELINE.md) — on both a
tone proxy and a formant-synthesized speech fixture — plus a full
mel -> linear -> Griffin-Lim -> re-featurize round trip on speech."""

import jax
import jax.numpy as jnp
import numpy as np

from helpers import synthesize_speech
from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer
from semi_tts_tpu.utils.metrics import mcd
from test_features import _ref_features


def test_featurizer_mcd_within_budget():
    """Production default ('high' DFT precision) must stay far inside the
    0.1 dB MCD budget."""
    feat = AudioFeaturizer(AudioConfig())
    rng = np.random.RandomState(0)
    L = 44100
    # speech-like signal: tones + noise floor
    t = np.arange(L) / 22050
    wave = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 660 * t)
            + 0.02 * rng.randn(L)).astype(np.float32)
    waves = np.zeros((1, 45000), np.float32)
    waves[0, :L] = wave
    mel, _, flen = feat.featurize(jnp.asarray(waves), jnp.asarray([L]))
    want_mel, _ = _ref_features(wave)
    T = want_mel.shape[0]
    got = np.asarray(mel)[0, :T]
    d = mcd(got, want_mel)
    assert d < 0.02, f"MCD {d} dB vs reference math (budget 0.1 dB)"


def test_speech_fixture_mcd_within_budget():
    """Same gate on real speech structure: formants, harmonics, fricative
    bursts, onsets, and silence gaps (synthesized, deterministic)."""
    feat = AudioFeaturizer(AudioConfig())
    wave = synthesize_speech(2.0, seed=7, f0=135.0)
    L = wave.shape[0]
    waves = np.zeros((1, L + 900), np.float32)
    waves[0, :L] = wave
    mel, lin, flen = feat.featurize(jnp.asarray(waves), jnp.asarray([L]))
    want_mel, want_lin = _ref_features(wave)
    T = want_mel.shape[0]
    d = mcd(np.asarray(mel)[0, :T], want_mel)
    assert d < 0.02, f"speech-fixture mel MCD {d} dB vs reference math (budget 0.1 dB)"
    np.testing.assert_allclose(np.asarray(lin)[0, :T], want_lin, atol=5e-4)


def test_speech_griffin_lim_roundtrip():
    """wave -> mel -> pinv linear -> Griffin-Lim -> wave -> mel keeps the
    spectral envelope: the reconstruction's mel trajectory must correlate
    strongly with (and stay within a loose MCD of) the original, and silence
    must stay silent."""
    from semi_tts_tpu.ops.griffin_lim import specgram_to_waveform

    cfg = AudioConfig()
    feat = AudioFeaturizer(cfg)
    wave = synthesize_speech(2.0, seed=11, f0=120.0)
    L = wave.shape[0]
    waves = np.zeros((1, L), np.float32)
    waves[0] = wave
    mel, _, flen = feat.featurize(jnp.asarray(waves), jnp.asarray([L]))
    amp = feat.mel_to_linear_amp(mel)
    wav2 = np.asarray(specgram_to_waveform(
        amp, jax.random.PRNGKey(3), n_fft=cfg.n_fft, hop=cfg.hop_length,
        win_length=cfg.win_length))
    n = wav2.shape[1]
    waves2 = np.zeros((1, L), np.float32)
    waves2[0, :n] = wav2[0, :L]
    mel2, _, _ = feat.featurize(jnp.asarray(waves2), jnp.asarray([min(n, L)]))
    T = int(np.asarray(flen)[0]) - 2  # last frames straddle the GL trim
    a = np.asarray(mel)[0, :T]
    b = np.asarray(mel2)[0, :T]
    # spectral-envelope agreement: frame-mean energy trajectories correlate
    corr = np.corrcoef(a.mean(-1), b.mean(-1))[0, 1]
    assert corr > 0.95, f"mel energy trajectory corr {corr}"
    # per-bin error on the loudest frames: the 80-mel pinv smears harmonic
    # fine structure, so ~1-2 dB/bin is the attainable floor for GL-from-mel
    # (MCD, which squares cepstral diffs over 100x-scaled dB, amplifies this
    # ~100x and is gated on the featurizer instead — see tests above)
    e = a.mean(-1)
    hi = e > 0.5 * e.max()
    assert hi.sum() >= 10
    err_db = 100.0 * np.abs(a[hi] - b[hi]).mean()  # normalized units -> dB
    assert err_db < 2.5, f"GL round-trip per-bin error {err_db} dB on voiced frames"
    # silence stays silent
    lo = e < 0.02
    if lo.any():
        assert b[lo].mean() < 0.05


def test_mcd_metric_properties():
    rng = np.random.RandomState(1)
    a = rng.rand(20, 80)
    assert mcd(a, a) == 0.0
    b = a + 0.001  # +0.1 dB uniform offset, c0 excluded -> tiny MCD
    assert mcd(a, b) < 1e-6
    c = a + rng.randn(20, 80) * 0.01
    assert mcd(a, c) > 0.1
