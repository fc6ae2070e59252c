"""The driver's north-star fidelity check: MCD of our featurizer vs the
PyTorch-reference math must be well within 0.1 dB (BASELINE.md)."""

import jax.numpy as jnp
import numpy as np

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


def test_mcd_metric_properties():
    rng = np.random.RandomState(1)
    a = rng.rand(20, 80)
    assert mcd(a, a) == 0.0
    b = a + 0.001  # +0.1 dB uniform offset, c0 excluded -> tiny MCD
    assert mcd(a, b) < 1e-6
    c = a + rng.randn(20, 80) * 0.01
    assert mcd(a, c) > 0.1
