"""Griffin-Lim convergence: reconstructed waveform's spectrogram should
approach the target magnitude (src/audio.py:207-226 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from semi_tts_tpu.ops.griffin_lim import griffin_lim, specgram_to_waveform
from semi_tts_tpu.ops.stft import stft_complex

N_FFT, HOP, WIN = 2048, 275, 1102


def _tone(L, f, sr=22050):
    t = np.arange(L) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_griffin_lim_converges():
    x = _tone(HOP * 60, 440.0)
    mag = jnp.abs(stft_complex(jnp.asarray(x), n_fft=N_FFT, hop=HOP, win_length=WIN))
    wav = griffin_lim(mag, jax.random.PRNGKey(0), n_fft=N_FFT, hop=HOP, win_length=WIN, n_iter=30)
    mag2 = jnp.abs(stft_complex(wav, n_fft=N_FFT, hop=HOP, win_length=WIN))
    mag, mag2 = np.asarray(mag), np.asarray(mag2)
    rel = np.linalg.norm(mag2[2:-2] - mag[2:-2]) / np.linalg.norm(mag[2:-2])
    assert rel < 0.15, rel


def test_griffin_lim_batched():
    x = np.stack([_tone(HOP * 40, 440.0), _tone(HOP * 40, 880.0)])
    mag = jnp.abs(stft_complex(jnp.asarray(x), n_fft=N_FFT, hop=HOP, win_length=WIN))
    wav = specgram_to_waveform(mag, jax.random.PRNGKey(1), n_fft=N_FFT, hop=HOP,
                               win_length=WIN, n_iter=10)
    wav = np.asarray(wav)
    assert wav.shape == (2, HOP * (mag.shape[1] - 1))
    assert np.abs(wav).max() <= 1.0
    assert np.isfinite(wav).all()
