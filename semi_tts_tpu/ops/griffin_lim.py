"""Batched Griffin-Lim waveform reconstruction on TPU.

Parity target: `/root/reference/src/audio.py:179-226` — 30 iterations of
[stft -> take phase -> reapply magnitude -> istft], random uniform phase
init, followed by inverse pre-emphasis and clipping to [-1, 1]. The
reference runs this per spectrogram with numpy phase init; here the whole
batch runs as one ``lax.fori_loop`` on device with PRNG phases
(`SURVEY.md §7` hard-parts list).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .features import GFL_ITER, inv_preemphasis
from .stft import istft, stft_complex


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "n_iter"))
def griffin_lim(
    magnitude: jnp.ndarray,
    rng: jax.Array,
    *,
    n_fft: int,
    hop: int,
    win_length: int,
    n_iter: int = GFL_ITER,
) -> jnp.ndarray:
    """Reconstruct waveforms from amplitude spectrograms.

    Args:
      magnitude: ``(..., T, F)`` linear *amplitude* spectrogram, F = n_fft//2+1.
      rng: PRNG key for the random phase initialization.

    Returns waveform ``(..., hop * (T - 1))``.
    """
    magnitude = jnp.abs(magnitude)
    phases = jax.random.uniform(rng, magnitude.shape, minval=-jnp.pi, maxval=jnp.pi)
    y = magnitude * jnp.exp(1j * phases)
    x = istft(y, n_fft=n_fft, hop=hop, win_length=win_length)

    def body(_, x):
        y = stft_complex(x, n_fft=n_fft, hop=hop, win_length=win_length)
        y = magnitude * jnp.exp(1j * jnp.angle(y))
        return istft(y, n_fft=n_fft, hop=hop, win_length=win_length)

    return jax.lax.fori_loop(0, n_iter, body, x)


def specgram_to_waveform(
    magnitude: jnp.ndarray,
    rng: jax.Array,
    *,
    n_fft: int,
    hop: int,
    win_length: int,
    preemphasis_coeff: float = 0.97,
    n_iter: int = GFL_ITER,
    apply_inv_preemphasis: bool = True,
) -> jnp.ndarray:
    """Griffin-Lim + inverse pre-emphasis + clip (`src/audio.py:179-192`)."""
    wav = griffin_lim(magnitude, rng, n_fft=n_fft, hop=hop, win_length=win_length, n_iter=n_iter)
    if apply_inv_preemphasis:
        wav = inv_preemphasis(wav, preemphasis_coeff)
    return jnp.clip(wav, -1.0, 1.0)
