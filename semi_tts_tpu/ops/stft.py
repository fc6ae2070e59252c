"""Batched STFT / iSTFT as pure jittable JAX functions.

Parity targets:
  * forward STFT — ``torch.stft(center=True, pad_mode='reflect',
    onesided=True)`` semantics used throughout the reference
    (`/root/reference/src/audio.py:234-246`). The reference's
    ``Spectrogram(power=2).sqrt()`` hack is simply the magnitude here.
  * inverse STFT — the vendored batched overlap-add iSTFT
    (`/root/reference/lib/istft.py:3-155`): irfft each frame, window,
    overlap-add at ``hop`` stride, divide by the squared-window envelope,
    trim ``n_fft//2`` from both ends (NOLA condition assumed/checked).

TPU-first design notes:
  * Framing is a gather with statically-shaped index matrices, so the whole
    wave->frames->rFFT->|.| pipeline compiles to one fused XLA program; the
    rFFT itself is the XLA FFT op (fast on TPU).
  * ``hop``/``win_length`` may be *traced* scalars (per-item random
    time-stretch draws a new hop/win every batch): the frame gather uses
    dynamic start indices and the Hann window is evaluated as a masked
    closed-form expression over the static ``n_fft`` grid. One compiled
    program covers every stretch rate — no shape-specializing recompiles.
  * Overlap-add in the iSTFT is a scatter-add (``.at[].add``) over
    statically-shaped index matrices instead of conv_transpose tricks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def dynamic_hann_window(n_fft: int, win_length) -> jnp.ndarray:
    """Periodic Hann window of (possibly traced) length ``win_length``,
    zero-padded and centered in an ``n_fft`` buffer exactly like torch.stft
    centers a short window inside the FFT frame."""
    win_length = jnp.asarray(win_length, jnp.int32)
    left = (n_fft - win_length) // 2
    i = jnp.arange(n_fft, dtype=jnp.int32)
    k = i - left
    inside = (k >= 0) & (k < win_length)
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * k.astype(jnp.float32) / win_length.astype(jnp.float32))
    return jnp.where(inside, w, 0.0)


def reflect_pad_ragged(x: jnp.ndarray, lengths: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad each row of a right-zero-padded batch ``x`` of shape
    ``(B, S)`` around its *own* end ``lengths[b]`` (and around 0 on the left),
    producing ``(B, S + 2*pad)``.

    This reproduces, inside one static-shape batch, the per-file
    ``pad_mode='reflect'`` behavior the reference gets by featurizing files
    one at a time in DataLoader workers — frames that straddle an utterance
    boundary stay bit-comparable. Requires ``lengths > pad`` (true for any
    real utterance; pad is n_fft//2 ≈ 46 ms).
    """
    B, S = x.shape
    j = jnp.arange(S + 2 * pad, dtype=jnp.int32)[None, :] - pad     # (1, S+2p), signed source index
    L = lengths.astype(jnp.int32)[:, None]                          # (B, 1)
    src = jnp.where(j < 0, -j, j)
    src = jnp.where(src >= L, 2 * L - 2 - src, src)
    src = jnp.clip(src, 0, S - 1)
    return jnp.take_along_axis(x, src, axis=1)


def frame_signal(x_padded: jnp.ndarray, n_fft: int, hop, num_frames: int) -> jnp.ndarray:
    """Extract ``num_frames`` frames of length ``n_fft`` at (possibly traced)
    stride ``hop`` from a padded batch ``(B, S_pad)`` -> ``(B, T, n_fft)``."""
    t = jnp.arange(num_frames, dtype=jnp.int32)[:, None]
    i = jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    idx = t * jnp.asarray(hop, jnp.int32) + i                       # (T, n_fft)
    idx = jnp.clip(idx, 0, x_padded.shape[-1] - 1)
    return x_padded[:, idx]


def stft_magnitude(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    n_fft: int,
    hop,
    win_length,
    num_frames: int,
    frame_lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Magnitude STFT of a right-zero-padded batch ``(B, S)``.

    Returns ``(B, num_frames, n_fft//2 + 1)`` with frames at
    ``t >= frame_lengths[b]`` zeroed (matching the reference's
    zero-padded collate, `src/data.py:134-136`).

    ``hop``/``win_length`` may be traced scalars (see module docstring);
    ``frame_lengths`` is the per-item true frame count ``1 + L // hop``.
    """
    pad = n_fft // 2
    xp = reflect_pad_ragged(x, lengths, pad)
    frames = frame_signal(xp, n_fft, hop, num_frames)
    window = dynamic_hann_window(n_fft, win_length)
    spec = jnp.abs(jnp.fft.rfft(frames * window[None, None, :], n=n_fft, axis=-1))
    if frame_lengths is not None:
        t = jnp.arange(num_frames, dtype=jnp.int32)[None, :]
        mask = t < frame_lengths.astype(jnp.int32)[:, None]
        spec = jnp.where(mask[:, :, None], spec, 0.0)
    return spec


def stft_complex(x: jnp.ndarray, *, n_fft: int, hop: int, win_length: int) -> jnp.ndarray:
    """Complex STFT of ``(..., S)`` with whole-array reflect padding —
    the Griffin-Lim inner loop operates on a single fixed-length signal,
    so plain reflect padding (no ragged lengths) is exact here."""
    pad = n_fft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    S = x.shape[-1]
    num_frames = 1 + S // hop
    t = jnp.arange(num_frames, dtype=jnp.int32)[:, None]
    i = jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    frames = xp[..., t * hop + i]                                    # (..., T, n_fft)
    window = dynamic_hann_window(n_fft, win_length)
    return jnp.fft.rfft(frames * window, n=n_fft, axis=-1)


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "length"))
def istft(y: jnp.ndarray, *, n_fft: int, hop: int, win_length: int, length: int | None = None) -> jnp.ndarray:
    """Inverse STFT by windowed overlap-add (batched).

    ``y``: complex, shape ``(..., T, n_fft//2+1)`` (note: frame axis second
    to last — the transpose-free layout; callers adapting reference-layout
    ``(freq, time)`` data should swap axes first).
    Returns ``(..., S)`` with ``S = hop * (T - 1)`` when ``length`` is None
    (i.e. ``center=True`` trim of ``n_fft//2`` per side).
    """
    T = y.shape[-2]
    window = dynamic_hann_window(n_fft, win_length)
    frames = jnp.fft.irfft(y, n=n_fft, axis=-1) * window             # (..., T, n_fft)

    expected = n_fft + hop * (T - 1)
    pos = (jnp.arange(T, dtype=jnp.int32)[:, None] * hop + jnp.arange(n_fft, dtype=jnp.int32)[None, :]).reshape(-1)

    lead_shape = frames.shape[:-2]
    flat = frames.reshape((-1, T * n_fft))
    sig = jnp.zeros((flat.shape[0], expected), frames.dtype).at[:, pos].add(flat)

    env = jnp.zeros((expected,), frames.dtype).at[pos].add(jnp.tile(window**2, (T,)))

    half = n_fft // 2
    end = expected - half if length is None else half + length
    sig = sig[:, half:end] / jnp.maximum(env[half:end], 1e-11)
    return sig.reshape(lead_shape + (sig.shape[-1],))


def nola_check(n_fft: int, hop: int, win_length: int, num_frames: int = 16) -> float:
    """Minimum of the squared-window overlap-add envelope over the valid
    region (reference asserts > 1e-11, `lib/istft.py:146-149`)."""
    window = np.asarray(dynamic_hann_window(n_fft, win_length))
    expected = n_fft + hop * (num_frames - 1)
    env = np.zeros(expected)
    for t in range(num_frames):
        env[t * hop : t * hop + n_fft] += window**2
    half = n_fft // 2
    return float(np.abs(env[half : expected - half]).min())
