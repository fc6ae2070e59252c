"""Prototype: Cooley-Tukey split of the 2048-point magnitude DFT matmul.

Compares, on the real TPU at the clean-path benchmark shape:
  A. current full windowed-DFT matmul (ops.stft.magnitude_dft)
  B. radix-2 DIT: even/odd deinterleave -> 2x (1024 x [C|S]) matmuls -> twiddle
  C. radix-4 DIT: 4-way deinterleave -> 4x (512 x [C|S]) matmuls -> 2-stage/
     direct twiddle combine
Numerics verified vs numpy rfft at fp32/HIGHEST before timing.
"""

from __future__ import annotations

import time
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

N_FFT = 2048
F = N_FFT // 2 + 1


def _win(n_fft, win_length):
    w = np.zeros(n_fft)
    left = (n_fft - win_length) // 2
    k = np.arange(win_length, dtype=np.float64)
    w[left : left + win_length] = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / win_length)
    return w


# ---------------- variant A: full matmul ----------------
@lru_cache()
def mats_full(win_length):
    n = np.arange(N_FFT, dtype=np.float64)[:, None]
    k = np.arange(F, dtype=np.float64)[None, :]
    ang = 2 * np.pi * n * k / N_FFT
    w = _win(N_FFT, win_length)[:, None]
    return (w * np.cos(ang)).astype(np.float32), (w * -np.sin(ang)).astype(np.float32)


def mag_full(frames, win_length, precision):
    C, S = map(jnp.asarray, mats_full(win_length))
    re = jnp.einsum("...n,nf->...f", frames, C, precision=precision)
    im = jnp.einsum("...n,nf->...f", frames, S, precision=precision)
    return jnp.sqrt(re * re + im * im)


# ---------------- radix-R DIT shared pieces ----------------
@lru_cache()
def mats_sub(R, win_length):
    """Per-phase windowed sub-DFT matrices, packed [C | S]: list of R arrays
    (N/R, 2*(N/(2R)+1)). Phase j takes samples x[R*m + j]."""
    M = N_FFT // R
    Fs = M // 2 + 1
    m = np.arange(M, dtype=np.float64)[:, None]
    f = np.arange(Fs, dtype=np.float64)[None, :]
    ang = 2 * np.pi * m * f / M
    C, S = np.cos(ang), -np.sin(ang)
    w = _win(N_FFT, win_length)
    out = []
    for j in range(R):
        wj = w[j::R][:, None]
        out.append(np.concatenate([wj * C, wj * S], axis=1).astype(np.float32))
    return out


@lru_cache()
def twiddles(R):
    """cos/sin of 2*pi*j*k/N for k=0..F-1, j=1..R-1 (numpy constants)."""
    k = np.arange(F, dtype=np.float64)
    cs = []
    for j in range(1, R):
        ang = 2 * np.pi * j * k / N_FFT
        cs.append((np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)))
    return cs


def _extend(re, im, M):
    """(.., M//2+1) sub-DFT -> (.., F) on the k-grid via periodicity +
    conjugate symmetry, built from slices/flips (no gathers)."""
    # full period: [0..M/2] ++ conj(flip([1..M/2-1]))
    re_p = jnp.concatenate([re, re[..., 1:-1][..., ::-1]], axis=-1)   # (.., M)
    im_p = jnp.concatenate([im, -im[..., 1:-1][..., ::-1]], axis=-1)
    reps = -(-F // M)
    re_e = jnp.concatenate([re_p] * reps, axis=-1)[..., :F]
    im_e = jnp.concatenate([im_p] * reps, axis=-1)[..., :F]
    return re_e, im_e


def mag_radix(frames, R, win_length, precision):
    """frames (..., N_FFT) unwindowed -> magnitude (..., F)."""
    M = N_FFT // R
    Fs = M // 2 + 1
    sub = frames.reshape(frames.shape[:-1] + (M, R))  # [.., m, j] = x[R*m+j]
    mats = [jnp.asarray(a) for a in mats_sub(R, win_length)]
    reX, imX = None, None
    tw = twiddles(R)
    for j in range(R):
        cs = jnp.einsum("...m,mf->...f", sub[..., j], mats[j], precision=precision)
        re, im = _extend(cs[..., :Fs], cs[..., Fs:], M)
        if j == 0:
            reX, imX = re, im
        else:
            c, s = (jnp.asarray(tw[j - 1][0]), jnp.asarray(tw[j - 1][1]))
            reX = reX + c * re + s * im
            imX = imX + c * im - s * re
    return jnp.sqrt(reX * reX + imX * imX)


# ---------------- checks ----------------
def check():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 5, N_FFT).astype(np.float32)
    w = _win(N_FFT, 1102)
    ref = np.abs(np.fft.rfft(x * w, axis=-1))
    hi = jax.lax.Precision.HIGHEST
    a = np.asarray(jax.jit(partial(mag_full, win_length=1102, precision=hi))(x))
    for R in (2, 4, 8):
        b = np.asarray(jax.jit(partial(mag_radix, R=R, win_length=1102, precision=hi))(x))
        scale = np.maximum(ref, 1e-3)
        print(f"R={R}: max_rel_vs_fft={np.max(np.abs(b - ref) / scale):.3e} "
              f"full_vs_fft={np.max(np.abs(a - ref) / scale):.3e}")


# ---------------- timing ----------------
def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench():
    B, T = 128, 642
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(B, T, N_FFT).astype(np.float32))
    hp = jax.lax.Precision.HIGH

    # fold the whole thing under one jit incl. a mel-proj-like reduction to a
    # scalar so we don't read back the big output
    def run_full(fr):
        return jnp.sum(mag_full(fr, 1102, hp)[:, :, ::97])

    ts = timeit(jax.jit(run_full), frames)
    print(f"A full    : {ts*1e3:8.2f} ms")
    for R in (2, 4, 8):
        def run_r(fr, R=R):
            return jnp.sum(mag_radix(fr, R, 1102, hp)[:, :, ::97])
        ts = timeit(jax.jit(run_r), frames)
        print(f"C radix-{R} : {ts*1e3:8.2f} ms")


if __name__ == "__main__":
    print("devices:", jax.devices())
    check()
    bench()
