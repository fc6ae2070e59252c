"""Prototype two featurizer levers against the current fast paths:

A) clean path: spectrogram as ONE strided `lax.conv_general_dilated`
   (stride=hop, filters = windowed support-sliced DFT rows) — skips
   materializing the (B, T, span) frames tensor (~363 MB write + read).
B) aug path: fold the *traced* window into the DFT matrices
   (frames @ (window*C)) instead of windowing the frames
   ((frames*window) @ C) — replaces a 363 MB elementwise pass with a
   ~10 MB one over the matrices.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer
from semi_tts_tpu.ops.stft import (_support_dft_matrices, dynamic_hann_window,
                                   frame_signal, reflect_pad_ragged,
                                   stft_magnitude, window_support)

B, sec, sr = 128, 8.0, 22050
rng = np.random.RandomState(0)
S = int(sec * sr)
waves = jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32))
lengths = jnp.asarray(rng.randint(int(0.7 * S), S + 1, size=B).astype(np.int32))

cfg = AudioConfig()
n_fft, hop, win = cfg.n_fft, cfg.hop_length, cfg.win_length
T = 1 + S // hop
off, span = window_support(n_fft, win)
HP = jax.lax.Precision.HIGH


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def s(x):
    return x.reshape(-1)[0]


# ---------------- A: conv clean path ----------------
C, Sm = _support_dft_matrices(n_fft, win, (off, span))  # (span, F) each
W = np.concatenate([C, Sm], axis=1)[:, None, :]  # (span, 1, 2F) WIO... wait
W = np.ascontiguousarray(np.concatenate([C, Sm], axis=1))[:, None, :]
Wj = jnp.asarray(W)
F = C.shape[1]


def spec_conv(x, l):
    xp = reflect_pad_ragged(x, l, n_fft // 2)
    need = off + (T - 1) * hop + span
    if xp.shape[1] < need:
        xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1])))
    xin = xp[:, off : off + (T - 1) * hop + span, None]  # (B, W, 1)
    out = jax.lax.conv_general_dilated(
        xin, Wj, window_strides=(hop,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), precision=HP)  # (B, T, 2F)
    re, im = out[..., :F], out[..., F:]
    return jnp.sqrt(re * re + im * im)


def spec_now(x, l):
    fl = 1 + l // hop
    return stft_magnitude(x, l, n_fft=n_fft, hop=hop, win_length=win,
                          num_frames=T, frame_lengths=None, precision=HP)


a = jax.jit(spec_conv)(waves, lengths)
b = jax.jit(spec_now)(waves, lengths)
print("A max|conv-now|:", float(jnp.max(jnp.abs(a - b))),
      " rel:", float(jnp.max(jnp.abs(a - b)) / jnp.max(b)))
t_conv = timeit(jax.jit(lambda x, l: s(spec_conv(x, l))), waves, lengths)
t_now = timeit(jax.jit(lambda x, l: s(spec_now(x, l))), waves, lengths)
print(f"A spec conv : {t_conv*1e3:7.2f} ms   current: {t_now*1e3:7.2f} ms")

# ---------------- B: aug window fold ----------------
feat = AudioFeaturizer(cfg)
aoff, aspan = window_support(n_fft, cfg.max_stretch_win)
Ca, Sa = _support_dft_matrices(n_fft, None, (aoff, aspan))
Caj, Saj = jnp.asarray(Ca), jnp.asarray(Sa)
xp = reflect_pad_ragged(waves, lengths, n_fft // 2)
T_aug = 1 + S // cfg.min_stretch_hop
hop_tr = jnp.int32(260)
win_tr = jnp.int32(1150)
s_last = xp.shape[1] - n_fft


def framing(xp, hop):
    def step(_, t):
        st = jnp.minimum(t * hop, s_last) + aoff
        return None, jax.lax.dynamic_slice(xp, (0, st), (B, aspan))
    _, fr = jax.lax.scan(step, None, jnp.arange(T_aug, dtype=jnp.int32), unroll=8)
    return fr


frames = framing(xp, hop_tr)  # (T, B, aspan)


def aug_now(fr, w):
    window = dynamic_hann_window(n_fft, w)[aoff : aoff + aspan]
    fw = fr * window
    re = jnp.einsum("...n,nf->...f", fw, Caj, precision=HP)
    im = jnp.einsum("...n,nf->...f", fw, Saj, precision=HP)
    return jnp.sqrt(re * re + im * im)


def aug_fold(fr, w):
    window = dynamic_hann_window(n_fft, w)[aoff : aoff + aspan]
    Cw = window[:, None] * Caj
    Sw = window[:, None] * Saj
    re = jnp.einsum("...n,nf->...f", fr, Cw, precision=HP)
    im = jnp.einsum("...n,nf->...f", fr, Sw, precision=HP)
    return jnp.sqrt(re * re + im * im)


a = jax.jit(aug_now)(frames, win_tr)
b = jax.jit(aug_fold)(frames, win_tr)
print("B max|fold-now|:", float(jnp.max(jnp.abs(a - b))),
      " rel:", float(jnp.max(jnp.abs(a - b)) / jnp.max(a)))
t_a = timeit(jax.jit(lambda f, w: s(aug_now(f, w))), frames, win_tr)
t_b = timeit(jax.jit(lambda f, w: s(aug_fold(f, w))), frames, win_tr)
print(f"B aug window+DFT now: {t_a*1e3:7.2f} ms   fold-into-matrix: {t_b*1e3:7.2f} ms")

# ---------------- C: conv for the aug path too? stride is traced -> no. ----
# But the aug DFT could ALSO take bf16 frames... not pursued (see
# PERFORMANCE.md bf16x2 negative result).
