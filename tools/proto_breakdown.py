"""Measure the per-stage breakdown of the featurization benchmark on TPU:
clean path, aug path, and sub-stages (pad, framing, DFT, mel, scan unroll)."""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer
from semi_tts_tpu.ops.stft import (dynamic_hann_window, frame_signal,
                                   magnitude_dft, reflect_pad_ragged)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    B, sec, sr = 128, 8.0, 22050
    rng = np.random.RandomState(0)
    S = int(sec * sr)
    waves = jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32))
    lengths = jnp.asarray(rng.randint(int(0.7 * S), S + 1, size=B).astype(np.int32))
    key = jax.random.PRNGKey(0)

    feat = AudioFeaturizer(AudioConfig())
    c = feat.cfg
    T = 1 + S // c.hop_length

    def s(x):  # tiny readback
        return jax.tree_util.tree_map(lambda a: a.reshape(-1)[0], x)

    t_clean = timeit(jax.jit(lambda w, l: s(feat.featurize(w, l))), waves, lengths)
    print(f"clean featurize total : {t_clean*1e3:7.2f} ms")
    t_aug = timeit(jax.jit(lambda w, l, k: s(feat.featurize_augmented(w, l, k))),
                   waves, lengths, key)
    print(f"aug featurize total   : {t_aug*1e3:7.2f} ms")
    print(f"sum                   : {(t_clean+t_aug)*1e3:7.2f} ms")

    # ---- clean sub-stages ----
    pad = c.n_fft // 2

    t = timeit(jax.jit(lambda w, l: s(reflect_pad_ragged(w, l, pad))), waves, lengths)
    print(f"  reflect_pad         : {t*1e3:7.2f} ms")

    xp = reflect_pad_ragged(waves, lengths, pad)
    t = timeit(jax.jit(lambda x: s(frame_signal(x, c.n_fft, c.hop_length, T))), xp)
    print(f"  frame_signal (const hop): {t*1e3:7.2f} ms")

    frames = frame_signal(xp, c.n_fft, c.hop_length, T)
    hp = jax.lax.Precision.HIGH
    t = timeit(jax.jit(lambda f: s(magnitude_dft(f, c.n_fft, hp, 1102))), frames)
    print(f"  windowed DFT (HIGH) : {t*1e3:7.2f} ms")
    t = timeit(jax.jit(lambda f: s(magnitude_dft(f, c.n_fft,
                                                 jax.lax.Precision.DEFAULT, 1102))), frames)
    print(f"  windowed DFT (DEFAULT bf16): {t*1e3:7.2f} ms")

    spec = magnitude_dft(frames, c.n_fft, hp, 1102)
    t = timeit(jax.jit(lambda sp: s(feat._mel_of_spec(sp))), spec)
    print(f"  mel proj            : {t*1e3:7.2f} ms")
    t = timeit(jax.jit(lambda sp: s(feat._finalize(sp))), spec)
    print(f"  finalize(linear)    : {t*1e3:7.2f} ms")

    # ---- aug sub-stages ----
    T_aug = 1 + S // c.min_stretch_hop
    hop_tr = jnp.int32(248)

    def framing_scan(xp, hop, unroll):
        s_last = xp.shape[1] - c.n_fft

        def step(_, t):
            st = jnp.minimum(t * hop, s_last)
            return None, jax.lax.dynamic_slice(xp, (0, st), (B, c.n_fft))

        _, fr = jax.lax.scan(step, None, jnp.arange(T_aug, dtype=jnp.int32),
                             unroll=unroll)
        return fr

    for u in (1, 2, 4, 8):
        t = timeit(jax.jit(lambda x, h, u=u: s(framing_scan(x, h, u))), xp, hop_tr)
        print(f"  aug framing scan u={u}: {t*1e3:7.2f} ms")

    fr_aug = framing_scan(xp, hop_tr, 1)  # (T, B, n)
    t = timeit(jax.jit(lambda f, w: s(magnitude_dft(
        f * dynamic_hann_window(c.n_fft, w), c.n_fft, hp))), fr_aug, jnp.int32(1102))
    print(f"  aug window+DFT (HIGH): {t*1e3:7.2f} ms")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
