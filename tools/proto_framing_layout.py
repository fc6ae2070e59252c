"""Aug-path framing layout probe: scan-of-dynamic_slice over (B, S) rows
(current, slices are 128 strided 4.8 KB row-chunks) vs over a transposed
(S, B) buffer (each slice is one contiguous span*B block), including the
downstream windowed DFT so layout costs/benefits reach the dot."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer
from semi_tts_tpu.ops.stft import (dynamic_hann_window, magnitude_dft,
                                   reflect_pad_ragged, window_support)

cfg = AudioConfig()
feat = AudioFeaturizer(cfg)
B, sec, sr = 128, 8.0, 22050
rng = np.random.RandomState(0)
S = int(sec * sr)
waves = jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32))
lengths = jnp.asarray(rng.randint(int(0.7 * S), S + 1, size=B).astype(np.int32))
key = jax.random.PRNGKey(0)
iters = 10
c = cfg
n_fft = c.n_fft
T_max = 1 + S // c.min_stretch_hop
off, span = window_support(n_fft, c.max_stretch_win)
HP = jax.lax.Precision.HIGH


def make(variant):
    def aug_mel(w, l, k):
        hop = jnp.int32(260)
        win = jnp.int32(1150)
        xp = reflect_pad_ragged(w, l, n_fft // 2)
        s_last = xp.shape[1] - n_fft
        window = dynamic_hann_window(n_fft, win)[off : off + span]
        if variant == "rows":
            def step(_, t):
                st = jnp.minimum(t * hop, s_last) + off
                return None, lax.dynamic_slice(xp, (0, st), (B, span))
            _, frames = lax.scan(step, None, jnp.arange(T_max, dtype=jnp.int32), unroll=8)
            spec = magnitude_dft(frames * window, n_fft, precision=HP,
                                 support=(off, span))  # (T, B, F)
            mel = feat._finalize(feat._mel_of_spec(spec))
            return mel
        else:  # transposed
            xpt = xp.T  # (S_pad, B)
            def step(_, t):
                st = jnp.minimum(t * hop, s_last) + off
                return None, lax.dynamic_slice(xpt, (st, 0), (span, B))
            _, frames = lax.scan(step, None, jnp.arange(T_max, dtype=jnp.int32), unroll=8)
            # frames: (T, span, B); window over span axis
            fw = frames * window[None, :, None]
            re = jnp.einsum("tnb,nf->tbf", fw, feat_mats[0], precision=HP)
            im = jnp.einsum("tnb,nf->tbf", fw, feat_mats[1], precision=HP)
            spec = jnp.sqrt(re * re + im * im)
            mel = feat._finalize(feat._mel_of_spec(spec))
            return mel

    @jax.jit
    def chained(w, l, k):
        def body(i, s):
            m = aug_mel(w + i * 1e-6, l, jax.random.fold_in(k, i))
            return s + m.reshape(-1)[0]
        return lax.fori_loop(0, iters, body, 0.0)

    float(chained(waves, lengths, key))
    return chained


from semi_tts_tpu.ops.stft import _support_dft_matrices
feat_mats = tuple(jnp.asarray(m) for m in _support_dft_matrices(n_fft, None, (off, span)))

progs = {v: make(v) for v in ("rows", "transposed")}
times = {v: [] for v in progs}
for _ in range(4):
    for v, p in progs.items():
        t0 = time.perf_counter()
        float(p(waves, lengths, key))
        times[v].append((time.perf_counter() - t0) / iters * 1e3)
for v, ts in times.items():
    print(v, [f"{t:.2f}" for t in ts], f"best {min(ts):.2f} ms")
