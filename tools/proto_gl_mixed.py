"""Mixed-precision Griffin-Lim probe: run the 30 phase-refinement iterations
with 1-pass bf16 dots (DEFAULT) and only the final synthesis at HIGH
(bf16x3), vs all-HIGH. GL is an iterative projection — intermediate phase
estimates only need enough accuracy to keep converging; quality is judged
by the repo's own GL round-trip metrics on the speech fixture."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer
from semi_tts_tpu.ops.griffin_lim import griffin_lim
from semi_tts_tpu.ops.stft import istft_reim, stft_reim

cfg = AudioConfig()
feat = AudioFeaturizer(cfg)
N_ITER = 30
HI = jax.lax.Precision.HIGH
LO = jax.lax.Precision.DEFAULT


def gl_mixed(magnitude, rng, lo=LO, hi=HI):
    magnitude = jnp.abs(magnitude)
    phases = jax.random.uniform(rng, magnitude.shape, minval=-jnp.pi, maxval=jnp.pi)
    kw = dict(n_fft=cfg.n_fft, hop=cfg.hop_length, win_length=cfg.win_length)

    def body(x, prec):
        re, im = stft_reim(x, precision=prec, **kw)
        r = jnp.sqrt(re * re + im * im)
        scale = magnitude / jnp.where(r > 0, r, 1.0)
        y_re = jnp.where(r > 0, re * scale, magnitude)
        y_im = jnp.where(r > 0, im * scale, 0.0)
        return y_re, y_im

    x = istft_reim(magnitude * jnp.cos(phases), magnitude * jnp.sin(phases),
                   precision=lo, **kw)
    x = lax.fori_loop(0, N_ITER - 1,
                      lambda _, x: istft_reim(*body(x, lo), precision=lo, **kw), x)
    return istft_reim(*body(x, hi), precision=hi, **kw)


# ---- quality on the speech fixture (test_speech_griffin_lim_roundtrip) ----
from helpers import synthesize_speech

wave = synthesize_speech(2.0, seed=11, f0=120.0)
L = wave.shape[0]
waves = np.zeros((1, L), np.float32)
waves[0] = wave
mel, _, flen = feat.featurize(jnp.asarray(waves), jnp.asarray([L]))
amp = feat.mel_to_linear_amp(mel)
key = jax.random.PRNGKey(3)


def roundtrip_metrics(wav2):
    wav2 = np.asarray(jnp.clip(wav2, -1.0, 1.0))
    n = wav2.shape[1]
    waves2 = np.zeros((1, L), np.float32)
    waves2[0, : min(n, L)] = wav2[0, :L]
    mel2, _, _ = feat.featurize(jnp.asarray(waves2), jnp.asarray([min(n, L)]))
    T = int(np.asarray(flen)[0]) - 2
    a, b = np.asarray(mel)[0, :T], np.asarray(mel2)[0, :T]
    corr = np.corrcoef(a.mean(-1), b.mean(-1))[0, 1]
    e = a.mean(-1)
    hi_m = e > 0.5 * e.max()
    err_db = 100.0 * np.abs(a[hi_m] - b[hi_m]).mean()
    return corr, err_db


from semi_tts_tpu.ops.features import inv_preemphasis

w_hi = inv_preemphasis(griffin_lim(amp, key, n_fft=cfg.n_fft, hop=cfg.hop_length,
                                   win_length=cfg.win_length), 0.97)
w_mx = inv_preemphasis(jax.jit(gl_mixed)(amp, key), 0.97)
print("all-HIGH  corr/err_db:", roundtrip_metrics(w_hi))
print("mixed     corr/err_db:", roundtrip_metrics(w_mx))
print("waveform rel dev mixed vs HIGH:",
      float(jnp.linalg.norm(w_mx - w_hi) / jnp.linalg.norm(w_hi)))

# ---- speed, bench geometry ----
B, T = 16, 600
rng_np = np.random.RandomState(0)
melb = jnp.asarray(rng_np.uniform(0.0, 0.8, size=(B, T, 80)).astype(np.float32))
ampb = feat.mel_to_linear_amp(melb)
iters = 16


def make(fn):
    @jax.jit
    def chained(amp, key):
        def body(i, s):
            w = fn(amp + i * 1e-9, jax.random.fold_in(key, i))
            return s + w[0, 0]
        return lax.fori_loop(0, iters, body, 0.0)
    float(chained(ampb, key))
    return chained


progs = {
    "all_high": make(lambda a, k: griffin_lim(a, k, n_fft=cfg.n_fft,
                                              hop=cfg.hop_length,
                                              win_length=cfg.win_length)),
    "mixed": make(gl_mixed),
}
times = {n: [] for n in progs}
for _ in range(4):
    for n, p in progs.items():
        t0 = time.perf_counter()
        float(p(ampb, key))
        times[n].append((time.perf_counter() - t0) / iters * 1e3)
for n, ts in times.items():
    print(n, [f"{t:.1f}" for t in ts], f"best {min(ts):.1f} ms/batch")
