"""Measure dft_precision='bf16x2' vs 'high' (bf16x3) vs 'highest' (fp32):
max |error| of clean mel/linear (normalized units; x100 = dB) and chained
featurize+augment wall time per batch. Run on the real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer

B, sec, sr = 128, 8.0, 22050
rng = np.random.RandomState(0)
S = int(sec * sr)
waves = jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32))
lengths = jnp.asarray(rng.randint(int(0.7 * S), S + 1, size=B).astype(np.int32))
key = jax.random.PRNGKey(0)

feats = {p: AudioFeaturizer(AudioConfig(dft_precision=p))
         for p in ("highest", "high", "bf16x2")}

ref_mel, ref_lin, _ = feats["highest"].featurize(waves, lengths)
ref_aug, _ = feats["highest"].featurize_augmented(waves, lengths, key)
for p in ("high", "bf16x2"):
    mel, lin, _ = feats[p].featurize(waves, lengths)
    aug, _ = feats[p].featurize_augmented(waves, lengths, key)
    print(f"{p:8s} max|dmel|={float(jnp.max(jnp.abs(mel - ref_mel))):.3e} "
          f"max|dlin|={float(jnp.max(jnp.abs(lin - ref_lin))):.3e} "
          f"max|daug|={float(jnp.max(jnp.abs(aug - ref_aug))):.3e} "
          f"(x100 = dB)")

iters = 10
for p in ("high", "bf16x2"):
    feat = feats[p]

    @jax.jit
    def chained(w, l, k):
        def body(i, carry):
            s, kk = carry
            m, lin, fl = feat.featurize(w + i * 1e-6, l)
            a, al = feat.featurize_augmented(w + i * 1e-6, l, jax.random.fold_in(kk, i))
            return (s + m[0, 0, 0] + lin[0, 0, 0] + a[0, 0, 0], kk)
        s, _ = jax.lax.fori_loop(0, iters, body, (0.0, k))
        return s

    float(chained(waves, lengths, key))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(waves, lengths, key))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{p:8s} featurize+aug batch: {best * 1e3:.2f} ms")
