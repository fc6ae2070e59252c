"""Prototype: scatter-free reflect_pad_ragged (doubled-row trick), conv-fused
framing+DFT, and bf16 accuracy of the augmented mel path."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer
from semi_tts_tpu.ops.stft import reflect_pad_ragged


def reflect_pad_v2(x, lengths, pad):
    """Same contract as reflect_pad_ragged, no scatter: the right mirror is a
    flip + per-row shift realized as one contiguous dynamic_slice per row out
    of a doubled flipped row."""
    B, S = x.shape
    L = lengths.astype(jnp.int32)
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    xm = jnp.where(pos < L[:, None], x, 0.0)
    left = xm[:, 1 : pad + 1][:, ::-1]

    xq = jnp.concatenate([xm, jnp.zeros((B, pad), x.dtype)], axis=1)  # (B, S+pad)
    xr = xm[:, ::-1]                        # xr[b, j] = xm[b, S-1-j]
    d = jnp.concatenate([xr, xr], axis=1)   # doubled for negative shifts

    # mirror m[b, q] = xm[b, 2L-2-q] = d[b, q + 2S+1-2L]
    def row(drow, l):
        return jax.lax.dynamic_slice(drow, (2 * S + 1 - 2 * l,), (S + pad,))

    m = jax.vmap(row)(d, L)
    q = jnp.arange(S + pad, dtype=jnp.int32)[None, :]
    v = jnp.where(q < L[:, None], xq, m)
    return jnp.concatenate([left, v], axis=1)


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
    pad = 1024

    a = np.asarray(reflect_pad_ragged(waves, lengths, pad))
    b = np.asarray(jax.jit(lambda w, l: reflect_pad_v2(w, l, pad))(waves, lengths))
    # only positions < L + 2*pad are consumed by valid frames
    Ln = np.asarray(lengths)
    ok = True
    for i in range(B):
        upto = Ln[i] + 2 * pad
        ok &= np.array_equal(a[i, :upto], b[i, :upto])
    print("reflect_pad_v2 exact on consumed region:", bool(ok))

    def s(x):
        return jax.tree_util.tree_map(lambda a: a.reshape(-1)[0], x)

    t = timeit(jax.jit(lambda w, l: s(reflect_pad_ragged(w, l, pad))), waves, lengths)
    print(f"reflect_pad v1: {t*1e3:7.2f} ms")
    t = timeit(jax.jit(lambda w, l: s(reflect_pad_v2(w, l, pad))), waves, lengths)
    print(f"reflect_pad v2: {t*1e3:7.2f} ms")

    # ---- conv-fused framing + windowed DFT (clean path) ----
    from semi_tts_tpu.ops.stft import _windowed_dft_matrices, frame_signal, magnitude_dft

    C, Sm = _windowed_dft_matrices(2048, 1102)
    kern = jnp.asarray(np.concatenate([C, Sm], axis=1).T[:, None, :])  # (2052, 1, 2048)
    xp = reflect_pad_v2(waves, lengths, pad)
    T = 1 + S // 275

    def conv_dft(xp):
        y = jax.lax.conv_general_dilated(
            xp[:, None, :], kern, window_strides=(275,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGH)  # (B, 2052, T')
        y = y[:, :, :T]
        re, im = y[:, :1025], y[:, 1025:2050]
        return jnp.sqrt(re * re + im * im)

    def slice_dft(xp):
        fr = frame_signal(xp, 2048, 275, T)
        return magnitude_dft(fr, 2048, jax.lax.Precision.HIGH, fold_window=1102)

    r1 = np.asarray(jax.jit(conv_dft)(xp))
    r2 = np.asarray(jax.jit(slice_dft)(xp))
    print("conv vs slice max abs diff:", float(np.max(np.abs(np.swapaxes(r1, 1, 2) - r2))))
    t = timeit(jax.jit(lambda x: s(conv_dft(x))), xp)
    print(f"conv framing+DFT : {t*1e3:7.2f} ms")
    t = timeit(jax.jit(lambda x: s(slice_dft(x))), xp)
    print(f"slice framing+DFT: {t*1e3:7.2f} ms")

    # ---- aug-path bf16 accuracy on a speech-like signal ----
    t_ax = np.arange(S) / sr
    f0 = 140.0
    speech = sum(0.5 / k * np.sin(2 * np.pi * k * f0 * t_ax * (1 + 0.02 * np.sin(2 * np.pi * 3 * t_ax)))
                 for k in range(1, 30))
    env = (np.sin(2 * np.pi * 2.5 * t_ax) > -0.3).astype(np.float64)
    speech = (speech * env * 0.2).astype(np.float32)
    sw = jnp.asarray(np.tile(speech[None], (8, 1)))
    sl = jnp.asarray(np.full(8, S, np.int32))
    key = jax.random.PRNGKey(1)

    from semi_tts_tpu.utils.metrics import mcd

    snrs = jax.random.uniform(jax.random.PRNGKey(2), (8,), minval=10.0, maxval=100.0)
    for prec_name in ("HIGHEST", "HIGH", "DEFAULT"):
        import semi_tts_tpu.ops.stft as stft_mod

        feat = AudioFeaturizer(AudioConfig())
        # monkeypatch the aug DFT precision by calling _augment_impl with a
        # tweaked magnitude_dft? simpler: temporarily swap Precision.HIGH
        orig = stft_mod.magnitude_dft

        def patched(frames, n_fft, precision=jax.lax.Precision.HIGHEST, fold_window=None,
                    _p=getattr(jax.lax.Precision, prec_name)):
            return orig(frames, n_fft, precision=_p, fold_window=fold_window)

        import semi_tts_tpu.ops.features as feats_mod

        feats_mod.magnitude_dft = patched
        aug, al = jax.jit(feat._augment_impl)(sw, sl, snrs, jnp.float32(1.03), key)
        feats_mod.magnitude_dft = orig
        aug = np.asarray(aug)[0, : int(np.asarray(al)[0])]
        if prec_name == "HIGHEST":
            ref_aug = aug
        else:
            print(f"aug mel {prec_name} vs HIGHEST: mcd={mcd(aug, ref_aug):.4f} dB, "
                  f"maxabs={np.max(np.abs(aug - ref_aug)):.5f} (norm units)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
