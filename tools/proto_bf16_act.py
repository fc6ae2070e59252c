#!/usr/bin/env python
"""Lever probe: bf16 decode-scan activations at the production train batch.

docs/PERFORMANCE.md establishes the decoder scan dominates the train step
and both directions are weight-streaming/activation-traffic bound. This
probe times the TTS stage (text-encoder + decode scan + CBHG) forward and
forward+backward at B=64 paired shapes with

  (a) fp32 activations (current training path), vs
  (b) bf16 activations: memory/teacher/probes cast to bf16, so the decode
      scan's carry, attention, and per-step residuals are all bf16
      (`models/decoder.py` follows ``memory.dtype``); params stay fp32.

If (b) does not win, the negative result gets recorded in PERFORMANCE.md
(the backward's floor is streaming the same ~35 MB of weights again; the
residual reads it would halve are the minority term).

Usage: python tools/proto_bf16_act.py [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g
from semi_tts_tpu.models import vqvae as V
from semi_tts_tpu.models.decoder import wgrad_probes
from semi_tts_tpu.train.optim import make_optimizer
from semi_tts_tpu.train.steps import StepBuilder, Weights


def timed(fn, *args, iters=12):
    @jax.jit
    def chained(n, *a):
        def body(i, s):
            return s + fn(i, *a)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chained(jnp.int32(iters), *args))  # compile+warm
    lo = hi = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(jnp.int32(iters), *args))
        lo = min(lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chained(jnp.int32(4 * iters), *args))
        hi = min(hi, time.perf_counter() - t0)
    return (hi - lo) / (3 * iters)


def consume(tree):
    return sum(jnp.asarray(l).reshape(-1)[0].astype(jnp.float32)
               for l in jax.tree_util.tree_leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    B = args.batch

    cfg, feat, phn_attr, params, state = g._build("full")
    tx, _ = make_optimizer("Adam", 1e-3, "decay")
    builder = StepBuilder(cfg, feat, phn_attr, tx,
                          weights=Weights(1.0, 1.0, 1.0, 10.0, 0, 0),
                          freq_loss_kwargs=dict(sample_rate=22050, n_mels=80,
                                                loss="mse", differential_loss=True,
                                                emphasize_linear_low=True))
    waves, wave_len, text, sid = map(jnp.asarray, g._example_batch(B, 6.0, U=32, seed=0))
    key = jax.random.PRNGKey(0)
    r = cfg.n_frames_per_step

    mel, _, _, _, _ = builder._features(key, waves, wave_len)
    decode_steps = mel.shape[1] // r
    lat = V.embed_text(params, cfg, phn_attr, text)
    lat_len = jnp.sum(text != 0, -1) + 1
    sid_d = jnp.asarray(sid)

    res = {}
    for name, dt in (("fp32", jnp.float32), ("bf16_act", jnp.bfloat16)):
        lat_c, teacher_c = lat.astype(dt), mel.astype(dt)

        def f_fwd(i, p, st, la, te, k):
            out = V.text_to_speech(p, st, jax.random.fold_in(k, i), cfg, la, sid_d,
                                   decode_steps=decode_steps, train=True,
                                   teacher=te, tf_rate=0.9, latent_lengths=lat_len)
            return out[0][0, 0, 0].astype(jnp.float32)

        res[name + "_fwd_ms"] = round(
            timed(f_fwd, params, state, lat_c, teacher_c, key) * 1e3, 2)

        def f_bwd(i, p, st, la, te, k):
            probes = wgrad_probes(cfg.tts.decoder, decode_steps, B, dtype=dt)

            def loss(p, probes):
                mel_p, lin_p, _, _, _, aux = V.text_to_speech(
                    p, st, jax.random.fold_in(k, i), cfg, la, sid_d,
                    decode_steps=decode_steps, train=True, teacher=te,
                    tf_rate=0.9, latent_lengths=lat_len, wgrad_probes=probes)
                return (jnp.sum(mel_p.astype(jnp.float32)) * 1e-3
                        + jnp.sum(lin_p.astype(jnp.float32)) * 1e-3), aux

            (l, aux), (gr, gp) = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True)(p, probes)
            return l + consume(gr) + consume(gp)

        res[name + "_fwdbwd_ms"] = round(
            timed(f_bwd, params, state, lat_c, teacher_c, key) * 1e3, 2)

        # numeric drift of the bf16 forward vs fp32 (prenet coins pinned by key)
        if dt == jnp.bfloat16:
            m32 = V.text_to_speech(params, state, key, cfg, lat, sid_d,
                                   decode_steps=decode_steps, train=True,
                                   teacher=mel, tf_rate=1.0, latent_lengths=lat_len)[0]
            m16 = V.text_to_speech(params, state, key, cfg, lat_c, sid_d,
                                   decode_steps=decode_steps, train=True,
                                   teacher=teacher_c, tf_rate=1.0,
                                   latent_lengths=lat_len)[0]
            res["mel_abs_dev_mean"] = round(float(jnp.mean(jnp.abs(
                m16.astype(jnp.float32) - m32))), 5)
            res["mel_abs_dev_max"] = round(float(jnp.max(jnp.abs(
                m16.astype(jnp.float32) - m32))), 5)

    res["shapes"] = {"B": B, "decode_steps": int(decode_steps)}
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
