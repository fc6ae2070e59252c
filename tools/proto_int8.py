#!/usr/bin/env python
"""Measure the int8 weight-streaming serving decode vs the bf16 path.

The AR decode loop re-reads ~35 MB of bf16-converted weights per step
(docs/PERFORMANCE.md); `ops/qmatmul.py` streams the two LSTM cells + frame
projection as int8 with in-VMEM dequantize, ~halving those bytes. This
proto times the full-size Tacotron2 serving decode both ways (chained
fori_loop, best-of-3) at several batch sizes and reports the mel deviation
int8-vs-bf16 on the [0,1] normalized scale (the quality gate).

Usage: python tools/proto_int8.py [--batches 64,256,512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g
from semi_tts_tpu.models import vqvae as V
from semi_tts_tpu.ops.qmatmul import quantize_decoder


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,256,512")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--decode-steps", type=int, default=200)
    args = ap.parse_args()

    cfg, feat, phn_attr, params, state = g._build("full")
    qw = quantize_decoder(params["tts"]["decoder"])
    U, steps, r = 32, args.decode_steps, cfg.n_frames_per_step
    out = {}
    for B in (int(b) for b in args.batches.split(",")):
        rng = np.random.RandomState(0)
        text = np.zeros((B, U), np.int32)
        text[:, : U - 2] = rng.randint(3, 43, size=(B, U - 2))
        text = jnp.asarray(text)
        sid = jnp.asarray(rng.randint(0, 109, size=B).astype(np.int32))

        def infer(params, state, text, sid, key, qweights):
            lat = V.embed_text(params, cfg, phn_attr, text)
            mel, lin, align, stop, _ = V.text_to_speech(
                params, state, key, cfg, lat, sid, decode_steps=steps,
                train=False, teacher=None, tf_rate=0.0, qweights=qweights)
            return mel

        def bench(qweights):
            @jax.jit
            def chained(params, state, text, sid, key):
                def body(i, s):
                    mel = infer(params, state, text, sid,
                                jax.random.fold_in(key, i), qweights)
                    return s + mel[0, 0, 0]
                return jax.lax.fori_loop(0, args.iters, body, 0.0)

            key = jax.random.PRNGKey(0)
            float(chained(params, state, text, sid, key))  # compile+warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(params, state, text, sid, key))
                best = min(best, time.perf_counter() - t0)
            return best / args.iters

        dt_f = bench(None)
        dt_q = bench(qw)
        frames = B * steps * r
        out[f"B{B}"] = {
            "bf16_ms": round(dt_f * 1e3, 2),
            "int8_ms": round(dt_q * 1e3, 2),
            "bf16_frames_per_sec": round(frames / dt_f, 0),
            "int8_frames_per_sec": round(frames / dt_q, 0),
            "speedup": round(dt_f / dt_q, 3),
        }
        if B == 64:  # quality gate once
            key = jax.random.PRNGKey(7)
            mel_f = jax.jit(lambda p, s, t, i, k: infer(p, s, t, i, k, None))(
                params, state, text, sid, key)
            mel_q = jax.jit(lambda p, s, t, i, k: infer(p, s, t, i, k, qw))(
                params, state, text, sid, key)
            dev = jnp.abs(mel_q - mel_f)
            out["mel_dev_mean"] = round(float(jnp.mean(dev)), 5)
            out["mel_dev_max"] = round(float(jnp.max(dev)), 5)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
