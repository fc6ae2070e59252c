#!/usr/bin/env python
"""Does rematerializing the decode-scan body shrink the decoder backward?

Stage timing (docs/PERFORMANCE.md r3 table) puts the decoder backward at
~17.4 ms vs a ~14 ms two-pass weight-streaming floor; part of the excess is
residual traffic (per-step intermediates saved in fwd, re-read in bwd).
`decoder_apply(remat=True)` wraps the scan body in jax.checkpoint: only the
carry is saved and the backward re-runs each step's forward — trading
residual HBM reads for a second weight-streaming pass. On a memory-bound
program this can go either way: measure.

Usage: python tools/proto_remat.py
"""

from __future__ import annotations

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
from semi_tts_tpu.models import decoder as D
from semi_tts_tpu.models import vqvae as V
from semi_tts_tpu.models.encoder import encoder_apply

ITERS = 12


def timed(fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, s):
            return s + fn(i, *a)

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    float(chained(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def consume(tree):
    return sum(jnp.asarray(l).reshape(-1)[0].astype(jnp.float32)
               for l in jax.tree_util.tree_leaves(tree))


def main():
    cfg, feat, phn_attr, params, state = g._build("full")
    B = 16
    waves, wave_len, text, sid = map(jnp.asarray, g._example_batch(B, 6.0, U=32, seed=0))
    key = jax.random.PRNGKey(0)
    mel, lin, flen = feat.featurize(waves, wave_len)
    r = cfg.n_frames_per_step
    pad = (-mel.shape[1]) % r
    teacher = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)))
    decode_steps = teacher.shape[1] // r
    lat = V.embed_text(params, cfg, phn_attr, text)
    spkr = params["spkr_embed"][sid]
    memory, _ = encoder_apply(params["tts"]["encoder"], state["tts"]["encoder"],
                              key, lat, dropout_rate=cfg.tts.enc_dropout, train=True)
    dcfg = cfg.tts.decoder

    def make(remat):
        def f(i, p, mem, tch, k):
            probes = D.wgrad_probes(dcfg, decode_steps, B, jnp.float32)

            def loss(p, probes):
                mel_p, align, stop, aux = D.decoder_apply(
                    p, jax.random.fold_in(k, i), mem, spkr, cfg=dcfg,
                    decode_steps=decode_steps, train=True, teacher=tch,
                    tf_rate=0.9, wgrad_probes=probes, remat=remat)
                return jnp.sum(mel_p) * 1e-3 + jnp.sum(stop) * 1e-4, aux

            (l, aux), (gr, gp) = jax.value_and_grad(loss, argnums=(0, 1),
                                                    has_aux=True)(p, probes)
            return l + consume(gr) + consume(gp)

        return f

    res = {}
    for name, remat in [("base", False), ("remat_body", True)]:
        res[name + "_ms"] = round(timed(make(remat), params["tts"]["decoder"],
                                        memory, teacher, key) * 1e3, 2)
        # equality gate: remat must not change gradients
    g0 = jax.jit(lambda p: jax.grad(lambda p: jnp.sum(D.decoder_apply(
        p, key, memory, spkr, cfg=dcfg, decode_steps=decode_steps, train=True,
        teacher=teacher, tf_rate=0.9, remat=False)[0]))(p))(params["tts"]["decoder"])
    g1 = jax.jit(lambda p: jax.grad(lambda p: jnp.sum(D.decoder_apply(
        p, key, memory, spkr, cfg=dcfg, decode_steps=decode_steps, train=True,
        teacher=teacher, tf_rate=0.9, remat=True)[0]))(p))(params["tts"]["decoder"])
    dev = max(float(jnp.max(jnp.abs(a - b)))
              for a, b in zip(jax.tree_util.tree_leaves(g0),
                              jax.tree_util.tree_leaves(g1)))
    res["grad_max_dev"] = dev
    print(json.dumps(res))


if __name__ == "__main__":
    main()
