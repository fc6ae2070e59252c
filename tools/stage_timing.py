#!/usr/bin/env python
"""Per-stage train-step accounting on the real TPU.

Times each stage of the speech-first semi-supervised step in isolation at
the exact shapes the full step uses (B=8 paired + B=8 unpaired, 6 s waves):
featurization, ASR encoder (fwd and fwd+bwd), codebook+trim, decoder scan
(fwd and fwd+bwd via the probe path), CBHG postnet, CTC, losses, optimizer.
The stages sum to within measurement noise of the fused step, giving the
ms-table docs/PERFORMANCE.md quotes (VERDICT r2 item 1).

Methodology: chained fori_loop + single scalar readback, best-of-3
(`bench.py` docstring); fwd-only vs fwd+bwd isolates each backward.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g
from semi_tts_tpu.models import vqvae as V
from semi_tts_tpu.models.cbhg import cbhg_apply
from semi_tts_tpu.ops.ctc import ctc_loss
from semi_tts_tpu.ops.quantize import padded_concat, trim_merge_segments
from semi_tts_tpu.train.losses import freq_loss
from semi_tts_tpu.train.optim import make_optimizer
from semi_tts_tpu.train.steps import StepBuilder, Weights

ITERS = 16


def timed(fn, *args, iters=ITERS):
    """Best-of-3 per-iteration seconds for fn(*args) chained on device."""

    @jax.jit
    def chained(*a):
        def body(i, s):
            r = fn(i, *a)
            return s + jnp.asarray(r, jnp.float32).reshape(-1)[0]

        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(chained(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def consume(tree):
    """Touch EVERY leaf of a pytree so XLA cannot dead-code-eliminate any
    per-leaf output (returning only one grad leaf lets the compiler drop the
    rest of the backward — measured: a 'full step' shrank to its forward)."""
    return sum(jnp.asarray(l).reshape(-1)[0].astype(jnp.float32)
               for l in jax.tree_util.tree_leaves(tree))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="paired batch size (unpaired matches; the packed "
                         "ASR/TTS batch is 2x this)")
    args = ap.parse_args()

    cfg, feat, phn_attr, params, state = g._build("full")
    tx, _ = make_optimizer("Adam", 1e-3, "decay")
    builder = StepBuilder(cfg, feat, phn_attr, tx,
                          weights=Weights(1.0, 1.0, 1.0, 10.0, 0, 0),
                          freq_loss_kwargs=dict(sample_rate=22050, n_mels=80,
                                                loss="mse", differential_loss=True,
                                                emphasize_linear_low=True))
    B = args.batch
    waves, wave_len, text, sid = map(jnp.asarray, g._example_batch(B, 6.0, U=32, seed=0))
    u_waves, u_wave_len, u_text, u_sid = map(jnp.asarray, g._example_batch(B, 6.0, U=32, seed=1))
    key = jax.random.PRNGKey(0)
    r = cfg.n_frames_per_step

    res = {}

    # ---- stage 0: featurize both batches (clean + aug) ----
    def f_feat(i, w, wl, uw, uwl, k):
        k = jax.random.fold_in(k, i)
        mel, lin, aug, _, _ = builder._features(k, w + i * 1e-6, wl)
        umel, ulin, uaug, _, _ = builder._features(k, uw + i * 1e-6, uwl)
        return mel[0, 0, 0] + umel[0, 0, 0] + aug[0, 0, 0] + uaug[0, 0, 0]

    res["featurize_2x"] = timed(f_feat, waves, wave_len, u_waves, u_wave_len, key)

    # materialize fixed features for the model stages
    mel, linear, aug, _, _ = builder._features(key, waves, wave_len)
    u_mel, u_linear, u_aug, _, _ = builder._features(key, u_waves, u_wave_len)
    _, all_aug = padded_concat(aug, u_aug)
    decode_steps = max(mel.shape[1], u_mel.shape[1]) // r
    T_all = all_aug.shape[1]

    # ---- ASR encoder + codebook (packed 2B batch) ----
    def f_asr(i, p, st, x, k):
        p_code, q, post, _ = V.speech_to_text(p, st, jax.random.fold_in(k, i), cfg,
                                              phn_attr, x, paired_bs=B, train=True)
        return p_code[0, 0, 0] + q[0, 0, 0] + (post[0, 0, 0] if post is not None else 0.0)

    res["asr_codebook_fwd"] = timed(f_asr, params, state, all_aug, key)

    def f_asr_bwd(i, p, st, x, k):
        def loss(p):
            p_code, q, post, _ = V.speech_to_text(p, st, jax.random.fold_in(k, i),
                                                  cfg, phn_attr, x, paired_bs=B, train=True)
            return jnp.sum(p_code) * 1e-3 + jnp.sum(q) * 1e-3 \
                + (jnp.sum(post) * 1e-3 if post is not None else 0.0)

        l, gr = jax.value_and_grad(loss)(p)
        return l + consume(gr)

    res["asr_codebook_fwdbwd"] = timed(f_asr_bwd, params, state, all_aug, key)

    # ---- trim/merge ----
    p_code_full, q_full, _, _ = V.speech_to_text(params, state, key, cfg, phn_attr,
                                                 all_aug, paired_bs=B, train=True)

    def f_trim(i, pc, q):
        lat, lens, ok = trim_merge_segments(pc[B:] + i * 1e-9, q[B:],
                                            max_frames_per_phn=cfg.max_frames_per_phn)
        return lat[0, 0, 0] + lens[0]

    res["trim_merge"] = timed(f_trim, p_code_full, q_full)

    # ---- decoder (text_to_speech includes text-encoder + decoder scan + CBHG) ----
    pair_lat = V.embed_text(params, cfg, phn_attr, text)
    u_latent, u_lens, _ = trim_merge_segments(p_code_full[B:], q_full[B:],
                                              max_frames_per_phn=cfg.max_frames_per_phn)
    _, all_lat = padded_concat(pair_lat, jax.lax.stop_gradient(u_latent))
    _, all_teacher = padded_concat(mel, u_mel)
    all_sid = jnp.concatenate([sid, u_sid])
    all_lat_len = jnp.concatenate([jnp.sum(text != 0, -1) + 1, u_lens])

    def f_tts(i, p, st, lat, k):
        out = V.text_to_speech(p, st, jax.random.fold_in(k, i), cfg, lat, all_sid,
                               decode_steps=decode_steps, train=True,
                               teacher=all_teacher, tf_rate=0.9,
                               latent_lengths=all_lat_len)
        return out[0][0, 0, 0]

    res["tts_fwd"] = timed(f_tts, params, state, all_lat, key)

    def f_tts_bwd(i, p, st, lat, k):
        probes = builder._probes(decode_steps, 2 * B, mel.dtype)

        def loss(p, probes):
            mel_p, lin_p, align, stop, _, aux = V.text_to_speech(
                p, st, jax.random.fold_in(k, i), cfg, lat, all_sid,
                decode_steps=decode_steps, train=True, teacher=all_teacher,
                tf_rate=0.9, latent_lengths=all_lat_len, wgrad_probes=probes)
            return jnp.sum(mel_p) * 1e-3 + jnp.sum(lin_p) * 1e-3, aux

        (l, aux), (gr, gp) = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(p, probes)
        return l + consume(gr) + consume(gp)

    res["tts_fwdbwd"] = timed(f_tts_bwd, params, state, all_lat, key)

    # ---- CBHG postnet alone (packed batch, mel -> linear) ----
    mel_pred = jnp.zeros((2 * B, decode_steps * r, cfg.n_mels), jnp.float32)

    def f_cbhg(i, p, st, x):
        y, _ = cbhg_apply(p["tts"]["postnet"]["cbhg"], st["tts"]["postnet"],
                          x + i * 1e-6, train=True)
        return y[0, 0, 0]

    res["cbhg_fwd"] = timed(f_cbhg, params, state, mel_pred)

    def f_cbhg_bwd(i, p, st, x):
        def loss(p):
            y, _ = cbhg_apply(p["tts"]["postnet"]["cbhg"], st["tts"]["postnet"],
                              x + i * 1e-6, train=True)
            return jnp.sum(y) * 1e-3

        l, gr = jax.value_and_grad(loss)(p)
        return l + consume(gr)

    res["cbhg_fwdbwd"] = timed(f_cbhg_bwd, params, state, mel_pred)

    # ---- CTC (paired) ----
    T_enc_p = aug.shape[1] // cfg.time_reduce_factor
    probs = jax.nn.softmax(jax.random.normal(key, (B, T_enc_p, 43)))
    tlen = jnp.sum(text != 0, -1)
    lens = jnp.full((B,), T_enc_p, jnp.int32)

    def f_ctc(i, pr):
        return jnp.sum(ctc_loss(jnp.log(pr + 1e-10) + i * 1e-9, text, lens, tlen))

    res["ctc_fwd"] = timed(f_ctc, probs)

    def f_ctc_bwd(i, pr):
        l, gr = jax.value_and_grad(
            lambda z: jnp.sum(ctc_loss(jnp.log(z + 1e-10) + i * 1e-9, text, lens, tlen)))(pr)
        return l + gr[0, 0, 0]

    res["ctc_fwdbwd"] = timed(f_ctc_bwd, probs)

    # ---- freq losses (paired mel+linear + unpaired mel+linear) ----
    floss = builder.floss
    lin_pred = jnp.zeros_like(padded_concat(linear, u_linear)[1])

    def f_loss(i, mp, lp):
        Tp, Tu = mel.shape[1], u_mel.shape[1]
        l = floss(mp[:B, :Tp] + i * 1e-9, mel) + floss(lp[:B, :Tp], linear) \
            + floss(mp[B:, :Tu], u_mel) + floss(lp[B:, :Tu], u_linear)
        return l

    res["freq_losses"] = timed(f_loss, jnp.zeros_like(padded_concat(mel, u_mel)[1]), lin_pred)

    # ---- optimizer ----
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda x: jnp.full_like(x, 1e-4), params)

    def f_opt(i, p, o, gr):
        import optax

        gr = jax.tree_util.tree_map(lambda x: x + i * 1e-9, gr)
        gn = optax.global_norm(gr)
        upd, o2 = tx.update(gr, o, p)
        p2 = optax.apply_updates(p, upd)
        return gn + consume(p2) + consume(o2)

    res["optimizer"] = timed(f_opt, params, opt_state, grads)

    # ---- the fused full step for comparison ----
    step = builder.make_speech_first_step()
    opt_state = tx.init(params)

    def f_full(i, p, st, o):
        p2, st2, o2, mets = step(p, st, o, key, i, 0.9, waves, wave_len, text, sid,
                                 u_waves, u_wave_len, u_text, u_sid)
        return mets["total_loss"] + consume(p2) + consume(o2) + consume(st2)

    res["full_speech_first_step"] = timed(f_full, params, state, opt_state, iters=12)

    out = {k: round(v * 1e3, 2) for k, v in res.items()}
    out["derived"] = {
        "asr_codebook_bwd": round((res["asr_codebook_fwdbwd"] - res["asr_codebook_fwd"]) * 1e3, 2),
        "tts_bwd": round((res["tts_fwdbwd"] - res["tts_fwd"]) * 1e3, 2),
        "cbhg_bwd": round((res["cbhg_fwdbwd"] - res["cbhg_fwd"]) * 1e3, 2),
        "ctc_bwd": round((res["ctc_fwdbwd"] - res["ctc_fwd"]) * 1e3, 2),
        "stage_sum_vs_full": round(
            (res["featurize_2x"] + res["asr_codebook_fwdbwd"] + res["trim_merge"]
             + res["tts_fwdbwd"] + res["ctc_fwdbwd"] + res["freq_losses"]
             + res["optimizer"]) * 1e3, 2),
    }
    out["shapes"] = {"B_packed": 2 * B, "T_frames": int(T_all),
                     "decode_steps": int(decode_steps)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
