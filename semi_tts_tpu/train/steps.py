"""Jitted train/eval step builders for the semi-supervised VQVAE trainer.

Parity target: the hot loop of `/root/reference/bin/train_vqvae.py:111-330`:
  * EVEN steps — speech-first cycle: ``speech_to_text(aug_mel, unpair_aug_mel)``
    -> trim/merge -> ``text_to_speech`` with pair text + unpair latents
    (`:137-185`); unpaired speech reconstruction loss (`:227-233`); the
    all-blank "ignore_speech_cycle" escape (`:162-171`).
  * ODD steps — text-first cycle: ``text_to_speech`` with unpaired text,
    detach the fake mel (`:201`), ``speech_to_text(..., using_fake_mel)``
    (`:186-205`); unpaired-text CTC loss with NaN-zeroing (`:236-248`).
  * Paired CTC loss ``(p+1e-10).log()`` fed to CTC with full input lengths by
    default, ``--actual-len`` variant (`:430-444`); paired mel+linear
    freq_loss (`:220-223`); grad-clip 5.0 + NaN-step skip (`src/solver.py:138-151`).

TPU-first structure: each cycle is ONE fused jit program — on-device
featurization (clean + augmented), ASR, quantizer, trim/merge, decoder scan,
losses, grads, optax update. The reference's per-batch DataLoader feature
extraction, Python decode loop, and host-side mean_forward all disappear
into the same XLA computation. The all-blank escape becomes a multiplicative
gate on the unpaired loss (the packed TTS batch still runs; its gradients are
exactly zero when gated) rather than a shape-changing Python branch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import vqvae as V
from ..ops.ctc import ctc_loss
from ..ops.quantize import padded_concat, trim_merge_segments
from .losses import freq_loss

EPS = 1e-10  # (`bin/train_vqvae.py:18`)
SPEC_PAD_VALUE = 0.0


class Weights(NamedTuple):
    asr: float = 1.0
    tts: float = 1.0
    unpair_text: float = 0.0
    unpair_speech: float = 0.0
    unpair_text_start: int = 0
    unpair_speech_start: int = 0


def round_up(x, r):
    """Round ``x`` up to the next multiple of ``r`` (works for python ints and
    traced int arrays). The reference's ``x += x % r`` idiom
    (`src/vqvae.py:156-159`) is NOT a round-up when ``r ∤ 2x`` — see
    docs/PARITY.md adaptations."""
    return x + (-x) % r


def _pad_frames(x, r):
    """Pad time to a multiple of r with at least one extra frame
    (`bin/train_vqvae.py:43-46`)."""
    T = x.shape[1]
    pad = r - (T % r)
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0)), constant_values=SPEC_PAD_VALUE)


class StepBuilder:
    """Builds the jitted step functions. Everything captured here is static:
    model/audio config, loss weights, optax transformation."""

    def __init__(self, cfg: V.VQVAEConfig, feat, phn_attr, tx, *, weights: Weights,
                 freq_loss_kwargs: dict, actual_len: bool = False, mesh=None):
        self.cfg = cfg
        self.feat = feat
        self.phn_attr = phn_attr
        self.tx = tx
        self.w = weights
        self.floss = partial(freq_loss, **freq_loss_kwargs)
        self.actual_len = actual_len
        self.r = cfg.n_frames_per_step
        self.mesh = mesh  # optional ('data','model') mesh: in-step constraints

    def _c(self, x):
        """Pin the batch axis of a big activation to the 'data' mesh axis at
        module boundaries so XLA keeps the DP layout through the step (no-op
        without a mesh)."""
        if self.mesh is None or x is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(*(("data",) + (None,) * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(self.mesh, spec))

    # ---------------- shared pieces ----------------

    def _features(self, rng, waves, wave_len, *, need_aug=True):
        waves = self._c(waves)
        mel, linear, flen = self.feat.featurize(waves, wave_len)
        mel = self._c(_pad_frames(mel, self.r))
        linear = self._c(_pad_frames(linear, self.r))
        if not need_aug:
            return mel, linear, None, flen, None
        aug, aug_flen = self.feat.featurize_augmented(waves, wave_len, rng)
        return mel, linear, self._c(aug), flen, aug_flen

    def _enc_len(self, flen, t_enc):
        """True (non-pad) ASR-encoder output length for per-item frame counts
        ``flen`` — used to trim bucket-pad junk out of PER scoring. The
        reference pads only to the batch max so it scores pad frames too
        (`src/util.py:169-181`); our static buckets pad much further, so the
        trim keeps dev PER comparable."""
        up = -(-flen.astype(jnp.int32) // self.cfg.time_reduce_factor)  # ceil
        return jnp.minimum(up, t_enc)

    def _ctc_lengths(self, model_input, p_code):
        """Full-length input lens by default; --actual-len uses non-pad frames
        (`bin/train_vqvae.py:436-443`)."""
        B, T_enc = p_code.shape[0], p_code.shape[1]
        if not self.actual_len:
            return jnp.full((B,), T_enc, jnp.int32)
        nonpad = jnp.sum(
            (jnp.sum((model_input == SPEC_PAD_VALUE).astype(jnp.int32), axis=-1)
             != model_input.shape[-1]).astype(jnp.int32), axis=-1)
        return nonpad // self.cfg.time_reduce_factor

    def _paired_ctc(self, model_input, probs, text, *, apply_log=True):
        ctc_in = jnp.log(probs + EPS) if apply_log else probs
        lens = self._ctc_lengths(model_input, probs)
        tlen = jnp.sum(text != 0, axis=-1)
        return ctc_loss(ctc_in, text, lens, tlen)

    def _apply_updates(self, params, opt_state, grads):
        grad_norm = optax.global_norm(grads)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, grad_norm

    # -------- batched decoder weight grads (see decoder.decoder_apply) --------

    def _probes(self, decode_steps, B_all, dtype=jnp.float32):
        from ..models.decoder import wgrad_probes

        return wgrad_probes(self.cfg.tts.decoder, decode_steps, B_all, dtype)

    def _merge_wgrads(self, grads, aux, probe_grads):
        from ..models.decoder import merge_wgrads

        merge_wgrads(grads["tts"]["decoder"], aux, probe_grads)
        return grads

    def _losses_paired(self, params, state, rngs, mel, linear, aug_mel, text, sid,
                       tf_rate, wgrad_probes=None):
        """Paired-only forward: CTC + TTS losses (supervised path)."""
        cfg = self.cfg
        B = mel.shape[0]
        p_code, _, post_prob, st = V.speech_to_text(
            params, state, rngs[0], cfg, self.phn_attr, aug_mel, paired_bs=B, train=True)
        p_code = self._c(p_code)
        asr_loss = self._paired_ctc(aug_mel, p_code, text)
        lat = V.embed_text(params, cfg, self.phn_attr, text)
        # encoded length = non-pad tokens + the trailing <pad> (src/text.py:65)
        lat_len = jnp.sum(text != 0, axis=-1) + 1
        tts_out = V.text_to_speech(
            params, st, rngs[1], cfg, lat, sid,
            decode_steps=mel.shape[1] // self.r, train=True, teacher=mel,
            tf_rate=tf_rate, latent_lengths=lat_len, wgrad_probes=wgrad_probes)
        mel_pred, lin_pred, align, stop, st = tts_out[:5]
        aux = tts_out[5] if wgrad_probes is not None else None
        mel_pred, lin_pred = self._c(mel_pred), self._c(lin_pred)
        mel_loss = self.floss(mel_pred, mel)
        lin_loss = self.floss(lin_pred, linear) if lin_pred is not None else 0.0
        total = self.w.tts * (mel_loss + lin_loss)
        if cfg.use_asr_postnet:
            post_loss = self._paired_ctc(aug_mel, post_prob, text, apply_log=False)
            total = total + self.w.asr * (1 - cfg.asr_postnet_weight) * asr_loss \
                + self.w.asr * cfg.asr_postnet_weight * post_loss
        else:
            post_loss = jnp.float32(0)
            total = total + self.w.asr * asr_loss
        mets = dict(asr_loss=asr_loss, mel_loss=mel_loss, linear_loss=lin_loss,
                    tts_loss=mel_loss + lin_loss, post_loss=post_loss,
                    pair_align=align, pair_pred=jnp.argmax(p_code, -1))
        return total, st, mets, aux

    # ---------------- compiled steps ----------------

    def make_paired_step(self):
        """Supervised step (also the fallback when no unpaired data is used)."""

        @partial(jax.jit, donate_argnums=(0, 2))
        def step(params, state, opt_state, rng, step_no, tf_rate, waves, wave_len, text, sid):
            rng = jax.random.fold_in(rng, step_no)  # in-graph: host RNG splits are expensive
            k_aug, k1, k2 = jax.random.split(rng, 3)
            mel, linear, aug, _, aug_flen = self._features(k_aug, waves, wave_len)
            probes = self._probes(mel.shape[1] // self.r, mel.shape[0], mel.dtype)

            def loss_fn(p, probes):
                total, st, mets, aux = self._losses_paired(p, state, (k1, k2), mel, linear,
                                                           aug, text, sid, tf_rate,
                                                           wgrad_probes=probes)
                mets["pair_pred_len"] = self._enc_len(aug_flen, mets["pair_pred"].shape[1])
                return total, (st, mets, aux)

            (total, (st, mets, aux)), (grads, gprobes) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, probes)
            grads = self._merge_wgrads(grads, aux, gprobes)
            params2, opt_state, gnorm = self._apply_updates(params, opt_state, grads)
            mets.update(total_loss=total, grad_norm=gnorm)
            return params2, st, opt_state, mets

        return step

    def make_speech_first_step(self):
        """EVEN steps: speech->text->speech with unpaired speech."""

        @partial(jax.jit, donate_argnums=(0, 2))
        def step(params, state, opt_state, rng, step_no, tf_rate,
                 waves, wave_len, text, sid, u_waves, u_wave_len, u_text, u_sid):
            cfg, r = self.cfg, self.r
            rng = jax.random.fold_in(rng, step_no)
            k_aug, k_uaug, k1, k2 = jax.random.split(rng, 4)
            mel, linear, aug, _, aug_flen = self._features(k_aug, waves, wave_len)
            u_mel, u_linear, u_aug, _, u_aug_flen = self._features(k_uaug, u_waves, u_wave_len)
            Bp, Bu = mel.shape[0], u_mel.shape[0]
            # padded_concat(mel, u_mel) pads time to the max: the decoder runs
            # exactly this many macro-steps (probes must match)
            decode_steps = max(mel.shape[1], u_mel.shape[1]) // r
            probes = self._probes(decode_steps, Bp + Bu, mel.dtype)

            def loss_fn(p, probes):
                # speech -> text on packed aug mels (`src/vqvae.py:106-141`)
                _, all_aug = padded_concat(aug, u_aug)
                p_code, q, post_prob, st = V.speech_to_text(
                    p, state, k1, cfg, self.phn_attr, self._c(all_aug), paired_bs=Bp, train=True)
                p_code = self._c(p_code)
                pair_prob = p_code[:Bp, : aug.shape[1] // cfg.time_reduce_factor]
                u_latent, u_lens, ok = trim_merge_segments(
                    p_code[Bp:], q[Bp:], max_frames_per_phn=cfg.max_frames_per_phn)

                asr_loss = self._paired_ctc(aug, pair_prob, text)

                # text -> speech: pair text latents + unpair trimmed latents
                pair_lat = V.embed_text(p, cfg, self.phn_attr, text)
                _, all_lat = padded_concat(pair_lat, u_latent)
                _, all_teacher = padded_concat(mel, u_mel)
                all_sid = jnp.concatenate([sid, u_sid])
                all_lat_len = jnp.concatenate([jnp.sum(text != 0, -1) + 1, u_lens])
                mel_pred, lin_pred, align, stop, st, aux = V.text_to_speech(
                    p, st, k2, cfg, all_lat, all_sid,
                    decode_steps=decode_steps, train=True,
                    teacher=all_teacher, tf_rate=tf_rate,
                    latent_lengths=all_lat_len, wgrad_probes=probes)
                mel_pred, lin_pred = self._c(mel_pred), self._c(lin_pred)

                Tp, Tu = mel.shape[1], u_mel.shape[1]
                mel_loss = self.floss(mel_pred[:Bp, :Tp], mel)
                lin_loss = self.floss(lin_pred[:Bp, :Tp], linear)
                u_sph_loss = self.floss(mel_pred[Bp:, :Tu], u_mel) + \
                    self.floss(lin_pred[Bp:, :Tu], u_linear)

                total = self.w.asr * asr_loss + self.w.tts * (mel_loss + lin_loss)
                # all-blank escape -> gate unpaired loss (`bin/train_vqvae.py:162-171,227-233`)
                gate = ok.astype(jnp.float32) * (step_no > self.w.unpair_speech_start)
                total = total + self.w.unpair_speech * gate * u_sph_loss
                mets = dict(asr_loss=asr_loss, mel_loss=mel_loss, linear_loss=lin_loss,
                            tts_loss=mel_loss + lin_loss,
                            unpair_speech_loss=u_sph_loss, unpair_ok=ok,
                            pair_align=align[:Bp], unpair_align=align[Bp:],
                            pair_pred=jnp.argmax(pair_prob, -1),
                            pair_pred_len=self._enc_len(aug_flen, pair_prob.shape[1]),
                            unpair_pred=jnp.argmax(p_code[Bp:], -1),
                            unpair_pred_len=self._enc_len(u_aug_flen, p_code.shape[1]))
                return total, (st, mets, aux)

            (total, (st, mets, aux)), (grads, gprobes) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, probes)
            grads = self._merge_wgrads(grads, aux, gprobes)
            params2, opt_state, gnorm = self._apply_updates(params, opt_state, grads)
            mets.update(total_loss=total, grad_norm=gnorm)
            return params2, st, opt_state, mets

        return step

    def make_text_first_step(self):
        """ODD steps: text->speech->text with unpaired text."""

        @partial(jax.jit, donate_argnums=(0, 2))
        def step(params, state, opt_state, rng, step_no, tf_rate,
                 waves, wave_len, text, sid, u_waves, u_wave_len, u_text, u_sid):
            cfg, r = self.cfg, self.r
            rng = jax.random.fold_in(rng, step_no)
            k_aug, k1, k2 = jax.random.split(rng, 3)
            mel, linear, aug, _, aug_flen = self._features(k_aug, waves, wave_len)
            Bp, Bu = mel.shape[0], u_text.shape[0]

            # fake-mel length: FRAME_PHN_RATIO * |unpair text| rounded UP to a
            # multiple of r (`src/vqvae.py:156-159`; the reference's
            # ``x += x % r`` only rounds correctly when r | 2x — a genuine
            # round-up is used here, flagged in docs/PARITY.md)
            u_ts = round_up(int(V.FRAME_PHN_RATIO * u_text.shape[1]), r)
            decode_steps = max(mel.shape[1] // r, u_ts // r)
            probes = self._probes(decode_steps, Bp + Bu, mel.dtype)

            def loss_fn(p, probes):
                pair_lat = V.embed_text(p, cfg, self.phn_attr, text)
                u_lat = V.embed_text(p, cfg, self.phn_attr, u_text)
                _, all_lat = padded_concat(pair_lat, u_lat)
                teacher = jnp.concatenate([mel, jnp.zeros((Bu,) + mel.shape[1:])], axis=0)
                teacher_rows = jnp.arange(Bp + Bu) < Bp
                all_sid = jnp.concatenate([sid, u_sid])
                all_lat_len = jnp.concatenate([jnp.sum(text != 0, -1) + 1,
                                               jnp.sum(u_text != 0, -1) + 1])
                mel_pred, lin_pred, align, stop, st, aux = V.text_to_speech(
                    p, state, k2, cfg, all_lat, all_sid, decode_steps=decode_steps,
                    train=True, teacher=teacher, teacher_rows=teacher_rows,
                    tf_rate=tf_rate, latent_lengths=all_lat_len, wgrad_probes=probes)
                mel_pred, lin_pred = self._c(mel_pred), self._c(lin_pred)

                Tp = mel.shape[1]
                mel_loss = self.floss(mel_pred[:Bp, :Tp], mel)
                lin_loss = self.floss(lin_pred[:Bp, :Tp], linear)

                # text2text: stop-grad the fake mel (`bin/train_vqvae.py:201`)
                fake_mel = jax.lax.stop_gradient(mel_pred[Bp:, :u_ts])
                _, all_mel2 = padded_concat(aug, fake_mel)
                p_code, _, post_prob, st = V.speech_to_text(
                    p, st, k1, cfg, self.phn_attr, self._c(all_mel2), paired_bs=Bp,
                    first_n_real_mel=Bp, train=True)
                p_code = self._c(p_code)
                T_enc_p = aug.shape[1] // cfg.time_reduce_factor
                pair_prob = p_code[:Bp, :T_enc_p]
                u_prob = p_code[Bp:, : u_ts // cfg.time_reduce_factor]

                asr_loss = self._paired_ctc(aug, pair_prob, text)

                # unpaired-text CTC (`bin/train_vqvae.py:236-248`)
                if self.actual_len:
                    ulen = round_up(jnp.sum(u_text != 0, -1) * int(V.FRAME_PHN_RATIO), r)
                    ctc_len = 1 + ulen // cfg.time_reduce_factor
                else:
                    ctc_len = jnp.full((Bu,), u_prob.shape[1], jnp.int32)
                u_txt_loss = ctc_loss(jnp.log(u_prob + EPS), u_text, ctc_len,
                                      jnp.sum(u_text != 0, -1))
                u_txt_nan = ~jnp.isfinite(u_txt_loss)
                u_txt_loss = jnp.where(u_txt_nan, 0.0, u_txt_loss)  # zeroed upstream too

                total = self.w.asr * asr_loss + self.w.tts * (mel_loss + lin_loss) \
                    + self.w.unpair_text * u_txt_loss
                mets = dict(asr_loss=asr_loss, mel_loss=mel_loss, linear_loss=lin_loss,
                            tts_loss=mel_loss + lin_loss, unpair_text_loss=u_txt_loss,
                            ctc_nan=u_txt_nan, pair_align=align[:Bp],
                            pair_pred=jnp.argmax(pair_prob, -1),
                            pair_pred_len=self._enc_len(aug_flen, pair_prob.shape[1]))
                return total, (st, mets, aux)

            (total, (st, mets, aux)), (grads, gprobes) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, probes)
            grads = self._merge_wgrads(grads, aux, gprobes)
            params2, opt_state, gnorm = self._apply_updates(params, opt_state, grads)
            mets.update(total_loss=total, grad_norm=gnorm)
            return params2, st, opt_state, mets

        return step

    # ---------------- evaluation ----------------

    def make_eval_step(self):
        """Dev-set forward (`bin/train_vqvae.py:332-372`): clean-mel ASR for
        PER + inference-mode TTS (tf_rate=0, decode steps = teacher length)."""

        @partial(jax.jit, static_argnames=("margin_frames",))
        def step(params, state, rng, ctr, waves, wave_len, text, sid, margin_frames=0):
            cfg, r = self.cfg, self.r
            rng = jax.random.fold_in(rng, ctr)
            # distinct keys per consumer: eval has no dropout/aug today, but
            # key reuse across _features and the ASR would correlate any
            # randomness a future config turns on
            k0, k1, k2 = jax.random.split(rng, 3)
            mel, linear, _, flen, _ = self._features(k0, waves, wave_len, need_aug=False)
            B = mel.shape[0]
            p_code, _, post_prob, _ = V.speech_to_text(
                params, state, k1, cfg, self.phn_attr, mel, paired_bs=B, train=False)
            lat = V.embed_text(params, cfg, self.phn_attr, text)
            decode_steps = (mel.shape[1] + margin_frames) // r
            mel_pred, lin_pred, align, stop, _ = V.text_to_speech(
                params, state, k2, cfg, lat, sid, decode_steps=decode_steps,
                train=False, teacher=None, tf_rate=0.0,
                latent_lengths=jnp.sum(text != 0, -1) + 1)
            Tp = mel.shape[1]
            tts_loss = self.floss(mel_pred[:, :Tp], mel) + self.floss(lin_pred[:, :Tp], linear)
            return dict(mel=mel, linear=linear, p_code=p_code, post_prob=post_prob,
                        enc_len=self._enc_len(flen, p_code.shape[1]),
                        mel_pred=mel_pred, lin_pred=lin_pred, align=align,
                        tts_loss=tts_loss)

        return step
