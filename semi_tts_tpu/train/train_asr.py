"""Supervised ASR-only trainer (the reference's dangling ``--asr-only``
dispatch, `main.py:60` — `bin/train_asr.py` absent from its snapshot;
reconstructed from the paired-CTC half of `bin/train_vqvae.py:208-217,430-444`
per SURVEY.md §7 step 6)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import vqvae as V
from ..train.train_vqvae import VqvaeTrainer
from ..utils.metrics import cal_per, human_format


class AsrTrainer(VqvaeTrainer):
    def set_model(self):
        super().set_model()
        builder = self.builder

        @partial(jax.jit, donate_argnums=(0, 2))
        def asr_step(params, state, opt_state, rng, step_no, waves, wave_len, text, sid):
            rng = jax.random.fold_in(rng, step_no)
            k_aug, k1 = jax.random.split(rng)
            mel, linear, aug, _, aug_flen = builder._features(k_aug, waves, wave_len)

            def loss_fn(p):
                B = aug.shape[0]
                p_code, _, post_prob, st = V.speech_to_text(
                    p, state, k1, builder.cfg, builder.phn_attr, aug, paired_bs=B, train=True)
                asr_loss = builder._paired_ctc(aug, p_code, text)
                if builder.cfg.use_asr_postnet:
                    post = builder._paired_ctc(aug, post_prob, text, apply_log=False)
                    w = builder.cfg.asr_postnet_weight
                    total = (1 - w) * asr_loss + w * post
                else:
                    total = asr_loss
                return total, (st, dict(asr_loss=asr_loss, pair_pred=jnp.argmax(p_code, -1),
                                        pair_pred_len=builder._enc_len(aug_flen, p_code.shape[1])))

            (total, (st, mets)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            gnorm = optax.global_norm(grads)
            updates, opt_state2 = builder.tx.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            mets.update(total_loss=total, grad_norm=gnorm)
            return params2, st, opt_state2, mets

        self._asr_step = asr_step

    def exec(self):
        self.verbose(["Total training steps {} (ASR only).".format(human_format(self.max_step))])
        self.timer.set()
        while self.step < self.max_step:
            batch = self._shard(next(self.pair_iter))
            self.timer.cnt("rd")
            self.params, self.state, self.opt_state, mets = self._asr_step(
                self.params, self.state, self.opt_state, self.rng, self.step,
                batch.waves, batch.wave_len, batch.text, batch.sid)
            self.step += 1
            self.timer.cnt("fw")
            self.timer.cnt("bw")
            if self.step == 1 or self.step % self._PROGRESS_STEP == 0:
                self.progress("ASR | Loss - {:.2f} | Grad. Norm - {:.2f} | {}".format(
                    float(mets["total_loss"]), float(mets["grad_norm"]), self.timer.show()))
                self.write_log("txt_loss", {"pair": float(mets["asr_loss"])})
            if self.step == 1 or self.step % self.valid_step == 0:
                self.validate_asr()
            self.timer.set()

    def validate_asr(self):
        pers = []
        for i, batch in enumerate(self.dev_set):
            batch = self._shard(batch)
            out = self._eval_step(self.params, self.state, self.rng,
                                  self.step * 100003 + i,
                                  batch.waves, batch.wave_len, batch.text, batch.sid)
            pers.append(cal_per(np.asarray(out["p_code"]), np.asarray(batch.text),
                                pred_lens=np.asarray(out["enc_len"])))
        dev_per = sum(pers) / max(len(pers), 1)
        if dev_per < self.best_per:
            self.best_per = dev_per
            self.save_checkpoint_triple("best_per.pth", dev_per, params=self.params,
                                        state=self.state, opt_state=self.opt_state)
        self.write_log("per", {"dev": dev_per})
