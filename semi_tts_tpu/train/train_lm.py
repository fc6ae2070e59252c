"""LM pretraining solvers — the working form of the reference's commented
``--pretrain_speech`` / ``--pretrain_text`` modes (`/root/reference/main.py:34-35`,
models in `src/lm.py:16-138`; upstream the module is dead code — SURVEY.md §2
"snapshot caveats").

* ``AudioLmTrainer`` — teacher-forced unconditional audio LM over mels
  (`src/lm.py:71-93`): the TTS decoder in ``pretrain`` mode + CBHG postnet.
  Saves ``best_mel.pth`` (the reference's ``pretrained_tts`` filename) whose
  ``model`` tree is ``{"tts": {"decoder", "postnet"}}`` so
  `checkpoint.apply_pretrained` grafts it with keys ``tts/decoder`` /
  ``tts/postnet``.
* ``TextLmTrainer`` — causal phoneme LM whose output layer is the shared
  codebook table under the neg-L2 measurement (`src/lm.py:96-138`). Saves
  ``best_acc.pth`` (the ``pretrained_emb`` filename) carrying
  ``{"codebook": {"learnable_table": ...}}`` — the reference's codebook
  graft loads exactly the embedding table (`src/embed.py:41-48`).

The checkpoint's state tree mirrors the model-tree prefix, so
``apply_pretrained`` grafts BN running stats along with parameters —
matching torch ``load_state_dict`` semantics (`src/vqvae.py:71-90`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..models import vqvae as V
from ..models.lm import audiolm_apply, audiolm_init, textlm_init, textlm_loss
from ..train.checkpoint import load_checkpoint, save_checkpoint
from ..train.losses import freq_loss
from ..train.optim import make_optimizer
from ..train.steps import _pad_frames
from ..train.train_vqvae import VqvaeTrainer
from ..utils.metrics import human_format, read_phn_attr


class LmTrainer(VqvaeTrainer):
    """Shared lifecycle for the two pretraining modes (data plumbing is
    inherited from the VQVAE trainer; model/step/ckpt layers are LM-specific)."""

    lm_mode = "speech"  # overridden by subclasses

    def __init__(self, config, paras, mode):
        super().__init__(config, paras, mode)
        self.best_dev = float("inf")
        self._last_valid_step = -1

    # ------------------------------------------------ data
    def load_data(self):
        super().load_data()
        from ..data.loader import infinite

        # pretraining consumes the *unpaired* stream (untranscribed speech /
        # text-only); fall back to the paired stream when it is empty
        train_set = self.unpair_set if len(self.unpair_set) else self.pair_set
        self.train_iter = infinite(train_set)

    # ------------------------------------------------ model
    def set_model(self):
        model_cfg = dict(self.config["model"])
        for k in ("pretrained_asr", "pretrained_emb", "pretrained_tts"):
            model_cfg.pop(k, None)
        phn_attr_pth = model_cfg["codebook"].get("phn_attr_pth") or ""
        attr_dim = read_phn_attr(phn_attr_pth).shape[1] if phn_attr_pth else 0
        self.model_cfg = V.config_from_yaml(
            model_cfg, n_mels=self.n_mels, linear_dim=self.linear_dim,
            vocab_size=self.vocab_size, n_spkr=self.n_spkr, attr_dim=attr_dim)
        key = jax.random.PRNGKey(self.paras.seed)

        h = self.config["hparas"]
        self.tx, _ = make_optimizer(h["optimizer"], h["lr"], h["lr_scheduler"])
        floss = partial(freq_loss,
                        sample_rate=self.config["data"]["audio"]["sample_rate"],
                        n_mels=self.n_mels, loss=h["freq_loss_type"],
                        differential_loss=h["differential_loss"],
                        emphasize_linear_low=h["emphasize_linear_low"])
        self.rng = jax.random.PRNGKey(self.paras.seed + 1)

        if self.lm_mode == "speech":
            self.lm_params, self.lm_state, self.dec_cfg = audiolm_init(
                key, self.model_cfg.tts.decoder, linear_dim=self.model_cfg.tts.linear_dim)
            self.verbose("AudioLM pretraining: decoder + CBHG postnet "
                         f"({self.n_mels} mels -> linear {self.linear_dim})")
        else:
            self.lm_params = textlm_init(key, self.vocab_size,
                                         self.model_cfg.codebook.learn_dim)
            self.lm_state = {}
            self.verbose(f"TextLM pretraining: codebook table "
                         f"({self.vocab_size} x {self.model_cfg.codebook.learn_dim})")
        # --mesh: pure data parallelism for pretraining (params replicated,
        # batches sharded on 'data'; the LMs are small)
        self.mesh = self._make_mesh()
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            self.lm_params = replicate(self.lm_params, self.mesh)
            self.lm_state = replicate(self.lm_state, self.mesh)
        self.opt_state = self.tx.init(self.lm_params)

        feat, dec_cfg, r = self.featurizer, getattr(self, "dec_cfg", None), \
            self.model_cfg.tts.decoder.n_frames_per_step

        if self.lm_mode == "speech":
            def loss_fn(p, probes, state, k, mel, linear):
                mel_pred, lin_pred, st, aux = audiolm_apply(
                    p, state, k, mel, dec_cfg=dec_cfg, train=True,
                    wgrad_probes=probes)
                total = floss(mel_pred, mel)
                if lin_pred is not None:
                    total = total + floss(lin_pred, linear)
                return total, (st, aux)

            @partial(jax.jit, donate_argnums=(0, 2))
            def step(p, state, opt_state, rng, i, waves, wave_len):
                from ..models.decoder import merge_wgrads, wgrad_probes

                k = jax.random.fold_in(rng, i)
                mel, linear, _ = feat.featurize(waves, wave_len)
                mel, linear = _pad_frames(mel, r), _pad_frames(linear, r)
                probes = wgrad_probes(dec_cfg, mel.shape[1] // r, mel.shape[0], mel.dtype)
                (total, (st, aux)), (grads, gprobes) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True)(p, probes, state, k, mel, linear)
                merge_wgrads(grads["decoder"], aux, gprobes)
                updates, opt_state = self.tx.update(grads, opt_state, p)
                return optax.apply_updates(p, updates), st, opt_state, total

            @jax.jit
            def dev_step(p, state, rng, i, waves, wave_len):
                k = jax.random.fold_in(rng, i)
                mel, linear, _ = feat.featurize(waves, wave_len)
                mel, linear = _pad_frames(mel, r), _pad_frames(linear, r)
                mel_pred, lin_pred, _ = audiolm_apply(p, state, k, mel,
                                                      dec_cfg=dec_cfg, train=False)
                total = floss(mel_pred, mel)
                if lin_pred is not None:
                    total = total + floss(lin_pred, linear)
                return total
        else:
            @partial(jax.jit, donate_argnums=(0, 2))
            def step(p, state, opt_state, rng, i, text, text_len):
                total, grads = jax.value_and_grad(textlm_loss)(p, text, text_len)
                updates, opt_state = self.tx.update(grads, opt_state, p)
                return optax.apply_updates(p, updates), state, opt_state, total

            @jax.jit
            def dev_step(p, state, rng, i, text, text_len):
                return textlm_loss(p, text, text_len)

        self._step, self._dev_step = step, dev_step

        if self.paras.load:  # resume an interrupted pretraining run
            import jax.numpy as jnp_

            ckpt = load_checkpoint(self.paras.load)
            sub = ckpt["model"]["tts" if self.lm_mode == "speech" else "textlm"]
            self.lm_params = jax.tree_util.tree_map(jnp_.asarray, sub)
            self.lm_state = jax.tree_util.tree_map(jnp_.asarray, ckpt["state"])
            self.opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(self.tx.init(self.lm_params)),
                [jnp_.asarray(l) for l in jax.tree_util.tree_leaves(ckpt["optimizer"])])
            if self.mesh is not None:
                from ..parallel.mesh import replicate

                self.lm_params = replicate(self.lm_params, self.mesh)
                self.lm_state = replicate(self.lm_state, self.mesh)
                self.opt_state = replicate(self.opt_state, self.mesh)
            self.step = ckpt["global_step"]
            self.verbose("Load {} LM ckpt from {}, restarting at step {}".format(
                self.lm_mode, self.paras.load, self.step))

    # ------------------------------------------------ loop
    def _batch_args(self, batch):
        if self.lm_mode == "speech":
            return batch.waves, batch.wave_len
        text = jnp.asarray(batch.text)
        return text, jnp.sum(text != 0, axis=-1)

    def exec(self):
        self.verbose([f"Total pretraining steps {human_format(self.max_step)} "
                      f"({self.lm_mode} LM)."])
        self.timer.set()
        total = jnp.float32(0)
        while self.step < self.max_step:
            batch = self._shard(next(self.train_iter))
            self.timer.cnt("rd")
            self.lm_params, self.lm_state, self.opt_state, total = self._step(
                self.lm_params, self.lm_state, self.opt_state, self.rng,
                self.step, *self._batch_args(batch))
            self.step += 1
            self.timer.cnt("fw")
            self.timer.cnt("bw")
            if self.step == 1 or self.step % self._PROGRESS_STEP == 0:
                self.progress("LM({}) | Loss - {:.3f} | {}".format(
                    self.lm_mode, float(total), self.timer.show()))
                self.write_log("lm_loss", {"train": float(total)})
            if self.step == 1 or self.step % self.valid_step == 0:
                self.validate()
            self.timer.set()
        if self._last_valid_step != self.step:
            self.validate()  # final: guarantees a checkpoint exists

    def validate(self):
        self._last_valid_step = self.step
        losses = []
        for i, batch in enumerate(self.dev_set):
            batch = self._shard(batch)
            losses.append(float(self._dev_step(
                self.lm_params, self.lm_state, self.rng,
                self.step * 100003 + i, *self._batch_args(batch))))
        dev = sum(losses) / max(len(losses), 1)
        self.write_log("lm_loss", {"dev": dev})
        if dev <= self.best_dev:
            self.best_dev = dev
            self._save(dev)

    def _save(self, score):
        import os

        if self.lm_mode == "speech":
            # audiolm params are exactly {"decoder", "postnet"} — the VQVAE
            # tts subtrees `apply_pretrained` grafts from 'tts/...'; the
            # state tree mirrors the same prefix so BN running stats graft
            # along with the parameters (torch load_state_dict semantics,
            # `src/vqvae.py:71-90`)
            model = {"tts": self.lm_params}
            state = {"tts": self.lm_state}
            fname = "best_mel.pth"  # reference's pretrained_tts filename
        else:
            model = {"codebook": {"learnable_table": self.lm_params["learnable_table"]},
                     "textlm": self.lm_params}
            state = self.lm_state
            fname = "best_acc.pth"  # reference's pretrained_emb filename
        path = os.path.join(self.ckpdir, fname)
        save_checkpoint(path, params=model, state=state,
                        opt_state=self.opt_state, step=self.step)
        self.verbose("Saved {} LM checkpoint (step = {}, dev = {:.3f}) @ {}".format(
            self.lm_mode, human_format(self.step), score, path))


class AudioLmTrainer(LmTrainer):
    lm_mode = "speech"


class TextLmTrainer(LmTrainer):
    lm_mode = "text"
