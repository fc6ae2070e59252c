"""Semi-supervised VQVAE trainer (the heart of the framework).

Parity target: `/root/reference/bin/train_vqvae.py` — alternating
speech-first / text-first cycles (`:137-205`), loss weighting + start-step
gating (`:27-32,227-248`), NaN counters in the progress line (`:115-121,
278-281`), PER / token-usage / attention logging (`:278-310`), validation
every ``valid_step`` with best-TTS / best-PER / periodic checkpointing
(`:313-428`). The reference's CUDA-OOM retry loop is unnecessary: shapes are
bucketed and static, so memory use is fixed at compile time (SURVEY.md §7).
"""

from __future__ import annotations

import json

import jax
import numpy as np

from ..data import load_dataset
from ..data.loader import infinite
from ..models import vqvae as V
from ..train.checkpoint import apply_pretrained, load_checkpoint
from ..train.optim import Optimizer, make_optimizer, tf_rate_schedule
from ..train.steps import StepBuilder, Weights
from ..train.solver import BaseSolver
from ..utils.metrics import cal_per, human_format, read_phn_attr
from ..utils.viz import data_to_bar, feat_to_fig

LISTEN_N_EXAMPLES = 6  # (`bin/train_vqvae.py:14`)
ATTENTION_PLOT_STEP = 500
CKPT_STEP = 10000


class VqvaeTrainer(BaseSolver):
    def __init__(self, config, paras, mode):
        super().__init__(config, paras, mode)
        self.step = 0
        self.best_tts_loss = 100.0
        self.best_per = 2.0
        h = config["hparas"]
        self.asr_weight = h["asr_weight"]
        self.tts_weight = h["tts_weight"]
        self.unpair_text_start_step = h["unpair_text_start_step"]
        self.unpair_text_weight = h["unpair_text_weight"]
        self.unpair_speech_start_step = h["unpair_speech_start_step"]
        self.unpair_speech_weight = h["unpair_speech_weight"]

    # ------------------------------------------------ data
    def load_data(self):
        self.verbose(["Loading data... large corpus may took a while."])
        (self.unpair_set, self.pair_set, self.dev_set, self.test_set,
         self.featurizer, self.tokenizer, data_msg) = load_dataset(
            self.paras.njobs, self.paras.gpu, self.paras.pin_memory,
            seed=self.paras.seed, **self.config["data"])
        self.pair_iter = infinite(self.pair_set)
        self.unpair_iter = infinite(self.unpair_set)
        self.n_mels = self.config["data"]["audio"]["num_mels"]
        self.linear_dim = (self.config["data"]["audio"]["num_freq"]
                           if self.config["data"]["audio"]["use_linear"] else None)
        self.vocab_size = self.tokenizer.vocab_size
        self.n_spkr = len(json.load(open(self.config["data"]["corpus"]["spkr_map"])))
        self.verbose(data_msg)

    # ------------------------------------------------ model
    def set_model(self):
        model_cfg = dict(self.config["model"])
        # graft targets mirror the reference's partial loads
        # (`src/vqvae.py:71-90`): whole ASR encoder, the codebook *table*
        # only (`src/embed.py:41-48`), and the TTS decoder (+ mel->linear
        # postnet when present) — not the TTS text encoder
        tts_ckpt = model_cfg.pop("pretrained_tts", None)
        pretrained = {
            "asr": model_cfg.pop("pretrained_asr", None),
            "codebook/learnable_table": model_cfg.pop("pretrained_emb", None),
            "tts/decoder": tts_ckpt,
            "tts/postnet": tts_ckpt if self.linear_dim else None,
        }
        phn_attr_pth = model_cfg["codebook"].get("phn_attr_pth") or ""
        self.phn_attr = None
        attr_dim = 0
        if phn_attr_pth:
            self.phn_attr = read_phn_attr(phn_attr_pth)
            attr_dim = self.phn_attr.shape[1]
        self.model_cfg = V.config_from_yaml(
            model_cfg, n_mels=self.n_mels, linear_dim=self.linear_dim,
            vocab_size=self.vocab_size, n_spkr=self.n_spkr, attr_dim=attr_dim)
        key = jax.random.PRNGKey(self.paras.seed)
        self.params, self.state = V.vqvae_init(
            key, self.model_cfg,
            None if self.phn_attr is None else jax.numpy.asarray(self.phn_attr))
        self.params, self.state = apply_pretrained(self.params, pretrained,
                                                   state=self.state)

        self.mesh = self._make_mesh()
        if self.mesh is not None:
            from ..parallel.mesh import replicate, shard_params

            self.params = shard_params(self.params, self.mesh)
            self.state = replicate(self.state, self.mesh)

        h = self.config["hparas"]
        self.tx, self.lr_fn = make_optimizer(h["optimizer"], h["lr"], h["lr_scheduler"])
        self.opt_state = self.tx.init(self.params)
        self.tf_rate = tf_rate_schedule(h.get("tf_start", 1.0), h.get("tf_end", 1.0),
                                        h.get("tf_step", 1))
        self.optimizer = Optimizer(**h)  # facade for create_msg parity
        self.verbose(self.optimizer.create_msg())
        self.verbose("           | ASR weight = {}\t| start step = {}".format(self.asr_weight, 0))
        self.verbose("           | TTS weight = {}\t| start step = {}".format(self.tts_weight, 0))
        self.verbose("           | Txt weight = {}\t| start step = {}".format(
            self.unpair_text_weight, self.unpair_text_start_step))
        self.verbose("           | Sph weight = {}\t| start step = {}".format(
            self.unpair_speech_weight, self.unpair_speech_start_step))

        weights = Weights(self.asr_weight, self.tts_weight, self.unpair_text_weight,
                          self.unpair_speech_weight, self.unpair_text_start_step,
                          self.unpair_speech_start_step)
        self.builder = StepBuilder(
            self.model_cfg, self.featurizer,
            None if self.phn_attr is None else jax.numpy.asarray(self.phn_attr),
            self.tx, weights=weights,
            freq_loss_kwargs=dict(
                sample_rate=self.config["data"]["audio"]["sample_rate"],
                n_mels=self.n_mels, loss=h["freq_loss_type"],
                differential_loss=h["differential_loss"],
                emphasize_linear_low=h["emphasize_linear_low"]),
            actual_len=getattr(self.paras, "actual_len", False),
            mesh=self.mesh)
        self._paired_step = self.builder.make_paired_step()
        self._speech_first_step = self.builder.make_speech_first_step()
        self._text_first_step = self.builder.make_text_first_step()
        self._eval_step = self.builder.make_eval_step()
        self.rng = jax.random.PRNGKey(self.paras.seed + 1)

        if self.paras.load:
            ckpt = load_checkpoint(self.paras.load)
            self.params = jax.tree_util.tree_map(jax.numpy.asarray, ckpt["model"])
            self.state = jax.tree_util.tree_map(jax.numpy.asarray, ckpt["state"])
            if self.mesh is not None:  # restore the mesh placement after load
                from ..parallel.mesh import replicate, shard_params

                self.params = shard_params(self.params, self.mesh)
                self.state = replicate(self.state, self.mesh)
            # optimizer state: unflatten into tx's structure; tx.init on the
            # (possibly sharded) params doubles as the sharding template.
            # Imported reference checkpoints carry optimizer=None
            # (train/torch_import.py) — start Adam's moments fresh there but
            # fast-forward the Noam schedule to the carried global_step, so
            # fine-tuning a converged import does NOT restart warmup at
            # peak-LR ramp (the reference recomputes lr from global_step,
            # `src/optim.py:19-27`).
            template = self.tx.init(self.params)
            if ckpt["optimizer"] is None:
                from .optim import advance_lr_schedule

                self.opt_state = advance_lr_schedule(
                    template, ckpt["global_step"])
            else:
                self.opt_state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(template),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(jax.numpy.asarray, ckpt["optimizer"])))
            if self.mesh is not None:
                self.opt_state = jax.tree_util.tree_map(
                    lambda t, v: jax.device_put(v, t.sharding)
                    if hasattr(t, "sharding") else v, template, self.opt_state)
            self.step = ckpt["global_step"]
            # restore best-metric watermarks so a resumed run cannot
            # re-checkpoint worse-than-best models (the reference restores
            # only model/optim/step, `bin/train_vqvae.py:104-109` — improved
            # here via the npz `extra` field)
            if ckpt.get("extra"):
                self.best_tts_loss = ckpt["extra"].get("best_tts_loss", self.best_tts_loss)
                self.best_per = ckpt["extra"].get("best_per", self.best_per)
            self.verbose("Load ckpt from {}, restarting at step {}".format(
                self.paras.load, self.step))

    def save_checkpoint_triple(self, f_name, score, **kw):
        """Carry the best-metric watermarks in every checkpoint's `extra`."""
        kw.setdefault("extra", {"best_tts_loss": float(self.best_tts_loss),
                                "best_per": float(self.best_per)})
        super().save_checkpoint_triple(f_name, score, **kw)

    # ------------------------------------------------ training loop
    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def exec(self):
        self.verbose(["Total training steps {}.".format(human_format(self.max_step))])
        self.timer.set()
        # --profile: capture a jax.profiler trace of a post-warmup window of
        # steps (`utils/timer.profile_trace`) — the TPU-native replacement for
        # the reference's wall-clock-only timer (`src/util.py:35-43`)
        import contextlib

        from ..utils.timer import profile_trace

        prof = contextlib.ExitStack()
        # anchored to the *starting* step so --profile works on resumed runs
        start0 = self.step
        prof_start = start0 + min(40, max(1, (self.max_step - start0) // 2))
        prof_end = min(self.max_step, prof_start + 20)
        cnter = {"ctc_nan": 0, "unp_sph": 0, "unp_txt": 0}
        tok_usage, gt_usage = [], []
        unsup_align = None
        mets = {}
        # per-step device scalars are buffered and fetched in ONE transfer at
        # the progress step — a per-step bool() sync costs 10-30 ms through
        # the TPU tunnel and would stall the pipeline
        pending = []  # (ok_flag_dev, unpair_pred_dev, unpair_text_np, ctc_nan_dev)

        while self.step < self.max_step:
            if getattr(self.paras, "profile", False):
                if self.step == prof_start:
                    try:
                        prof.enter_context(profile_trace(self.logdir))
                        self.verbose(f"Profiling steps {prof_start}..{prof_end} -> {self.logdir}")
                    except Exception as e:  # profiling must never kill training
                        self.verbose(f"profiler unavailable: {e}")
                elif self.step == prof_end:
                    prof.close()
            use_unpair_text = (self.unpair_text_weight > 0
                               and self.step > self.unpair_text_start_step)
            use_unpair_speech = (self.unpair_speech_weight > 0
                                 and self.step > self.unpair_speech_start_step)
            tf_rate = self.tf_rate(self.step)
            batch = self._shard(next(self.pair_iter))
            speech_first = self.step % 2 == 0
            self.timer.cnt("rd")

            # rng derivation happens in-graph (fold_in(rng, step)): host-side
            # RNG splits are device round trips through the TPU tunnel
            args = (self.params, self.state, self.opt_state, self.rng,
                    self.step, tf_rate, batch.waves, batch.wave_len, batch.text, batch.sid)
            if speech_first and use_unpair_speech:
                ub = self._shard(next(self.unpair_iter))
                self.params, self.state, self.opt_state, mets = self._speech_first_step(
                    *args, ub.waves, ub.wave_len, ub.text, ub.sid)
                pending.append((mets["unpair_ok"], mets["unpair_pred"], ub.text,
                                None, mets["unpair_pred_len"]))
                unsup_align = mets["unpair_align"]
            elif (not speech_first) and use_unpair_text:
                ub = self._shard(next(self.unpair_iter))
                cnter["unp_txt"] += 1
                self.params, self.state, self.opt_state, mets = self._text_first_step(
                    *args, ub.waves, ub.wave_len, ub.text, ub.sid)
                pending.append((None, None, None, mets["ctc_nan"], None))
            else:
                self.params, self.state, self.opt_state, mets = self._paired_step(*args)

            self.step += 1
            self.timer.cnt("fw")
            self.timer.cnt("bw")

            if self.step == 1 or self.step % self._PROGRESS_STEP == 0:
                # drain buffered per-step flags in one transfer
                fetched = jax.device_get([(o, p, n, pl) for o, p, _, n, pl in pending])
                for (ok, pred, nan, plen), (_, _, utext, _, _) in zip(fetched, pending):
                    if ok is not None and bool(ok):
                        cnter["unp_sph"] += 1
                        # token usage over true encoder lengths only (bucket
                        # pads would over-count whatever the encoder emits on
                        # pad frames — same trim as the PER fix)
                        pred = np.asarray(pred)
                        for b in range(pred.shape[0]):
                            tok_usage += pred[b, : int(plen[b])].tolist()
                        gt_usage += np.asarray(utext).flatten().tolist()
                    if nan is not None and bool(nan):
                        cnter["ctc_nan"] += 1
                pending = []
                if not np.isfinite(float(mets["total_loss"])):
                    cnter["ctc_nan"] += 1  # non-finite step (update was skipped)
                total = float(mets["total_loss"])
                gnorm = float(mets["grad_norm"])
                self.progress(
                    "Tr stat | Loss - {:.2f} (CTC-nan/unp-sph/unp-txt={}/{}/{}) | "
                    "Grad. Norm - {:.2f} | {} ".format(
                        total, cnter["ctc_nan"], cnter["unp_sph"], cnter["unp_txt"],
                        gnorm, self.timer.show()))
                self.write_log("txt_loss", {
                    "pair": float(mets.get("asr_loss", np.nan)),
                    "unpair": float(mets["unpair_text_loss"]) if "unpair_text_loss" in mets else None,
                    "post": float(mets["post_loss"]) if self.model_cfg.use_asr_postnet else None})
                self.write_log("speech_loss", {
                    "pair": float(mets.get("tts_loss", np.nan)),
                    "unpair": float(mets["unpair_speech_loss"]) if "unpair_speech_loss" in mets else None})
                for k in cnter:
                    cnter[k] = 0
                if self.step == 1 or self.step % ATTENTION_PLOT_STEP == 0:
                    sup_pred = np.asarray(mets["pair_pred"])
                    sup_trans = np.asarray(batch.text)
                    unp_per = None
                    if tok_usage:
                        unp_per = cal_per(np.asarray(mets.get("unpair_pred")), np.asarray(ub.text),
                                          pred_lens=np.asarray(mets["unpair_pred_len"])) \
                            if "unpair_pred" in mets else None
                    self.write_log("per", {"pair": cal_per(sup_pred, sup_trans,
                                                           pred_lens=np.asarray(mets["pair_pred_len"])),
                                           "unpair": unp_per})
                    bar = data_to_bar(tok_usage, gt_usage, self.vocab_size,
                                      self.tokenizer._vocab_list)
                    if bar is not None:
                        self.write_log("unpair_hist", bar)
                    align = np.asarray(mets["pair_align"])
                    for i in range(min(LISTEN_N_EXAMPLES, align.shape[0])):
                        self.write_log(f"pair_align{i}", feat_to_fig(align[i]))
                        if unsup_align is not None and i < np.asarray(unsup_align).shape[0]:
                            self.write_log(f"unpair_align{i}", feat_to_fig(np.asarray(unsup_align)[i]))
                    tok_usage, gt_usage = [], []

            if self.step == 1 or self.step % self.valid_step == 0:
                self.validate()
            self.timer.set()
            if self.step > self.max_step:
                break
        prof.close()  # still-open trace (max_step < profile window end)

    # ------------------------------------------------ validation
    def _log_waves(self, name, feats, *, is_mel, suffix=""):
        """Batched Griffin-Lim of logged dev features -> TB audio
        (`src/audio.py:399-409` feat_to_wave)."""
        import jax.numpy as jnp

        from ..ops.griffin_lim import specgram_to_waveform

        acfg = self.featurizer.cfg
        feats = jnp.asarray(np.stack(list(feats)))
        amp = (self.featurizer.mel_to_linear_amp(feats) if is_mel
               else self.featurizer.linear_to_amp(feats))
        wavs = np.asarray(specgram_to_waveform(
            amp, self._next_rng(), n_fft=acfg.n_fft, hop=acfg.hop_length,
            win_length=acfg.win_length, preemphasis_coeff=acfg.preemphasis_coeff))
        for i, w in enumerate(wavs):
            self.write_log(f"{name}{i}{suffix}", (w, acfg.sample_rate))

    def validate(self):
        dev_tts_loss, dev_per, dev_post_per = [], [], []
        mel_p = linear_p = align_p = hyp = sample_txt = None
        n_batches = len(self.dev_set)
        for i, batch in enumerate(self.dev_set):
            batch = self._shard(batch)
            self.progress("Valid step - {}/{}".format(i + 1, n_batches))
            out = self._eval_step(self.params, self.state, self.rng,
                                  self.step * 100003 + i,
                                  batch.waves, batch.wave_len, batch.text, batch.sid)
            enc_len = np.asarray(out["enc_len"])
            dev_per.append(cal_per(np.asarray(out["p_code"]), np.asarray(batch.text),
                                   pred_lens=enc_len))
            if out["post_prob"] is not None:
                dev_post_per.append(cal_per(np.asarray(out["post_prob"]), np.asarray(batch.text),
                                            pred_lens=enc_len))
            dev_tts_loss.append(float(out["tts_loss"]))
            if i == n_batches // 2:
                n = LISTEN_N_EXAMPLES
                sample_txt = np.asarray(batch.text)[:n]
                hyp = np.asarray(out["p_code"]).argmax(-1)[:n]
                mel_p = np.asarray(out["mel_pred"])[:n]
                linear_p = np.asarray(out["lin_pred"])[:n]
                align_p = np.asarray(out["align"])[:n]
                sample_mel = np.asarray(out["mel"])[:n]
                sample_linear = np.asarray(out["linear"])[:n]

        dev_tts_loss = sum(dev_tts_loss) / max(len(dev_tts_loss), 1)
        dev_per = sum(dev_per) / max(len(dev_per), 1)
        dev_post_per = sum(dev_post_per) / len(dev_post_per) if dev_post_per else None

        trip = dict(params=self.params, state=self.state, opt_state=self.opt_state)
        if getattr(self.paras, "store_best_per", False):
            if dev_per < self.best_per:
                self.best_per = dev_per
                self.save_checkpoint_triple("best_per.pth", dev_per, **trip)
            if dev_post_per is not None and dev_post_per < self.best_per:
                self.best_per = dev_post_per
                self.save_checkpoint_triple("best_post_per.pth", dev_post_per, **trip)
        else:
            if dev_tts_loss < self.best_tts_loss:
                self.best_tts_loss = dev_tts_loss
                if self.step > 1:
                    self.save_checkpoint_triple(f"tts_{self.step}.pth", dev_tts_loss, **trip)
            if dev_per < self.best_per:
                self.best_per = dev_per
                if self.step > 1:
                    self.save_checkpoint_triple(f"asr_{self.step}.pth", dev_per, **trip)
            if dev_post_per is not None and dev_post_per < self.best_per:
                self.best_per = dev_post_per
                self.save_checkpoint_triple("best_post_per.pth", dev_post_per, **trip)
        if (self.step > 1 and self.step % CKPT_STEP == 0
                and not getattr(self.paras, "store_best_per", False)):
            self.save_checkpoint_triple(f"step_{self.step}.pth", dev_tts_loss, **trip)

        if mel_p is not None:
            for i, (m_p, l_p, a_p, h_p) in enumerate(zip(mel_p, linear_p, align_p, hyp)):
                self.write_log(f"hyp_text{i}", self.tokenizer.decode(h_p.tolist()))
                self.write_log(f"mel_spec{i}", feat_to_fig(m_p))
                self.write_log(f"linear_spec{i}", feat_to_fig(l_p))
                self.write_log(f"dv_align{i}", feat_to_fig(a_p))
            # Griffin-Lim audio of dev predictions / (at step 1) ground truth
            # (`bin/train_vqvae.py:411-421`); skipped under --store-best-per
            # like the reference
            if self.log is not None and not getattr(self.paras, "store_best_per", False):
                self._log_waves("mel_wave", mel_p, is_mel=True)
                self._log_waves("linear_wave", linear_p, is_mel=False)
                if self.step == 1:
                    for i, gt_txt in enumerate(sample_txt):
                        self.write_log(f"truth_text{i}", self.tokenizer.decode(gt_txt.tolist()))
                        self.write_log(f"mel_spec{i}_gt", feat_to_fig(sample_mel[i]))
                        self.write_log(f"linear_spec{i}_gt", feat_to_fig(sample_linear[i]))
                    self._log_waves("mel_wave", sample_mel, is_mel=True, suffix="_gt")
                    self._log_waves("linear_wave", sample_linear, is_mel=False, suffix="_gt")
        self.write_log("speech_loss", {"dev": dev_tts_loss})
        self.write_log("per", {"dev": dev_per, "dev_post": dev_post_per})
        # codebook embedding projector (`bin/train_vqvae.py:425`)
        from ..models.embed import full_codebook_table

        table = full_codebook_table(
            self.params["codebook"], self.model_cfg.codebook,
            None if self.phn_attr is None else jax.numpy.asarray(self.phn_attr))
        self.write_log("codebook", (np.asarray(table), self.tokenizer._vocab_list))
