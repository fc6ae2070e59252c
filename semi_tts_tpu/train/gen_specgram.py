"""Inference solver: batch TTS spectrogram generation on the test split.

Parity target: `/root/reference/bin/gen_specgram.py` — tf_rate=0 decoding
with teacher length + 40-frame margin (`:17,99-108`), saving per-utterance
``{id}-mel.npy`` / ``{id}-spec.npy`` / ``{id}-align.npy`` with the alignment
cropped to ``|text| * FRAME_PHN_RATIO / r`` decode steps (`:112-124`), and
optional batched Griffin-Lim ``--gen-wav`` output (`:114,125-126`).
"""

from __future__ import annotations

import os
from os.path import join

import jax
import numpy as np

from ..data import load_dataset
from ..models import vqvae as V
from ..ops.griffin_lim import specgram_to_waveform
from ..data import wavio
from ..train.checkpoint import load_checkpoint
from ..train.steps import StepBuilder, Weights
from ..train.solver import BaseSolver
from ..utils.metrics import read_phn_attr

INFERENCE_MARGIN_FRAMES = 40  # (`bin/gen_specgram.py:17`)


class SpecgramGenerator(BaseSolver):
    def __init__(self, config, paras, mode):
        super().__init__(config, paras, mode)

    def load_data(self):
        (self.unpair_set, self.pair_set, self.dev_set, self.test_set,
         self.featurizer, self.tokenizer, _) = load_dataset(
            self.paras.njobs, self.paras.gpu, self.paras.pin_memory,
            inference_stage=True, seed=self.paras.seed, **self.config["data"])
        import json

        self.n_mels = self.config["data"]["audio"]["num_mels"]
        self.linear_dim = (self.config["data"]["audio"]["num_freq"]
                           if self.config["data"]["audio"]["use_linear"] else None)
        self.vocab_size = self.tokenizer.vocab_size
        self.n_spkr = len(json.load(open(self.config["data"]["corpus"]["spkr_map"])))

    def set_model(self):
        model_cfg = dict(self.config["model"])
        for k in ("pretrained_asr", "pretrained_emb", "pretrained_tts"):
            model_cfg.pop(k, None)
        phn_attr_pth = model_cfg["codebook"].get("phn_attr_pth") or ""
        self.phn_attr = read_phn_attr(phn_attr_pth) if phn_attr_pth else None
        self.model_cfg = V.config_from_yaml(
            model_cfg, n_mels=self.n_mels, linear_dim=self.linear_dim,
            vocab_size=self.vocab_size, n_spkr=self.n_spkr,
            attr_dim=0 if self.phn_attr is None else self.phn_attr.shape[1])

        assert self.paras.load is not None
        ckpt = load_checkpoint(self.paras.load)
        self.params = jax.tree_util.tree_map(jax.numpy.asarray, ckpt["model"])
        self.state = jax.tree_util.tree_map(jax.numpy.asarray, ckpt["state"])
        self.mesh = self._make_mesh()
        if self.mesh is not None:
            from ..parallel.mesh import replicate, shard_params

            self.params = shard_params(self.params, self.mesh)
            self.state = replicate(self.state, self.mesh)
        self.step = ckpt["global_step"]
        self.verbose("Load ckpt from {}, restarting at step {}".format(self.paras.load, self.step))

        h = self.config["hparas"]
        from ..train.optim import make_optimizer

        tx, _ = make_optimizer(h["optimizer"], h["lr"], h["lr_scheduler"])
        self.builder = StepBuilder(
            self.model_cfg, self.featurizer,
            None if self.phn_attr is None else jax.numpy.asarray(self.phn_attr),
            tx, weights=Weights(),
            freq_loss_kwargs=dict(
                sample_rate=self.config["data"]["audio"]["sample_rate"],
                n_mels=self.n_mels, loss=h["freq_loss_type"],
                differential_loss=h["differential_loss"],
                emphasize_linear_low=h["emphasize_linear_low"]),
            mesh=self.mesh,
        )
        self._eval_step = self.builder.make_eval_step()
        self.rng = jax.random.PRNGKey(self.paras.seed)

    def exec(self):
        self.gen_specgram("test", self.logdir + "_%dk" % (self.step // 1000))

    def gen_specgram(self, split, output_dir):
        """One-deep software pipeline: batch i's device outputs are written
        to disk while the device already runs batch i+1 (JAX dispatch is
        async; the blocking ``np.asarray`` readback happens one step late,
        so host IO and the ~10-80 ms tunnel readback overlap decode)."""
        os.makedirs(output_dir, exist_ok=True)
        self.verbose("Save outputs in {}".format(output_dir))
        cnt = 0
        loader = getattr(self, split + "_set")
        r = self.model_cfg.n_frames_per_step
        n_batches = len(loader)
        acfg = self.featurizer.cfg

        def write_outputs(batch, out, wavs_dev):
            n = 0
            mel_pred = np.asarray(out["mel_pred"])
            lin_pred = np.asarray(out["lin_pred"])
            align_pred = np.asarray(out["align"])
            enc_step = np.asarray((batch.text != 0).sum(-1)).tolist()
            dec_step = [int(t_len * V.FRAME_PHN_RATIO) // r for t_len in enc_step]
            wavs = None if wavs_dev is None else np.asarray(wavs_dev)
            for idx in range(mel_pred.shape[0]):
                fname = batch.fids[idx]
                np.save(join(output_dir, fname + "-mel.npy"),
                        mel_pred[idx].astype(np.float32), allow_pickle=False)
                np.save(join(output_dir, fname + "-spec.npy"),
                        lin_pred[idx].astype(np.float32), allow_pickle=False)
                ali = align_pred[idx][: dec_step[idx], : enc_step[idx]]
                np.save(join(output_dir, fname + "-align.npy"), ali)
                if wavs is not None:
                    wavio.write(join(output_dir, fname + "-pred.wav"), wavs[idx], acfg.sample_rate)
                n += 1
            return n

        pending = None
        for i, batch in enumerate(loader):
            self.progress("Generating spectrogram for {} - {}/{}".format(split, i + 1, n_batches))
            batch = self._shard(batch)
            k2 = jax.random.fold_in(self.rng, i + 1)
            out = self._eval_step(self.params, self.state, self.rng, i, batch.waves,
                                  batch.wave_len, batch.text, batch.sid,
                                  margin_frames=INFERENCE_MARGIN_FRAMES)
            wavs_dev = None
            if self.paras.gen_wav:
                amp = self.featurizer.linear_to_amp(out["lin_pred"])
                wavs_dev = specgram_to_waveform(
                    amp, k2, n_fft=acfg.n_fft, hop=acfg.hop_length,
                    win_length=acfg.win_length,
                    preemphasis_coeff=acfg.preemphasis_coeff)
            if pending is not None:
                cnt += write_outputs(*pending)
            pending = (batch, out, wavs_dev)
        if pending is not None:
            cnt += write_outputs(*pending)

        self.verbose("Save {} spectorgram totally".format(cnt))
