"""Greedy CTC decoding of the test split (the reference's dangling
``--asr-decode`` dispatch, `main.py:49-51` — solver file absent from its
snapshot). Emits per-utterance phoneme hypotheses + PER to
``{logdir}_decode/hyp.tsv``."""

from __future__ import annotations

import os
from os.path import join

import jax
import numpy as np

from ..models import vqvae as V
from ..utils.metrics import IGNORE_INDICES, cal_per
from .gen_specgram import SpecgramGenerator as _Base


class VqvaeDecoder(_Base):
    def exec(self):
        output_dir = self.logdir + "_decode"
        os.makedirs(output_dir, exist_ok=True)
        loader = self.test_set
        rows, pers = [], []
        for batch in loader:
            batch = self._shard(batch)
            self.rng, k = jax.random.split(self.rng)
            mel, linear, _, flen, _ = self.builder._features(k, batch.waves, batch.wave_len,
                                                             need_aug=False)
            p_code, _, post_prob, _ = V.speech_to_text(
                self.params, self.state, k, self.model_cfg, self.builder.phn_attr,
                mel, paired_bs=mel.shape[0], train=False)
            pred = np.asarray(p_code).argmax(-1)
            enc_len = np.asarray(self.builder._enc_len(flen, p_code.shape[1]))
            pers.append(cal_per(pred, np.asarray(batch.text), pred_lens=enc_len))
            for i, fid in enumerate(batch.fids):
                p = pred[i][: int(enc_len[i])].tolist()
                p = [v for j, v in enumerate(p)
                     if (j == 0 or v != p[j - 1]) and v not in IGNORE_INDICES]
                rows.append((fid, self.tokenizer.decode(p)))
        per = sum(pers) / max(len(pers), 1)
        with open(join(output_dir, "hyp.tsv"), "w") as f:
            f.write("id\thyp\n")
            for fid, hyp in rows:
                f.write(f"{fid}\t{hyp}\n")
        self.verbose(f"Decoded {len(rows)} utterances | PER = {per:.3f} -> {output_dir}/hyp.tsv")
