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
        """Same one-deep pipeline as gen_specgram: batch i-1's hypotheses
        are scored on host while the device encodes batch i. Per-batch keys
        come from in-graph fold_in (a host-side `random.split` would add a
        10-80 ms device round trip per batch, re-serializing the loop)."""
        import jax.numpy as jnp

        output_dir = self.logdir + "_decode"
        os.makedirs(output_dir, exist_ok=True)
        loader = self.test_set
        rows, pers = [], []

        def score(batch, pred_dev, enc_len_dev):
            pred = np.asarray(pred_dev)
            enc_len = np.asarray(enc_len_dev)
            pers.append(cal_per(pred, np.asarray(batch.text), pred_lens=enc_len))
            for i, fid in enumerate(batch.fids):
                p = pred[i][: int(enc_len[i])].tolist()
                p = [v for j, v in enumerate(p)
                     if (j == 0 or v != p[j - 1]) and v not in IGNORE_INDICES]
                rows.append((fid, self.tokenizer.decode(p)))

        pending = None
        for bi, batch in enumerate(loader):
            batch = self._shard(batch)
            k = jax.random.fold_in(self.rng, bi)
            mel, linear, _, flen, _ = self.builder._features(k, batch.waves, batch.wave_len,
                                                             need_aug=False)
            p_code, _, post_prob, _ = V.speech_to_text(
                self.params, self.state, k, self.model_cfg, self.builder.phn_attr,
                mel, paired_bs=mel.shape[0], train=False)
            pred_dev = jnp.argmax(p_code, -1)
            enc_len_dev = self.builder._enc_len(flen, p_code.shape[1])
            if pending is not None:
                score(*pending)
            pending = (batch, pred_dev, enc_len_dev)
        if pending is not None:
            score(*pending)
        per = sum(pers) / max(len(pers), 1)
        with open(join(output_dir, "hyp.tsv"), "w") as f:
            f.write("id\thyp\n")
            for fid, hyp in rows:
                f.write(f"{fid}\t{hyp}\n")
        self.verbose(f"Decoded {len(rows)} utterances | PER = {per:.3f} -> {output_dir}/hyp.tsv")
