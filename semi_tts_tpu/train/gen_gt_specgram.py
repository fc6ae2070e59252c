"""Ground-truth spectrogram dump (the reference's dangling
``--gen-gt-specgram`` dispatch, `main.py:55-57` — solver file absent from its
snapshot). Featurizes the test split on device and saves the same artifact
set as gen_specgram, letting vocoder experiments compare GT vs predicted."""

from __future__ import annotations

import os
from os.path import join

import jax
import numpy as np

from ..data import wavio
from ..ops.griffin_lim import specgram_to_waveform
from .gen_specgram import SpecgramGenerator as _Base


class SpecgramGenerator(_Base):
    def set_model(self):
        # no model needed: ground-truth features only
        self.step = 0
        self.mesh = self._make_mesh()
        self.rng = jax.random.PRNGKey(self.paras.seed)

    def exec(self):
        self.gen_specgram("test", self.logdir + "_gt")

    def gen_specgram(self, split, output_dir):
        os.makedirs(output_dir, exist_ok=True)
        self.verbose("Save outputs in {}".format(output_dir))
        loader = getattr(self, split + "_set")
        acfg = self.featurizer.cfg
        cnt = 0
        for batch in loader:
            batch = self._shard(batch)
            mel, linear, flen = self.featurizer.featurize(batch.waves, batch.wave_len)
            mel, linear, flen = np.asarray(mel), np.asarray(linear), np.asarray(flen)
            if self.paras.gen_wav:
                self.rng, k = jax.random.split(self.rng)
                amp = self.featurizer.linear_to_amp(linear)
                wavs = np.asarray(specgram_to_waveform(
                    amp, k, n_fft=acfg.n_fft, hop=acfg.hop_length,
                    win_length=acfg.win_length, preemphasis_coeff=acfg.preemphasis_coeff))
            for i, fname in enumerate(batch.fids):
                T = int(flen[i])
                np.save(join(output_dir, fname + "-mel.npy"), mel[i, :T], allow_pickle=False)
                np.save(join(output_dir, fname + "-spec.npy"), linear[i, :T], allow_pickle=False)
                if self.paras.gen_wav:
                    wavio.write(join(output_dir, fname + "-pred.wav"), wavs[i], acfg.sample_rate)
                cnt += 1
        self.verbose("Save {} spectorgram totally".format(cnt))
