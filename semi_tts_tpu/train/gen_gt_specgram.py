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
        """One-deep pipeline (see gen_specgram/asr_decode): batch i-1's
        features are written while the device featurizes batch i; Griffin-Lim
        keys come from in-graph fold_in instead of host `random.split`."""
        os.makedirs(output_dir, exist_ok=True)
        self.verbose("Save outputs in {}".format(output_dir))
        loader = getattr(self, split + "_set")
        acfg = self.featurizer.cfg
        cnt = 0

        def write_outputs(batch, mel_dev, linear_dev, flen_dev, wavs_dev):
            n = 0
            mel, linear, flen = (np.asarray(mel_dev), np.asarray(linear_dev),
                                 np.asarray(flen_dev))
            wavs = None if wavs_dev is None else np.asarray(wavs_dev)
            for i, fname in enumerate(batch.fids):
                T = int(flen[i])
                np.save(join(output_dir, fname + "-mel.npy"), mel[i, :T], allow_pickle=False)
                np.save(join(output_dir, fname + "-spec.npy"), linear[i, :T], allow_pickle=False)
                if wavs is not None:
                    wavio.write(join(output_dir, fname + "-pred.wav"), wavs[i], acfg.sample_rate)
                n += 1
            return n

        pending = None
        for bi, batch in enumerate(loader):
            batch = self._shard(batch)
            mel, linear, flen = self.featurizer.featurize(batch.waves, batch.wave_len)
            wavs_dev = None
            if self.paras.gen_wav:
                k = jax.random.fold_in(self.rng, bi)
                amp = self.featurizer.linear_to_amp(linear)
                wavs_dev = specgram_to_waveform(
                    amp, k, n_fft=acfg.n_fft, hop=acfg.hop_length,
                    win_length=acfg.win_length, preemphasis_coeff=acfg.preemphasis_coeff)
            if pending is not None:
                cnt += write_outputs(*pending)
            pending = (batch, mel, linear, flen, wavs_dev)
        if pending is not None:
            cnt += write_outputs(*pending)
        self.verbose("Save {} spectorgram totally".format(cnt))
