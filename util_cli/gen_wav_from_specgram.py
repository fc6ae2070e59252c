#!/usr/bin/env python
"""Offline vocoder CLI: ``*-spec.npy`` linear spectrograms -> Griffin-Lim wavs.

Parity target: `/root/reference/util/gen_wav_from_specgram.py` — same flags
(--config/--specgram-dir/--output-dir/--sample); TPU-native difference: files
are grouped by frame count and reconstructed in *batched* on-device
Griffin-Lim instead of one utterance at a time.
"""

import argparse
import os
import sys
from collections import defaultdict
from glob import glob
from os.path import basename, join

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLE_LIST = [  # (`util/gen_wav_from_specgram.py:13-34`)
    "LJ010-0057", "LJ027-0067", "LJ009-0213", "LJ034-0190", "LJ005-0281",
    "LJ002-0054", "LJ028-0259", "LJ012-0022", "LJ006-0039", "LJ019-0060",
    "LJ023-0001", "LJ044-0108", "LJ007-0219", "LJ016-0258", "LJ042-0113",
    "LJ013-0087", "LJ010-0003", "LJ019-0128", "LJ013-0200", "LJ001-0131",
]


def run(paras):
    import jax

    if paras.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from semi_tts_tpu.data import wavio
    from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer
    from semi_tts_tpu.ops.griffin_lim import specgram_to_waveform

    os.makedirs(paras.output_dir, exist_ok=True)
    config = yaml.load(open(paras.config), Loader=yaml.FullLoader)
    a = config["data"]["audio"]
    acfg = AudioConfig(num_freq=a["num_freq"], num_mels=a["num_mels"],
                       frame_length_ms=a["frame_length_ms"], frame_shift_ms=a["frame_shift_ms"],
                       preemphasis_coeff=a["preemphasis_coeff"], sample_rate=a["sample_rate"],
                       use_linear=a["use_linear"], snr_range=tuple(a["snr_range"]),
                       time_stretch_range=tuple(a["time_stretch_range"]))
    feat = AudioFeaturizer(acfg)

    files = sorted(glob(join(paras.specgram_dir, "*-spec.npy")))
    if paras.sample:
        files = [f for f in files if basename(f).replace("-spec.npy", "") in SAMPLE_LIST]

    by_T = defaultdict(list)
    for f in files:
        spec = np.load(f)
        by_T[spec.shape[0]].append((f, spec))

    rng = jax.random.PRNGKey(0)
    done = 0
    for T, group in sorted(by_T.items()):
        for s in range(0, len(group), paras.batch):
            chunk = group[s : s + paras.batch]
            specs = jnp.asarray(np.stack([c[1] for c in chunk]))
            amp = feat.linear_to_amp(specs)
            rng, k = jax.random.split(rng)
            wavs = np.asarray(specgram_to_waveform(
                amp, k, n_fft=acfg.n_fft, hop=acfg.hop_length,
                win_length=acfg.win_length, preemphasis_coeff=acfg.preemphasis_coeff))
            for (f, _), wav in zip(chunk, wavs):
                out = join(paras.output_dir, basename(f).replace("-spec.npy", ".wav"))
                wavio.write(out, wav, acfg.sample_rate)
                done += 1
                print(f"[{done}/{len(files)}] {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Convert spectrogram into raw waveform.")
    parser.add_argument("--config", type=str, required=True, help="Path to experiment config.")
    parser.add_argument("--specgram-dir", type=str, required=True, help="Path to input spectrogram.")
    parser.add_argument("--output-dir", type=str, required=True, help="Path to output wave.")
    parser.add_argument("--sample", action="store_true", help="Only sample some wavs.")
    parser.add_argument("--batch", type=int, default=16, help="Griffin-Lim batch size.")
    parser.add_argument("--cpu", action="store_true", help="Force CPU execution.")
    run(parser.parse_args())
