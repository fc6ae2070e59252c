#!/usr/bin/env python
"""CLI entry point — same flag surface as the reference's main.py
(`/root/reference/main.py:14-68`): YAML config + argparse flags dispatch to a
solver class, then the ``load_data -> set_model -> exec`` lifecycle.

The reference's dangling dispatch targets (`bin/asr_decode.py`,
`bin/gen_gt_specgram.py`, `bin/train_asr.py` are absent from its snapshot —
SURVEY.md "snapshot caveats") are implemented here: --asr-only trains the
supervised CTC path, --gen-gt-specgram dumps ground-truth features.
"""

import argparse
import random

import numpy as np
import yaml

parser = argparse.ArgumentParser(description="Training E2E asr.")
parser.add_argument("--config", type=str, help="Path to experiment config.")
parser.add_argument("--name", default=None, type=str, help="Name for logging.")
parser.add_argument("--logdir", default="log/", type=str, help="Logging path.")
parser.add_argument("--ckpdir", default="ckpt/", type=str, help="Checkpoint/Result path.")
parser.add_argument("--load", default=None, type=str, help="Load pre-trained model")
parser.add_argument("--seed", default=0, type=int, help="Random seed for reproducable results.")
parser.add_argument("--njobs", default=5, type=int, help="Number of threads for decoding.")
parser.add_argument("--cpu", action="store_true", help="Disable TPU training.")
parser.add_argument("--debug", action="store_true", help="Debug use.")
parser.add_argument("--no-pin", action="store_true", help="Disable pin-memory for dataloader")
parser.add_argument("--asr-decode", action="store_true", help="ASR greedy decode.")
parser.add_argument("--gen-specgram", action="store_true", help="Generating mel/linear spectrogram.")
parser.add_argument("--gen-gt-specgram", action="store_true", help="Generating ground-truth mel/linear spectrogram.")
parser.add_argument("--no-msg", action="store_true", help="Hide all messages.")
parser.add_argument("--actual-len", action="store_true", help="Using actual len for CTC loss.")
parser.add_argument("--store-best-per", action="store_true", help="Only store the model with best PER.")
parser.add_argument("--asr-only", action="store_true", help="Only train supervised ASR.")
parser.add_argument("--gen-wav", action="store_true", help="Generate waveform using Griffin-Lim.")
paras = parser.parse_args()
setattr(paras, "gpu", not paras.cpu)
setattr(paras, "pin_memory", not paras.no_pin)  # (reference inverted this — known bug not copied)
setattr(paras, "verbose", not paras.no_msg)
if not paras.config:
    parser.error("--config is required (path to an experiment YAML, e.g. config/supervised.yaml)")
try:
    config = yaml.load(open(paras.config, "r"), Loader=yaml.FullLoader)
except FileNotFoundError:
    parser.error(f"config file not found: {paras.config}")

random.seed(paras.seed)
np.random.seed(paras.seed)

if paras.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

if paras.asr_decode:
    mode = "test"
    from semi_tts_tpu.train.asr_decode import VqvaeDecoder as Solver
elif paras.gen_specgram:
    mode = "test"
    from semi_tts_tpu.train.gen_specgram import SpecgramGenerator as Solver
elif paras.gen_gt_specgram:
    mode = "test"
    from semi_tts_tpu.train.gen_gt_specgram import SpecgramGenerator as Solver
elif paras.asr_only:
    mode = "train"
    from semi_tts_tpu.train.train_asr import AsrTrainer as Solver
else:
    mode = "train"
    from semi_tts_tpu.train.train_vqvae import VqvaeTrainer as Solver

solver = Solver(config, paras, mode)
solver.load_data()
solver.set_model()
solver.exec()
