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

parser = argparse.ArgumentParser(
    description="Semi-supervised TTS/ASR training and inference on TPU.")
parser.add_argument("--config", type=str, help="Experiment YAML to run.")
parser.add_argument("--name", default=None, type=str,
                    help="Experiment name (defaults to <config>-sd<seed>).")
parser.add_argument("--logdir", default="log/", type=str, help="Directory for TensorBoard logs.")
parser.add_argument("--ckpdir", default="ckpt/", type=str,
                    help="Directory for checkpoints and generated outputs.")
parser.add_argument("--load", default=None, type=str, help="Checkpoint to restore and resume from.")
parser.add_argument("--seed", default=0, type=int, help="Global RNG seed.")
parser.add_argument("--njobs", default=5, type=int, help="Worker threads for data loading.")
parser.add_argument("--cpu", action="store_true", help="Run on CPU instead of the TPU.")
parser.add_argument("--debug", action="store_true", help="Enable debug-mode behavior.")
parser.add_argument("--no-pin", action="store_true",
                    help="Skip pinned host memory in the data loader.")
parser.add_argument("--asr-decode", action="store_true",
                    help="Greedy-decode the ASR branch on the test split.")
parser.add_argument("--gen-specgram", action="store_true",
                    help="Run TTS inference and dump mel/linear spectrograms.")
parser.add_argument("--gen-gt-specgram", action="store_true",
                    help="Dump ground-truth features for the test split.")
parser.add_argument("--no-msg", action="store_true", help="Silence all stdout messages.")
parser.add_argument("--actual-len", action="store_true",
                    help="Use true (unpadded) frame counts as CTC input lengths.")
parser.add_argument("--store-best-per", action="store_true",
                    help="Checkpoint only when dev PER improves.")
parser.add_argument("--asr-only", action="store_true",
                    help="Train just the supervised ASR branch.")
parser.add_argument("--gen-wav", action="store_true",
                    help="Also vocode generated spectrograms with Griffin-Lim.")
parser.add_argument("--pretrain-speech", action="store_true",
                    help="Pretrain the audio LM (TTS decoder init; emits best_mel.pth).")
parser.add_argument("--pretrain-text", action="store_true",
                    help="Pretrain the text LM (codebook init; emits best_acc.pth).")
parser.add_argument("--profile", action="store_true",
                    help="Capture a jax.profiler trace of a window of train steps into logdir.")
parser.add_argument("--mesh", default="", type=str,
                    help="Run over a DATAxMODEL device mesh, e.g. 4x2 "
                         "(data-parallel x tensor-parallel); applies to training "
                         "and the inference solvers. Default: single device.")
parser.add_argument("--compile-cache", default="", type=str,
                    help="Directory for JAX's persistent XLA compilation "
                         "cache (also via SEMI_TTS_COMPILE_CACHE). Restarted "
                         "runs with the same program shapes skip the 60-100 s "
                         "TPU compiles. Empty = disabled.")
parser.add_argument("--matmul-precision", default="default",
                    choices=["default", "high", "highest"],
                    help="Global precision for model matmuls/convs on TPU: "
                         "'default' = bf16 compute with fp32 params/grads "
                         "(standard TPU mixed precision), 'high' = bf16x3, "
                         "'highest' = full fp32 for strict-parity runs. The "
                         "DSP featurizer has its own knob (audio.dft_precision).")
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

if paras.matmul_precision != "default":
    import jax

    jax.config.update("jax_default_matmul_precision", paras.matmul_precision)

from semi_tts_tpu.utils.compile_cache import maybe_enable_from_env

maybe_enable_from_env(paras.compile_cache)

# multi-host bring-up (env-driven; no-op single-process) — must precede the
# first device query so jax.process_index()/process_count() are correct for
# the data loaders' shard selection
from semi_tts_tpu.parallel.mesh import init_distributed

init_distributed()

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
elif paras.pretrain_speech:
    mode = "train"
    from semi_tts_tpu.train.train_lm import AudioLmTrainer as Solver
elif paras.pretrain_text:
    mode = "train"
    from semi_tts_tpu.train.train_lm import TextLmTrainer as Solver
else:
    mode = "train"
    from semi_tts_tpu.train.train_vqvae import VqvaeTrainer as Solver

solver = Solver(config, paras, mode)
solver.load_data()
solver.set_model()
solver.exec()
