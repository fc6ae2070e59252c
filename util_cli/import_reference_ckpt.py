#!/usr/bin/env python
"""Convert a trained checkpoint of the PyTorch reference into this
framework's npz checkpoint.

The reference has no equivalent (its checkpoints ARE its format); this is
the migration path for its users: bring `best_tts_loss.pth` (the solver
triple `src/solver.py:204-218`, or a bare state_dict) plus the experiment
YAML, get a checkpoint loadable by every surface here — `main.py --load`,
`--gen-specgram`, `serve.TTSServer.from_checkpoint`, fine-tuning.

    python util_cli/import_reference_ckpt.py \
        --config config/semi-multi-spkr-paired-data.yaml \
        --torch-ckpt /path/to/best_tts_loss.pth \
        --output ckpt/imported/best_tts_loss.pth

Weights and BatchNorm running stats are carried exactly; optimizer moments
are not (trainers re-init the optimizer; the Noam schedule resumes from the
carried global_step).
"""

import argparse
import json
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(args):
    import jax

    jax.config.update("jax_platforms", "cpu")  # conversion is host-side

    from semi_tts_tpu.models import vqvae as V
    from semi_tts_tpu.train.checkpoint import save_checkpoint
    from semi_tts_tpu.train.torch_import import import_reference_checkpoint
    from semi_tts_tpu.utils.metrics import read_phn_attr

    config = yaml.safe_load(open(args.config))
    audio = config["data"]["audio"]
    corpus = config["data"]["corpus"]

    from semi_tts_tpu.data.text import load_text_encoder

    tokenizer = load_text_encoder("phoneme", vocab_file=corpus["vocab_file"])
    n_spkr = len(json.load(open(corpus["spkr_map"])))

    model_cfg = dict(config["model"])
    for k in ("pretrained_asr", "pretrained_emb", "pretrained_tts"):
        model_cfg.pop(k, None)
    phn_attr_pth = model_cfg["codebook"].get("phn_attr_pth") or ""
    phn_attr = read_phn_attr(phn_attr_pth) if phn_attr_pth else None
    cfg = V.config_from_yaml(
        model_cfg, n_mels=audio["num_mels"],
        linear_dim=audio["num_freq"] if audio["use_linear"] else None,
        vocab_size=tokenizer.vocab_size, n_spkr=n_spkr,
        attr_dim=0 if phn_attr is None else phn_attr.shape[1])

    ckpt = import_reference_checkpoint(args.torch_ckpt, cfg, phn_attr,
                                       strict=not args.lenient)
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    save_checkpoint(args.output, params=ckpt["model"], state=ckpt["state"],
                    opt_state=None, step=ckpt["global_step"])
    n = len(jax.tree_util.tree_leaves(ckpt["model"]))
    print(f"imported {n} weight tensors (step {ckpt['global_step']}) "
          f"-> {args.output}")
    return args.output


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", required=True,
                    help="The experiment YAML the checkpoint was trained with.")
    ap.add_argument("--torch-ckpt", required=True,
                    help="Reference .pth file (solver triple or state_dict).")
    ap.add_argument("--output", required=True,
                    help="Output npz-checkpoint path (conventionally .pth).")
    ap.add_argument("--lenient", action="store_true",
                    help="Ignore unconsumed checkpoint keys instead of failing.")
    return run(ap.parse_args(argv))


if __name__ == "__main__":
    main()
