"""Offline CLI tools: g2p post-processing and the batched vocoder CLI."""

import os
import subprocess
import sys

import numpy as np

from helpers import REPO


def test_g2p_reduce_mapping_covers_vocab():
    sys.path.insert(0, os.path.join(REPO, "util_cli"))
    from g2p_common import PHONEME_REDUCE_MAPPING, clean_line, remove_num

    vocab = {l.strip() for l in open(os.path.join(REPO, "data/cmu_phn.vocab"))}
    reduced = set(PHONEME_REDUCE_MAPPING.values()) - {""}
    # every reduced phone must be in the vocab (plus '.') and vice versa
    assert reduced == vocab, reduced ^ vocab
    assert remove_num("AA1") == "AA"
    assert clean_line('He said: "hi!" (loudly)', no_punc=False) == "He said hi. loudly"
    assert clean_line("He said: hi! now", no_punc=True) == "He said hi now"


def test_main_cli_errors():
    env = dict(os.environ)
    r = subprocess.run([sys.executable, "main.py", "--config", "/nope.yaml"],
                       capture_output=True, text=True, cwd=REPO, env=env, timeout=120)
    assert r.returncode != 0
    assert "config file not found" in r.stderr
    r2 = subprocess.run([sys.executable, "main.py"], capture_output=True, text=True,
                        cwd=REPO, env=env, timeout=120)
    assert r2.returncode != 0
    assert "--config is required" in r2.stderr


def test_gen_wav_cli(tmp_path):
    """gen_wav_from_specgram over synthetic -spec.npy files."""
    import yaml

    from helpers import tiny_config

    root = str(tmp_path / "corpus")
    os.makedirs(root)
    cfg = tiny_config(root)
    cfg_path = tmp_path / "cfg.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    spec_dir = tmp_path / "specs"
    os.makedirs(spec_dir)
    rng = np.random.RandomState(0)
    for name, T in [("a-spec.npy", 30), ("b-spec.npy", 30), ("c-spec.npy", 41)]:
        np.save(spec_dir / name, rng.rand(T, cfg["data"]["audio"]["num_freq"]).astype(np.float32))
    out_dir = tmp_path / "wavs"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, os.path.join(REPO, "util_cli/gen_wav_from_specgram.py"),
                        "--config", str(cfg_path), "--specgram-dir", str(spec_dir),
                        "--output-dir", str(out_dir), "--batch", "2", "--cpu"],
                       capture_output=True, text=True, cwd=REPO, timeout=420, env=env)
    assert r.returncode == 0, r.stderr[-1000:]
    from semi_tts_tpu.data import wavio

    wavs = sorted(os.listdir(out_dir))
    assert wavs == ["a.wav", "b.wav", "c.wav"]
    w, sr = wavio.read(out_dir / "a.wav")
    assert sr == 22050 and np.isfinite(w).all() and w.shape[1] > 1000
