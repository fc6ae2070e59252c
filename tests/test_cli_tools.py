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


def test_g2p_tools_to_tokenizer_chain(tmp_path):
    """g2p tool -> map table -> PhoneTextEncoder.file_to_seq, end to end,
    with a deterministic stub g2p backend (the real g2p_en is an offline
    dependency; everything downstream of it is exercised here)."""
    import json
    from argparse import Namespace
    from os.path import join

    import g2p_lj
    import g2p_vctk

    def stub_g2p(text):  # words -> fake CMU tokens with stress digits
        out = []
        for w in text.split():
            out += ["HH", "AH0", "L OW1".split()[0]][: 1 + len(w) % 2]
            out.append(" ")
        out.append(".")
        return out

    src = str(tmp_path / "metadata.csv")
    with open(src, "w") as f:
        f.write("LJ001-0001|x|Printing, in the only sense.\n")
        f.write("LJ001-0002|x|Hello world\n")
    out = str(tmp_path / "lj_table.csv")
    g2p_lj.run(Namespace(src=src, out=out, no_punc=False), g2p=stub_g2p)

    from semi_tts_tpu.data.text import load_text_encoder

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    enc = load_text_encoder("phoneme", join(REPO, "data/cmu_phn.vocab"), map_table=out)
    seq = enc.file_to_seq("LJ001-0001.wav")
    assert len(seq) > 2 and seq[-1] == 0  # trailing <pad>
    assert all(0 <= t < enc.vocab_size for t in seq)

    # vctk variant also emits the speaker-id json
    src2 = str(tmp_path / "vctk.txt")
    with open(src2, "w") as f:
        f.write("p225_001|p225|Please call Stella\n")
        f.write("p226_001|p226|Ask her to bring\n")
    out2 = str(tmp_path / "vctk_table.csv")
    spkr_json = str(tmp_path / "spkr.json")
    g2p_vctk.run(Namespace(src=src2, out=out2, out_spkr_dict=spkr_json,
                           no_punc=True), g2p=stub_g2p)
    enc2 = load_text_encoder("phoneme", join(REPO, "data/cmu_phn.vocab"), map_table=out2)
    assert len(enc2.file_to_seq("p226_001.wav")) > 1
    assert json.load(open(spkr_json)) == {"p225": 0, "p226": 1}


def test_g2p_rule_fallback_offline_chain(tmp_path, monkeypatch):
    """The built-in RuleG2p fallback (--fallback-rules) generates a usable
    map table with NO external G2P dependency: every emitted phone reduces
    into the 39-phone set and the table feeds the tokenizer."""
    import sys
    from argparse import Namespace
    from os.path import join

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, join(REPO, "util_cli"))  # keep the test self-contained

    import g2p_lj
    from g2p_common import (PHONEME_REDUCE_MAPPING, RuleG2p, load_g2p,
                            reduce_phonemes)

    # force the ImportError branch even on hosts where g2p_en/nltk exist
    monkeypatch.setitem(sys.modules, "nltk", None)
    monkeypatch.setitem(sys.modules, "g2p_en", None)
    g2p = load_g2p(fallback_rules=True)
    assert isinstance(g2p, RuleG2p)

    # totality: arbitrary text never raises and always reduces
    for text in ("The quick brown fox jumps over the lazy dog.",
                 "Knights wrought 12 pounds, though!",
                 "zyzzyva qat's edge"):
        red = reduce_phonemes(g2p(text))
        assert all(r == "" or r in PHONEME_REDUCE_MAPPING.values() for r in red)

    src = str(tmp_path / "metadata.csv")
    with open(src, "w") as f:
        f.write("LJ001-0001|x|Printing, in the only sense.\n")
        f.write("LJ001-0002|x|Hello world.\n")
    out = str(tmp_path / "lj_table.csv")
    g2p_lj.run(Namespace(src=src, out=out, no_punc=False, fallback_rules=True))

    from semi_tts_tpu.data.text import load_text_encoder

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    enc = load_text_encoder("phoneme", join(REPO, "data/cmu_phn.vocab"), map_table=out)
    for fid in ("LJ001-0001.wav", "LJ001-0002.wav"):
        seq = enc.file_to_seq(fid)
        assert len(seq) > 4 and seq[-1] == 0
        assert all(0 <= t < enc.vocab_size for t in seq)
