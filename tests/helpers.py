"""Shared test fixtures: a tiny synthetic corpus + scaled-down experiment
config exercising the full CLI/config schema without real VCTK audio."""

from __future__ import annotations

import json
import os
from argparse import Namespace
from os.path import join

import numpy as np

from semi_tts_tpu.data import wavio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VOCAB = [l.strip() for l in open(join(REPO, "data/cmu_phn.vocab"))]
SR = 22050


def synthesize_speech(duration, sr=SR, seed=0, f0=120.0):
    """Formant-synthesized pseudo-speech with real speech structure: voiced
    vowel segments (glottal-pulse source with an f0 contour driven through a
    3-formant resonator cascade), unvoiced fricative bursts, and silence
    gaps. Gives the fidelity/e2e tests a fixture with formants, harmonics,
    onsets, and silences rather than a sine+noise proxy."""
    from scipy.signal import lfilter

    rng = np.random.RandomState(seed)
    n = int(duration * sr)
    out = np.zeros(n)
    # F1/F2/F3 of /a/, /i/, /u/, /ae/ (Peterson-Barney ballpark)
    vowels = [(730, 1090, 2440), (270, 2290, 3010), (300, 870, 2240), (660, 1720, 2410)]
    t = 0
    while t < n:
        seg_n = min(int(rng.uniform(0.08, 0.25) * sr), n - t)
        kind = rng.rand()
        if kind < 0.15:  # silence gap
            t += seg_n
            continue
        if kind < 0.32:  # fricative: high-passed noise burst
            sig = np.diff(rng.randn(seg_n), prepend=0.0) * 0.15
        else:  # voiced vowel
            i = np.arange(seg_n)
            f = f0 * (1.0 + 0.08 * np.sin(2 * np.pi * 2.3 * i / sr)
                      + rng.uniform(-0.08, 0.08))
            phase = np.cumsum(f) / sr
            src = np.maximum(0.0, np.sin(2 * np.pi * phase)) ** 4
            src = np.diff(src, prepend=0.0)  # sharpened glottal pulses
            sig = src
            for fc, bw in zip(vowels[rng.randint(len(vowels))], (60, 90, 120)):
                r = np.exp(-np.pi * bw / sr)
                th = 2 * np.pi * fc / sr
                sig = lfilter([1.0], [1.0, -2 * r * np.cos(th), r * r], sig)
        ramp = min(seg_n // 4, int(0.01 * sr))
        env = np.ones(seg_n)
        if ramp > 0:
            env[:ramp] = np.linspace(0, 1, ramp)
            env[-ramp:] = np.linspace(1, 0, ramp)
        out[t : t + seg_n] = sig * env
        t += seg_n
    peak = np.abs(out).max()
    return (0.4 * out / max(peak, 1e-6)).astype(np.float32)


def phone_acoustics(phone, seed=1234):
    """Deterministic acoustic recipe for one phoneme: a (kind, params) pair
    derived by hashing the phone string. Vowel-ish phones get a distinct
    formant triple; consonant-ish ones a distinct noise band. Used by
    `synthesize_from_phonemes` so audio is a *rendering of the transcript* —
    the speech<->text mapping becomes learnable (and dev PER meaningful),
    which the random-transcript corpus of `make_synthetic_corpus` is not."""
    import zlib

    # zlib.crc32 is process-stable (python's hash() is salted per process)
    h = zlib.crc32(f"{phone}|{seed}".encode()) % (1 << 30)
    rng = np.random.RandomState(h)
    if phone in (".",):
        return ("sil", {})
    vowelish = {"aa", "ae", "ah", "ao", "aw", "ay", "eh", "er", "ey", "ih",
                "iy", "ow", "oy", "uh", "uw", "l", "r", "w", "y", "m", "n", "ng"}
    if phone in vowelish:
        f1 = rng.uniform(250, 850)
        f2 = rng.uniform(f1 + 300, 2400)
        f3 = rng.uniform(f2 + 300, 3200)
        return ("voiced", {"formants": (f1, f2, f3)})
    # fricatives/stops: band-limited noise with a distinct center
    return ("noise", {"center": rng.uniform(1500, 8000), "bw": rng.uniform(500, 2000)})


def synthesize_from_phonemes(phones, sr=SR, seed=0, f0=120.0,
                             phn_dur=0.09):
    """Render a phoneme sequence to audio deterministically (per-phone
    acoustics from `phone_acoustics`, fixed ~phn_dur per phone, speaker f0).
    The inverse problem (audio -> phonemes) is thus well-posed: the corpus
    built on this generator gives semi-supervised cycle experiments a real
    learnable mapping."""
    from scipy.signal import lfilter

    rng = np.random.RandomState(seed)
    seg_n = int(phn_dur * sr)
    out = []
    for ph in phones:
        kind, prm = phone_acoustics(ph)
        n = seg_n + rng.randint(-seg_n // 8, seg_n // 8 + 1)
        if kind == "sil":
            out.append(np.zeros(n))
            continue
        if kind == "noise":
            sig = rng.randn(n)
            r = np.exp(-np.pi * prm["bw"] / sr)
            th = 2 * np.pi * prm["center"] / sr
            sig = lfilter([1.0], [1.0, -2 * r * np.cos(th), r * r], sig)
            sig *= 0.15 / max(np.abs(sig).max(), 1e-6)
        else:
            i = np.arange(n)
            f = f0 * (1.0 + 0.06 * np.sin(2 * np.pi * 2.3 * i / sr)
                      + rng.uniform(-0.05, 0.05))
            phase = np.cumsum(f) / sr
            src = np.maximum(0.0, np.sin(2 * np.pi * phase)) ** 4
            sig = np.diff(src, prepend=0.0)
            for fc, bw in zip(prm["formants"], (60, 90, 120)):
                r = np.exp(-np.pi * bw / sr)
                th = 2 * np.pi * fc / sr
                sig = lfilter([1.0], [1.0, -2 * r * np.cos(th), r * r], sig)
        ramp = max(min(n // 6, int(0.008 * sr)), 1)
        env = np.ones(n)
        env[:ramp] = np.linspace(0, 1, ramp)
        env[-ramp:] = np.linspace(1, 0, ramp)
        out.append(sig * env)
    wav = np.concatenate(out) if out else np.zeros(seg_n)
    peak = np.abs(wav).max()
    return (0.4 * wav / max(peak, 1e-6)).astype(np.float32)


def make_conditioned_corpus(root, n_per_split=(8, 64, 16, 4), seed=0,
                            inventory=10, utt_phones=(6, 12), batch_size=8):
    """Corpus whose audio is synthesized FROM its transcripts
    (`synthesize_from_phonemes`) over a small phoneme inventory — the
    learnable-mapping counterpart of `make_synthetic_corpus`, built for
    semi-supervised cycle-convergence experiments (paired split small,
    unpaired large)."""
    rng = np.random.RandomState(seed)
    inv = [p for p in VOCAB if p != "."][:inventory]
    audio_dir = join(root, "audio-corpus")
    speakers = ["p001", "p002"]
    spkr_map = {s: i for i, s in enumerate(speakers)}
    spkr_map["lj"] = len(speakers)

    rows = ["{},speaker,split,duration".format("")]
    map_rows = ["\tphn_seq\tspkr"]
    splits = ["paired", "unpaired", "dev", "test"]
    fid_n = 0
    f0s = {"p001": 110.0, "p002": 190.0}
    for split, n in zip(splits, n_per_split):
        for _ in range(n):
            spk = speakers[fid_n % 2]
            fid = f"{spk}_{fid_n:03d}"
            fid_n += 1
            phones = list(rng.choice(inv, size=rng.randint(*utt_phones)))
            wav = synthesize_from_phonemes(phones, seed=rng.randint(1 << 30),
                                           f0=f0s[spk])
            os.makedirs(join(audio_dir, spk), exist_ok=True)
            wavio.write(join(audio_dir, spk, fid + ".wav"), wav, SR)
            rows.append(f"{fid},{spk},{split},{len(wav) / SR:.2f}")
            map_rows.append(f"{fid}\t{' '.join(phones)}\t{spk}")

    with open(join(root, "partition.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(join(root, "map_table.csv"), "w") as f:
        f.write("\n".join(map_rows) + "\n")
    with open(join(root, "spkr.json"), "w") as f:
        json.dump(spkr_map, f)

    return {
        "name": "vctk",
        "path": audio_dir,
        "bucketing": False,
        "batch_size": batch_size,
        "spkr_map": join(root, "spkr.json"),
        "partition_table": join(root, "partition.csv"),
        "map_table": join(root, "map_table.csv"),
        "vocab_file": join(REPO, "data/cmu_phn.vocab"),
    }


def make_synthetic_corpus(root, n_per_split=(4, 4, 2, 2), seed=0):
    """Create wavs + partition table + spkr map + g2p map table under root.

    Returns the `data.corpus` config dict.
    """
    rng = np.random.RandomState(seed)
    audio_dir = join(root, "audio-corpus")
    speakers = ["p001", "p002"]
    spkr_map = {s: i for i, s in enumerate(speakers)}
    spkr_map["lj"] = len(speakers)

    rows = ["{},speaker,split,duration".format("")]
    map_rows = ["\tphn_seq\tspkr"]
    splits = ["paired", "unpaired", "dev", "test"]
    fid_n = 0
    for split, n in zip(splits, n_per_split):
        for _ in range(n):
            spk = speakers[fid_n % 2]
            fid = f"{spk}_{fid_n:03d}"
            fid_n += 1
            dur = rng.uniform(0.35, 0.7)
            wav = synthesize_speech(dur, seed=rng.randint(1 << 30),
                                    f0=rng.uniform(90, 250))
            os.makedirs(join(audio_dir, spk), exist_ok=True)
            wavio.write(join(audio_dir, spk, fid + ".wav"), wav, SR)
            rows.append(f"{fid},{spk},{split},{dur:.2f}")
            phns = " ".join(rng.choice(VOCAB, size=rng.randint(4, 9)))
            map_rows.append(f"{fid}\t{phns}\t{spk}")

    with open(join(root, "partition.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    with open(join(root, "map_table.csv"), "w") as f:
        f.write("\n".join(map_rows) + "\n")
    with open(join(root, "spkr.json"), "w") as f:
        json.dump(spkr_map, f)

    return {
        "name": "vctk",
        "path": audio_dir,
        "bucketing": False,
        "batch_size": 2,
        "spkr_map": join(root, "spkr.json"),
        "partition_table": join(root, "partition.csv"),
        "map_table": join(root, "map_table.csv"),
        "vocab_file": join(REPO, "data/cmu_phn.vocab"),
    }


def tiny_config(root, *, bone="seperate", unpair_speech=0.0, unpair_text=0.0,
                valid_step=100, max_step=2, separate_postnet=False):
    """Full reference-schema config scaled down for CPU tests."""
    return {
        "data": {
            "corpus": make_synthetic_corpus(root),
            "audio": {
                "num_freq": 257, "num_mels": 20,
                "frame_length_ms": 20, "frame_shift_ms": 10,
                "preemphasis_coeff": 0.97, "sample_rate": SR,
                "use_linear": True,
                "snr_range": [10, 100], "time_stretch_range": [0.9, 1.1],
            },
        },
        "hparas": {
            "valid_step": valid_step, "max_step": max_step,
            "asr_weight": 1.0, "tts_weight": 1.0,
            "unpair_text_start_step": 0, "unpair_text_weight": unpair_text,
            "unpair_speech_start_step": 0, "unpair_speech_weight": unpair_speech,
            "optimizer": "Adam", "lr": 0.001, "lr_scheduler": "decay",
            "freq_loss_type": "mse", "differential_loss": True,
            "emphasize_linear_low": True,
            "tf_start": 1.0, "tf_end": 1.0, "tf_step": 50000,
        },
        "model": {
            "stop_threshold": 0.5, "max_frames_per_phn": 3,
            "txt_update_codebook": False, "spkr_latent_dim": 8,
            "encoder": {
                "dim": 16, "kernel": [3, 4], "stride": [1, 2],
                "residual": [0, 0], "dropout": 0.5, "activation": "Tanh",
                "batch_norm": True, "rnn_bid": True, "rnn_layers": 1,
                "rnn_dim": 8, "layer_norm": False,
            },
            "codebook": {
                "bone": bone, "softmax": "normal", "latent_dim": 12,
                "commit_weight": 0, "vq_weight": 0, "temp": 1,
                "skip_prob": 0, "stop_grad": True,
                "phn_attr_pth": join(REPO, "data/phn_attr.csv"),
                "proj_attr": 4,
            },
            "decoder": {
                "separate_postnet": separate_postnet,
                "encoder": {
                    "enc_n_conv": 2, "enc_kernel_size": 5, "enc_rnn_layer": 1,
                    "enc_embed_dim": 16, "enc_dropout": 0.0,
                },
                "decoder": {
                    "n_frames_per_step": 3, "prenet_dim": 8,
                    "prenet_dropout": 0.5, "query_rnn_dim": 16,
                    "dec_rnn_dim": 16, "query_dropout": 0.1, "dec_dropout": 0.1,
                    "attn_dim": 8, "n_location_filters": 4,
                    "location_kernel_size": 7, "loc_aware": True,
                    "use_summed_weights": True, "drop_dec_in": 0.0,
                },
            },
        },
    }


def make_paras(root, **kw):
    defaults = dict(config=join(root, "cfg.yaml"), name=None,
                    logdir=join(root, "log"), ckpdir=join(root, "ckpt"),
                    load=None, seed=0, njobs=0, cpu=True, debug=False,
                    no_pin=True, gen_wav=False, actual_len=False,
                    store_best_per=False, verbose=False, gpu=False,
                    pin_memory=False)
    defaults.update(kw)
    return Namespace(**defaults)
