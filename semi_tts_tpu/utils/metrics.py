"""Evaluation metrics + small helpers.

Parity targets in `/root/reference/src/util.py`: ``cal_per`` (`:169-181`,
edit-distance PER with repeat-trim and IGNORE_INDICES), ``cal_ppx``
(`:184-189`, 2-based codebook perplexity), ``read_phn_attr`` (`:240-245`),
``human_format`` (`:161-167`). The reference's `editdistance` C extension is
replaced by a small numpy Levenshtein DP.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

PRESERVE_INDICES = 3  # ['<pad>', '<space>', '<eos>'] (`src/util.py:15`)
IGNORE_INDICES = (0, 1, 2, 42)  # (`src/util.py:17`)
SEP = "\t"


def edit_distance(a, b) -> int:
    """Levenshtein distance (native C++ kernel when built; numpy DP fallback
    defines the semantics)."""
    from .. import native

    d = native.edit_distance(list(a), list(b))
    if d is not None:
        return d
    a, b = list(a), list(b)
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        cur = np.empty(len(b) + 1, np.int64)
        cur[0] = i
        sub = prev[:-1] + (np.asarray(b) != ca)
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        for j in range(1, len(b) + 1):  # carry insertions left-to-right
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return int(prev[-1])


def cal_per(pred, truth, ignore=IGNORE_INDICES, pred_lens=None) -> float:
    """Phone error rate of a batch. ``pred``: (B, T) ids or (B, T, V) probs.

    ``pred_lens``: optional per-item true prediction lengths — frames beyond
    them are bucket pad, not model output, and are excluded from scoring (the
    reference scores its much smaller batch-max pads, `src/util.py:169-181`).
    """
    if pred is None:
        return float("nan")
    pred = np.asarray(pred)
    truth = np.asarray(truth)
    if pred.ndim >= 3:
        pred = pred.argmax(-1)
    ers = []
    for bi, (p, t) in enumerate(zip(pred, truth)):
        if pred_lens is not None:
            p = p[: int(pred_lens[bi])]
        p = p.tolist()
        p = [v for i, v in enumerate(p) if (i == 0 or v != p[i - 1]) and v not in ignore]
        t = [v for v in t.tolist() if v not in ignore]
        ers.append(edit_distance(p, t) / len(t))
    return sum(ers) / len(ers)


def cal_ppx(prob) -> float:
    """Codebook perplexity 2^H averaged over non-pad frames (`src/util.py:184-189`)."""
    prob = np.asarray(prob)
    prob_len = np.sum(prob.sum(-1) != 0, axis=-1, keepdims=True).astype(np.float64)
    entropy = -np.sum(prob * np.log2(prob + 1e-10), axis=-1)
    entropy = np.mean(entropy.sum(-1) / np.maximum(prob_len[:, 0], 1))
    return float(2.0**entropy)


def read_phn_attr(phn_attr_pth, neg_val=0):
    """(vocab_size, attr_dim) float array: 3 zero rows for the specials, then
    the binary phonological attributes (`src/util.py:240-245`)."""
    df = pd.read_csv(phn_attr_pth, index_col=0, sep=SEP)
    attr = df.to_numpy().astype(np.float32)
    attr[attr == 0] = neg_val
    return np.concatenate([np.zeros((PRESERVE_INDICES, attr.shape[1]), np.float32), attr])


def human_format(num):
    magnitude = 0
    while num >= 1000:
        magnitude += 1
        num /= 1000.0
    return "{:3}{}".format(num, [" ", "K", "M", "G", "T", "P"][magnitude])


def mcd(mel_a, mel_b, n_cep: int = 13, skip_c0: bool = True) -> float:
    """Mel-cepstral distortion in dB between two aligned (T, M) normalized
    log-mel spectrograms (the driver's fidelity metric; BASELINE.md).

    Features here are normalized dB/100 (`src/audio.py:284-288`), so cepstra
    are computed on ``100 * mel`` to restore the dB scale, then the standard
    MCD formula (10 / ln10) * sqrt(2 * sum((c_a - c_b)^2)) averaged over
    frames.
    """
    from ..ops.mel import dct_matrix

    mel_a = np.asarray(mel_a, np.float64) * 100.0
    mel_b = np.asarray(mel_b, np.float64) * 100.0
    dct = dct_matrix(n_cep, mel_a.shape[-1]).astype(np.float64)
    ca = mel_a @ dct.T
    cb = mel_b @ dct.T
    s = 1 if skip_c0 else 0
    diff = ca[..., s:] - cb[..., s:]
    return float(np.mean((10.0 / np.log(10.0)) * np.sqrt(2.0 * np.sum(diff**2, axis=-1))))
