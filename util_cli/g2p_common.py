"""Shared G2P post-processing: CMU(48) -> reduced(39) phoneme mapping and
text cleanup.

Parity target: `/root/reference/util/g2p_lj.py:12-120` /
`util/g2p_vctk.py:13-127` — the reduction table, digit stripping, and
punctuation -> '.' handling. The `g2p_en`/`nltk` dependency is only needed at
actual generation time (these are offline tools); everything else is testable
without it.
"""

from __future__ import annotations

import re

SEP = "\t"

# 48 -> 39 reduced CMU phone mapping (data table, from the standard CMU/TIMIT
# reduction also used by the reference)
PHONEME_REDUCE_MAPPING = {
    " ": "",
    "b": "b", "d": "d", "g": "g", "p": "p", "t": "t", "k": "k",
    "jh": "jh", "ch": "ch", "s": "s", "sh": "sh", "z": "z", "zh": "zh",
    "f": "f", "th": "th", "v": "v", "dh": "dh",
    "m": "m", "n": "n", "ng": "ng", "em": "m", "en": "n", "eng": "ng", "nx": "n",
    "l": "l", "r": "r", "w": "w", "y": "y", "hh": "hh", "hv": "hh", "el": "l",
    "iy": "iy", "ih": "ih", "eh": "eh", "ey": "ey", "ae": "ae", "aa": "aa",
    "aw": "aw", "ay": "ay", "ah": "ah", "ao": "ao", "oy": "oy", "ow": "ow",
    "uh": "uh", "uw": "uw", "ux": "uw", "er": "er", "ax": "ah", "ix": "ih",
    "axr": "er", "ax-h": "ah",
    ".": ".",
}

KEEP_PUNC = "!?,;"  # mapped to '.' unless --no-punc


def remove_num(s: str) -> str:
    return "".join(ch for ch in s if not ch.isdigit())


def clean_line(line: str, no_punc: bool) -> str:
    line = line.replace("--", "")
    line = re.sub(r'[:"\-()]', "", line)
    if not no_punc:
        for token in KEEP_PUNC:
            line = line.replace(token, ".")
    else:
        line = re.sub(r"[!?,.;]", "", line)
    return line


def reduce_phonemes(phns):
    """Map raw g2p output tokens to the reduced set (drops digits/stress)."""
    return [PHONEME_REDUCE_MAPPING[remove_num(p.lower())] for p in phns]


def load_g2p():
    try:
        import nltk

        nltk.download("punkt", quiet=True)
        from g2p_en import G2p

        return G2p()
    except ImportError as e:  # offline tool; not baked into the image
        raise SystemExit(
            "g2p_en/nltk are required to (re)generate map tables: "
            "pip install g2p_en nltk  (offline tool, not needed at train time). "
            f"Import failed with: {e}")
