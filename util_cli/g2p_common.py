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


class RuleG2p:
    """Deterministic rule-based English letter-to-sound fallback.

    Emits the same token stream shape as ``g2p_en.G2p`` (uppercase ARPAbet
    tokens, ``' '`` between words, ``'.'`` for sentence punctuation) using a
    longest-match grapheme table, so the ``reduce_phonemes`` -> map-table ->
    ``PhoneTextEncoder.file_to_seq`` chain runs fully offline.

    This is an APPROXIMATION — a dictionary-based G2P (g2p_en) produces
    better pronunciations; use this only where that dependency can't be
    installed (opt-in via ``--fallback-rules`` on the CLIs). Every emitted
    phone is in the 39-phone reduced set, so downstream reduction is total.
    """

    # ordered longest-match-first grapheme -> phone-sequence rules
    _RULES = [
        ("tion", ["SH", "AH", "N"]), ("sion", ["ZH", "AH", "N"]),
        ("ture", ["CH", "ER"]), ("ough", ["AO"]), ("augh", ["AO"]),
        ("eigh", ["EY"]), ("igh", ["AY"]), ("tch", ["CH"]),
        ("dge", ["JH"]), ("sch", ["S", "K"]),
        ("th", ["TH"]), ("sh", ["SH"]), ("ch", ["CH"]), ("ph", ["F"]),
        ("wh", ["W"]), ("ck", ["K"]), ("ng", ["NG"]), ("qu", ["K", "W"]),
        ("gh", []), ("kn", ["N"]), ("wr", ["R"]), ("mb$", ["M"]),
        ("ee", ["IY"]), ("ea", ["IY"]), ("ai", ["EY"]), ("ay", ["EY"]),
        ("oa", ["OW"]), ("oi", ["OY"]), ("oy", ["OY"]),
        ("au", ["AO"]), ("aw", ["AO"]), ("oo", ["UW"]), ("ew", ["UW"]),
        ("ie", ["IY"]), ("ei", ["EY"]), ("ue", ["UW"]), ("ui", ["UW"]),
        ("ou", ["AW"]), ("ow", ["OW"]),
        ("ar", ["AA", "R"]), ("er", ["ER"]), ("ir", ["ER"]),
        ("ur", ["ER"]), ("or", ["AO", "R"]),
    ]
    _SINGLE = {
        "x": ["K", "S"],
        "a": ["AE"], "e": ["EH"], "i": ["IH"], "o": ["AA"], "u": ["AH"],
        "b": ["B"], "d": ["D"], "f": ["F"], "h": ["HH"], "j": ["JH"],
        "k": ["K"], "l": ["L"], "m": ["M"], "n": ["N"], "p": ["P"],
        "r": ["R"], "s": ["S"], "t": ["T"], "v": ["V"], "w": ["W"],
        "z": ["Z"],
    }

    def _word(self, w: str):
        out, i, n = [], 0, len(w)
        # drop a silent final consonant+e (cake -> c-a-k, not c-a-k-e)
        if n > 2 and w[-1] == "e" and w[-2] not in "aeiou":
            w, n = w[:-1], n - 1
        while i < n:
            ch = w[i]
            # collapse double letters
            if i + 1 < n and w[i + 1] == ch and ch not in "aeiou":
                i += 1
                continue
            # multi-character rules first (digraphs beat c/g/y specials)
            matched = False
            for pat, phones in self._RULES:
                if len(pat) < 2:
                    break  # rules are ordered longest-first
                if pat.endswith("$"):
                    if i == n - (len(pat) - 1) and w.endswith(pat[:-1]):
                        out.extend(phones)
                        i = n
                        matched = True
                        break
                elif w.startswith(pat, i):
                    out.extend(phones)
                    i += len(pat)
                    matched = True
                    break
            if matched:
                continue
            if ch == "c":
                out.append("S" if i + 1 < n and w[i + 1] in "eiy" else "K")
            elif ch == "g":
                out.append("JH" if i + 1 < n and w[i + 1] in "eiy" else "G")
            elif ch == "y":
                out.append("Y" if i == 0 else ("IY" if i == n - 1 else "IH"))
            else:
                out.extend(self._SINGLE.get(ch, []))
            i += 1
        return out

    def __call__(self, text: str):
        tokens = []
        for raw in text.lower().split():
            word = "".join(ch for ch in raw if ch.isalpha() or ch == "'")
            word = word.replace("'", "")
            if word:
                if tokens:
                    tokens.append(" ")
                tokens.extend(self._word(word))
            if raw.rstrip().endswith("."):
                tokens.append(".")
        return tokens


def load_g2p(fallback_rules: bool = False):
    try:
        import nltk

        nltk.download("punkt", quiet=True)
        from g2p_en import G2p

        return G2p()
    except ImportError as e:  # offline tool; not baked into the image
        if fallback_rules:
            print("[WARN] g2p_en/nltk unavailable — using the approximate "
                  "rule-based fallback (RuleG2p). Pronunciations are "
                  "rule-derived, not dictionary lookups.")
            return RuleG2p()
        raise SystemExit(
            "g2p_en/nltk are required to (re)generate map tables: "
            "pip install g2p_en nltk  (offline tool, not needed at train "
            "time), or pass --fallback-rules to use the approximate built-in "
            f"letter-to-sound rules. Import failed with: {e}")
