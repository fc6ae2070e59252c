#!/usr/bin/env python
"""Offline text -> phoneme map-table generation for VCTK (also emits the
speaker-name -> id JSON map).

Parity target: `/root/reference/util/g2p_vctk.py` — reads ``id|spkr|text``
rows, emits ``id<TAB>phn_seq`` plus a speaker dictionary JSON.
"""

import argparse
import json
import os
from os.path import dirname

from g2p_common import SEP, clean_line, load_g2p, reduce_phonemes


def run(args, g2p=None):
    # tests inject a stub g2p; the real backend needs g2p_en/nltk (offline)
    g2p = g2p or load_g2p(getattr(args, 'fallback_rules', False))
    full_set = set()
    spkr_dict = {}
    with open(args.src, "r") as f:
        f_lines = f.readlines()
    with open(args.out, "w") as f_out:
        f_out.write(SEP + "phn_seq\n")
        for i, line in enumerate(f_lines):
            idx = line.split("|")[0]
            spkr = line.split("|")[1]
            if spkr not in spkr_dict:
                spkr_dict[spkr] = len(spkr_dict)
            text = clean_line(line.split("|")[-1], args.no_punc)
            phn = reduce_phonemes(g2p(text))
            full_set |= set(phn)
            f_out.write(idx + SEP + " ".join(phn) + "\n")
            if (i + 1) % 500 == 0:
                print(f"{i + 1}/{len(f_lines)}")
    print("Total {} phonemes used, {} speakers used.".format(len(full_set), len(spkr_dict)))
    os.makedirs(dirname(args.out_spkr_dict) or ".", exist_ok=True)
    json.dump(spkr_dict, open(args.out_spkr_dict, "w"), indent=2)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Text to phoneme")
    parser.add_argument("--src", required=True, type=str,
                        help="Path to source text file (id|spkr|text rows).")
    parser.add_argument("--out", required=True, type=str, help="Path to output text file.")
    parser.add_argument("--out-spkr-dict", type=str, default="corpus_meta/spkr/vctk.json",
                        help="Path of json object for speaker dictionary.")
    parser.add_argument("--no-punc", action="store_true", help="Preserve no punctuation.")
    parser.add_argument("--fallback-rules", action="store_true",
                        help="Use the approximate built-in letter-to-sound rules "
                             "when g2p_en/nltk are unavailable (offline).")
    run(parser.parse_args())
