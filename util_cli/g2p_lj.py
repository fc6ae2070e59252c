#!/usr/bin/env python
"""Offline text -> reduced-CMU-phoneme map-table generation for LJSpeech.

Parity target: `/root/reference/util/g2p_lj.py` — reads a
``metadata.csv``-style ``id|...|text`` file, emits ``id<TAB>phn_seq`` rows.
"""

import argparse

from g2p_common import SEP, clean_line, load_g2p, reduce_phonemes


def run(args, g2p=None):
    # tests inject a stub g2p; the real backend needs g2p_en/nltk (offline)
    g2p = g2p or load_g2p(getattr(args, 'fallback_rules', False))
    full_set = set()
    with open(args.src, "r") as f:
        f_lines = f.readlines()
    with open(args.out, "w") as f_out:
        f_out.write(SEP + "phn_seq\n")
        for i, line in enumerate(f_lines):
            idx = line.split("|")[0]
            text = clean_line(line.split("|")[-1], args.no_punc)
            phn = reduce_phonemes(g2p(text))
            full_set |= set(phn)
            f_out.write(idx + SEP + " ".join(phn) + "\n")
            if (i + 1) % 500 == 0:
                print(f"{i + 1}/{len(f_lines)}")
    print("Total {} phonemes used.".format(len(full_set)))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Text to phoneme")
    parser.add_argument("--src", required=True, type=str,
                        help="Path to source text file. (format like metadata.csv of LJSpeech)")
    parser.add_argument("--out", required=True, type=str, help="Path to output text file.")
    parser.add_argument("--no-punc", action="store_true", help="Preserve no punctuation.")
    parser.add_argument("--fallback-rules", action="store_true",
                        help="Use the approximate built-in letter-to-sound rules "
                             "when g2p_en/nltk are unavailable (offline).")
    run(parser.parse_args())
