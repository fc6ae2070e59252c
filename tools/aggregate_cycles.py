#!/usr/bin/env python
"""Aggregate multi-seed cycles-vs-control runs (tools/cycle_check.py
--json-out files) into the docs/convergence_evidence.json schema.

Usage: python tools/aggregate_cycles.py OUTKEY file.json [file.json ...]
Prints the aggregate block; paste/merge into docs/convergence_evidence.json
(or pipe with --write to merge in place under
semi_supervised_cycles.<OUTKEY>).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv):
    write = "--write" in argv
    argv = [a for a in argv if a != "--write"]
    outkey, files = argv[0], argv[1:]
    runs = []
    for f in files:
        r = json.load(open(f))
        runs.append({
            "seed": r["seed"],
            "n_paired": int(r["corpus"].split(" paired")[0].split("(")[-1]),
            "cycle_start_step": r["cycle_start_step"],
            "dev_per_at_cycle_start": r.get("dev_per_at_cycle_start"),
            "dev_per_final": [r["dev_per_cycles"], r["dev_per_paired_only_control"]],
            "dev_per_best": [r["best_dev_per_cycles"], r["best_dev_per_control"]],
            "unpair_speech_loss_halves": [r["unpair_speech_loss_first_half"],
                                          r["unpair_speech_loss_second_half"]],
            "unpair_text_loss_halves": [r["unpair_text_loss_first_half"],
                                        r["unpair_text_loss_second_half"]],
            "unpair_ok_engaged_of_4": r["unpair_ok_engaged_of_4"],
            "verdict": r["verdict"],
            "dev_per_trajectory_cycles": r["dev_per_trajectory_cycles"],
            "dev_per_trajectory_control": r["dev_per_trajectory_control"],
        })
    n = len(runs)
    mean = lambda k, i: round(sum(r[k][i] for r in runs) / n, 4)  # noqa: E731
    cycles_wins_best = sum(r["dev_per_best"][0] < r["dev_per_best"][1] for r in runs)
    agg = {
        "n_runs": n,
        "protocol": runs[0] and (
            "tools/cycle_check.py --steps %s --start-step %s --n-paired %s "
            "--pin-shapes; per-run corpus/seed in `runs`" % (
                json.load(open(files[0]))["steps"],
                runs[0]["cycle_start_step"], runs[0]["n_paired"])),
        # dev_per_at_cycle_start is null when no validation landed at/before
        # the engage step — average the measured ones only
        "mean_dev_per_at_cycle_start": (lambda vs: round(sum(vs) / len(vs), 4)
                                        if vs else None)(
            [r["dev_per_at_cycle_start"] for r in runs
             if r["dev_per_at_cycle_start"] is not None]),
        "mean_dev_per_final": [mean("dev_per_final", 0), mean("dev_per_final", 1)],
        "mean_dev_per_best": [mean("dev_per_best", 0), mean("dev_per_best", 1)],
        "cycles_wins_best_per_seeds": cycles_wins_best,
        "loss_descent_replicates": all(
            r["unpair_speech_loss_halves"][1] < r["unpair_speech_loss_halves"][0]
            and r["unpair_text_loss_halves"][1] < r["unpair_text_loss_halves"][0]
            for r in runs),
        "unpair_ok_engaged_all_runs": all((r["unpair_ok_engaged_of_4"] or 0) > 0
                                          for r in runs),
        "verdict": "PASS" if cycles_wins_best == n else
                   ("FAIL" if cycles_wins_best == 0 else "MIXED"),
    }
    block = {"runs": runs, "aggregate": agg}
    print(json.dumps(block, indent=1))
    if write:
        p = os.path.join(REPO, "docs", "convergence_evidence.json")
        d = json.load(open(p))
        d["semi_supervised_cycles"][outkey] = block
        json.dump(d, open(p, "w"), indent=1)
        print("merged into %s under semi_supervised_cycles.%s" % (p, outkey),
              file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1:])
