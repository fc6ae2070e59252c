#!/usr/bin/env python
"""Append new tools/cycle_check.py --json-out seed runs to an EXISTING
docs/convergence_evidence.json aggregate block and recompute its aggregate
(the raw files of earlier seeds may live on another host — their run
records in the evidence file are the durable copy, so unlike
tools/aggregate_cycles.py this never overwrites them).

Usage: python tools/merge_cycle_seeds.py OUTKEY file.json [file.json ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def to_run(r):
    return {
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
    }


def aggregate(runs, protocol):
    n = len(runs)
    mean = lambda k, i: round(sum(r[k][i] for r in runs) / n, 4)  # noqa: E731
    wins = sum(r["dev_per_best"][0] < r["dev_per_best"][1] for r in runs)
    starts = [r["dev_per_at_cycle_start"] for r in runs
              if r["dev_per_at_cycle_start"] is not None]
    return {
        "n_runs": n,
        "protocol": protocol,
        "mean_dev_per_at_cycle_start":
            round(sum(starts) / len(starts), 4) if starts else None,
        "mean_dev_per_final": [mean("dev_per_final", 0), mean("dev_per_final", 1)],
        "mean_dev_per_best": [mean("dev_per_best", 0), mean("dev_per_best", 1)],
        "cycles_wins_best_per_seeds": wins,
        "loss_descent_replicates": all(
            r["unpair_speech_loss_halves"][1] < r["unpair_speech_loss_halves"][0]
            and r["unpair_text_loss_halves"][1] < r["unpair_text_loss_halves"][0]
            for r in runs),
        "unpair_ok_engaged_all_runs": all((r["unpair_ok_engaged_of_4"] or 0) > 0
                                          for r in runs),
        "verdict": "PASS" if wins == n else ("FAIL" if wins == 0 else "MIXED"),
    }


def main(argv):
    outkey, files = argv[0], argv[1:]
    p = os.path.join(REPO, "docs", "convergence_evidence.json")
    d = json.load(open(p))
    block = d["semi_supervised_cycles"][outkey]
    have = {r["seed"] for r in block["runs"]}
    added = []
    for f in files:
        r = to_run(json.load(open(f)))
        if r["seed"] in have:
            print("seed %d already present — skipped" % r["seed"], file=sys.stderr)
            continue
        block["runs"].append(r)
        added.append(r["seed"])
    block["runs"].sort(key=lambda r: r["seed"])
    block["aggregate"] = aggregate(block["runs"], block["aggregate"]["protocol"])
    json.dump(d, open(p, "w"), indent=1)
    print("merged seeds %s into %s (now n_runs=%d, verdict=%s, "
          "mean_best=[%s, %s])" % (
              added, outkey, block["aggregate"]["n_runs"],
              block["aggregate"]["verdict"],
              block["aggregate"]["mean_dev_per_best"][0],
              block["aggregate"]["mean_dev_per_best"][1]))


if __name__ == "__main__":
    main(sys.argv[1:])
