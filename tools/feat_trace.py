#!/usr/bin/env python
"""Per-op profile of the featurizer (VERDICT r2 item 8).

Captures a jax.profiler trace of the clean+augmented featurization batch
(the bench shape: B=128 x 8 s) and reduces the device trace to a per-op-
category ms table, replacing docs/PERFORMANCE.md's pass-count *estimate* of
where the non-dot ~10 ms goes with measured numbers.

The trace parser walks the TensorBoard plugin output
(plugins/profile/<run>/*.trace.json.gz), keeps only events on the TPU
device track (excludes host threads), and buckets XLA op names by fusion
kind / HLO op.

Usage: python tools/feat_trace.py [--outdir /tmp/feat_trace]
Prints a JSON table {category: ms, ...} plus the top named ops.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def capture(outdir, iters=8):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer

    feat = AudioFeaturizer(AudioConfig())
    B, sec, sr = 128, 8.0, 22050
    rng = np.random.RandomState(0)
    S = int(sec * sr)
    waves = jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32))
    lengths = jnp.asarray(rng.randint(int(0.7 * S), S + 1, size=B).astype(np.int32))

    @jax.jit
    def chained(w, l, key):
        def body(i, carry):
            s, k = carry
            m, lin, fl = feat.featurize(w + i * 1e-6, l)
            a, al = feat.featurize_augmented(w + i * 1e-6, l, jax.random.fold_in(k, i))
            return (s + m[0, 0, 0] + lin[0, 0, 0] + a[0, 0, 0], k)

        s, _ = jax.lax.fori_loop(0, iters, body, (0.0, key))
        return s

    key = jax.random.PRNGKey(0)
    float(chained(waves, lengths, key))  # compile + warm
    jax.profiler.start_trace(outdir)
    float(chained(waves, lengths, key))
    jax.profiler.stop_trace()
    return iters


def categorize(name, hlo_category=""):
    """Bucket a leaf XLA op by its trace `hlo_category` (authoritative —
    name-pattern guessing miscategorized dot-containing 'fusion.N' ops)."""
    c = (hlo_category or "").lower()
    if "convolution" in c or "dot" in c:
        return "dot(DFT/mel matmuls)"
    if c:
        return c
    n = name.lower()
    if "copy" in n or "transpose" in n or "reshape" in n:
        return "copy/transpose"
    if "dynamic" in n or "slice" in n:
        return "slice/update"
    return "other"


def parse(outdir, iters):
    traces = sorted(glob.glob(os.path.join(
        outdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not traces:
        raise SystemExit(f"no trace under {outdir}")
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # keep ONLY the device's "XLA Ops" thread — the flat leaf-op timeline.
    # The "XLA Modules" track (whole jit programs) and the host threads
    # contain the same time again as parent spans and would double-count.
    pids_device = set()
    ops_tids = set()
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if "TPU" in pname or "/device" in pname.lower():
                pids_device.add(e["pid"])
        if e.get("name") == "thread_name" and \
                e.get("args", {}).get("name") == "XLA Ops":
            ops_tids.add((e["pid"], e.get("tid")))
    cat_ms = defaultdict(float)
    op_ms = defaultdict(float)
    total = 0.0
    for e in events:
        if (e.get("ph") != "X" or e.get("pid") not in pids_device
                or (e["pid"], e.get("tid")) not in ops_tids):
            continue
        name = e.get("name", "")
        if name.startswith(("jit_", "while")):  # container spans, not leaf ops
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        args = e.get("args", {})
        cat_ms[categorize(name, args.get("hlo_category", ""))] += dur
        # annotate dots with their analytic FLOP rate (TF/s) for the
        # roofline check
        flops = int(args.get("model_flops", 0) or 0)
        key = name if not flops else f"{name} [{flops / (e.get('dur', 1) * 1e6):.0f} TF/s]"
        op_ms[key] += dur
        total += dur
    per_iter = {k: round(v / iters, 3) for k, v in
                sorted(cat_ms.items(), key=lambda kv: -kv[1])}
    top = {k: round(v / iters, 3) for k, v in
           sorted(op_ms.items(), key=lambda kv: -kv[1])[:25]}
    return {"total_device_ms_per_iter": round(total / iters, 2),
            "category_ms_per_iter": per_iter, "top_ops_ms_per_iter": top,
            "trace_file": traces[-1]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/feat_trace")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.outdir, args.iters)
    print(json.dumps(parse(args.outdir, args.iters), indent=1))


if __name__ == "__main__":
    main()
