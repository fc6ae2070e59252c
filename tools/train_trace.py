#!/usr/bin/env python
"""Captured-trace per-op profile of the FUSED speech-first train step.

`tools/stage_timing.py` attributes the step's time by re-running stages in
isolation (its table over-counts shared forwards by construction). This tool
instead captures one jax.profiler trace of the fused compiled step — the
program the trainer actually runs (`train/steps.py:213`, mirroring the
reference hot loop `bin/train_vqvae.py:137-248`) — and reduces the device
timeline to per-category / per-op ms with `tools/feat_trace.py`'s parser.
The two views should agree on the headline (decoder scan dominates) while
this one is ground truth for the fused schedule.

Usage: python tools/train_trace.py [--outdir /tmp/train_trace]
Prints a JSON table {category: ms, ...} plus the top named ops.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from feat_trace import parse  # noqa: E402  (shared trace reducer)


def capture(outdir, iters=8):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from semi_tts_tpu.train.optim import make_optimizer
    from semi_tts_tpu.train.steps import StepBuilder, Weights

    cfg, feat, phn_attr, params, state = g._build("full")
    tx, _ = make_optimizer("Adam", 1e-3, "decay")
    builder = StepBuilder(cfg, feat, phn_attr, tx,
                          weights=Weights(1.0, 1.0, 1.0, 10.0, 0, 0),
                          freq_loss_kwargs=dict(sample_rate=22050, n_mels=80,
                                                loss="mse", differential_loss=True,
                                                emphasize_linear_low=True))
    B = 8
    waves, wave_len, text, sid = map(jnp.asarray, g._example_batch(B, 6.0, U=32, seed=0))
    u_waves, u_wave_len, u_text, u_sid = map(jnp.asarray, g._example_batch(B, 6.0, U=32, seed=1))
    step = builder.make_speech_first_step()
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def chained(p, st, o):
        def body(i, c):
            p, st, o = c
            p, st, o, _ = step(p, st, o, key, i, 0.9, waves, wave_len, text, sid,
                               u_waves, u_wave_len, u_text, u_sid)
            return (p, st, o)

        p, st, o = jax.lax.fori_loop(0, iters, body, (p, st, o))
        return jax.tree_util.tree_leaves(p)[0].reshape(-1)[0]

    float(chained(params, state, opt_state))  # compile + warm
    jax.profiler.start_trace(outdir)
    float(chained(params, state, opt_state))
    jax.profiler.stop_trace()
    return iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/train_trace")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.outdir, args.iters)
    print(json.dumps(parse(args.outdir, args.iters), indent=1))


if __name__ == "__main__":
    main()
