#!/usr/bin/env python
"""Train-step throughput vs batch size on the real TPU.

docs/PERFORMANCE.md argues the B=8 train step is weight-streaming-bound
(the decode scan re-reads ~35 MB of bf16-converted weights per step, both
directions), so per-chip MFU should rise with batch the same way serving
decode does (4.2 M fr/s @ B=64 -> 8.9 M @ B=512). This measures it instead
of asserting it: the paired supervised step (the reference's
`bin/train_vqvae.py:124-136` hot loop) at B = 8..256, reporting ms/step,
utterance-throughput, and analytic-FLOPs MFU — B=128/256 locate the
training-side saturation point (VERDICT r4 item 4), the counterpart of the
serving decoder's measured B=512 saturation.

B=8 is the reference's parity batch (`config/*.yaml` batch_size); larger B
is the knob a production deployment would actually turn.

Methodology: chained fori_loop with a TRACED trip count + single scalar
readback, timed differentially (bench._differential_time) so the tunnel's
per-call overhead cancels. Wave batches are generated ON DEVICE (a B=256
host batch is 135 MB — minutes through the tunnel on a bad hour). Wave
seconds fixed at 6 s so frames/utterance is constant across B. A B that
OOMs is reported as such and the sweep continues.

Usage: python tools/batch_scaling.py [B ...]
"""

from __future__ import annotations

import json
import sys
import time  # noqa: F401  (kept for ad-hoc use)

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np  # noqa: F401

import bench
import __graft_entry__ as g
from semi_tts_tpu.train.optim import make_optimizer
from semi_tts_tpu.train.steps import StepBuilder, Weights
from semi_tts_tpu.utils.flops import matmul_flops

V5E_BF16_PEAK = 197e12
ITERS = 12


def main(argv=None):
    bs = [int(b) for b in (argv or [])] or (8, 16, 32, 64, 128, 256)
    from semi_tts_tpu.utils.compile_cache import (default_cache_dir,
                                                  enable_compilation_cache)

    enable_compilation_cache(default_cache_dir())
    cfg, feat, phn_attr, params, state = g._build("full")
    tx, _ = make_optimizer("Adam", 1e-3, "decay")
    builder = StepBuilder(cfg, feat, phn_attr, tx,
                          weights=Weights(1.0, 1.0, 1.0, 10.0, 0, 0),
                          freq_loss_kwargs=dict(sample_rate=22050, n_mels=80,
                                                loss="mse", differential_loss=True,
                                                emphasize_linear_low=True))
    opt_state = tx.init(params)
    step = builder.make_paired_step()
    key = jax.random.PRNGKey(0)

    out = {}
    for B in bs:
        _, wave_len, text, sid = g._example_batch(B, 6.0, U=32, seed=0,
                                                  make_waves=False)
        shape = (B, int(6.0 * 22050))
        waves = jax.jit(lambda k: jax.random.normal(k, shape) * 0.1)(
            jax.random.PRNGKey(0))
        args = (waves,) + tuple(map(jnp.asarray, (wave_len, text, sid)))

        @jax.jit
        def chained(params, state, opt_state, n, *args):
            def body(i, c):
                p, s, o = c
                p, s, o, _ = step(p, s, o, key, i, 0.9, *args)
                return (p, s, o)
            p, s, o = jax.lax.fori_loop(0, n, body, (params, state, opt_state))
            return jax.tree_util.tree_leaves(p)[0].reshape(-1)[0]

        try:
            float(chained(params, state, opt_state, jnp.int32(ITERS), *args))
            dt = bench._differential_time(
                lambda n: float(chained(params, state, opt_state,
                                        jnp.int32(n), *args)),
                ITERS, 3 * ITERS)
            flops = matmul_flops(lambda *a: step(*a), params, state, opt_state,
                                 key, 1, 0.9, *args)
            out[f"B{B}"] = {
                "ms_per_step": round(dt * 1e3, 1),
                "utt_per_sec": round(B / dt, 1),
                "mfu_pct": round(100 * flops / dt / V5E_BF16_PEAK, 1),
            }
        except Exception as e:  # OOM at large B must not kill the sweep
            out[f"B{B}"] = {"error": repr(e)[:200]}
        print(json.dumps({B: out[f"B{B}"]}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
