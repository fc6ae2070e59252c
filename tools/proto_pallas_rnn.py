#!/usr/bin/env python
"""Probe: can a Pallas whole-recurrence LSTM kernel beat the XLA scan?

The sequence RNN scans (`ops/rnn._lstm_rec`) run one tiny (B, H) x (H, 4H)
dot per step inside a `lax.scan` — after the batched-dW custom VJP their
remaining cost is per-step loop/dispatch overhead and the small-dot MXU
underutilization. A Pallas kernel with the recurrence as a sequential grid
over T (weights pinned in VMEM, h/c carried in VMEM scratch) pays no
XLA while-loop overhead per step. This probe measures both at the ASR
BiLSTM's train shapes (B=16, T=267, H=256) to decide whether the kernel is
worth productionizing.

Run: python tools/proto_pallas_rnn.py [--T 267 --B 16 --H 256]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from semi_tts_tpu.ops.rnn import _lstm_rec


def pallas_lstm_rec(w_hh, x_proj):
    """x_proj (T, B, 4H) -> hs (T, B, H), recurrence as a Pallas grid over T."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B, H4 = x_proj.shape
    H = H4 // 4

    def kernel(xp_ref, whh_ref, hs_ref, h_scr, c_scr):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        h = h_scr[:]
        gates = xp_ref[0] + jax.lax.dot_general(
            h.astype(jnp.bfloat16), whh_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c_scr[:] + jax.nn.sigmoid(i) * jnp.tanh(g)
        h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        h_scr[:] = h2
        c_scr[:] = c2
        hs_ref[0] = h2

    return pl.pallas_call(
        kernel,
        grid=(T,),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, B, H4), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H4, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                        pltpu.VMEM((B, H), jnp.float32)],
    )(x_proj, w_hh)


def timed(fn, *args, iters=50):
    @jax.jit
    def chained(*a):
        def body(i, s):
            out = fn(*[x + s * 0.0 if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
                       and x.ndim == 3 else x for x in a])
            return s + out.reshape(-1)[0]
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(chained(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=267)
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--H", type=int, default=256)
    args = ap.parse_args()
    T, B, H = args.T, args.B, args.H

    rng = np.random.RandomState(0)
    x_proj = jnp.asarray(rng.randn(T, B, 4 * H).astype(np.float32) * 0.1)
    w_hh = jnp.asarray(rng.randn(4 * H, H).astype(np.float32) * 0.05)

    # correctness first
    ref = _lstm_rec(False, w_hh, x_proj)
    got = pallas_lstm_rec(w_hh, x_proj)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"max |pallas - scan| = {err:.2e}", file=sys.stderr)

    t_scan = timed(lambda w, x: _lstm_rec(False, w, x), w_hh, x_proj)
    t_pall = timed(pallas_lstm_rec, w_hh, x_proj)

    def bwd_scan(w, x):
        return jax.grad(lambda w, x: jnp.sum(_lstm_rec(False, w, x)), argnums=(0, 1))(w, x)[0]

    t_scan_bwd = timed(lambda w, x: bwd_scan(w, x), w_hh, x_proj)

    print(
        {"shape": f"T{T} B{B} H{H}",
         "xla_scan_fwd_ms": round(t_scan * 1e3, 3),
         "xla_scan_us_per_step": round(t_scan / T * 1e6, 2),
         "pallas_fwd_ms": round(t_pall * 1e3, 3),
         "pallas_us_per_step": round(t_pall / T * 1e6, 2),
         "xla_scan_fwdbwd_ms": round(t_scan_bwd * 1e3, 3),
         "max_err": err})


if __name__ == "__main__":
    main()
