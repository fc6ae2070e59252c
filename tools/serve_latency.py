#!/usr/bin/env python
"""Single-request TTS serving latency on the real TPU.

bench.py measures serving THROUGHPUT (utt/s at B=16/64, pipelined batches);
a production endpoint also cares about the latency of one request arriving
alone. This measures the full text -> mel/linear -> Griffin-Lim -> waveform
path (the `--gen-wav` serving pipeline, `train/gen_specgram.py:126-145`,
reference `bin/gen_specgram.py:89-129` + `src/audio.py:179-226`) as ONE
cold-queue dispatch pair at B=1 and B=4, reporting end-to-end wall latency
per request. The stage programs are `semi_tts_tpu.serve.serving_stages` —
the exact jits `serve.TTSServer` deploys and bench.py times for throughput,
so all three instruments describe the same program.

The AR decode is weight-streaming-bound (~35 MB bf16/step), so B=1 latency
is essentially the same device time as B=4 — the B=4 row shows how much
batching a queue of concurrent requests costs the individual request.

Methodology note: unlike the throughput benches this intentionally does NOT
chain iterations inside one fori_loop — latency includes the dispatch +
single readback that a real request pays. Tunnel readback (~10-40 ms) is
reported separately via a no-op roundtrip so the device-time component is
attributable.

Usage: python tools/serve_latency.py [--decode-steps 200]
Prints one JSON object on stdout (progress lines go to stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

import __graft_entry__ as g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--decode-steps", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=8)
    args = ap.parse_args()

    cfg, feat, phn_attr, params, state = g._build("full")
    c = feat.cfg
    decode_steps = args.decode_steps
    audio_sec = decode_steps * cfg.n_frames_per_step * c.hop_length / c.sample_rate

    out = {"decode_steps": decode_steps, "audio_sec_per_utt": round(audio_sec, 2)}

    # tunnel readback floor: dispatch + scalar readback of a trivial program
    @jax.jit
    def noop(x):
        return x + 1.0

    one = jnp.float32(0.0)
    float(noop(one))
    rt = min(_timed(lambda: float(noop(one))) for _ in range(args.repeats))
    out["tunnel_roundtrip_ms"] = round(rt * 1e3, 1)

    synth, vocode = g._serving_stages(cfg, feat, phn_attr, decode_steps)
    for B in (1, 4):
        text, sid = g._serving_inputs(B)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))

        def request():
            wav = vocode(synth(params, state, text, sid, k1), k2)
            return float(wav[0, 0])  # scalar readback = request completion

        request()  # compile + warm
        lat = min(_timed(request) for _ in range(args.repeats))
        out[f"B{B}"] = {
            "latency_ms": round(lat * 1e3, 1),
            "realtime_factor": round(audio_sec / lat, 1),
        }
        print(json.dumps({B: out[f"B{B}"]}), file=sys.stderr, flush=True)

    print(json.dumps(out))


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
