#!/usr/bin/env python
"""Headline benchmark (driver-run): on-device featurization throughput vs the
reference's CPU pipeline, plus AR-decoder / train-step / Griffin-Lim /
serving-e2e numbers and MFU estimates.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The baseline is measured in-process: the reference extracts features per file
on CPU (torch.stft + mel matmul + dB + normalize, `src/audio.py:156-177`,
driven from DataLoader workers `src/data.py:127-128`); we run exactly that
math with torch on this host's CPU and compare mel-frames/sec.

Deadline discipline (round-3 lesson: BENCH_r03 was rc=124 with ZERO keys):
the whole bench runs under a global wall budget (default 560 s, override
with SEMI_TTS_BENCH_BUDGET_S). Stages run most-important-first, each merges
its keys into the shared result dict the moment it finishes, the clock is
checked against a per-stage cost estimate before starting the next stage,
and a watchdog thread prints the partial JSON and exits 0 if a stage wedges
past the budget (remote XLA compiles cannot be cancelled from Python).
Partial honest JSON always beats a timeout: skipped stages are listed under
"stages_skipped".

Timing methodology (axon tunnel): N iterations chained inside ONE jitted
fori_loop with a TRACED trip count and a single scalar float() readback
(block_until_ready does not reliably flush the remote queue), timed
DIFFERENTIALLY at N and 4N — the per-call dispatch+readback overhead
(10 ms on a good hour, 100-300 ms during tunnel troughs; at a fixed N=20
it inflated the featurizer 24.3 -> 32.9 ms/batch) is identical at both
trip counts and cancels in the subtraction. Both sides of every
measurement are best-of-3, so a contended run on either side cannot skew
the vs_baseline ratio. MFU =
analytic dot/conv FLOPs (`utils.flops.matmul_flops`, scan-aware — XLA's own
cost_analysis counts loop bodies once) / time / bf16 peak. These are
*useful* FLOPs: dots at HIGH (bf16x3) precision execute 3 hardware passes
per counted dot, so hardware busy-ness is up to 3x the reported MFU.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

V5E_BF16_PEAK = 197e12  # TPU v5e bf16 MXU peak FLOP/s

# ---------------------------------------------------------------------------
# Result sink: keys merge in as stages complete; exactly one JSON line is
# ever printed (main at the end, or the budget watchdog on a wedged stage).

_RESULTS: dict = {}
_PRINT_LOCK = threading.Lock()
_PRINTED = threading.Event()
_FIRST_STAGE_DONE = threading.Event()  # any stage ended (ok or error):
#                                        the service RPCs are responding
_T_START = time.time()


def _merge(**kw):
    with _PRINT_LOCK:
        _RESULTS.update(kw)


def _emit(exit_code=None):
    """Assemble + print THE one JSON line from whatever has been measured."""
    with _PRINT_LOCK:
        if _PRINTED.is_set():
            return
        _PRINTED.set()
        out = {
            "metric": "featurization_mel_frames_per_sec",
            "value": 0,
            "unit": "mel-frames/s",
            "vs_baseline": 0,
        }
        out.update(_RESULTS)
        print(json.dumps(out), flush=True)
    if exit_code is not None:
        os._exit(exit_code)


def _stage_log(name):
    print("[bench %6.1fs] %s" % (time.time() - _T_START, name),
          file=sys.stderr, flush=True)


def _device_watchdog(timeout_s=300):
    """Fail fast if the device is unreachable instead of hanging forever.

    The axon tunnel can wedge for hours (observed 2026-08-17/18: even
    `jax.devices()` blocks indefinitely). A hung bench is worse than a
    failed one — probe the backend with a trivial jitted op on a side
    thread and, if it doesn't answer within ``timeout_s``, print an honest
    error JSON line (still one line, still has metric/value/vs_baseline
    keys) and hard-exit, because the probe thread cannot be cancelled."""
    done = threading.Event()

    def probe():
        import jax
        import jax.numpy as jnp

        jax.jit(lambda x: x + 1.0)(jnp.float32(0.0)).block_until_ready()
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        _merge(error="device unresponsive after %ds (axon tunnel wedged?); "
                     "no measurement possible" % timeout_s)
        _emit(exit_code=2)


def _best_of(fn, n=3):
    """Best (min) wall time of ``n`` timed calls — both sides of the
    vs_baseline ratio use best-of-k so one contended/wobbly run on either
    side cannot skew the comparison."""
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _differential_time(chained, n_lo, n_hi, samples_out=None):
    """Per-iteration device time of a chained program whose trip count is a
    TRACED argument: time the same executable at ``n_lo`` and ``n_hi``
    iterations (best-of-3 each, interleaved) and divide the difference.

    The per-call dispatch+readback overhead over the axon tunnel is
    100-300 ms during bandwidth troughs (measured r4: the same featurizer
    program read 24.3 vs 32.9 ms/iter depending on the hour at a fixed
    iteration count) — it is identical for both trip counts, so the
    subtraction cancels it exactly instead of merely amortizing it.

    ``samples_out``: optional list; receives the per-round (hi_i-lo_i)/dn
    estimates so callers can emit a stability marker (best-vs-median spread
    — BENCH_r04's featurizer caught a 30% device trough that was invisible
    in the single best-of number; VERDICT r4 item 5c)."""
    lo = hi = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        chained(n_lo)
        lo_i = time.perf_counter() - t0
        lo = min(lo, lo_i)
        t0 = time.perf_counter()
        chained(n_hi)
        hi_i = time.perf_counter() - t0
        hi = min(hi, hi_i)
        if samples_out is not None:
            samples_out.append((hi_i - lo_i) / (n_hi - n_lo))
    return (hi - lo) / (n_hi - n_lo)


def _iota_noise(B, S, seed=0):
    """Deterministic noise-like wave batch from iota (elementwise sin of an
    irrational stride — zero-mean, bounded, non-periodic over the batch).
    Exists because the obvious `jax.random.normal` at wave shapes is the
    single most expensive/wedge-prone program on the axon compile service
    (measured 46-100+ s per fresh process at (128, 176400); the iota form
    compiles in milliseconds). Benchmark math is content-independent —
    static shapes, no data-dependent control flow — so the distribution
    does not matter, only the shape."""
    import jax
    import jax.numpy as jnp

    i = jax.lax.iota(jnp.float32, B * S).reshape(B, S)
    return jnp.sin(i * 12.9898 + seed * 78.233) * 0.1


# ---------------------------------------------------------------------------
# Shared lazily-built context (full-size model, step builder, batches) so the
# per-stage functions don't rebuild it.

_CTX: dict = {}


def _ctx():
    if "cfg" not in _CTX:
        import __graft_entry__ as g

        cfg, feat, phn_attr, params, state = g._build("full")
        _CTX.update(cfg=cfg, feat=feat, phn_attr=phn_attr, params=params,
                    state=state, g=g)
    return _CTX


def _train_builder():
    c = _ctx()
    if "builder" not in c:
        from semi_tts_tpu.train.optim import make_optimizer
        from semi_tts_tpu.train.steps import StepBuilder, Weights

        tx, _ = make_optimizer("Adam", 1e-3, "decay")
        c["builder"] = StepBuilder(
            c["cfg"], c["feat"], c["phn_attr"], tx,
            weights=Weights(1.0, 1.0, 1.0, 10.0, 0, 0),
            freq_loss_kwargs=dict(sample_rate=22050, n_mels=80, loss="mse",
                                  differential_loss=True,
                                  emphasize_linear_low=True))
        c["opt_state"] = tx.init(c["params"])
    return c["builder"], c["opt_state"]


# ---------------------------------------------------------------------------
# Stage: featurizer (TPU) + CPU reference baseline


def _stage_feat_tpu(iters=40):
    import jax
    import jax.numpy as jnp

    from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer
    from semi_tts_tpu.utils.flops import matmul_flops

    B, sec, sr = 128, 8.0, 22050
    rng = np.random.RandomState(0)
    S = int(sec * sr)
    lengths = rng.randint(int(0.7 * S), S + 1, size=B).astype(np.int32)

    feat = AudioFeaturizer(AudioConfig())
    # Generate the wave batch ON DEVICE: featurizer compute is
    # data-independent, and pushing 90 MB of host noise through the tunnel
    # costs 10-450 s depending on the day's bandwidth (r4 measured both).
    # Deterministic iota "noise", NOT jax.random.normal: the threefry
    # program at this shape costs 46-100+ s per fresh process on the axon
    # compile service and is the exact RPC observed to wedge whole bench
    # runs (2026-08-21, three instrumented trials: noop 0.3 s, 13 MB
    # chained-executable load 1.9 s, wave-gen 46/100/wedged s). An
    # elementwise sin-of-iota compiles instantly and the featurizer's
    # timing is content-independent (static shapes, no data-dependent
    # control flow).
    wd = jax.jit(_iota_noise, static_argnums=(0, 1))(B, S)
    ld = jnp.asarray(lengths)

    # Chain the iterations inside ONE program with a single scalar readback;
    # the trip count is a TRACED argument so `_differential_time` can cancel
    # the tunnel's per-call overhead with one compiled executable.
    @jax.jit
    def chained(w, l, key, n):
        def body(i, carry):
            s, k = carry
            m, lin, fl = feat.featurize(w + i * 1e-6, l)
            a, al = feat.featurize_augmented(w + i * 1e-6, l, jax.random.fold_in(k, i))
            return (s + m[0, 0, 0] + lin[0, 0, 0] + a[0, 0, 0], k)
        s, _ = jax.lax.fori_loop(0, n, body, (0.0, key))
        return s

    # Frame counts in a SEPARATE tiny program: only the frame-length outputs
    # are kept, so XLA dead-code-eliminates the mel math and this compiles in
    # seconds (round 3's two standalone full featurize compiles cost ~1 min
    # of the budget just to count frames).
    @jax.jit
    def frame_counts(w, l, key):
        _, _, fl = feat.featurize(w, l)
        _, al = feat.featurize_augmented(w, l, jax.random.fold_in(key, 0))
        return fl.sum() + al.sum()

    key = jax.random.PRNGKey(0)
    float(chained(wd, ld, key, jnp.int32(iters)))  # compile + warm
    samples = []
    dt = _differential_time(
        lambda n: float(chained(wd, ld, key, jnp.int32(n))), iters, 4 * iters,
        samples_out=samples)
    flops = matmul_flops(
        lambda w, l, k: (feat.featurize(w, l), feat.featurize_augmented(w, l, k)),
        wd, ld, key)
    frames = int(frame_counts(wd, ld, key))
    # stability marker: median-vs-best spread of the 3 differential rounds.
    # ~1.0 = quiet device; BENCH_r04's 30% co-tenant trough would have shown
    # here as ~1.3, making a trough-hour record self-describing.
    med = float(np.median(samples)) if samples else dt
    # marker from the RAW best-of dt: 0 = the N/4N best-of mins crossed
    # (unmeasurable trough), not "quiet"
    stability = round(med / dt, 3) if dt > 0 and med > 0 else 0
    if dt <= 0:
        # trough artifact: the independent best-of mins of the N and 4N runs
        # crossed (a quiet window on one side only). The per-round paired
        # differences are robust to one-sided drift — fall back to their
        # median; if that is non-positive too there is no honest number.
        dt = med
    if dt <= 0:
        raise RuntimeError(
            "differential timing non-positive (tunnel trough): samples=%r"
            % (samples,))
    rate = frames / dt
    _merge(value=round(rate, 1),
           featurize_batch_ms=round(dt * 1e3, 2),
           featurize_batch_ms_median=round(med * 1e3, 2),
           featurizer_stability_median_over_best=stability,
           featurization_mel_frames_per_device_sec=round(rate, 1),
           featurizer_mfu_pct=round(100 * flops / dt / V5E_BF16_PEAK, 1),
           # the frame count (numerator) includes BOTH the clean and the
           # augmented pass of the fused program — the CPU baseline counts
           # identically, so vs_baseline is apples-to-apples, but don't
           # compare `value` against a clean-only featurization figure
           featurization_counts_augmented_frames=True)
    _CTX["_feat_lengths"] = lengths
    if "baseline_cpu_mel_frames_per_sec" in _RESULTS:
        _merge(vs_baseline=round(rate / _RESULTS["baseline_cpu_mel_frames_per_sec"], 2))


def _stage_feat_cpu(n_files=8):
    """Literal torch restatement of the reference clean+augmented per-file
    pipeline on CPU (what its DataLoader workers compute per batch)."""
    import torch

    from semi_tts_tpu.ops.mel import mel_filterbank

    # Same shapes/distribution/lengths as the TPU stage (value equality is
    # irrelevant to a throughput baseline; the device batch never leaves the
    # chip — see _stage_feat_tpu).
    lengths = _CTX["_feat_lengths"]
    waves = (np.random.RandomState(0).randn(n_files, int(8.0 * 22050)) * 0.1
             ).astype(np.float32)
    fb = torch.from_numpy(mel_filterbank(22050, 2048, n_mels=80))
    win = torch.hann_window(1102)

    def clean(x):
        x = torch.cat([x[:1], x[1:] - 0.97 * x[:-1]])
        y = torch.stft(x[None], n_fft=2048, hop_length=275, win_length=1102,
                       window=win, center=True, pad_mode="reflect",
                       onesided=True, return_complex=True).abs()[0]
        m = fb @ y
        db = 20 * torch.log10(torch.clamp(m, min=1e-5)) - 20
        return torch.clamp((db + 100) / 100, 0, 1)

    def aug(x, rate=1.05):
        sr2 = int(22050 * rate)
        w2 = torch.hann_window(int(0.05 * sr2))
        x = x + 0.01 * torch.randn_like(x)
        x = torch.cat([x[:1], x[1:] - 0.97 * x[:-1]])
        y = torch.stft(x[None], n_fft=2048, hop_length=int(0.0125 * sr2),
                       win_length=int(0.05 * sr2), window=w2, center=True,
                       pad_mode="reflect", onesided=True, return_complex=True).abs()[0]
        m = fb @ y
        db = 20 * torch.log10(torch.clamp(m, min=1e-5)) - 20
        return torch.clamp((db + 100) / 100, 0, 1)

    # best-of-3: the single host CPU core is sometimes contended; taking the
    # best CPU throughput keeps the vs_baseline ratio conservative
    best, best_files = 0.0, 0.0
    for _ in range(3):
        frames = 0
        t0 = time.perf_counter()
        for i in range(n_files):
            x = torch.from_numpy(waves[i % len(waves), : lengths[i % len(waves)]].copy())
            frames += clean(x).shape[1] + aug(x).shape[1]
        dt = time.perf_counter() - t0
        best = max(best, frames / dt)
        best_files = max(best_files, n_files / dt)
    _merge(baseline_cpu_mel_frames_per_sec=round(best, 1),
           baseline_cpu_files_per_sec=round(best_files, 2))
    if "value" in _RESULTS and _RESULTS["value"]:
        _merge(vs_baseline=round(_RESULTS["value"] / best, 2))


# ---------------------------------------------------------------------------
# Stage: AR decoder (per batch size)


def _decoder_infer(B, decode_steps=200, U=32):
    import jax
    import jax.numpy as jnp

    from semi_tts_tpu.models import vqvae as V

    c = _ctx()
    cfg, phn_attr = c["cfg"], c["phn_attr"]
    rng = np.random.RandomState(0)
    text = np.zeros((B, U), np.int32)
    text[:, : U - 2] = rng.randint(3, 43, size=(B, U - 2))
    sid = jnp.asarray(rng.randint(0, 109, size=B).astype(np.int32))
    text = jnp.asarray(text)

    @jax.jit
    def infer(params, state, text, sid, key):
        lat = V.embed_text(params, cfg, phn_attr, text)
        mel, lin, align, stop, _ = V.text_to_speech(
            params, state, key, cfg, lat, sid, decode_steps=decode_steps,
            train=False, teacher=None, tf_rate=0.0)
        return mel
    return infer, text, sid


def _stage_decoder(B, with_mfu, iters=48, decode_steps=200):
    """AR decoder mel-frames/sec/chip on the full-size Tacotron2 stack.

    The decode loop is weight-streaming-bound (~37 MB of bf16-converted
    LSTM/attention weights re-read per step), so throughput scales with
    serving batch; B=64 is the headline (with MFU), B=256/512 are the
    serving-farm figures."""
    import jax
    import jax.numpy as jnp

    c = _ctx()
    params, state, cfg = c["params"], c["state"], c["cfg"]
    infer, text, sid = _decoder_infer(B, decode_steps)

    @jax.jit
    def chained(params, state, text, sid, key, n):
        def body(i, s):
            mel = infer(params, state, text, sid, jax.random.fold_in(key, i))
            return s + mel[0, 0, 0]
        return jax.lax.fori_loop(0, n, body, 0.0)

    key = jax.random.PRNGKey(0)
    float(chained(params, state, text, sid, key, jnp.int32(iters)))  # compile + warm
    dt = _differential_time(
        lambda n: float(chained(params, state, text, sid, key, jnp.int32(n))),
        iters, 4 * iters)
    rate = (B * decode_steps * cfg.n_frames_per_step) / dt
    suffix = "" if B == 64 else "_b%d" % B
    _merge(**{"ar_decoder_mel_frames_per_sec_per_chip" + suffix: round(rate, 1)})
    if with_mfu:
        from semi_tts_tpu.utils.flops import matmul_flops

        flops = matmul_flops(infer, params, state, text, sid, key)
        _merge(ar_decoder_mfu_pct=round(100 * flops / dt / V5E_BF16_PEAK, 1))


# ---------------------------------------------------------------------------
# Stage: train steps (per variant/batch)


def _train_batches(B):
    import jax
    import jax.numpy as jnp

    g = _ctx()["g"]

    def on_device(seed):
        # identical structure to g._example_batch, but the (B, 132300) noise
        # waves are generated on device — a 34 MB host batch costs seconds to
        # minutes through the tunnel depending on the day's bandwidth (and
        # make_waves=False skips even materializing it on the host)
        _, wave_len, text, sid = g._example_batch(B, 6.0, U=32, seed=seed,
                                                  make_waves=False)
        # iota noise, not threefry — see _stage_feat_tpu: the threefry
        # generation program is the wedge-prone compile-service RPC
        wd = jax.jit(_iota_noise, static_argnums=(0, 1, 2))(
            B, int(6.0 * 22050), seed)
        return (wd, jnp.asarray(wave_len), jnp.asarray(text), jnp.asarray(sid))

    return on_device(0), on_device(1)


def _stage_train(variant, B=8, with_mfu=False, iters=24):
    """Full-size semi-supervised train-step wall time (paired / speech-first
    / text-first cycles, B paired [+ B unpaired], 6 s waves) — the TPU
    counterpart of the reference's only perf instrument, the ``sec/step``
    line (`src/util.py:35-43`)."""
    import jax
    import jax.numpy as jnp

    c = _ctx()
    builder, opt_state = _train_builder()
    params, state = c["params"], c["state"]
    pair, unpair = _train_batches(B)
    make = {"paired": builder.make_paired_step,
            "speech_first": builder.make_speech_first_step,
            "text_first": builder.make_text_first_step}[variant]
    step = make()
    args = pair if variant == "paired" else pair + unpair
    key = jax.random.PRNGKey(0)

    @jax.jit
    def chained(params, state, opt_state, key, n, *args):
        def body(i, cy):
            p, s, o = cy
            p, s, o, _ = step(p, s, o, key, i, 0.9, *args)
            return (p, s, o)
        p, s, o = jax.lax.fori_loop(0, n, body, (params, state, opt_state))
        return jax.tree_util.tree_leaves(p)[0].reshape(-1)[0]

    float(chained(params, state, opt_state, key, jnp.int32(iters), *args))
    dt = _differential_time(
        lambda n: float(chained(params, state, opt_state, key, jnp.int32(n), *args)),
        iters, 4 * iters)
    suffix = "" if B == 8 else "_b%d" % B
    _merge(**{"train_step_ms_%s%s" % (variant, suffix): round(dt * 1e3, 1)})
    if B != 8:
        _merge(**{"train_step_utt_per_sec%s" % suffix: round(B / dt, 1)})
    if with_mfu:
        from semi_tts_tpu.utils.flops import matmul_flops

        flops = matmul_flops(lambda *a: step(*a), params, state, opt_state,
                             key, 1, 0.9, *args)
        _merge(**{"train_step_mfu_pct%s" % suffix:
                  round(100 * flops / dt / V5E_BF16_PEAK, 1)})


# ---------------------------------------------------------------------------
# Stage: Griffin-Lim vocoder


def _stage_griffin_lim(iters=32):
    """Batched Griffin-Lim vocoder throughput (B=16 utterances of ~7.5 s,
    30 iterations — `src/audio.py:179-226`)."""
    import jax
    import jax.numpy as jnp

    from semi_tts_tpu.ops.griffin_lim import griffin_lim

    feat = _ctx()["feat"]
    c = feat.cfg
    B, T = 16, 600
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.uniform(0.0, 0.8, size=(B, T, 80)).astype(np.float32))
    amp = feat.mel_to_linear_amp(mel)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def chained(amp, key, n):
        def body(i, s):
            w = griffin_lim(amp + i * 1e-9, jax.random.fold_in(key, i),
                            n_fft=c.n_fft, hop=c.hop_length, win_length=c.win_length)
            return s + w[0, 0]
        return jax.lax.fori_loop(0, n, body, 0.0)

    float(chained(amp, key, jnp.int32(iters)))  # compile + warm
    dt = _differential_time(
        lambda n: float(chained(amp, key, jnp.int32(n))), iters, 4 * iters)
    _merge(griffin_lim_utt_per_sec=round(B / dt, 1),
           griffin_lim_batch_ms=round(dt * 1e3, 1))


# ---------------------------------------------------------------------------
# Stage: serving e2e throughput (per batch) + single-request latency


def _serving(decode_steps=200):
    c = _ctx()
    key = "serving_%d" % decode_steps
    if key not in c:
        c[key] = c["g"]._serving_stages(c["cfg"], c["feat"], c["phn_attr"],
                                        decode_steps)
    return c[key]


def _stage_tts_e2e(B, iters=8, decode_steps=200):
    """Full serving pipeline: text -> codebook embed -> Tacotron2 (AR decode
    + CBHG mel->linear) -> denormalize -> Griffin-Lim -> waveform. The
    `--gen-wav` path (`train/gen_specgram.py:126-145`, reference
    `bin/gen_specgram.py:89-129` + `src/audio.py:179-226`) at serving batch;
    utterances are 600 mel frames (~7.5 s). TWO stage programs (synthesis,
    vocoder) chained by async dispatch with a single scalar readback at the
    end — the exact programs `serve.TTSServer` deploys; one fused program
    hits pathological remote-compile times at B>16."""
    import jax

    c = _ctx()
    cfg, feat = c["cfg"], c["feat"]
    params, state = c["params"], c["state"]
    audio_sec = decode_steps * cfg.n_frames_per_step * feat.cfg.hop_length \
        / feat.cfg.sample_rate
    synth, vocode = _serving(decode_steps)
    text, sid = c["g"]._serving_inputs(B)
    # Pre-materialize per-iteration keys OUTSIDE the timed region so the
    # timed loop issues nothing but the two stage dispatches.
    keys = [k for k in jax.random.split(jax.random.PRNGKey(0), 8 * iters)]

    def run(n):
        last = None
        for i in range(n):
            amp = synth(params, state, text, sid, keys[2 * i])
            last = vocode(amp, keys[2 * i + 1])
        return float(last[0, 0])  # single scalar readback flushes the queue

    run(iters)  # compile + warm both stages
    dt = _differential_time(run, iters, 4 * iters)
    suffix = "" if B == 16 else "_b%d" % B
    _merge(**{"tts_e2e_utt_per_sec" + suffix: round(B / dt, 1),
              "tts_e2e_realtime_factor" + suffix: round(B * audio_sec / dt, 1)})


def _stage_serve_latency(B=1, repeats=8, decode_steps=200):
    """Latency of ONE request arriving alone (tools/serve_latency.py
    methodology): a single synth+vocode dispatch pair with the readback a
    real request pays — intentionally NOT fori-chained."""
    import jax

    c = _ctx()
    params, state = c["params"], c["state"]
    cfg, feat = c["cfg"], c["feat"]
    audio_sec = decode_steps * cfg.n_frames_per_step * feat.cfg.hop_length \
        / feat.cfg.sample_rate
    synth, vocode = _serving(decode_steps)
    text, sid = c["g"]._serving_inputs(B)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))

    def request():
        wav = vocode(synth(params, state, text, sid, k1), k2)
        return float(wav[0, 0])  # scalar readback = request completion

    request()  # compile + warm (B=1 programs are distinct from B=16's)
    lat = min(_best_of(request, n=1) for _ in range(repeats))

    # decompose: the tunnel's dispatch+readback floor, measured with a no-op
    # program the same way (tools/serve_latency.py methodology). A co-located
    # deployment pays ~(latency - roundtrip); without this key the headline
    # number conflates the two (VERDICT r4 item 5b/weak 4).
    import jax.numpy as jnp

    noop = jax.jit(lambda x: x + 1.0)
    one = jnp.float32(0.0)
    float(noop(one))  # compile
    rt = min(_best_of(lambda: float(noop(one)), n=1) for _ in range(repeats))
    _merge(**{"serve_latency_ms_b%d" % B: round(lat * 1e3, 1),
              "serve_latency_realtime_factor_b%d" % B:
                  round(audio_sec / lat, 1),
              "tunnel_roundtrip_ms": round(rt * 1e3, 1),
              "serve_latency_ms_b%d_minus_roundtrip" % B:
                  round((lat - rt) * 1e3, 1)})


# ---------------------------------------------------------------------------


class StageScheduler:
    """Budget gate for the bench's stage loop (pure host logic, unit-tested
    in `tests/test_bench_sched.py` — a bug here silently forfeits BENCH keys).

    Stage estimates are COLD-cache costs, but with the persistent compile
    cache warm each stage runs 5-15x under its estimate — so completed
    stages' actual/estimate ratios scale the remaining estimates. The scale
    is the LOW-median of observed ratios, capped at 1.0 (one stage blown out
    by a tunnel trough must never cascade into skipping everything after it
    — r4 saw a 442 s featurizer stage on a warm cache) and floored at 0.1
    (never extrapolate more than 10x optimism from a few fast stages)."""

    def __init__(self):
        self.ratios: list = []  # actual/estimate of completed stages

    def scale(self) -> float:
        if not self.ratios:
            return 1.0
        return max(0.1, min(1.0, sorted(self.ratios)[(len(self.ratios) - 1) // 2]))

    def affords(self, est: float, remaining: float) -> bool:
        return remaining >= est * self.scale()

    def record(self, est: float, actual: float) -> None:
        self.ratios.append(actual / est)


def main():
    # Persistent XLA compile cache: the bench's dominant wall cost is the
    # remote compiles; re-runs on the same host hit the cache and measure in
    # a fraction of the time. Execution timings are unaffected (the cache
    # stores compiled executables, not measurements). Per-user dir (0700) so
    # multi-user hosts neither collide nor deserialize another user's
    # entries; SEMI_TTS_COMPILE_CACHE overrides.
    from semi_tts_tpu.utils.compile_cache import (default_cache_dir,
                                                  enable_compilation_cache)

    # min_compile_seconds=0: persist even the trivial programs (wave-gen,
    # frame counts, the watchdog no-op). Their pure compile time is <1 s, so
    # the default threshold skips them — but on the axon tunnel EVERY
    # uncached compile pays the erratic remote-service queue (measured
    # 2026-08-21: ~50 s per tiny program in a trough; two back-to-back
    # bench runs lost their whole budget to it). Cached, they cost ~0.1 s.
    enable_compilation_cache(default_cache_dir(), min_compile_seconds=0.0)
    _device_watchdog()

    # 560 s: the driver's own `timeout` killed BENCH_r03 somewhere past
    # 614 s — our watchdog must ALWAYS win that race, so stay well under.
    # The deadline is ABSOLUTE (carried across self-re-execs below): however
    # many fresh starts happen, the wall clock from the FIRST start is what
    # the driver's timeout sees.
    budget = float(os.environ.get("SEMI_TTS_BENCH_BUDGET_S", "560"))
    deadline = float(os.environ.get("SEMI_TTS_BENCH_DEADLINE_EPOCH", "0")) \
        or (_T_START + budget)
    execs = int(os.environ.get("SEMI_TTS_BENCH_EXECS", "0"))
    _merge(bench_budget_s=budget)
    if execs:
        _merge(bench_stall_reexecs=execs)

    def _budget_watchdog():
        # Belt-and-braces: if a stage wedges inside an uncancellable remote
        # compile, print whatever has been measured and exit 0 just before
        # the budget expires.
        remaining = deadline - time.time() - 5.0
        if remaining > 0 and _PRINTED.wait(remaining):
            return
        _stage_log("budget watchdog fired — emitting partial results")
        skipped = _RESULTS.get("stages_skipped", [])
        _merge(stages_skipped=skipped + ["<budget watchdog cut the run>"])
        _emit(exit_code=0)

    threading.Thread(target=_budget_watchdog, daemon=True).start()

    def _stall_watchdog():
        # The axon compile/load service intermittently wedges a single RPC
        # for many minutes while the device itself answers (measured
        # 2026-08-21: three runs lost their ENTIRE budget inside stage 1,
        # each with a passing device probe, and a fresh process immediately
        # after each wedge ran fine). The wedged RPC cannot be cancelled
        # from Python — but the PROCESS can be replaced: if the first stage
        # produces nothing within `limit`, re-exec bench.py in place (same
        # PID/stdout for the driver, fresh service connection, warm disk
        # cache) against the same absolute deadline. Never fires once any
        # stage has completed, at most twice, and only while enough budget
        # remains for a warm re-run to beat a guaranteed zero.
        # a HEALTHY stage 1 runs ~140-165 s on this host (trivial programs
        # cached); the limit must clear that with margin EVEN after an
        # earlier re-exec shrank the remaining budget (a floor below the
        # healthy time would re-exec a healthy-but-slow run spuriously),
        # while a real wedge spends only `limit` of the run before the retry
        limit = min(220.0, max(185.0, (deadline - time.time()) / 2.8))
        if _FIRST_STAGE_DONE.wait(limit) or _PRINTED.is_set() or execs >= 2 \
                or deadline - time.time() < 120:
            return
        _stage_log("stall watchdog: no stage completed in %.0fs — re-exec "
                   "with %.0fs left (fresh service connection, warm cache)"
                   % (limit, deadline - time.time()))
        os.environ["SEMI_TTS_BENCH_DEADLINE_EPOCH"] = repr(deadline)
        os.environ["SEMI_TTS_BENCH_EXECS"] = str(execs + 1)
        sys.stdout.flush()
        sys.stderr.flush()
        try:
            os.execv(sys.executable, [sys.executable] + sys.argv)
        except OSError:
            pass  # fall back to the budget watchdog's partial emit

    threading.Thread(target=_stall_watchdog, daemon=True).start()

    # (name, estimated cold-cache cost in s, fn) — most important first: the
    # budget cuts from the tail, never the headline. Estimates are measured
    # COLD-cache costs (r4, after the in-graph DFT-basis change cut the
    # featurize-bearing compiles ~7x); with the persistent cache warm every
    # stage runs far under its estimate and nothing is skipped.
    stages = [
        ("featurizer_tpu", 45, _stage_feat_tpu),
        ("featurizer_cpu_baseline", 15, _stage_feat_cpu),
        ("decoder_b64", 200, lambda: _stage_decoder(64, with_mfu=True)),
        ("train_paired_b8", 110, lambda: _stage_train("paired", 8, with_mfu=True)),
        ("train_paired_b64", 130, lambda: _stage_train("paired", 64, with_mfu=True)),
        ("tts_e2e_b16", 380, lambda: _stage_tts_e2e(16)),
        ("serve_latency_b1", 80, lambda: _stage_serve_latency(1)),
        ("griffin_lim", 40, _stage_griffin_lim),
        ("train_speech_first_b8", 120, lambda: _stage_train("speech_first", 8)),
        ("train_text_first_b8", 120, lambda: _stage_train("text_first", 8)),
        ("decoder_b256", 60, lambda: _stage_decoder(256, with_mfu=False)),
        ("decoder_b512", 60, lambda: _stage_decoder(512, with_mfu=False)),
        # training-side batch saturation (VERDICT r4 item 4): B=128 is where
        # tools/batch_scaling.py's curve flattens — see docs/PERFORMANCE.md
        ("train_paired_b128", 140,
         lambda: _stage_train("paired", 128, with_mfu=True, iters=12)),
        # NO tts_e2e_b64 stage: the B=64 synthesis program (decode scan +
        # CBHG) did not finish its remote XLA compile in 24 min (r4 measured;
        # r3 saw the same for the B>=32 monoliths) — unbenchable within any
        # sane budget on this tunnel. Serving batch scaling is covered by
        # ar_decoder_*_b256/b512 + the staged-serving analysis in
        # docs/PERFORMANCE.md.
    ]
    skipped = []
    sched = StageScheduler()
    for name, est, fn in stages:
        remaining = deadline - time.time()
        if not sched.affords(est, remaining):
            skipped.append(name)
            _stage_log("SKIP %s (est %ds x %.2f > %.0fs left)"
                       % (name, est, sched.scale(), remaining))
            continue
        _stage_log(name)
        t_stage = time.time()
        try:
            fn()
        except Exception as e:  # a broken stage must not forfeit the rest
            _stage_log("ERROR in %s: %r" % (name, e))
            skipped.append(name + ":error")
            _merge(**{"error_" + name: repr(e)[:200]})
            # failed stages inform the budget model only as evidence of
            # SLOWNESS: a fast failure's tiny ratio would inflate optimism
            # (VERDICT r4 item 8a), but a stage that burned past its
            # estimate before dying (e.g. a 400 s trough compile ending in
            # an exception) is real evidence the device/queue is slow
            actual = time.time() - t_stage
            if actual >= est:
                sched.record(est, actual)
        else:
            sched.record(est, time.time() - t_stage)
        _FIRST_STAGE_DONE.set()  # RPCs respond — disarm the stall watchdog
    if skipped:
        _merge(stages_skipped=skipped)
    _stage_log("done (%.1fs)" % (time.time() - _T_START))
    _emit()


if __name__ == "__main__":
    main()
