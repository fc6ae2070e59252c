#!/usr/bin/env python
"""Headline benchmark (driver-run): on-device featurization throughput vs the
reference's CPU pipeline, plus AR-decoder / train-step / Griffin-Lim numbers
and MFU estimates.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The baseline is measured in-process: the reference extracts features per file
on CPU (torch.stft + mel matmul + dB + normalize, `src/audio.py:156-177`,
driven from DataLoader workers `src/data.py:127-128`); we run exactly that
math with torch on this host's CPU and compare mel-frames/sec.

Timing methodology (axon tunnel): N iterations chained inside ONE jitted
fori_loop, a single scalar float() readback (block_until_ready does not
reliably flush the remote queue). The readback itself costs ~10 ms of
tunnel latency, so N must be large enough to amortize it (profiler-checked:
at N=3 the AR-decoder figure under-reported device throughput ~2x).
Every timing — device chains AND the CPU baseline — is best-of-3, so a
contended run on either side cannot skew the vs_baseline ratio. MFU = analytic dot/conv FLOPs
(`utils.flops.matmul_flops`, scan-aware — XLA's own cost_analysis counts
loop bodies once) / time / bf16 peak. These are *useful* FLOPs: dots at
HIGH (bf16x3) precision execute 3 hardware passes per counted dot, so
hardware busy-ness is up to 3x the reported MFU.
"""

from __future__ import annotations

import json
import time

import numpy as np

V5E_BF16_PEAK = 197e12  # TPU v5e bf16 MXU peak FLOP/s


def _device_watchdog(timeout_s=300):
    """Fail fast if the device is unreachable instead of hanging forever.

    The axon tunnel can wedge for hours (observed 2026-08-17/18: even
    `jax.devices()` blocks indefinitely). A hung bench is worse than a
    failed one — probe the backend with a trivial jitted op on a side
    thread and, if it doesn't answer within ``timeout_s``, print an honest
    error JSON line (still one line, still has metric/value/vs_baseline
    keys) and hard-exit, because the probe thread cannot be cancelled."""
    import os
    import threading

    done = threading.Event()

    def probe():
        import jax
        import jax.numpy as jnp

        jax.jit(lambda x: x + 1.0)(jnp.float32(0.0)).block_until_ready()
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(json.dumps({
            "metric": "featurization_mel_frames_per_sec",
            "value": 0,
            "unit": "mel-frames/s",
            "vs_baseline": 0,
            "error": "device unresponsive after %ds (axon tunnel wedged?); "
                     "no measurement possible" % timeout_s,
        }), flush=True)
        os._exit(2)


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


def _bench_tpu_featurizer(waves, lengths, iters=20):
    import jax
    import jax.numpy as jnp

    from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer

    feat = AudioFeaturizer(AudioConfig())
    wd, ld = jnp.asarray(waves), jnp.asarray(lengths)

    # Chain the iterations inside ONE program with a single scalar readback:
    # immune to host dispatch / TPU-tunnel round-trip latency, measures pure
    # device compute.
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
    float(chained(wd, ld, key))  # compile + warm
    dt = _best_of(lambda: float(chained(wd, ld, key))) / iters
    from semi_tts_tpu.utils.flops import matmul_flops

    flops = matmul_flops(
        lambda w, l, k: (feat.featurize(w, l), feat.featurize_augmented(w, l, k)),
        wd, ld, key)
    mfu = flops / dt / V5E_BF16_PEAK
    _, _, fl = feat.featurize(wd, ld)
    _, al = feat.featurize_augmented(wd, ld, key)
    frames = int(np.asarray(fl).sum()) + int(np.asarray(al).sum())
    return frames / dt, dt, mfu


def _bench_cpu_reference(waves, lengths, n_files=8):
    """Literal torch restatement of the reference clean+augmented per-file
    pipeline on CPU (what its DataLoader workers compute per batch)."""
    import torch

    from semi_tts_tpu.ops.mel import mel_filterbank

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
    best = 0.0
    for _ in range(3):
        frames = 0
        t0 = time.perf_counter()
        for i in range(n_files):
            x = torch.from_numpy(waves[i % len(waves), : lengths[i % len(waves)]].copy())
            frames += clean(x).shape[1] + aug(x).shape[1]
        best = max(best, frames / (time.perf_counter() - t0))
    return best


def _bench_decoder(iters=24, batch_sizes=(64, 256, 512)):
    """AR decoder mel-frames/sec/chip on the full-size Tacotron2 stack.

    The decode loop is weight-streaming-bound (~37 MB of bf16-converted
    LSTM/attention weights re-read per step), so throughput scales with
    serving batch; the first batch size is the headline (with MFU), the
    rest are serving-farm figures. Returns {B: rate}, mfu_of_first.
    """
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from semi_tts_tpu.models import vqvae as V

    cfg, feat, phn_attr, params, state = g._build("full")
    U = 32
    decode_steps = 200  # 600 mel frames / utterance
    rates, mfu = {}, None
    for B in batch_sizes:
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

        @jax.jit
        def chained(params, state, text, sid, key):
            def body(i, s):
                mel = infer(params, state, text, sid, jax.random.fold_in(key, i))
                return s + mel[0, 0, 0]
            return jax.lax.fori_loop(0, iters, body, 0.0)

        key = jax.random.PRNGKey(0)
        float(chained(params, state, text, sid, key))  # compile + warm
        dt = _best_of(lambda: float(chained(params, state, text, sid, key))) / iters
        rates[B] = (B * decode_steps * cfg.n_frames_per_step) / dt
        if mfu is None:  # analytic-FLOPs MFU for the headline batch only
            from semi_tts_tpu.utils.flops import matmul_flops

            flops = matmul_flops(infer, params, state, text, sid, key)
            mfu = flops / dt / V5E_BF16_PEAK
    return rates, mfu


def _bench_train_steps(iters=12):
    """Full-size semi-supervised train-step wall times (paired /
    speech-first / text-first cycles, B=8 paired + B=8 unpaired, 6 s waves) —
    the TPU counterpart of the reference's only perf instrument, the
    ``sec/step`` line (`src/util.py:35-43`)."""

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
    opt_state = tx.init(params)
    B = 8
    waves, wave_len, text, sid = g._example_batch(B, 6.0, U=32, seed=0)
    u_waves, u_wave_len, u_text, u_sid = g._example_batch(B, 6.0, U=32, seed=1)
    pair = tuple(map(jnp.asarray, (waves, wave_len, text, sid)))
    unpair = tuple(map(jnp.asarray, (u_waves, u_wave_len, u_text, u_sid)))
    key = jax.random.PRNGKey(0)

    from semi_tts_tpu.utils.flops import matmul_flops

    def _mfu(step, dt, *args):
        flops = matmul_flops(
            lambda *a: step(*a), params, state, opt_state, key, 1, 0.9, *args)
        return flops / dt / V5E_BF16_PEAK

    variants = {
        "paired": (builder.make_paired_step(), pair),
        "speech_first": (builder.make_speech_first_step(), pair + unpair),
        "text_first": (builder.make_text_first_step(), pair + unpair),
    }
    out = {}
    mfu_paired = None
    for name, (step, args) in variants.items():
        @jax.jit
        def chained(params, state, opt_state, key, *args):
            def body(i, c):
                p, s, o = c
                p, s, o, _ = step(p, s, o, key, i, 0.9, *args)
                return (p, s, o)
            p, s, o = jax.lax.fori_loop(0, iters, body, (params, state, opt_state))
            return jax.tree_util.tree_leaves(p)[0].reshape(-1)[0]

        float(chained(params, state, opt_state, key, *args))  # compile + warm
        dt = _best_of(
            lambda: float(chained(params, state, opt_state, key, *args))) / iters
        out[name] = dt
        if name == "paired":
            mfu_paired = _mfu(step, dt, *args)

    # paired step at production batch B=64: the weight-streaming reads
    # amortize across the batch (tools/batch_scaling.py has the full sweep)
    pair64 = tuple(map(jnp.asarray, g._example_batch(64, 6.0, U=32, seed=0)))
    step64 = builder.make_paired_step()

    @jax.jit
    def chained64(params, state, opt_state, key, *args):
        def body(i, c):
            p, s, o = c
            p, s, o, _ = step64(p, s, o, key, i, 0.9, *args)
            return (p, s, o)
        p, s, o = jax.lax.fori_loop(0, iters, body, (params, state, opt_state))
        return jax.tree_util.tree_leaves(p)[0].reshape(-1)[0]

    float(chained64(params, state, opt_state, key, *pair64))  # compile + warm
    out["paired_b64"] = _best_of(
        lambda: float(chained64(params, state, opt_state, key, *pair64))) / iters
    return out, mfu_paired, _mfu(step64, out["paired_b64"], *pair64)


def _bench_griffin_lim(iters=16):
    """Batched Griffin-Lim vocoder throughput (B=16 utterances of ~7.5 s,
    30 iterations — `src/audio.py:179-226`)."""
    import jax
    import jax.numpy as jnp

    from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer
    from semi_tts_tpu.ops.griffin_lim import griffin_lim

    feat = AudioFeaturizer(AudioConfig())
    c = feat.cfg
    B, T = 16, 600
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.uniform(0.0, 0.8, size=(B, T, 80)).astype(np.float32))
    amp = feat.mel_to_linear_amp(mel)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def chained(amp, key):
        def body(i, s):
            w = griffin_lim(amp + i * 1e-9, jax.random.fold_in(key, i),
                            n_fft=c.n_fft, hop=c.hop_length, win_length=c.win_length)
            return s + w[0, 0]
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(chained(amp, key))  # compile + warm
    dt = _best_of(lambda: float(chained(amp, key))) / iters
    return B / dt, dt


def _bench_tts_e2e(iters=8, batch_sizes=(16, 64), decode_steps=200):
    """Full serving pipeline: text -> codebook embed -> Tacotron2 (AR decode
    + CBHG mel->linear) -> denormalize -> Griffin-Lim -> waveform. The
    `--gen-wav` path (`train/gen_specgram.py:126-145`, reference
    `bin/gen_specgram.py:89-129` + `src/audio.py:179-226`) at serving batch;
    utterances are 600 mel frames (~7.5 s).

    Structured exactly like production serving: TWO stage programs
    (synthesis, vocoder) chained by async dispatch with a single scalar
    readback at the end. One fused program hits pathological remote-compile
    times at B>16 (the tunnel compile of the text->decode->GL monolith never
    finished at B=32/64 in 15 min); the split stages each compile in
    minutes, which is what makes the B=64 figure measurable at all.
    Returns {B: (utt/s, realtime-factor)}.
    """
    import jax

    import __graft_entry__ as g

    cfg, feat, phn_attr, params, state = g._build("full")
    c = feat.cfg
    audio_sec_per_utt = decode_steps * cfg.n_frames_per_step * c.hop_length / c.sample_rate
    synth, vocode = g._serving_stages(cfg, feat, phn_attr, decode_steps)
    results = {}
    for B in batch_sizes:
        text, sid = g._serving_inputs(B)

        # Pre-materialize per-iteration keys OUTSIDE the timed region so the
        # timed loop issues nothing but the two stage dispatches.
        keys = [k for k in jax.random.split(jax.random.PRNGKey(0), 2 * iters)]

        def run():
            last = None
            for i in range(iters):
                amp = synth(params, state, text, sid, keys[2 * i])
                last = vocode(amp, keys[2 * i + 1])
            return float(last[0, 0])  # single scalar readback flushes the queue

        run()  # compile + warm both stages
        dt = _best_of(run) / iters
        results[B] = (B / dt, B * audio_sec_per_utt / dt)
    return results


def main():
    # Persistent XLA compile cache: the bench's dominant wall cost is the
    # remote compiles (the two serving-stage programs alone are minutes
    # each); re-runs on the same host hit the cache and measure in a
    # fraction of the time. Execution timings are unaffected (the cache
    # stores compiled executables, not measurements).
    from semi_tts_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache("/tmp/semi_tts_xla_cache")
    _device_watchdog()

    import sys
    t_start = time.time()

    def stage(name):  # stderr progress; stdout stays ONE JSON line
        print("[bench %6.1fs] %s" % (time.time() - t_start, name),
              file=sys.stderr, flush=True)
    B, sec, sr = 128, 8.0, 22050
    rng = np.random.RandomState(0)
    S = int(sec * sr)
    waves = (rng.randn(B, S) * 0.1).astype(np.float32)
    lengths = rng.randint(int(0.7 * S), S + 1, size=B).astype(np.int32)

    stage("featurizer (TPU)")
    tpu_rate, step_dt, feat_mfu = _bench_tpu_featurizer(waves, lengths)
    stage("featurizer (CPU reference baseline)")
    cpu_rate = _bench_cpu_reference(waves, lengths)
    stage("AR decoder B=64/256/512")
    dec_rates, dec_mfu = _bench_decoder()
    stage("train steps")
    train_ms, train_mfu, train_mfu_b64 = _bench_train_steps()
    stage("Griffin-Lim")
    gl_rate, gl_dt = _bench_griffin_lim()
    stage("serving e2e B=16/64")
    e2e = _bench_tts_e2e()
    stage("done")

    print(json.dumps({
        "metric": "featurization_mel_frames_per_sec",
        # `value` is device-time-derived (frames / chained device seconds) —
        # the figure that is stable across runs; vs_baseline divides by the
        # co-measured host-CPU reference pipeline (volatile with host load)
        "value": round(tpu_rate, 1),
        "unit": "mel-frames/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
        "baseline_cpu_mel_frames_per_sec": round(cpu_rate, 1),
        "featurize_batch_ms": round(step_dt * 1e3, 2),
        "featurization_mel_frames_per_device_sec": round(tpu_rate, 1),
        "featurizer_mfu_pct": round(100 * feat_mfu, 1),
        "ar_decoder_mel_frames_per_sec_per_chip": round(dec_rates[64], 1),
        "ar_decoder_mel_frames_per_sec_per_chip_b256": round(dec_rates[256], 1),
        "ar_decoder_mel_frames_per_sec_per_chip_b512": round(dec_rates[512], 1),
        "ar_decoder_mfu_pct": round(100 * dec_mfu, 1),
        "train_step_ms_paired": round(train_ms["paired"] * 1e3, 1),
        "train_step_ms_speech_first": round(train_ms["speech_first"] * 1e3, 1),
        "train_step_ms_text_first": round(train_ms["text_first"] * 1e3, 1),
        "train_step_mfu_pct": round(100 * train_mfu, 1),
        "train_step_ms_paired_b64": round(train_ms["paired_b64"] * 1e3, 1),
        "train_step_utt_per_sec_b64": round(64 / train_ms["paired_b64"], 1),
        "train_step_mfu_pct_b64": round(100 * train_mfu_b64, 1),
        "griffin_lim_utt_per_sec": round(gl_rate, 1),
        "griffin_lim_batch_ms": round(gl_dt * 1e3, 1),
        "tts_e2e_utt_per_sec": round(e2e[16][0], 1),
        "tts_e2e_realtime_factor": round(e2e[16][1], 1),
        "tts_e2e_utt_per_sec_b64": round(e2e[64][0], 1),
        "tts_e2e_realtime_factor_b64": round(e2e[64][1], 1),
    }))


if __name__ == "__main__":
    main()
