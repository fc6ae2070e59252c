"""Pre-warm the persistent XLA compile cache for bench.py's tail stages.

`python bench.py` runs under a hard wall budget (the driver wraps it in its
own `timeout`), so on a COLD cache the budget is spent compiling the head
stages and the tail (`tts_e2e_b16`, `serve_latency_b1`, the speech/text-first
train variants, the b256/b512 decoder points) gets skipped — and therefore
never gets warmed either, so the NEXT run skips it again. This tool breaks
that cycle: it runs exactly the named stages with NO budget, so their
compiled executables land in the same per-user persistent cache bench.py
uses (`utils/compile_cache`), and a subsequent budgeted bench run completes
every stage.

Usage:
    python tools/warm_bench_cache.py [stage ...]   # default: the tail six

Stage names match bench.py's schedule entries. Measurements printed here are
side effects of warming, not records — the driver's BENCH_r*.json is the
record.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo root on path)

STAGES = {
    "featurizer_tpu": bench._stage_feat_tpu,
    "decoder_b64": lambda: bench._stage_decoder(64, with_mfu=True),
    "train_paired_b8": lambda: bench._stage_train("paired", 8, with_mfu=True),
    "train_paired_b64": lambda: bench._stage_train("paired", 64, with_mfu=True),
    "tts_e2e_b16": lambda: bench._stage_tts_e2e(16),
    "serve_latency_b1": lambda: bench._stage_serve_latency(1),
    "griffin_lim": bench._stage_griffin_lim,
    "train_speech_first_b8": lambda: bench._stage_train("speech_first", 8),
    "train_text_first_b8": lambda: bench._stage_train("text_first", 8),
    "decoder_b256": lambda: bench._stage_decoder(256, with_mfu=False),
    "decoder_b512": lambda: bench._stage_decoder(512, with_mfu=False),
    "train_paired_b128": lambda: bench._stage_train("paired", 128,
                                                    with_mfu=True, iters=12),
}
DEFAULT = ["tts_e2e_b16", "serve_latency_b1", "train_speech_first_b8",
           "train_text_first_b8", "decoder_b256", "decoder_b512",
           "train_paired_b128"]


def main(argv):
    names = argv or DEFAULT
    unknown = [n for n in names if n not in STAGES]
    if unknown:
        raise SystemExit("unknown stage(s) %s; choose from %s"
                         % (unknown, sorted(STAGES)))
    from semi_tts_tpu.utils.compile_cache import (default_cache_dir,
                                                  enable_compilation_cache)

    # SAME dir derivation as bench.main() — one shared helper, so the warmer
    # can never silently fill a different cache (ADVICE r4)
    # min_compile_seconds=0 matches bench.main(): the trivial programs must
    # land in the cache too, or every bench run re-pays the remote compile
    # queue (~50 s each in a trough) for them
    enable_compilation_cache(default_cache_dir(), min_compile_seconds=0.0)
    # Fail fast on a wedged axon tunnel (observed to block even jax.devices()
    # for hours) instead of hanging before the first stage; the intentional
    # no-BUDGET design only covers slow compiles, not a dead device
    bench._device_watchdog()
    failed = []
    for n in names:
        t0 = time.time()
        print("[warm] %s ..." % n, flush=True)
        try:
            STAGES[n]()
        except Exception as e:  # keep warming the rest
            print("[warm] %s ERROR: %r" % (n, e), flush=True)
            failed.append(n)
        else:
            print("[warm] %s done (%.1fs)" % (n, time.time() - t0),
                  flush=True)
    print("[warm] results (informational): %s" % bench._RESULTS, flush=True)
    if failed:  # scripted callers must see a failed warm run (ADVICE r4)
        raise SystemExit("[warm] %d/%d stages failed: %s"
                         % (len(failed), len(names), failed))


if __name__ == "__main__":
    main(sys.argv[1:])
