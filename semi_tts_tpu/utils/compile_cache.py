"""Persistent XLA compilation cache.

The reference never needed this: PyTorch eager has no ahead-of-time compile
step. On TPU every jitted program is XLA-compiled, and on this class of
deployment the compiles are the dominant cold-start cost (measured on the
v5e target: 60-100 s for one big training step; the serving synthesis stage
takes minutes at large batch — docs/PERFORMANCE.md "Serving-e2e at larger
batch"). JAX ships a content-addressed on-disk cache for exactly this; this
module is the one switch that turns it on for the trainers (``main.py
--compile-cache``), the serving endpoint (`serve.TTSServer`), and anything
else that imports the package.

With the cache enabled, re-running the same program shape (a restarted
trainer, a rolling-restarted serving replica, the per-decode-length bucketed
programs `TTSServer.stages` compiles) loads the compiled executable from
disk instead of re-invoking XLA — on the remote-tunnel TPU that turns a
multi-minute warm-up into seconds.
"""

from __future__ import annotations

import os

_enabled: tuple | None = None  # (dir, min_compile_seconds, min_entry_bytes)


def enable_compilation_cache(cache_dir: str, *, min_compile_seconds: float = 1.0,
                             min_entry_bytes: int = 0) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` (created if
    missing, mode 0700 so cache entries — deserialized compiled executables —
    are never shared across users). Process-global and last-writer-wins:
    calling again with the same (dir, thresholds) is a no-op; any changed
    value re-applies, re-pointing every later compile in the process.

    ``min_compile_seconds``: only persist programs whose compile took at
    least this long (default 1 s — skips the hundreds of trivial op-by-op
    programs, keeps every model-sized one). ``min_entry_bytes``: additional
    size floor; pass -1 to persist everything (used by tests).
    """
    global _enabled
    import jax

    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    config = (cache_dir, float(min_compile_seconds), int(min_entry_bytes))
    if _enabled == config:
        return cache_dir
    # mode applies only on creation; an existing (possibly shared) dir is
    # left alone — callers who need isolation pass a per-user path
    os.makedirs(cache_dir, mode=0o700, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_seconds))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                      int(min_entry_bytes))
    _enabled = config
    return cache_dir


def default_cache_dir() -> str:
    """The bench-family default cache path: ``SEMI_TTS_COMPILE_CACHE`` if
    set, else a per-user dir under the system tempdir (0700 on creation —
    entries are deserialized executables, never share them across users).
    ONE definition so bench.py, tools/warm_bench_cache.py and
    tools/cycle_check.py can never silently warm different caches
    (ADVICE r4)."""
    import getpass
    import tempfile

    return (os.environ.get("SEMI_TTS_COMPILE_CACHE")
            or os.path.join(tempfile.gettempdir(),
                            "semi_tts_xla_cache_%s" % getpass.getuser()))


def maybe_enable_from_env(flag_value: str | None = None) -> str | None:
    """Enable the cache from an explicit flag value or the
    ``SEMI_TTS_COMPILE_CACHE`` environment variable (either may be empty =
    disabled). Returns the enabled directory or None."""
    target = flag_value or os.environ.get("SEMI_TTS_COMPILE_CACHE", "")
    if not target:
        return None
    return enable_compilation_cache(target)
