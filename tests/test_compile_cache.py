"""Persistent XLA compilation cache (`semi_tts_tpu/utils/compile_cache.py`).

The TPU deployment's cold-start cost is XLA compiles (60-100 s per big
program over the remote tunnel); the cache makes restarts warm. These tests
pin the wiring on CPU: enabling writes executable entries to the directory,
and the switch is exposed on the serving API and the CLI.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from semi_tts_tpu.utils import compile_cache as cc


@pytest.fixture
def cache_guard():
    """Restore the process-global cache config after the test."""
    yield
    jax.config.update("jax_compilation_cache_dir", None)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    cc._enabled = None  # the module global guarding re-enable no-ops


def test_enable_writes_entries(tmp_path, cache_guard):
    d = cc.enable_compilation_cache(str(tmp_path / "cc"),
                                    min_compile_seconds=0.0,
                                    min_entry_bytes=-1)
    assert os.path.isdir(d)

    # a fresh program shape (unique constant) so this compile can't have been
    # cached in-memory by an earlier test
    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T + 12345.678).sum()

    f(jnp.ones((32, 32))).block_until_ready()
    assert os.listdir(d), "no cache entries written"

    # re-enabling the same directory is a no-op, a new one re-points
    assert cc.enable_compilation_cache(d) == d
    d2 = cc.enable_compilation_cache(str(tmp_path / "cc2"))
    assert d2 != d and os.path.isdir(d2)


def test_env_and_flag_routing(tmp_path, cache_guard, monkeypatch):
    monkeypatch.delenv("SEMI_TTS_COMPILE_CACHE", raising=False)
    assert cc.maybe_enable_from_env("") is None
    assert cc.maybe_enable_from_env(None) is None

    monkeypatch.setenv("SEMI_TTS_COMPILE_CACHE", str(tmp_path / "env_cc"))
    assert cc.maybe_enable_from_env("") == str(tmp_path / "env_cc")
    # an explicit flag value wins over the env var
    assert cc.maybe_enable_from_env(str(tmp_path / "flag_cc")) \
        == str(tmp_path / "flag_cc")


def test_server_kwarg(tmp_path, cache_guard):
    """TTSServer(compile_cache=...) enables the cache at construction."""
    from semi_tts_tpu.serve import TTSServer
    import __graft_entry__ as g

    cfg, feat, phn_attr, params, state = g._build("small")
    TTSServer(cfg, feat, phn_attr, params, state,
              compile_cache=str(tmp_path / "srv_cc"))
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "srv_cc")


def test_default_cache_dir_shared_helper(monkeypatch, tmp_path):
    """ONE dir derivation shared by bench.py / tools/warm_bench_cache.py /
    tools/cycle_check.py (ADVICE r4): env override wins, else a per-user
    tempdir path."""
    from semi_tts_tpu.utils import compile_cache as cc

    monkeypatch.setenv("SEMI_TTS_COMPILE_CACHE", str(tmp_path / "x"))
    assert cc.default_cache_dir() == str(tmp_path / "x")
    monkeypatch.delenv("SEMI_TTS_COMPILE_CACHE", raising=False)
    import getpass
    import tempfile

    assert cc.default_cache_dir() == os.path.join(
        tempfile.gettempdir(), "semi_tts_xla_cache_%s" % getpass.getuser())
