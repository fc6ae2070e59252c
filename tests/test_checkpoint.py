"""Checkpoint triple roundtrip + partial pretrained grafting
(src/solver.py:204-218, src/vqvae.py:71-90 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_tts_tpu.train import checkpoint as C


def _tree():
    return {
        "asr": {"convs": [{"w": jnp.ones((3, 2)), "b": jnp.zeros(3)}],
                "rnn": ({"w_ih": jnp.full((4, 4), 2.0)},)},
        "codebook": {"learnable_table": jnp.arange(12.0).reshape(4, 3)},
        "tts": {"decoder": {"proj": {"w": jnp.eye(3)}}, "none_field": None},
    }


def test_roundtrip(tmp_path):
    params = _tree()
    state = {"asr": {"bn": [{"mean": jnp.zeros(3), "momentum": jnp.float32(0.1)}]}}
    opt_state = (jnp.zeros(2), {"count": jnp.int32(7)})
    path = tmp_path / "ck.pth"
    C.save_checkpoint(str(path), params=params, state=state, opt_state=opt_state,
                      step=123, extra={"note": "hi"})
    back = C.load_checkpoint(str(path))
    assert back["global_step"] == 123
    assert back["extra"] == {"note": "hi"}

    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back["model"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # structure types preserved (tuple stays tuple, None stays None)
    assert isinstance(back["model"]["asr"]["rnn"], tuple)
    assert back["model"]["tts"]["none_field"] is None
    assert int(back["optimizer"][1]["count"]) == 7


def test_partial_graft(tmp_path):
    params = _tree()
    path = tmp_path / "pre.pth"
    C.save_checkpoint(str(path), params=params, state={}, opt_state={}, step=1)

    fresh = jax.tree_util.tree_map(lambda x: None if x is None else x * 0 - 1.0,
                                   _tree(), is_leaf=lambda x: x is None)
    fresh = C.apply_pretrained(fresh, {"codebook": str(path), "tts/decoder": str(path)})
    np.testing.assert_array_equal(np.asarray(fresh["codebook"]["learnable_table"]),
                                  np.arange(12.0).reshape(4, 3))
    np.testing.assert_array_equal(np.asarray(fresh["tts"]["decoder"]["proj"]["w"]), np.eye(3))
    # untouched module stays fresh
    assert float(np.asarray(fresh["asr"]["convs"][0]["w"]).max()) == -1.0


def test_graft_missing_module_raises(tmp_path):
    params = _tree()
    path = tmp_path / "pre.pth"
    C.save_checkpoint(str(path), params=params, state={}, opt_state={}, step=1)
    with pytest.raises(KeyError):
        C.apply_pretrained(_tree(), {"nonexistent": str(path)})


def test_graft_shape_mismatch_raises(tmp_path):
    params = _tree()
    path = tmp_path / "pre.pth"
    C.save_checkpoint(str(path), params=params, state={}, opt_state={}, step=1)
    fresh = _tree()
    fresh["codebook"]["learnable_table"] = jnp.zeros((5, 3))
    with pytest.raises(ValueError):
        C.apply_pretrained(fresh, {"codebook": str(path)})


def test_write_log_audio_shape(monkeypatch):
    """TB audio tensors must be (frames, channels<=2) — a (1, T) row vector
    crashes tensorboardX's summary builder at the first validation of any
    run with soundfile installed (`src/solver.py:178-202` routing)."""
    import sys
    import types

    from semi_tts_tpu.train.solver import BaseSolver

    monkeypatch.setitem(sys.modules, "soundfile", types.ModuleType("soundfile"))
    calls = {}
    fake_log = types.SimpleNamespace(
        add_audio=lambda name, t, step, sr: calls.update(t=t, sr=sr))
    self = types.SimpleNamespace(log=fake_log, step=7)
    BaseSolver.write_log(self, "dev_wave0", (np.zeros(100, np.float32), 22050))
    assert calls["t"].shape == (100, 1)
    assert calls["sr"] == 22050
