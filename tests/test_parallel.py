"""Mesh + sharding rules on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from semi_tts_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
)


def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh2 = make_mesh(8)
    assert dict(mesh2.shape) == {"data": 8, "model": 1}


def test_param_sharding_rules():
    mesh = make_mesh(8, model_parallel=2)
    params = {
        "rnn": {"w_ih": jnp.zeros((4096, 768)), "w_hh": jnp.zeros((4096, 1024)),
                "b_ih": jnp.zeros(4096)},
        "proj": {"w": jnp.zeros((240, 1536)), "b": jnp.zeros(240)},
        "tiny": {"w": jnp.zeros((3, 5))},
        "odd": {"w_ih": jnp.zeros((129, 64))},  # not divisible by 2 -> replicate
    }
    placed = shard_params(params, mesh)
    def spec(x):
        return x.sharding.spec

    assert spec(placed["rnn"]["w_ih"]) == P("model")
    assert spec(placed["rnn"]["w_hh"]) == P("model")
    assert spec(placed["rnn"]["b_ih"]) == P()
    assert spec(placed["proj"]["w"]) == P("model")
    assert spec(placed["tiny"]["w"]) == P()
    assert spec(placed["odd"]["w_ih"]) == P()


def test_dp_tp_execution():
    """A DP-sharded batch through a TP-sharded matmul executes and matches
    the unsharded result (XLA inserts the collectives)."""
    mesh = make_mesh(8, model_parallel=2)
    rng = np.random.RandomState(0)
    x = rng.randn(8, 64).astype(np.float32)
    w = rng.randn(128, 64).astype(np.float32)

    params = {"layer": {"w_ih": jnp.asarray(w)}}
    placed = shard_params(params, mesh)
    xb = shard_batch({"x": jnp.asarray(x)}, mesh)

    @jax.jit
    def f(p, x):
        return jnp.tanh(x @ p["layer"]["w_ih"].T).sum(axis=1)

    with mesh:
        got = np.asarray(f(placed, xb["x"]))
    want = np.tanh(x @ w.T).sum(1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_replicate():
    mesh = make_mesh(4)
    t = replicate({"a": jnp.ones(3)}, mesh)
    assert t["a"].sharding.spec == P()
