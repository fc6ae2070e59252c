"""Mesh construction and sharding rules.

The reference is single-device (`/root/reference/src/solver.py:27`; SURVEY.md
§2.2); scale-out here is TPU-native: a ``jax.sharding.Mesh`` with a ``data``
axis (batch parallelism — the realistic need at this model size) and an
optional ``model`` axis (tensor parallelism over the wide decoder/encoder
matmuls). Params/batches are placed with ``NamedSharding``; XLA inserts the
ICI collectives (psum for grad reduction, all-gathers for TP activations).

Multi-host: call :func:`init_distributed` before device queries; the same
mesh code then spans hosts (DCN between slices is handled by jax.distributed).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host bring-up (no-op when single-process).

    Env-driven when called with no arguments (the CLI path, `main.py`):
    ``SEMI_TTS_NUM_PROCESSES`` / ``SEMI_TTS_PROCESS_ID`` /
    ``SEMI_TTS_COORDINATOR`` select the process grid; on TPU pods where the
    runtime publishes its own cluster metadata, set
    ``SEMI_TTS_NUM_PROCESSES=auto`` to let ``jax.distributed.initialize()``
    autodetect everything. Must run before the first device query. Returns
    True when a multi-process runtime was initialized."""
    import os

    env_n = os.environ.get("SEMI_TTS_NUM_PROCESSES", "")
    if num_processes is None and env_n:
        if env_n.lower() == "auto":
            jax.distributed.initialize()
            return True
        num_processes = int(env_n)
        process_id = int(os.environ.get("SEMI_TTS_PROCESS_ID", "0"))
        coordinator = os.environ.get("SEMI_TTS_COORDINATOR", "localhost:12321")
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes, process_id=process_id)
        return True
    return False


def make_mesh(n_devices=None, *, model_parallel=1, devices=None) -> Mesh:
    """('data', 'model') mesh over the first ``n_devices`` devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch_tree, mesh: Mesh):
    s = batch_sharding(mesh)
    n_data = mesh.shape["data"]
    rep = NamedSharding(mesh, P())

    def put(x):
        if not (isinstance(x, (np.ndarray, jax.Array)) and x.ndim >= 1):
            return x
        # ragged tail batches (inference buckets) can't split over 'data';
        # replicate them — correct, just no DP speedup for that one batch
        return jax.device_put(x, s if x.shape[0] % n_data == 0 else rep)

    if isinstance(batch_tree, dict) and type(batch_tree) is not dict:
        # dict subclasses (e.g. the loader's Batch) are jax pytree *leaves*;
        # shard their values and rebuild the same type
        return type(batch_tree)(
            {k: jax.tree_util.tree_map(put, v) for k, v in batch_tree.items()})
    return jax.tree_util.tree_map(put, batch_tree)


def shard_params(params, mesh: Mesh, specs=None):
    """Place a VQVAE param pytree by the explicit per-module PartitionSpecs
    of `parallel.sharding` (pass ``specs`` for any other model's tree)."""
    from .sharding import place_params

    return place_params(params, mesh, specs)


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
