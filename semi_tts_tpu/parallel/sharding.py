"""Explicit per-module tensor-parallel PartitionSpecs for the VQVAE.

Each ``*_specs`` function mirrors its module's init layout exactly
(`models/asr.py`, `models/tts.py`, `models/decoder.py`, `models/cbhg.py`,
`ops/rnn.py`) and states the sharding intent leaf by leaf — no generic
path-string matching. Policy: shard the gate-stacked output dimension of the
wide LSTM/GRU weights and the big decoder/postnet projections over 'model';
everything small (convs, attention, codebook, biases' peers, norms)
replicates. ``place_params`` validates divisibility per leaf and falls back
to replication, so the same spec tree serves any mesh size.

XLA resolves any mixture of these placements with ICI collectives; the
numerical result is the single-device one up to reduction order
(`tests/test_parallel.py::test_dp_tp_step_matches_single_device`).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

R = P()  # replicated


def _fill(tree, spec=R):
    return jax.tree_util.tree_map(lambda _: spec, tree)


def lstm_specs(_p=None):
    """One LSTM/GRU direction (`ops/rnn.py:25-34,101-109`): (gates*H, D)
    weights shard on the stacked output dim."""
    return {"w_ih": P("model", None), "w_hh": P("model", None),
            "b_ih": P("model"), "b_hh": P("model")}


def multi_lstm_specs(layers):
    """`ops/rnn.multi_lstm_init`: [{'fwd': ..., 'bwd'?: ...}, ...]."""
    return [{d: lstm_specs() for d in layer} for layer in layers]


def linear_specs(p, shard_out=False):
    """`models/common.linear_init`: {'w': (out, in), 'b'?: (out,)}."""
    out = {"w": P("model", None) if shard_out else R}
    if "b" in p:
        out["b"] = P("model") if shard_out else R
    return out


def asr_specs(p):
    """`models/asr.asr_init`: conv stack replicated, BiLSTM sharded,
    output projection replicated (latent_dim is small)."""
    out = {"convs": _fill(p["convs"]), "rnn": multi_lstm_specs(p["rnn"]),
           "postnet": linear_specs(p["postnet"])}
    for k in ("bn", "ln"):
        if k in p:
            out[k] = _fill(p[k])
    return out


def asr_postnet_specs(p):
    """`models/asr.asr_postnet_init`."""
    return {"rnn": multi_lstm_specs(p["rnn"]), "linear": linear_specs(p["linear"])}


def decoder_specs(p):
    """`models/decoder.decoder_init`: the two big LSTMs and the (M*r)-wide
    frame projection shard; prenet/attention/gate/speaker adapters replicate."""
    out = {"prenet": _fill(p["prenet"]),
           "query_rnn": lstm_specs(),
           "dec_rnn": lstm_specs(),
           "attn": _fill(p["attn"]),
           "proj": linear_specs(p["proj"], shard_out=True),
           "gate": linear_specs(p["gate"])}
    for k in ("pseudo_mean", "pseudo_std", "spkr_mem_proj", "spkr_proj"):
        if k in p:
            out[k] = _fill(p[k])
    return out


def encoder_specs(p):
    """`models/encoder.encoder_init`: convs/BN replicated, BiLSTM sharded."""
    return {"convs": _fill(p["convs"]), "bn": _fill(p["bn"]),
            "lstm": multi_lstm_specs(p["lstm"])}


def cbhg_specs(p):
    """`models/cbhg.cbhg_init`: conv banks/projections/highways replicated,
    the BiGRU sharded."""
    return {"banks": _fill(p["banks"]), "projs": _fill(p["projs"]),
            "pre_highway": _fill(p["pre_highway"]),
            "highways": _fill(p["highways"]),
            "gru": {d: lstm_specs() for d in p["gru"]}}


def tts_specs(p):
    """`models/tts.tts_init`."""
    out = {"encoder": encoder_specs(p["encoder"]),
           "decoder": decoder_specs(p["decoder"])}
    if "postnet" in p:
        out["postnet"] = {"cbhg": cbhg_specs(p["postnet"]["cbhg"]),
                          "linear": linear_specs(p["postnet"]["linear"], shard_out=True)}
    return out


def vqvae_param_specs(params):
    """Spec pytree congruent with `models/vqvae.vqvae_init` params."""
    out = {"asr": asr_specs(params["asr"]),
           "codebook": _fill(params["codebook"]),  # vocab 43: replicate
           "spkr_embed": R,
           "tts": tts_specs(params["tts"])}
    if "asr_postnet" in params:
        out["asr_postnet"] = asr_postnet_specs(params["asr_postnet"])
    return out


def _validated(leaf, spec: P, mesh: Mesh) -> P:
    """Fall back to replication when a sharded dim doesn't divide the axis."""
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        if dim >= leaf.ndim or leaf.shape[dim] % mesh.shape[axis] != 0:
            return R
    if all(a is None for a in spec):
        return R
    return spec


def place_params(params, mesh: Mesh, specs=None):
    """device_put a param pytree according to a spec pytree (defaults to
    `vqvae_param_specs`), with per-leaf divisibility validation."""
    if specs is None:
        specs = vqvae_param_specs(params)

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, _validated(leaf, spec, mesh)))

    return jax.tree_util.tree_map(put, params, specs)
