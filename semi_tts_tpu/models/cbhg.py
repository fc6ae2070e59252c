"""CBHG mel->linear postnet (conv bank + highway + BiGRU).

Parity target: `/root/reference/src/module.py:527-622` — K=8 conv bank
(conv -> activation -> BatchNorm(momentum=0.99, eps=1e-3), even kernels
truncated back to T), max-pool(k=2, s=1), two conv projections, residual,
4 highways, bidirectional GRU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.rnn import bigru, bigru_init
from .common import (
    batchnorm,
    batchnorm_init,
    conv1d,
    conv1d_init,
    highway,
    highway_init,
    linear,
    torch_linear_init,
)


def _bn_conv_init(key, in_ch, out_ch, k):
    """BatchNormConv1d (`src/module.py:527-538`): conv (no bias, torch default
    init) then BN(momentum=0.99, eps=1e-3) after the activation."""
    p = {"conv": conv1d_init(key, in_ch, out_ch, k, bias=False)}
    bp, bs = batchnorm_init(out_ch, eps=1e-3, momentum=0.99)
    p["bn"] = bp
    return p, bs


def _bn_conv_apply(p, s, x, *, k, activation, train):
    y = conv1d(p["conv"], x, padding=k // 2)
    if activation:
        y = jax.nn.relu(y)
    y, s2 = batchnorm(p["bn"], s, y, train=train)
    return y, s2


def cbhg_init(key, in_dim, K=16, hidden_sizes=(128, 128)):
    keys = jax.random.split(key, K + len(hidden_sizes) + 6)
    banks, bank_state = [], []
    for i, k in enumerate(range(1, K + 1)):
        p, s = _bn_conv_init(keys[i], in_dim, in_dim, k)
        banks.append(p)
        bank_state.append(s)
    projs, proj_state = [], []
    sizes_in = [K * in_dim] + list(hidden_sizes[:-1])
    for j, (ci, co) in enumerate(zip(sizes_in, hidden_sizes)):
        p, s = _bn_conv_init(keys[K + j], ci, co, 3)
        projs.append(p)
        proj_state.append(s)
    pre_highway = torch_linear_init(keys[K + len(hidden_sizes)], hidden_sizes[-1], in_dim, bias=False)
    highways = [highway_init(keys[K + len(hidden_sizes) + 1 + h], in_dim, in_dim) for h in range(4)]
    gru = bigru_init(keys[-1], in_dim, in_dim)
    params = {"banks": banks, "projs": projs, "pre_highway": pre_highway,
              "highways": highways, "gru": gru}
    state = {"banks": bank_state, "projs": proj_state}
    return params, state


def cbhg_apply(params, state, x, *, train=True):
    """x: (B, T, in_dim) -> (B, T, 2*in_dim); returns (y, new_state)."""
    T = x.shape[1]
    K = len(params["banks"])
    outs, new_bank = [], []
    for i, (p, s) in enumerate(zip(params["banks"], state["banks"])):
        k = i + 1
        y, s2 = _bn_conv_apply(p, s, x, k=k, activation=True, train=train)
        outs.append(y[:, :T])  # even kernels emit T+1 frames; truncate (`:598`)
        new_bank.append(s2)
    h = jnp.concatenate(outs, axis=-1)  # (B, T, K*in_dim)

    # MaxPool1d(kernel=2, stride=1, padding=1) then truncate to T (`:573,600`)
    hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)), constant_values=-jnp.inf)
    h = jnp.maximum(hp[:, :-1], hp[:, 1:])[:, :T]

    new_proj = []
    acts = [True] * (len(params["projs"]) - 1) + [False]
    for p, s, act in zip(params["projs"], state["projs"], acts):
        h, s2 = _bn_conv_apply(p, s, h, k=3, activation=act, train=train)
        new_proj.append(s2)

    h = linear(params["pre_highway"], h)
    h = h + x
    for hw in params["highways"]:
        h = highway(hw, h)
    y = bigru(params["gru"], h)
    return y, {"banks": new_bank, "projs": new_proj}
