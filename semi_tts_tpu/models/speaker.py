"""Reference-style speaker encoder (conv stack -> mean/std pooling).

Parity target: `/root/reference/src/module.py:12-47` (``SpeakerEncoder``).
Note: the reference *defines but never instantiates* it — the live model uses
an ``nn.Embedding(n_spkr, 128)`` lookup instead (`src/vqvae.py:64-65`). It is
provided here for capability parity (e.g. zero-shot speaker conditioning).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import batchnorm, batchnorm_init, conv1d, conv1d_init, dropout


def speaker_encoder_init(key, in_dim, out_dim, kernel_size, filters, *args):
    in_size = [in_dim] + list(filters)
    out_size = list(filters) + [out_dim // 2]
    gains = ["relu"] * (len(out_size) - 1) + ["linear"]
    keys = jax.random.split(key, len(out_size))
    convs, bns, bn_state = [], [], []
    for k, di, do, g in zip(keys, in_size, out_size, gains):
        convs.append(conv1d_init(k, di, do, kernel_size, w_init_gain=g))
        bp, bs = batchnorm_init(do)
        bns.append(bp)
        bn_state.append(bs)
    return {"convs": convs, "bn": bns}, {"bn": bn_state}


def speaker_encoder_apply(params, state, rng, x, *, drop_rate: float, train: bool):
    """x: (B, T, n_mels) -> (B, out_dim) = concat(mean, std) over time."""
    new_bn = []
    n = len(params["convs"])
    for i, (conv_p, bn_p, bn_s) in enumerate(zip(params["convs"], params["bn"],
                                                 state["bn"])):
        x = conv1d(conv_p, x)
        x, s2 = batchnorm(bn_p, bn_s, x, train=train)
        new_bn.append(s2)
        if i < n - 1:  # relu on all but the last ('linear') layer
            x = jax.nn.relu(x)
        rng, sub = jax.random.split(rng)
        x = dropout(sub, x, drop_rate, enabled=train)
    mean = jnp.mean(x, axis=1)
    std = jnp.std(x, axis=1, ddof=1)
    return jnp.concatenate([mean, std], axis=-1), {"bn": new_bn}
