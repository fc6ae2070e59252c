"""Tacotron2 text-side encoder: conv x N + BiLSTM.

Parity target: `/root/reference/src/module.py:410-462` (Conv1d(k=5, relu
gain) + BatchNorm + ReLU + Dropout stack, then a single-layer BiLSTM with
hidden = enc_embed_dim // 2 per direction).
"""

from __future__ import annotations

import jax

from ..ops.rnn import multi_lstm, multi_lstm_init
from .common import batchnorm, batchnorm_init, conv1d, conv1d_init, dropout


def encoder_init(key, in_dim, enc_embed_dim, enc_n_conv, enc_rnn_layer, enc_kernel_size):
    keys = jax.random.split(key, enc_n_conv + 1)
    convs, bn_params, bn_state = [], [], []
    d = in_dim
    for i in range(enc_n_conv):
        convs.append(conv1d_init(keys[i], d, enc_embed_dim, enc_kernel_size, w_init_gain="relu"))
        bp, bs = batchnorm_init(enc_embed_dim)
        bn_params.append(bp)
        bn_state.append(bs)
        d = enc_embed_dim
    lstm = multi_lstm_init(keys[-1], enc_embed_dim, enc_embed_dim // 2, enc_rnn_layer, bidirectional=True)
    return {"convs": convs, "bn": bn_params, "lstm": lstm}, {"bn": bn_state}


def encoder_apply(params, state, rng, x, *, dropout_rate=0.5, train=True):
    """x: (B, L, in_dim) -> (B, L, enc_embed_dim); returns (y, new_state)."""
    new_bn = []
    for conv_p, bn_p, bn_s in zip(params["convs"], params["bn"], state["bn"]):
        x = conv1d(conv_p, x)
        x, bn_s2 = batchnorm(bn_p, bn_s, x, train=train)
        new_bn.append(bn_s2)
        x = jax.nn.relu(x)
        rng, sub = jax.random.split(rng)
        x = dropout(sub, x, dropout_rate, enabled=train)
    y = multi_lstm(params["lstm"], x)
    return y, {"bn": new_bn}
