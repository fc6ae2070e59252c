"""CTC phoneme-ASR encoder: conv stack (one stride-2) + BiLSTM + projection.

Parity target: `/root/reference/src/asr.py` — six ConvLayers
(kernel [3,4,3,3,3,1], stride [1,2,1,1,1,1], residual [0,0,1,1,1,1],
tanh activation, BatchNorm, dropout 0.5; `src/module.py:627-648`), a
2-layer BiLSTM(256) and a linear projection to the 64-d latent space, plus
the optional ``ASRPostnet`` (2-layer BiLSTM + linear + log_softmax,
`src/asr.py:67-80`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.rnn import multi_lstm, multi_lstm_init
from .common import batchnorm, batchnorm_init, conv1d, conv1d_init, dropout, torch_linear_init, linear


@dataclasses.dataclass(frozen=True)
class ASRConfig:
    """Mirror of the YAML `model.encoder` block."""

    in_dim: int = 80
    out_dim: int = 64  # latent_dim
    dim: int = 512
    kernel: tuple = (3, 4, 3, 3, 3, 1)
    stride: tuple = (1, 2, 1, 1, 1, 1)
    residual: tuple = (0, 0, 1, 1, 1, 1)
    dropout: float = 0.5
    activation: str = "tanh"
    batch_norm: bool = True
    rnn_bid: bool = True
    rnn_layers: int = 2
    rnn_dim: int = 256
    layer_norm: bool = False

    @property
    def time_reduce_factor(self) -> int:
        return 2 ** sum(1 for s in self.stride if s != 1)


def asr_init(key, cfg: ASRConfig):
    n = len(cfg.kernel)
    keys = jax.random.split(key, n + 2)
    dims = [cfg.in_dim] + [cfg.dim] * n
    convs, bns, bn_state = [], [], []
    for i in range(n):
        convs.append(conv1d_init(keys[i], dims[i], dims[i + 1], cfg.kernel[i]))
        if cfg.batch_norm:
            bp, bs = batchnorm_init(dims[i + 1])
            bns.append(bp)
            bn_state.append(bs)
    rnn = multi_lstm_init(keys[n], dims[-1], cfg.rnn_dim, cfg.rnn_layers, cfg.rnn_bid)
    rnn_out = cfg.rnn_dim * (2 if cfg.rnn_bid else 1)
    params = {"convs": convs, "rnn": rnn,
              "postnet": torch_linear_init(keys[n + 1], rnn_out, cfg.out_dim)}
    if cfg.batch_norm:
        params["bn"] = bns
    if cfg.layer_norm:
        params["ln"] = {"scale": jnp.ones((rnn_out,)), "bias": jnp.zeros((rnn_out,))}
    return params, {"bn": bn_state}


def asr_apply(params, state, rng, x, *, cfg: ASRConfig, train: bool):
    """x: (B, T, n_mels) -> latents (B, T // time_reduce_factor, out_dim)."""
    act = getattr(jnp, cfg.activation.lower())
    new_bn = []
    for i, conv_p in enumerate(params["convs"]):
        k, s = cfg.kernel[i], cfg.stride[i]
        pad = 1 if k != 1 else 0  # (`src/module.py:633`)
        y = conv1d(conv_p, x, stride=s, padding=pad)
        if cfg.batch_norm:
            y, bs2 = batchnorm(params["bn"][i], state["bn"][i], y, train=train)
            new_bn.append(bs2)
        y = act(y)
        if cfg.residual[i]:
            y = y + x
        rng, sub = jax.random.split(rng)
        x = dropout(sub, y, cfg.dropout, enabled=train)

    rng, sub = jax.random.split(rng)
    x = multi_lstm(params["rnn"], x, dropout=cfg.dropout, rng=sub, train=train)
    if cfg.layer_norm:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5) * params["ln"]["scale"] + params["ln"]["bias"]
    rng, sub = jax.random.split(rng)
    x = dropout(sub, x, cfg.dropout, enabled=train)
    return linear(params["postnet"], x), {"bn": new_bn}


def asr_postnet_init(key, latent_dim, vocab_size):
    k1, k2 = jax.random.split(key)
    return {"rnn": multi_lstm_init(k1, latent_dim, latent_dim, 2, True),
            "linear": torch_linear_init(k2, latent_dim * 2, vocab_size)}


def asr_postnet_apply(params, rng, x, *, train: bool):
    """(B, T, D) -> log-softmax posteriors (B, T, V) (`src/asr.py:76-80`)."""
    k1, k2 = jax.random.split(rng)
    y = multi_lstm(params["rnn"], x, dropout=0.5, rng=k1, train=train)
    y = dropout(k2, y, 0.5, enabled=train)
    return jax.nn.log_softmax(linear(params["linear"], y), axis=-1)
