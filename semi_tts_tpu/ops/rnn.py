"""Recurrent primitives as ``lax.scan`` programs (torch-compatible math).

The reference leans on cuDNN `nn.LSTM`/`nn.LSTMCell`/`nn.GRU`
(`/root/reference/src/asr.py:35`, `src/module.py:127-134,432-438,585-586`).
On TPU the idiomatic equivalent is a `lax.scan` whose per-step body is a
single fused gate matmul; the input-to-hidden projection for the *whole*
sequence is hoisted out of the scan as one large MXU matmul (the standard
time-batched trick), leaving only the `h @ W_hh` recurrence inside the loop.

Gate orders / formulas follow torch exactly (LSTM: i,f,g,o; GRU: r,z,n with
the b_hn-inside-r quirk) so unit tests can golden-check against torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _uniform(key, shape, scale):
    return jax.random.uniform(key, shape, minval=-scale, maxval=scale, dtype=jnp.float32)


def lstm_init(key, input_dim: int, hidden_dim: int):
    """torch-style U(-1/sqrt(H), 1/sqrt(H)) init for one direction/layer."""
    ks = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(hidden_dim)
    return {
        "w_ih": _uniform(ks[0], (4 * hidden_dim, input_dim), s),
        "w_hh": _uniform(ks[1], (4 * hidden_dim, hidden_dim), s),
        "b_ih": _uniform(ks[2], (4 * hidden_dim,), s),
        "b_hh": _uniform(ks[3], (4 * hidden_dim,), s),
    }


def lstm_cell(params, x, h, c, *, probe=None, stop_w=False):
    """One LSTMCell step. x: (B, D); h, c: (B, H). Returns (h', c').

    ``probe``/``stop_w`` implement the batched-weight-gradient trick for AR
    scans (see `models.decoder.decoder_apply`): with the weight matrices
    stop-gradiented and a zero ``probe`` added to the gate pre-activations,
    the probe's cotangent IS the gate gradient — letting the caller compute
    dW outside the scan as one batched einsum instead of autodiff's
    per-step (4H x D) accumulator carried through the loop.
    """
    w_ih, w_hh = params["w_ih"], params["w_hh"]
    if stop_w:
        w_ih = jax.lax.stop_gradient(w_ih)
        w_hh = jax.lax.stop_gradient(w_hh)
    gates = x @ w_ih.T + params["b_ih"] + h @ w_hh.T + params["b_hh"]
    if probe is not None:
        gates = gates + probe
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
    return h2, c2


def _lstm_scan(params, xs, reverse=False):
    """Run one LSTM direction over xs (B, T, D) -> (B, T, H).

    The x@W_ih projection for all T steps is one matmul outside the scan.
    """
    B = xs.shape[0]
    H = params["w_hh"].shape[1]
    x_proj = xs @ params["w_ih"].T + (params["b_ih"] + params["b_hh"])  # (B, T, 4H)

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ params["w_hh"].T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        return (h2, c2), h2

    init = (jnp.zeros((B, H), xs.dtype), jnp.zeros((B, H), xs.dtype))
    # note: scan unroll was measured at 0% gain on v5e (XLA pipelines loop
    # bodies); kept at default to keep compiles fast
    _, hs = jax.lax.scan(step, init, jnp.swapaxes(x_proj, 0, 1), reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def multi_lstm_init(key, input_dim: int, hidden_dim: int, num_layers: int, bidirectional: bool):
    """Parameters for a torch-style (possibly bi-directional) stacked LSTM."""
    layers = []
    d = input_dim
    for _ in range(num_layers):
        key, kf, kb = jax.random.split(key, 3)
        layer = {"fwd": lstm_init(kf, d, hidden_dim)}
        if bidirectional:
            layer["bwd"] = lstm_init(kb, d, hidden_dim)
        layers.append(layer)
        d = hidden_dim * (2 if bidirectional else 1)
    return layers


def multi_lstm(params, xs, *, dropout: float = 0.0, rng=None, train: bool = False):
    """Stacked (bi)LSTM matching `nn.LSTM(batch_first=True)`: inter-layer
    dropout on all but the last layer's output."""
    h = xs
    n = len(params)
    for li, layer in enumerate(params):
        outs = [_lstm_scan(layer["fwd"], h)]
        if "bwd" in layer:
            outs.append(_lstm_scan(layer["bwd"], h, reverse=True))
        h = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        if train and dropout > 0 and li < n - 1 and rng is not None:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, h.shape)
            h = jnp.where(keep, h / (1.0 - dropout), 0.0)
    return h


def gru_init(key, input_dim: int, hidden_dim: int):
    ks = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(hidden_dim)
    return {
        "w_ih": _uniform(ks[0], (3 * hidden_dim, input_dim), s),
        "w_hh": _uniform(ks[1], (3 * hidden_dim, hidden_dim), s),
        "b_ih": _uniform(ks[2], (3 * hidden_dim,), s),
        "b_hh": _uniform(ks[3], (3 * hidden_dim,), s),
    }


def _gru_scan(params, xs, reverse=False):
    """One GRU direction over (B, T, D) -> (B, T, H), torch gate math."""
    B = xs.shape[0]
    H = params["w_hh"].shape[1]
    x_proj = xs @ params["w_ih"].T + params["b_ih"]  # (B, T, 3H)

    def step(h, xp):
        hp = h @ params["w_hh"].T + params["b_hh"]
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        nn_ = jnp.tanh(xn + r * hn)
        h2 = (1.0 - z) * nn_ + z * h
        return h2, h2

    init = jnp.zeros((B, H), xs.dtype)
    _, hs = jax.lax.scan(step, init, jnp.swapaxes(x_proj, 0, 1), reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def bigru_init(key, input_dim: int, hidden_dim: int):
    kf, kb = jax.random.split(key)
    return {"fwd": gru_init(kf, input_dim, hidden_dim), "bwd": gru_init(kb, input_dim, hidden_dim)}


def bigru(params, xs):
    return jnp.concatenate([_gru_scan(params["fwd"], xs), _gru_scan(params["bwd"], xs, reverse=True)], axis=-1)
