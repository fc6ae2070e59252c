"""Shared functional building blocks (Linear/Conv1d/BatchNorm/Prenet/Highway/
MLP) with torch-compatible initialization and math.

Parity targets: `/root/reference/src/module.py:320-341` (Prenet, dropout
always on), `:480-522` (xavier-gain Conv1d/Linear wrappers), `:527-555`
(BatchNormConv1d, Highway), `:627-669` (ConvLayer, MLP).

Convention: every module is ``init(key, ...) -> params`` plus
``apply(params, x, ...)``. BatchNorms carry running statistics in a separate
*state* pytree threaded functionally (train mode normalizes with batch stats
and returns updated running stats; eval mode uses the stored ones) — the
reference's implicit ``model.train()/eval()`` switch made explicit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

GAINS = {"linear": 1.0, "relu": math.sqrt(2.0), "tanh": 5.0 / 3.0, "sigmoid": 1.0}


def follow_act_dtype(w, x):
    """Weight cast that makes layers activation-dtype-polymorphic.

    Params are stored fp32; when the caller feeds reduced-precision float
    activations (the decoder's ``memory.dtype`` convention — bf16 decode
    scan), the weight is cast in-graph to the activation dtype so compute
    and outputs STAY in that dtype instead of being silently promoted back
    to fp32 by jnp type promotion (dots) or rejected by lax.conv (which
    requires equal dtypes). XLA hoists the cast out of scans, so bf16
    callers stream bf16 weights. fp32-in/fp32-params paths are unchanged.
    """
    if (x.dtype != w.dtype and jnp.issubdtype(x.dtype, jnp.floating)
            and jnp.issubdtype(w.dtype, jnp.floating)):
        return w.astype(x.dtype)
    return w


# ---------------- Linear ----------------

def linear_init(key, in_dim, out_dim, *, bias=True, w_init_gain="linear"):
    """Xavier-uniform with torch gain semantics (`src/module.py:500-506`)."""
    kw, kb = jax.random.split(key)
    a = GAINS[w_init_gain] * math.sqrt(6.0 / (in_dim + out_dim))
    p = {"w": jax.random.uniform(kw, (out_dim, in_dim), minval=-a, maxval=a, dtype=jnp.float32)}
    if bias:
        # torch nn.Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        b = 1.0 / math.sqrt(in_dim)
        p["b"] = jax.random.uniform(kb, (out_dim,), minval=-b, maxval=b, dtype=jnp.float32)
    return p


def torch_linear_init(key, in_dim, out_dim, *, bias=True):
    """torch nn.Linear default (kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)))."""
    kw, kb = jax.random.split(key)
    b = 1.0 / math.sqrt(in_dim)
    p = {"w": jax.random.uniform(kw, (out_dim, in_dim), minval=-b, maxval=b, dtype=jnp.float32)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), minval=-b, maxval=b, dtype=jnp.float32)
    return p


def linear(params, x):
    y = x @ follow_act_dtype(params["w"], x).T
    if "b" in params:
        y = y + follow_act_dtype(params["b"], x)
    return y


# ---------------- Conv1d (NTC layout: (B, T, C)) ----------------

def conv1d_init(key, in_ch, out_ch, kernel_size, *, bias=True, w_init_gain=None):
    """Weight (out, in, k). ``w_init_gain=None`` -> torch conv default init."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel_size
    if w_init_gain is None:
        a = 1.0 / math.sqrt(fan_in)
    else:
        fan_out = out_ch * kernel_size
        a = GAINS[w_init_gain] * math.sqrt(6.0 / (fan_in + fan_out))
    p = {"w": jax.random.uniform(kw, (out_ch, in_ch, kernel_size), minval=-a, maxval=a, dtype=jnp.float32)}
    if bias:
        b = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(kb, (out_ch,), minval=-b, maxval=b, dtype=jnp.float32)
    return p


def conv1d(params, x, *, stride=1, padding=None, dilation=1):
    """x: (B, T, Cin) -> (B, T', Cout); torch-style symmetric int padding."""
    k = params["w"].shape[2]
    if padding is None:
        padding = (dilation * (k - 1)) // 2
    y = jax.lax.conv_general_dilated(
        x,
        jnp.transpose(follow_act_dtype(params["w"], x), (2, 1, 0)),  # (k, in, out)
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
    )
    if "b" in params:
        y = y + follow_act_dtype(params["b"], x)
    return y


# ---------------- BatchNorm (over batch+time for (B, T, C)) ----------------

def batchnorm_init(num_features, eps=1e-5, momentum=0.1):
    params = {"scale": jnp.ones((num_features,)), "bias": jnp.zeros((num_features,))}
    state = {"mean": jnp.zeros((num_features,)), "var": jnp.ones((num_features,)),
             "eps": jnp.float32(eps), "momentum": jnp.float32(momentum)}
    return params, state


def batchnorm(params, state, x, *, train: bool):
    """torch BatchNorm1d semantics on (B, T, C) (stats over B and T; biased
    variance for normalization, unbiased for the running update).

    Mixed precision: statistics and the running-state update always run in
    fp32 (bf16 variance is catastrophically imprecise); the normalize itself
    follows the activation dtype, so bf16 callers get bf16 out."""
    eps, momentum = state["eps"], state["momentum"]
    xs = x.astype(jnp.float32)
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xs, axis=axes)
        var = jnp.var(xs, axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = dict(state)
        new_state["mean"] = (1 - momentum) * state["mean"] + momentum * mean
        new_state["var"] = (1 - momentum) * state["var"] + momentum * unbiased
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = ((x - mean.astype(x.dtype)) * jax.lax.rsqrt(var + eps).astype(x.dtype)
         * follow_act_dtype(params["scale"], x) + follow_act_dtype(params["bias"], x))
    return y, new_state


# ---------------- Dropout ----------------

def dropout(rng, x, rate: float, *, enabled: bool = True):
    if not enabled or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ---------------- Prenet (dropout ALWAYS on — `src/module.py:337-339`) ----------------

def prenet_init(key, in_dim, hidden_dims=(256, 256)):
    dims = [in_dim] + list(hidden_dims)
    keys = jax.random.split(key, len(hidden_dims))
    return [linear_init(k, d_in, d_out, bias=False)
            for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])]


def prenet(params, rng, x, rate: float = 0.5):
    """relu(linear) + dropout per layer; dropout active in eval too."""
    for i, layer in enumerate(params):
        rng, sub = jax.random.split(rng)
        x = dropout(sub, jax.nn.relu(linear(layer, x)), rate, enabled=True)
    return x


# ---------------- Highway (`src/module.py:541-555`) ----------------

def highway_init(key, in_dim, out_dim):
    kh, kt = jax.random.split(key)
    h = torch_linear_init(kh, in_dim, out_dim)
    t = torch_linear_init(kt, in_dim, out_dim)
    h["b"] = jnp.zeros_like(h["b"])
    t["b"] = jnp.full_like(t["b"], -1.0)
    return {"H": h, "T": t}


def highway(params, x):
    h = jax.nn.relu(linear(params["H"], x))
    t = jax.nn.sigmoid(linear(params["T"], x))
    return h * t + x * (1.0 - t)


# ---------------- MLP (`src/module.py:650-669`) ----------------

def mlp_init(key, in_dim, dims):
    keys = jax.random.split(key, len(dims))
    sizes = [in_dim] + list(dims)
    return [torch_linear_init(k, a, b) for k, a, b in zip(keys, sizes[:-1], sizes[1:])]


def mlp(params, rng, x, *, relu=True, drop_rate=0.0, train=True):
    for layer in params:
        x = linear(layer, x)
        if relu:
            x = jax.nn.relu(x)
        if drop_rate > 0:
            rng, sub = jax.random.split(rng)
            x = dropout(sub, x, drop_rate, enabled=train)
    return x


# ---------------- masks ----------------

def seq_mask(lengths, max_len):
    """True for PADDED positions, shape (B, max_len) — matches the decoder's
    ``_make_mask`` (`src/module.py:308-317`; note `src/util.py:233-238`'s
    ``get_seq_mask`` uses a strict ``>`` instead — a reference quirk on a
    dead path)."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]


def xavier_normal_embedding_init(key, n, d):
    """nn.Embedding default: N(0, 1)."""
    return jax.random.normal(key, (n, d), dtype=jnp.float32)


# ---------------- conv-stack Postnet (`src/module.py:53-82`) ----------------
# (defined-but-unused upstream — the live model uses CBHG; provided for parity)

def postnet_init(key, n_mels, embed_dim, kernel_size, n_conv):
    in_size = [n_mels] + [embed_dim] * (n_conv - 1)
    out_size = [embed_dim] * (n_conv - 1) + [n_mels]
    gains = ["tanh"] * (n_conv - 1) + ["linear"]
    keys = jax.random.split(key, n_conv)
    convs, bns, bn_state = [], [], []
    for k, di, do, g in zip(keys, in_size, out_size, gains):
        convs.append(conv1d_init(k, di, do, kernel_size, w_init_gain=g))
        bp, bs = batchnorm_init(do)
        bns.append(bp)
        bn_state.append(bs)
    return {"convs": convs, "bn": bns}, {"bn": bn_state}


def postnet_apply(params, state, rng, x, *, drop_rate, train):
    new_bn = []
    n = len(params["convs"])
    for i, (conv_p, bn_p, bn_s) in enumerate(zip(params["convs"], params["bn"],
                                                 state["bn"])):
        x = conv1d(conv_p, x)
        x, s2 = batchnorm(bn_p, bn_s, x, train=train)
        new_bn.append(s2)
        if i < n - 1:  # tanh on all but the last layer
            x = jnp.tanh(x)
        rng, sub = jax.random.split(rng)
        x = dropout(sub, x, drop_rate, enabled=train)
    return x, {"bn": new_bn}


def sinusoid_encoding_table(n_position, d_hid, padding_idx=None):
    """Sinusoid position encoding (`src/util.py:193-211`)."""
    pos = np.arange(n_position)[:, None].astype(np.float64)
    dim = np.arange(d_hid)[None, :].astype(np.float64)
    angle = pos / np.power(10000.0, 2.0 * (dim // 2) / d_hid)
    table = np.where(dim % 2 == 0, np.sin(angle), np.cos(angle))
    if padding_idx is not None:
        table[padding_idx] = 0.0
    return jnp.asarray(table, jnp.float32)


# ---------------- espnet-style init helpers (`src/util.py:50-78`) ----------------
# (defined-but-never-called upstream; provided for parity — apply to a param
# pytree with `jax.tree_util.tree_map_with_path` or per-module)

def espnet_init_leaf(key, shape):
    """N(0, 1/sqrt(fan_in)) for linear/conv weights, zeros for biases,
    N(0,1) for embeddings handled by the caller (`src/util.py:50-73`)."""
    import numpy as _np

    if len(shape) == 1:
        return jnp.zeros(shape)
    n = shape[1]
    for k in shape[2:]:
        n *= k
    return jax.random.normal(key, shape) / _np.sqrt(n)


def init_gate(bias):
    """Set the LSTM forget-gate bias chunk to 1 (`src/util.py:74-78`)."""
    n = bias.shape[0]
    return bias.at[n // 4 : n // 2].set(1.0)
