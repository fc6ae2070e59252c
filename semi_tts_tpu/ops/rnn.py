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

from functools import partial

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
    from ..models.common import follow_act_dtype

    w_ih, w_hh = params["w_ih"], params["w_hh"]
    if stop_w:
        w_ih = jax.lax.stop_gradient(w_ih)
        w_hh = jax.lax.stop_gradient(w_hh)
    w_ih, w_hh = follow_act_dtype(w_ih, x), follow_act_dtype(w_hh, x)
    gates = (x @ w_ih.T + follow_act_dtype(params["b_ih"], x)
             + h.astype(x.dtype) @ w_hh.T + follow_act_dtype(params["b_hh"], x))
    if probe is not None:
        gates = gates + probe
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
    return h2, c2


def _shift_prev(ys, reverse):
    """Per-step 'previous output' tensor for a (T, B, H) scan output: the
    carry each step consumed. Forward scans see ys[t-1] (zero at t=0);
    reverse scans see ys[t+1] (zero at t=T-1)."""
    z = jnp.zeros_like(ys[:1])
    if reverse:
        return jnp.concatenate([ys[1:], z], axis=0)
    return jnp.concatenate([z, ys[:-1]], axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lstm_rec(reverse: bool, w_hh, x_proj):
    """LSTM recurrence over pre-projected inputs: x_proj (T, B, 4H) -> hs
    (T, B, H). Biases and the input projection live OUTSIDE (hoisted by the
    caller); only ``h @ w_hh.T`` runs per step.

    Custom VJP (the sequence-scan counterpart of the decoder's gate-probe
    trick, `models/decoder.py:91-127`): autodiff's scan transpose carries the
    (4H, H) ``w_hh`` gradient accumulator through HBM every backward step —
    the pathology measured at ~10.5 ms of a 12.5 ms decoder backward on v5e.
    Here the backward scan carries only (B, H) cotangents, emits per-step
    gate gradients, and rebuilds ``dW_hh = Σₜ dgatesₜ ⊗ h_{t-1}`` as ONE
    batched einsum outside the loop. The gate activations are *recomputed* in
    the backward from the saved hs via a single big matmul (cheaper than
    storing a (T, B, 4H) residual)."""
    hs, _ = _lstm_rec_fwd(reverse, w_hh, x_proj)
    return hs


def _lstm_rec_fwd(reverse, w_hh, x_proj):
    T, B, H4 = x_proj.shape
    H = H4 // 4

    def step(carry, xp):
        h, c = carry
        gates = xp + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        return (h2, c2), (h2, c2)

    init = (jnp.zeros((B, H), x_proj.dtype), jnp.zeros((B, H), x_proj.dtype))
    # note: scan unroll was measured at 0% gain on v5e (XLA pipelines loop
    # bodies); kept at default to keep compiles fast
    _, (hs, cs) = jax.lax.scan(step, init, x_proj, reverse=reverse)
    return hs, (w_hh, x_proj, hs, cs)


def _lstm_rec_bwd(reverse, res, g_hs):
    w_hh, x_proj, hs, cs = res
    h_prev = _shift_prev(hs, reverse)
    c_prev = _shift_prev(cs, reverse)
    # recompute all gate activations with ONE big (T*B, H) x (H, 4H) matmul
    gates = x_proj + h_prev @ w_hh.T
    ia, fa, ga, oa = jnp.split(gates, 4, axis=-1)
    ia, fa, ga, oa = (jax.nn.sigmoid(ia), jax.nn.sigmoid(fa),
                      jnp.tanh(ga), jax.nn.sigmoid(oa))
    tc = jnp.tanh(cs)

    def step(carry, xs_t):
        dh_rec, dc_rec = carry
        gy, i_t, f_t, g_t, o_t, tc_t, cp_t = xs_t
        dh = gy + dh_rec
        dc = dc_rec + dh * o_t * (1.0 - tc_t * tc_t)
        dgates = jnp.concatenate(
            [dc * g_t * i_t * (1.0 - i_t),
             dc * cp_t * f_t * (1.0 - f_t),
             dc * i_t * (1.0 - g_t * g_t),
             dh * tc_t * o_t * (1.0 - o_t)], axis=-1)
        return (dgates @ w_hh, dc * f_t), dgates

    B, H = hs.shape[1], hs.shape[2]
    zero = jnp.zeros((B, H), hs.dtype)
    # the backward recurrence runs opposite to the forward's time direction
    _, dgates = jax.lax.scan(step, (zero, zero),
                             (g_hs, ia, fa, ga, oa, tc, c_prev),
                             reverse=not reverse)
    dw_hh = jnp.einsum("tbg,tbh->gh", dgates, h_prev,
                       precision=jax.lax.Precision.HIGH)
    return dw_hh, dgates


_lstm_rec.defvjp(_lstm_rec_fwd, _lstm_rec_bwd)


def _lstm_scan(params, xs, reverse=False):
    """Run one LSTM direction over xs (B, T, D) -> (B, T, H).

    The x@W_ih projection for all T steps is one matmul outside the scan
    (so its dW is one matmul in the backward too); the recurrence runs in
    `_lstm_rec`, whose custom VJP keeps the w_hh gradient out of the scan
    carry. Weights follow the activation dtype (`common.follow_act_dtype`)
    so bf16 inputs keep the whole recurrence in bf16."""
    from ..models.common import follow_act_dtype

    x_proj = (xs @ follow_act_dtype(params["w_ih"], xs).T
              + follow_act_dtype(params["b_ih"] + params["b_hh"], xs))  # (B, T, 4H)
    hs = _lstm_rec(reverse, follow_act_dtype(params["w_hh"], xs),
                   jnp.swapaxes(x_proj, 0, 1))
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


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gru_rec(reverse: bool, w_hh, b_hh, x_proj):
    """GRU recurrence over pre-projected inputs: x_proj (T, B, 3H) -> hs
    (T, B, H). ``b_hh`` stays inside because torch applies the reset gate to
    ``h @ w_hh.T + b_hh`` *including* b_hn (the b_hn-inside-r quirk).

    Custom VJP: same batched-dW rationale as `_lstm_rec` — the backward scan
    carries only a (B, H) cotangent and emits per-step dh2; every gate
    gradient is linear in dh2 with coefficients precomputable outside the
    loop, so ``dW_hh``/``db_hh`` become one einsum/sum over the stacked
    hidden-side gate gradients."""
    hs, _ = _gru_rec_fwd(reverse, w_hh, b_hh, x_proj)
    return hs


def _gru_rec_fwd(reverse, w_hh, b_hh, x_proj):
    T, B, H3 = x_proj.shape
    H = H3 // 3

    def step(h, xp):
        hp = h @ w_hh.T + b_hh
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        nn_ = jnp.tanh(xn + r * hn)
        h2 = (1.0 - z) * nn_ + z * h
        return h2, h2

    init = jnp.zeros((B, H), x_proj.dtype)
    _, hs = jax.lax.scan(step, init, x_proj, reverse=reverse)
    return hs, (w_hh, b_hh, x_proj, hs)


def _gru_rec_bwd(reverse, res, g_hs):
    w_hh, b_hh, x_proj, hs = res
    h_prev = _shift_prev(hs, reverse)
    # recompute gate activations: ONE big matmul + elementwise
    hp = h_prev @ w_hh.T + b_hh
    xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
    hr, hz, hn = jnp.split(hp, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    # every gate gradient is (coefficient ⊙ dh2): precompute coefficients
    dn_c = (1.0 - z) * (1.0 - n * n)          # d(n pre-act)/d(dh2)
    cr = dn_c * hn * r * (1.0 - r)            # reset-gate pre-act coeff
    cz = (h_prev - n) * z * (1.0 - z)         # update-gate pre-act coeff
    coef_h = jnp.concatenate([cr, cz, dn_c * r], axis=-1)  # hidden-side (r quirk)

    def step(dh_rec, xs_t):
        gy, z_t, ch_t = xs_t
        dh2 = gy + dh_rec
        dhp = ch_t * jnp.concatenate([dh2, dh2, dh2], axis=-1)
        return dh2 * z_t + dhp @ w_hh, dh2

    B, H = hs.shape[1], hs.shape[2]
    _, dh2 = jax.lax.scan(step, jnp.zeros((B, H), hs.dtype),
                          (g_hs, z, coef_h), reverse=not reverse)
    dh2_3 = jnp.concatenate([dh2, dh2, dh2], axis=-1)
    dhp_all = coef_h * dh2_3
    dx_proj = jnp.concatenate([cr, cz, dn_c], axis=-1) * dh2_3
    dw_hh = jnp.einsum("tbg,tbh->gh", dhp_all, h_prev,
                       precision=jax.lax.Precision.HIGH)
    db_hh = jnp.sum(dhp_all, axis=(0, 1))
    return dw_hh, db_hh, dx_proj


_gru_rec.defvjp(_gru_rec_fwd, _gru_rec_bwd)


def _gru_scan(params, xs, reverse=False):
    """One GRU direction over (B, T, D) -> (B, T, H), torch gate math.
    Weights follow the activation dtype (see `_lstm_scan`)."""
    from ..models.common import follow_act_dtype

    x_proj = (xs @ follow_act_dtype(params["w_ih"], xs).T
              + follow_act_dtype(params["b_ih"], xs))  # (B, T, 3H)
    hs = _gru_rec(reverse, follow_act_dtype(params["w_hh"], xs),
                  follow_act_dtype(params["b_hh"], xs),
                  jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


def bigru_init(key, input_dim: int, hidden_dim: int):
    kf, kb = jax.random.split(key)
    return {"fwd": gru_init(kf, input_dim, hidden_dim), "bwd": gru_init(kb, input_dim, hidden_dim)}


def bigru(params, xs):
    return jnp.concatenate([_gru_scan(params["fwd"], xs), _gru_scan(params["bwd"], xs, reverse=True)], axis=-1)
