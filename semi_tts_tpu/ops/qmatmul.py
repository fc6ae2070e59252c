"""Int8 weight-streaming matmul (Pallas) for the serving decode path.

Why: AR decode is weight-streaming-bound — every decode step re-reads
~35 MB of bf16-converted decoder weights from HBM (docs/PERFORMANCE.md;
reference hot loop `/root/reference/src/module.py:184-288`). XLA cannot
dequantize int8 weights *inside* the dot's operand load: casting params
before the loop materializes a full-precision copy (measured in round 2),
so the only way to stream half the bytes is a kernel that loads int8 tiles
into VMEM and widens them there. That is exactly this Pallas kernel:

    out(B, N) = x(B, D) @ (Wq(N, D).astype(bf16) * scale(N, 1)).T

with symmetric per-output-row int8 quantization. The dequantize runs on the
VPU over VMEM-resident tiles — HBM sees only int8 — and the dot hits the
MXU in bf16. Weights-only quantization: activations stay bf16/fp32, so the
only error source is the per-row rounding of W (gated by
`tests/test_qmatmul.py` and the serving-decode deviation check in
`tools/proto_int8.py`).

MEASURED RESULT (v5e single chip, do not enable blindly): 0.91x vs the
bf16 path at B=64/256/512 — the pallas_call boundaries break the XLA
while-loop's weight-prefetch pipelining and the VPU widening serializes
ahead of the MXU (docs/PERFORMANCE.md "tried and measured WORSE"). Kept
as an off-by-default serving option for topologies where the byte math
changes (e.g. TP-sharded weights).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def quantize_rows(w, *, pad_n_to: int = 128):
    """Symmetric per-row int8 quantization of a (N, D) weight matrix.

    Returns (values int8 (N', D), scales f32 (N', 1)) with N' = N padded up
    to ``pad_n_to`` (Mosaic wants lane/sublane-aligned tiles; callers slice
    the padded rows back off the product).
    """
    w = jnp.asarray(w, jnp.float32)
    n, d = w.shape
    n_pad = (-n) % pad_n_to
    if n_pad:
        w = jnp.pad(w, ((0, n_pad), (0, 0)))
    s = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def _pick_tile(n: int) -> int:
    for t in (512, 256, 128):
        if n % t == 0:
            return t
    raise ValueError(f"N={n} not a multiple of 128 (quantize_rows pads for you)")


def _qmm_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)  # int8 -> bf16 ON-CHIP; HBM saw int8
    acc = jax.lax.dot_general(
        x_ref[:], w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = acc * s_ref[:].T  # (B, TN) * (1, TN)


@partial(jax.jit, static_argnames=("interpret",))
def qmatmul(x, wq, scales, *, interpret: bool | None = None):
    """x (B, D) -> (B, N) = x @ dequant(wq).T, streaming int8 weights.

    ``interpret`` defaults to True off-TPU (Pallas/Mosaic is TPU-only; the
    interpreter keeps CPU tests exact).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, D = x.shape
    N = wq.shape[0]
    TN = _pick_tile(N)
    x = x.astype(jnp.bfloat16)
    grid = (N // TN,)
    return pl.pallas_call(
        _qmm_kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, wq, scales)


def lstm_cell_q(qp, bias, x, h, c):
    """One LSTMCell step with int8-streamed weight matrices.

    ``qp``: {"w_ih": (q, s), "w_hh": (q, s)}; ``bias`` = b_ih + b_hh (fp32).
    Matches `ops.rnn.lstm_cell` exactly up to int8 weight rounding.
    """
    n_out = bias.shape[0]  # quantize_rows pads rows to 128 — slice them off
    gates = (qmatmul(x, *qp["w_ih"]) + qmatmul(h, *qp["w_hh"]))[:, :n_out] + bias
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
    return h2, c2


def quantize_decoder(dec_params):
    """Quantize the serving-decode hot weights (the two LSTM cells and the
    frame projection — ~96% of the per-step weight bytes). Returns the
    ``qweights`` dict `models.decoder.decoder_apply` accepts.
    """
    q = {}
    for cell in ("query_rnn", "dec_rnn"):
        p = dec_params[cell]
        q[cell] = {"w_ih": quantize_rows(p["w_ih"]),
                   "w_hh": quantize_rows(p["w_hh"]),
                   "bias": jnp.asarray(p["b_ih"] + p["b_hh"], jnp.float32)}
    w = dec_params["proj"]["w"]  # linear stores (out, in) torch layout
    q["proj"] = {"w": quantize_rows(w)}
    return q
