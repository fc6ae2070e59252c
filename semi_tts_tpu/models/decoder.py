"""Tacotron2 autoregressive decoder as ONE ``lax.scan``.

Parity target: `/root/reference/src/module.py:85-317` — the reference runs a
Python ``for t in range(decode_steps)`` calling prenet -> query LSTMCell ->
location attention -> dec LSTMCell -> projection per step, with scheduled
sampling drawn once per step (shared across the batch) and a partial-teacher
path for concat batches whose tail rows (unpaired text) have no teacher
(`src/module.py:184-206`). Speaker conditioning modes: 'adaIN' (scale/shift
of the query hidden, `:111-115,267-269`), 'concat', 'add' (`:116-120,246-250`).

TPU-first redesign: the per-step body is fused into a scan whose carry is
(rng, q_h, q_c, d_h, d_c, attn_w, attn_w_sum, attn_ctx, dec_in); the teacher
is prenet-projected for all steps in one batched matmul before the scan
(`:178-179`), the attention memory projection is hoisted (`:306`), and
scheduled-sampling decisions are PRNG bernoullis folded into the scan — all
branches are computed and selected with ``jnp.where`` (cheap: the prenet is
two small matmuls). ``decode_steps`` is static (length-bucketed by callers).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.rnn import lstm_cell, lstm_init
from .attention import attention_init, attention_step, process_memory
from .common import dropout, linear, linear_init, prenet, prenet_init, torch_linear_init


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Mirror of the YAML `model.decoder.decoder` block."""

    n_mels: int = 80
    n_frames_per_step: int = 3
    enc_embed_dim: int = 512
    spkr_embed_dim: int = 128
    prenet_dim: int = 256
    prenet_dropout: float = 0.5
    query_rnn_dim: int = 1024
    dec_rnn_dim: int = 1024
    query_dropout: float = 0.1
    dec_dropout: float = 0.1
    attn_dim: int = 256
    n_location_filters: int = 32
    location_kernel_size: int = 31
    loc_aware: bool = True
    use_summed_weights: bool = True
    drop_dec_in: float = 0.0
    spkr_embed_mode: str = "adain"
    # attention bypass for audio-LM pretraining (`src/module.py:241-243`,
    # used by AudioLM in `src/lm.py:40-55`)
    pretrain: bool = False
    # The reference never masks attention over padded memory (mask=None,
    # `src/module.py:163`) — but its pad is the dynamic batch max, while our
    # static trim-capacity pad can be much larger; this knob (off by default
    # for parity) masks energies at positions >= memory_lengths.
    mask_attention: bool = False


def decoder_init(key, cfg: DecoderConfig):
    ks = jax.random.split(key, 10)
    r, M = cfg.n_frames_per_step, cfg.n_mels
    p = {
        "prenet": prenet_init(ks[0], M * r, (cfg.prenet_dim, cfg.prenet_dim)),
        "query_rnn": lstm_init(ks[1], cfg.prenet_dim + cfg.enc_embed_dim, cfg.query_rnn_dim),
        "attn": attention_init(ks[2], cfg.query_rnn_dim, cfg.enc_embed_dim, cfg.attn_dim,
                               cfg.n_location_filters, cfg.location_kernel_size,
                               loc_aware=cfg.loc_aware, use_summed_weights=cfg.use_summed_weights),
        "dec_rnn": lstm_init(ks[3], cfg.query_rnn_dim + cfg.enc_embed_dim, cfg.dec_rnn_dim),
        "proj": linear_init(ks[4], cfg.dec_rnn_dim + cfg.enc_embed_dim, M * r),
        "gate": linear_init(ks[5], cfg.dec_rnn_dim + cfg.enc_embed_dim, 1, w_init_gain="sigmoid"),
    }
    mode = cfg.spkr_embed_mode.lower()
    if mode == "adain":
        p["pseudo_mean"] = torch_linear_init(ks[6], cfg.spkr_embed_dim, cfg.query_rnn_dim)
        p["pseudo_std"] = torch_linear_init(ks[7], cfg.spkr_embed_dim, cfg.query_rnn_dim)
    elif mode == "concat":
        p["spkr_mem_proj"] = torch_linear_init(ks[6], cfg.spkr_embed_dim + cfg.enc_embed_dim, cfg.enc_embed_dim)
    elif mode == "add":
        p["spkr_proj"] = torch_linear_init(ks[6], cfg.spkr_embed_dim, cfg.enc_embed_dim)
        p["spkr_mem_proj"] = torch_linear_init(ks[7], cfg.enc_embed_dim, cfg.enc_embed_dim)
    else:
        raise NotImplementedError(mode)
    return p


def wgrad_probes(cfg: DecoderConfig, decode_steps: int, B: int, dtype=jnp.float32):
    """Zero per-step gate probes enabling the batched-weight-gradient path
    (pass to `decoder_apply(wgrad_probes=...)` and differentiate w.r.t. them;
    see that function's docstring)."""
    return {"q": jnp.zeros((decode_steps, B, 4 * cfg.query_rnn_dim), dtype),
            "d": jnp.zeros((decode_steps, B, 4 * cfg.dec_rnn_dim), dtype)}


def merge_wgrads(dec_grads, aux, probe_grads):
    """Add the batched LSTM dW into a decoder grads subtree (whose w_ih/w_hh
    leaves are exactly zero under the probe path) — shared by every trainer
    that uses the probe path."""
    for name, sub in assemble_wgrads(aux, probe_grads).items():
        for k, v in sub.items():
            dec_grads[name][k] = dec_grads[name][k] + v
    return dec_grads


def assemble_wgrads(aux, probe_grads):
    """LSTM weight gradients from probe cotangents + saved cell inputs.

    ``aux``: the extra output of `decoder_apply(wgrad_probes=...)` — stacked
    per-step cell inputs concat(x_t, h_{t-1}). ``probe_grads``: gradients of
    the loss w.r.t. the probes (= gate gradients). Returns a partial params
    pytree {query_rnn,dec_rnn:{w_ih,w_hh}} to ADD into the (zero) autodiff
    gradients of those leaves. One big einsum per cell replaces autodiff's
    per-step (4H, D+H) accumulator carried through the scan transpose —
    measured ~10.5 ms of a 12.5 ms decoder backward at T=177, B=8.
    """
    out = {}
    for name, key in (("query_rnn", "q"), ("dec_rnn", "d")):
        H = probe_grads[key].shape[-1] // 4
        in_dim = aux[key].shape[-1] - H
        d_cat = jnp.einsum("tbg,tbx->gx", probe_grads[key], aux[key],
                           precision=jax.lax.Precision.HIGH)
        out[name] = {"w_ih": d_cat[:, :in_dim], "w_hh": d_cat[:, in_dim:]}
    return out


@partial(jax.jit, static_argnames=("cfg", "decode_steps", "train", "remat"))
def decoder_apply(
    params,
    rng,
    memory,
    spkr_embed,
    *,
    cfg: DecoderConfig,
    decode_steps: int,
    train: bool,
    teacher=None,
    teacher_rows=None,
    tf_rate=1.0,
    memory_lengths=None,
    wgrad_probes=None,
    remat: bool = False,
):
    """Run the AR decoder for ``decode_steps`` macro-steps.

    Args:
      memory: (B, L, enc_embed_dim) encoder outputs.
      spkr_embed: (B, spkr_embed_dim).
      teacher: (B, T_teacher, n_mels) ground-truth mel, T_teacher a multiple of
        r (callers pad; rows without a teacher may be zeros). ``None`` in
        inference (tf_rate==0 path of the reference).
      teacher_rows: (B,) bool — which rows actually have a teacher. Rows
        without one always consume their own previous output
        (`src/module.py:196-198,204-206`). ``None`` means all rows.
      tf_rate: traced teacher-forcing probability (per-step coin shared across
        the batch, as in `src/module.py:190`).

    Returns (mel (B, decode_steps*r, M), align (B, decode_steps, L),
             stop (B, decode_steps*r)); with ``wgrad_probes`` also an ``aux``
    dict of stacked per-step LSTM cell inputs.

    ``wgrad_probes`` (training-only, from `wgrad_probes()`): zero per-step
    tensors added to the two LSTM cells' gate pre-activations, with the
    corresponding weight matrices stop-gradiented. Autodiff's transpose of
    this scan otherwise carries each cell's full (4H, D+H) weight-gradient
    accumulator through every backward step — pure HBM traffic that
    dominates the decoder backward. Differentiating w.r.t. the probes yields
    the per-step gate gradients instead, and `assemble_wgrads` rebuilds the
    exact same dW with one batched einsum outside the loop.

    (An int8 weight-streaming serving branch lived here through r4; it was
    retired after the byte-economics analysis showed TP strictly dominates
    it on v5e — docs/PERFORMANCE.md "int8-under-TP byte economics".)
    """
    B, L, _ = memory.shape
    r, M = cfg.n_frames_per_step, cfg.n_mels
    mode = cfg.spkr_embed_mode.lower()
    # everything entering the decode scan follows memory's dtype (fp32
    # train default; bf16 opt-in — see tools/proto_bf16_act.py)
    spkr_embed = spkr_embed.astype(memory.dtype)

    # --- step-invariant precomputation (hoisted out of the reference's loop) ---
    if mode == "concat":
        mem = linear(params["spkr_mem_proj"],
                     jnp.concatenate([memory, jnp.broadcast_to(spkr_embed[:, None, :], (B, L, spkr_embed.shape[-1]))], -1))
    elif mode == "add":
        mem = linear(params["spkr_mem_proj"], memory + linear(params["spkr_proj"], spkr_embed)[:, None, :])
    else:
        mem = memory
    processed_memory = process_memory(params["attn"], mem)
    attn_mask = None
    if cfg.mask_attention and memory_lengths is not None:
        attn_mask = jnp.arange(L)[None, :] >= memory_lengths[:, None]

    if mode == "adain":
        ada_mean = linear(params["pseudo_mean"], spkr_embed)            # (B, Q)
        ada_std = jax.nn.relu(linear(params["pseudo_std"], spkr_embed))  # (B, Q)

    rng, k_teacher, k_go, k_scan = jax.random.split(rng, 4)
    dt = memory.dtype  # follow the activation dtype (fp32 train, bf16 opt-in)
    use_teacher = teacher is not None
    if use_teacher:
        teacher = teacher.astype(dt)  # keep the scan carry in one dtype
        T_t = teacher.shape[1] // r
        teacher_pre = prenet(params["prenet"], k_teacher,
                             teacher.reshape(B, T_t, r * M), cfg.prenet_dropout)  # (B, T_t, P)
        teacher_mean = jnp.mean(teacher_pre, axis=1)
        if teacher_rows is None:
            teacher_rows = jnp.ones((B,), bool)
        t_rows = teacher_rows[:, None].astype(dt)

    dec_in0 = prenet(params["prenet"], k_go, jnp.zeros((B, r * M), dt), cfg.prenet_dropout)
    carry0 = dict(
        rng=k_scan,
        q_h=jnp.zeros((B, cfg.query_rnn_dim), dt), q_c=jnp.zeros((B, cfg.query_rnn_dim), dt),
        d_h=jnp.zeros((B, cfg.dec_rnn_dim), dt), d_c=jnp.zeros((B, cfg.dec_rnn_dim), dt),
        attn_w=jnp.zeros((B, L), dt), attn_w_sum=jnp.zeros((B, L), dt),
        attn_ctx=jnp.zeros((B, cfg.enc_embed_dim), dt),
        dec_in=dec_in0.astype(dt),
    )

    use_probes = wgrad_probes is not None

    def step(c, xs):
        if use_probes:
            t, probe_q, probe_d = xs
        else:
            t, probe_q, probe_d = xs, None, None
        rng = c["rng"]
        rng, k_q, k_d, k_pre, k_coin = jax.random.split(rng, 5)

        # ---- decode_one_step (`src/module.py:216-288`) ----
        q_in = jnp.concatenate([c["dec_in"], c["attn_ctx"]], axis=-1)
        q_h, q_c = lstm_cell(params["query_rnn"], q_in, c["q_h"], c["q_c"],
                             probe=probe_q, stop_w=use_probes)
        q_h = dropout(k_q, q_h, cfg.query_dropout, enabled=train)

        if cfg.pretrain:
            # audio-LM pretraining: no conditioning (`src/module.py:241-243`)
            ctx = jnp.zeros_like(c["attn_ctx"])
            w = jnp.zeros_like(c["attn_w"])
        else:
            if cfg.use_summed_weights:
                attn_hist = jnp.stack([c["attn_w"], c["attn_w_sum"]], axis=1)  # (B, 2, L)
            else:
                attn_hist = c["attn_w"][:, None, :]
            ctx, w = attention_step(params["attn"], q_h, mem, processed_memory,
                                    attn_hist, mask=attn_mask)
        w_sum = c["attn_w_sum"] + w

        if mode == "adain":
            adapted = ada_std * (q_h - ada_mean)
        else:
            adapted = q_h
        d_in = jnp.concatenate([ctx, adapted], axis=-1)
        d_h, d_c = lstm_cell(params["dec_rnn"], d_in, c["d_h"], c["d_c"],
                             probe=probe_d, stop_w=use_probes)
        d_h = dropout(k_d, d_h, cfg.dec_dropout, enabled=train)

        hc = jnp.concatenate([d_h, ctx], axis=-1)
        mel_out = linear(params["proj"], hc).reshape(B, r, M)
        stop = jnp.repeat(linear(params["gate"], hc), r, axis=1)  # (B, r)

        # ---- scheduled sampling (`src/module.py:190-206`) ----
        own = prenet(params["prenet"], k_pre, mel_out.reshape(B, r * M), cfg.prenet_dropout)
        if use_teacher:
            u = jax.random.uniform(k_coin, (2,))
            take = jnp.minimum(t, T_t - 1)
            teach_frame = jax.lax.dynamic_index_in_dim(
                jnp.swapaxes(teacher_pre, 0, 1), take, axis=0, keepdims=False)  # (B, P)
            teach_based = jnp.where(u[1] < cfg.drop_dec_in, teacher_mean, teach_frame)
            # rows without a teacher always self-feed
            teach_based = t_rows * teach_based + (1.0 - t_rows) * own
            dec_in = jnp.where(u[0] > tf_rate, own, teach_based)
        else:
            dec_in = own

        c2 = dict(rng=rng, q_h=q_h, q_c=q_c, d_h=d_h, d_c=d_c,
                  attn_w=w, attn_w_sum=w_sum, attn_ctx=ctx, dec_in=dec_in)
        ys = (mel_out, w, stop)
        if use_probes:  # saved cell inputs for the batched dW einsum
            ys = ys + (jnp.concatenate([q_in, c["q_h"]], axis=-1),
                       jnp.concatenate([d_in, c["d_h"]], axis=-1))
        return c2, ys

    ts = jnp.arange(decode_steps)
    xs = (ts, wgrad_probes["q"], wgrad_probes["d"]) if use_probes else ts
    # remat: drop per-step residuals (backward re-runs the step body from
    # its carry) — trades residual HBM reads for a second weight-streaming
    # pass; measured by tools/proto_remat.py, off by default
    body = jax.checkpoint(step) if remat else step
    _, out = jax.lax.scan(body, carry0, xs)
    mels, aligns, stops = out[:3]
    mel = jnp.swapaxes(mels, 0, 1).reshape(B, decode_steps * r, M)
    align = jnp.swapaxes(aligns, 0, 1)                 # (B, T', L)
    stop = jnp.swapaxes(stops, 0, 1).reshape(B, decode_steps * r)
    if use_probes:
        return mel, align, stop, {"q": out[3], "d": out[4]}
    return mel, align, stop
