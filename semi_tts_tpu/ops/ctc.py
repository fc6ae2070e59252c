"""CTC loss as a log-semiring forward algorithm (`lax.scan` over time).

Parity target: ``torch.nn.CTCLoss(blank=0, reduction='mean')`` as used by the
reference trainer (`/root/reference/bin/train_vqvae.py:90,430-444`): inputs are
log-probabilities (the reference feeds ``(p + 1e-10).log()`` of softmax
outputs), targets arrive as a dense padded matrix (pad == blank == 0) with
per-row lengths, and the 'mean' reduction divides each sequence's NLL by its
target length before averaging over the batch.

TPU notes: the recursion is a scan whose per-step work is a tiny gather +
logaddexp over the (B, 2U+1) lattice — XLA fuses it; no host sync, no
variable shapes (input lengths handled by freezing the lattice past each
row's length).

Gradient: a custom VJP implements the classic alpha-beta forward-backward
result  d(-log P)/d lp[t,c] = -sum_{s: z_s=c} exp(alpha[t,s]+beta[t,s]+nll)
instead of letting autodiff transpose the forward scan — the transpose turns
each per-step label gather into a scatter-add, and T sequential scatters
dominated the whole train step on TPU (~17 ms of a 48 ms step at T=266;
the beta scan + one one-hot einsum costs ~2 ms).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.where(m <= NEG_INF / 2, 0.0, m)
    # clamp the sum away from 0: when every branch is dead the forward value
    # is discarded by the outer `where`, but log(0) would still poison the
    # *gradient* through the kept branch (where-grad leak)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    out = m_safe + jnp.log(jnp.maximum(s, 1e-37))
    return jnp.where(m <= NEG_INF / 2, NEG_INF, out)


def _lattice(targets, target_lengths, blank):
    """Extended label sequence and transition/validity masks.

    z = (blank, y1, blank, y2, ..., blank); the s-2 skip transition is
    allowed into odd (label) states whose label differs from the one two
    slots back; states past 2*target_len are invalid for that row.
    """
    B, U = targets.shape
    S = 2 * U + 1
    z = jnp.full((B, S), blank, targets.dtype).at[:, 1::2].set(targets)
    s_idx = jnp.arange(S)
    is_label = (s_idx % 2) == 1
    z_prev2 = jnp.roll(z, 2, axis=1)
    can_skip = is_label[None, :] & (z != z_prev2) & (s_idx[None, :] >= 2)
    valid_s = s_idx[None, :] < (2 * target_lengths[:, None] + 1)
    return z, can_skip, valid_s


def _alpha_pass(log_probs, z, can_skip, valid_s, input_lengths, target_lengths,
                blank, collect: bool):
    """Forward (alpha) recursion. Returns (nll (B,), alphas (T,B,S) or None)."""
    B, T, C = log_probs.shape
    S = z.shape[1]

    lp0 = log_probs[:, 0, :]
    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(lp0[:, blank])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(target_lengths > 0, jnp.take_along_axis(lp0, z[:, 1:2], axis=1)[:, 0], NEG_INF)
    )
    alpha0 = jnp.where(valid_s, alpha0, NEG_INF)

    def step(alpha, inputs):
        lp_t, t = inputs
        a1 = jnp.concatenate([jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1)
        a2 = jnp.concatenate([jnp.full((B, 2), NEG_INF), alpha[:, :-2]], axis=1)
        a2 = jnp.where(can_skip, a2, NEG_INF)
        emit = jnp.take_along_axis(lp_t, z, axis=1)  # (B, S)
        new = _logaddexp3(alpha, a1, a2) + emit
        new = jnp.where(valid_s, new, NEG_INF)
        # freeze rows whose input has ended
        new = jnp.where((t < input_lengths)[:, None], new, alpha)
        return new, (new if collect else None)

    lps = jnp.swapaxes(log_probs, 0, 1)  # (T, B, C)
    alpha, ys = jax.lax.scan(step, alpha0, (lps[1:], jnp.arange(1, T)))
    alpha = jnp.where(T > 1, alpha, alpha0)

    end = 2 * target_lengths  # final blank index
    a_end = jnp.take_along_axis(alpha, end[:, None], axis=1)[:, 0]
    a_last_label = jnp.where(
        target_lengths > 0,
        jnp.take_along_axis(alpha, jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0],
        NEG_INF,
    )
    nll = -jnp.logaddexp(a_end, a_last_label)
    alphas = jnp.concatenate([alpha0[None], ys], axis=0) if collect else None
    return nll, alphas


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_nll(log_probs, targets, input_lengths, target_lengths, blank):
    """Per-sample CTC negative log likelihood ``(B,)`` (reduction='none')."""
    z, can_skip, valid_s = _lattice(targets, target_lengths, blank)
    nll, _ = _alpha_pass(log_probs, z, can_skip, valid_s,
                         input_lengths, target_lengths, blank, collect=False)
    return nll


def _ctc_nll_fwd(log_probs, targets, input_lengths, target_lengths, blank):
    z, can_skip, valid_s = _lattice(targets, target_lengths, blank)
    nll, alphas = _alpha_pass(log_probs, z, can_skip, valid_s,
                              input_lengths, target_lengths, blank, collect=True)
    res = (alphas, log_probs, z, can_skip, valid_s, input_lengths,
           target_lengths, nll)
    return nll, res


def _ctc_nll_bwd(blank, res, g):
    alphas, log_probs, z, can_skip, valid_s, input_lengths, target_lengths, nll = res
    B, T, C = log_probs.shape
    S = z.shape[1]
    s_idx = jnp.arange(S)

    # terminal beta: 0 at the final blank / final label states, -inf elsewhere
    end = 2 * target_lengths
    term = jnp.where(
        (s_idx[None, :] == end[:, None])
        | ((s_idx[None, :] == (end - 1)[:, None]) & (target_lengths[:, None] > 0)),
        0.0, NEG_INF)
    term = jnp.where(valid_s, term, NEG_INF)

    # skip-transition mask seen from the SOURCE state: s -> s+2 allowed iff
    # can_skip at the target slot s+2
    skip_from = jnp.concatenate(
        [can_skip[:, 2:], jnp.zeros((B, 2), can_skip.dtype)], axis=1)

    def step(beta_next, inputs):
        lp_next, t = inputs  # log-probs at time t+1; computing beta[t]
        x = beta_next + jnp.take_along_axis(lp_next, z, axis=1)
        x = jnp.where(valid_s, x, NEG_INF)
        x1 = jnp.concatenate([x[:, 1:], jnp.full((B, 1), NEG_INF)], axis=1)
        x2 = jnp.concatenate([x[:, 2:], jnp.full((B, 2), NEG_INF)], axis=1)
        x2 = jnp.where(skip_from, x2, NEG_INF)
        std = _logaddexp3(x, x1, x2)
        # rows whose last real frame is t (or already past): terminal value
        beta_t = jnp.where((t >= input_lengths - 1)[:, None], term, std)
        return beta_t, beta_t

    lps = jnp.swapaxes(log_probs, 0, 1)  # (T, B, C)
    if T > 1:
        _, betas_rest = jax.lax.scan(step, term, (lps[1:], jnp.arange(T - 1)),
                                     reverse=True)
        betas = jnp.concatenate([betas_rest, term[None]], axis=0)
    else:
        betas = term[None]

    # occupancy posteriors: gamma + nll = log( alpha*beta / P ) <= 0
    occ = jnp.exp(jnp.minimum(alphas + betas + nll[None, :, None], 0.0))  # (T,B,S)
    onehot = ((z[:, :, None] == jnp.arange(C)[None, None, :]) & valid_s[:, :, None])
    # HIGHEST: gradients must not silently pass through bf16 on TPU (the
    # autodiff backward this replaces was full fp32); the dot is tiny
    grad = -jnp.einsum("tbs,bsc->btc", occ, onehot.astype(occ.dtype),
                       precision=jax.lax.Precision.HIGHEST)
    tmask = jnp.arange(T)[None, :] < input_lengths[:, None]
    finite = (nll < -NEG_INF / 2)  # impossible alignments: P=0 -> zero grad
    grad = grad * (g * finite)[:, None, None] * tmask[:, :, None].astype(occ.dtype)

    int_zero = lambda shape: np.zeros(shape, dtype=jax.dtypes.float0)
    return (grad, int_zero((B, (S - 1) // 2)), int_zero(input_lengths.shape),
            int_zero(target_lengths.shape))


_ctc_nll.defvjp(_ctc_nll_fwd, _ctc_nll_bwd)


def ctc_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    *,
    blank: int = 0,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Negative log likelihood of ``targets`` under CTC alignment.

    Args:
      log_probs: ``(B, T, C)`` log probabilities (batch-major; callers using
        torch's ``(T, B, C)`` layout should transpose).
      targets: ``(B, U)`` dense label matrix padded with ``blank``.
      input_lengths: ``(B,)`` valid frame counts.
      target_lengths: ``(B,)`` valid label counts.
      reduction: 'mean' (torch default: per-sample NLL / target_length,
        averaged), 'sum', or 'none'.
    """
    nll = _ctc_nll(log_probs, targets.astype(jnp.int32),
                   input_lengths.astype(jnp.int32),
                   target_lengths.astype(jnp.int32), blank)
    return _reduce(nll, target_lengths, reduction)


def ctc_loss_autodiff(log_probs, targets, input_lengths, target_lengths, *,
                      blank: int = 0, reduction: str = "mean"):
    """Plain-autodiff variant (scan transposed by JAX) — the reference
    implementation the custom VJP is verified against in tests; ~10x slower
    backward on TPU (per-step scatter-adds)."""
    z, can_skip, valid_s = _lattice(targets, target_lengths, blank)
    nll, _ = _alpha_pass(log_probs, z, can_skip, valid_s,
                         input_lengths, target_lengths, blank, collect=False)
    return _reduce(nll, target_lengths, reduction)


def _reduce(nll, target_lengths, reduction: str):
    """torch CTCLoss reductions: 'mean' divides each NLL by its target length
    before averaging (`torch.nn.CTCLoss` semantics)."""
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(target_lengths, 1).astype(nll.dtype))
    raise ValueError(reduction)
