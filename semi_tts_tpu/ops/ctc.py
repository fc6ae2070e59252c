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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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
    B, T, C = log_probs.shape
    U = targets.shape[1]
    S = 2 * U + 1

    # Extended label sequence z: blank, y1, blank, y2, ..., blank
    z = jnp.full((B, S), blank, targets.dtype).at[:, 1::2].set(targets)
    s_idx = jnp.arange(S)
    is_label = (s_idx % 2) == 1
    # allow the s-2 skip transition when z_s is a label differing from z_{s-2}
    z_prev2 = jnp.roll(z, 2, axis=1)
    can_skip = is_label[None, :] & (z != z_prev2) & (s_idx[None, :] >= 2)
    valid_s = s_idx[None, :] < (2 * target_lengths[:, None] + 1)

    # alpha_0
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
        return new, None

    lps = jnp.swapaxes(log_probs, 0, 1)  # (T, B, C)
    alpha, _ = jax.lax.scan(step, alpha0, (lps[1:], jnp.arange(1, T)))
    alpha = jnp.where(T > 1, alpha, alpha0)

    end = 2 * target_lengths  # final blank index
    a_end = jnp.take_along_axis(alpha, end[:, None], axis=1)[:, 0]
    a_last_label = jnp.where(
        target_lengths > 0,
        jnp.take_along_axis(alpha, jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0],
        NEG_INF,
    )
    nll = -jnp.logaddexp(a_end, a_last_label)

    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(target_lengths, 1).astype(nll.dtype))
    raise ValueError(reduction)
