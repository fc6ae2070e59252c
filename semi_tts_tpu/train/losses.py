"""Spectrogram regression losses.

Parity target: `/root/reference/src/util.py:80-126` (``freq_loss``) — L1 or
MSE over the whole padded batch, plus a 50/50 low-frequency-emphasis mix for
linear spectrograms (< 3 kHz) and a +0.5-weighted differential (delta-t)
term for mel spectrograms (arXiv 1909.10302 as cited upstream).
"""

from __future__ import annotations

import jax.numpy as jnp

CUTOFF_FREQ = 3000  # Hz (`src/util.py:103`)


def freq_loss(pred, label, *, sample_rate, n_mels, loss="mse",
              differential_loss=True, emphasize_linear_low=True, p=1.0):
    if loss == "l1":
        crit = lambda a, b: jnp.mean(jnp.abs(a - b))
    elif loss == "mse":
        crit = lambda a, b: jnp.mean((a - b) ** 2)
    else:
        raise NotImplementedError(loss)

    dim = pred.shape[-1]
    loss_all = crit(p * pred, p * label)

    if dim != n_mels and emphasize_linear_low:
        n_priority = int(dim * (CUTOFF_FREQ / (sample_rate / 2)))
        loss_low = crit(p * pred[:, :, :n_priority], p * label[:, :, :n_priority])
        loss_all = 0.5 * loss_all + 0.5 * loss_low

    if dim == n_mels and differential_loss:
        pd = pred[:, 1:, :] - pred[:, :-1, :]
        ld = label[:, 1:, :] - label[:, :-1, :]
        loss_all = loss_all + 0.5 * crit(p * pd, p * ld)

    return loss_all
