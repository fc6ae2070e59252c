"""Matplotlib renderers for TensorBoard images.

Parity target: `/root/reference/src/util.py:128-158` — spectrogram/alignment
heatmaps (``feat_to_fig``) and token-usage bar charts (``data_to_bar``),
returned as (HWC float array in [0,1], "HWC") pairs.
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _save_canvas(data, meta=None):
    fig, ax = plt.subplots(figsize=(16, 10))
    if meta is None:
        ax.imshow(data, aspect="auto", origin="lower")
    else:
        ax.bar(meta[0], data[0], tick_label=meta[1], fc=(0, 0, 1, 0.5))
        ax.bar(meta[0], data[1], tick_label=meta[1], fc=(1, 0, 0, 0.5))
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3] / 255.0
    plt.close(fig)
    return buf


def feat_to_fig(feat):
    """feat: (T, D) array -> (HWC image, 'HWC')."""
    if feat is None:
        return None
    return _save_canvas(np.asarray(feat).T), "HWC"


def data_to_bar(data, gt_data, tok_size, tick, zero_pad_tok=True):
    if len(gt_data) == 0:
        return None
    cnts = [data.count(i) / len(data) for i in range(tok_size)]
    gt_cnts = [gt_data.count(i) / len(gt_data) for i in range(tok_size)]
    if zero_pad_tok:
        cnts[0] = 0
        gt_cnts[0] = 0
    return _save_canvas((cnts, gt_cnts), meta=(range(tok_size), tick)), "HWC"
