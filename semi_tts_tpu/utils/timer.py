"""Step-time breakdown timer.

Parity target: `/root/reference/src/util.py:20-47` — rd/fw/bw category
accumulation reported as ``sec/step (rd%|fw%|bw%)``. Because the TPU step is
a single fused program, 'fw' and 'bw' merge into one 'step' category by
default, but the reference's three-way API is kept for solvers that split
host read from device step. Also exposes `jax.profiler` trace capture.
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    def __init__(self, categories=("rd", "fw", "bw")):
        self.categories = tuple(categories)
        self.prev_t = time.time()
        self.clear()

    def set(self):
        self.prev_t = time.time()

    def cnt(self, mode):
        self.time_table[mode] += time.time() - self.prev_t
        self.set()
        if mode == self.categories[-1]:
            self.click += 1

    def show(self):
        total = sum(self.time_table.values())
        avg = total / max(self.click, 1)
        parts = " | ".join(
            f"{k} {100 * v / total:.1f}%" for k, v in self.time_table.items()) if total else ""
        self.clear()
        return f"{avg:.3f} sec/step ({parts})"

    def clear(self):
        self.time_table = {c: 0.0 for c in self.categories}
        self.click = 0


@contextlib.contextmanager
def profile_trace(logdir):
    """jax.profiler trace around a block — the TPU-native replacement for the
    reference's wall-clock-only instrumentation (SURVEY.md §5)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
