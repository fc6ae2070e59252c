"""Fixed-shape segment trim/merge for unpaired CTC latents.

Parity target: `/root/reference/src/vqvae.py:218-257` (``mean_forward``) —
scan each row's argmax token sequence, close a segment whenever the token
changes OR the current run exceeds ``max_frames_per_phn`` frames, emit the
mean latent of every *non-blank* segment (token 0 = blank), and report
"abandon the whole unpaired cycle" when any row is entirely blank
(`bin/train_vqvae.py:162-171`).

The reference does this with a per-row Python loop on host; here it is a
static-shape device program: a tiny ``lax.scan`` assigns segment ids, a
``segment_sum`` computes means, and non-blank segments are compacted left
with a cumsum scatter. Output length is capped at T (every frame its own
segment in the worst case); callers slice/pad as needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_frames_per_phn",))
def trim_merge_segments(p_code: jnp.ndarray, latent: jnp.ndarray, *, max_frames_per_phn: int):
    """Returns ``(trimmed (B, T, D), lengths (B,), ok (bool scalar))``.

    ``ok`` is False when some row produced zero non-blank segments — the
    reference returns None then and the trainer skips the unpaired speech
    cycle that step.
    """
    B, T, D = latent.shape
    idx = jnp.argmax(p_code, axis=-1)  # (B, T)

    # --- segment ids via scan over time (carry: last_pos per row) ---
    def step(carry, x):
        last_pos, seg_id = carry
        t, cur, prev = x
        boundary = (cur != prev) | ((t - last_pos) > max_frames_per_phn)
        seg_id = seg_id + boundary.astype(jnp.int32)
        last_pos = jnp.where(boundary, t, last_pos)
        return (last_pos, seg_id), seg_id

    ts = jnp.arange(1, T, dtype=jnp.int32)
    init = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32))
    prev_tok = jnp.swapaxes(idx, 0, 1)[:-1]
    cur_tok = jnp.swapaxes(idx, 0, 1)[1:]
    (_, _), seg_ids_tail = jax.lax.scan(step, init, (ts, cur_tok, prev_tok))
    seg_id = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), jnp.swapaxes(seg_ids_tail, 0, 1)], axis=1)  # (B, T)
    n_segs = seg_id[:, -1] + 1

    # --- per-segment means & tokens (tokens are constant within a segment) ---
    seg_sum = jax.vmap(partial(jax.ops.segment_sum, num_segments=T))(latent, seg_id)  # (B, T, D)
    seg_cnt = jax.vmap(partial(jax.ops.segment_sum, num_segments=T))(jnp.ones_like(idx, jnp.float32), seg_id)
    seg_mean = seg_sum / jnp.maximum(seg_cnt, 1.0)[..., None]
    seg_tok = jax.vmap(partial(jax.ops.segment_max, num_segments=T))(idx, seg_id)

    s = jnp.arange(T)[None, :]
    keep = (seg_tok != 0) & (s < n_segs[:, None])
    lengths = jnp.sum(keep, axis=1)

    # --- compact kept segments to the left ---
    new_pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    new_pos = jnp.where(keep, new_pos, T)  # dropped -> scatter into a discard row
    out = jnp.zeros((B, T + 1, D), latent.dtype)
    out = jax.vmap(lambda o, p, v: o.at[p].set(v))(out, new_pos, seg_mean)[:, :T]

    ok = jnp.all(lengths > 0)
    return out, lengths, ok


def padded_concat(pair: jnp.ndarray, unpair: jnp.ndarray):
    """Concat two batches along batch dim, zero-padding time to the longer
    (`src/vqvae.py:259-271`). Shapes are static so this is trace-safe."""
    pt, ut = pair.shape[1], unpair.shape[1]
    if pt > ut:
        pad = [(0, 0)] * unpair.ndim
        pad[1] = (0, pt - ut)
        unpair = jnp.pad(unpair, pad)
    elif ut > pt:
        pad = [(0, 0)] * pair.ndim
        pad[1] = (0, ut - pt)
        pair = jnp.pad(pair, pad)
    return pair.shape[0], jnp.concatenate([pair, unpair], axis=0)
