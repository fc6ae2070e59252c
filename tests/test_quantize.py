"""trim_merge_segments vs a literal Python re-statement of the reference's
mean_forward loop (src/vqvae.py:218-257)."""

import jax.numpy as jnp
import numpy as np

from semi_tts_tpu.ops.quantize import padded_concat, trim_merge_segments


def _ref_mean_forward(p_code, latent, max_frames_per_phn):
    """Python transcription of src/vqvae.py:218-257."""
    B, T, D = latent.shape
    batch_latent, trimmed_len = [], []
    idx_all = p_code.argmax(-1)
    for b in range(B):
        idx_seq = idx_all[b].tolist()
        last_idx, last_pos, cur = idx_seq[0], 0, []
        for t, ix in enumerate(idx_seq):
            if last_idx != ix or ((t - last_pos) > max_frames_per_phn):
                if last_idx != 0:
                    cur.append(latent[b, last_pos:t].mean(0))
                last_idx, last_pos = ix, t
        if last_idx != 0:
            if last_pos != (T - 1):
                cur.append(latent[b, last_pos:].mean(0))
            else:
                cur.append(latent[b, T - 1])
        if len(cur) == 0:
            return None
        trimmed_len.append(len(cur))
        batch_latent.append(np.stack(cur))
    L = max(trimmed_len)
    out = np.zeros((B, L, D), latent.dtype)
    for b, seq in enumerate(batch_latent):
        out[b, : len(seq)] = seq
    return out, np.array(trimmed_len)


def _case(seed, B=3, T=24, V=6, D=4, max_f=3):
    rng = np.random.RandomState(seed)
    p = rng.rand(B, T, V).astype(np.float32)
    # bias toward repeats and blanks to hit all branches
    tokens = rng.choice(V, size=(B, T), p=[0.3] + [0.7 / (V - 1)] * (V - 1))
    run = rng.randint(1, 6, size=(B, T))
    for b in range(B):
        t = 0
        while t < T:
            tok = tokens[b, t]
            r = min(run[b, t], T - t)
            p[b, t : t + r, :] = 0.01
            p[b, t : t + r, tok] = 1.0
            t += r
    latent = rng.randn(B, T, D).astype(np.float32)
    return p, latent


def test_trim_merge_matches_reference():
    for seed in range(8):
        p, latent = _case(seed)
        want = _ref_mean_forward(p, latent, 3)
        got, lens, ok = trim_merge_segments(jnp.asarray(p), jnp.asarray(latent), max_frames_per_phn=3)
        got, lens, ok = np.asarray(got), np.asarray(lens), bool(ok)
        if want is None:
            assert not ok, seed
            continue
        assert ok, seed
        w, wl = want
        np.testing.assert_array_equal(lens, wl)
        for b in range(p.shape[0]):
            np.testing.assert_allclose(got[b, : lens[b]], w[b, : wl[b]], atol=1e-5, err_msg=f"seed {seed} b {b}")
            assert (got[b, lens[b]:] == 0).all()


def test_trim_merge_all_blank_row():
    B, T, V, D = 2, 10, 5, 3
    p = np.full((B, T, V), 0.01, np.float32)
    p[0, :, 0] = 1.0  # row 0: all blank
    p[1, :, 2] = 1.0
    latent = np.random.RandomState(0).randn(B, T, D).astype(np.float32)
    _, lens, ok = trim_merge_segments(jnp.asarray(p), jnp.asarray(latent), max_frames_per_phn=3)
    assert not bool(ok)
    assert int(lens[0]) == 0 and int(lens[1]) > 0


def test_padded_concat():
    a = jnp.ones((2, 5, 3))
    b = jnp.full((3, 8, 3), 2.0)
    bs, cat = padded_concat(a, b)
    assert bs == 2 and cat.shape == (5, 8, 3)
    assert (np.asarray(cat[:2, 5:]) == 0).all()
    bs2, cat2 = padded_concat(b, a)
    assert bs2 == 3 and cat2.shape == (5, 8, 3)
    assert (np.asarray(cat2[3:, 5:]) == 0).all()
