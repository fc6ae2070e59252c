"""CTC loss golden-checked against torch.nn.CTCLoss (the reference's loss,
bin/train_vqvae.py:90)."""

import jax.numpy as jnp
import numpy as np
import torch

from semi_tts_tpu.ops.ctc import ctc_loss


def _rand_case(seed, B=3, T=30, C=10, U=8):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, T, C).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1).numpy()
    target_lengths = rng.randint(1, U + 1, size=B)
    targets = np.zeros((B, U), np.int64)
    for b in range(B):
        targets[b, : target_lengths[b]] = rng.randint(1, C, size=target_lengths[b])
    input_lengths = rng.randint(2 * U + 2, T + 1, size=B)
    return log_probs, targets, input_lengths, target_lengths


def _torch_ctc(log_probs, targets, input_lengths, target_lengths, reduction="mean"):
    crit = torch.nn.CTCLoss(blank=0, reduction=reduction)
    flat = torch.from_numpy(np.concatenate([t[:l] for t, l in zip(targets, target_lengths)]))
    return crit(
        torch.from_numpy(log_probs).transpose(0, 1),
        flat,
        torch.from_numpy(input_lengths),
        torch.from_numpy(target_lengths),
    ).numpy()


def test_ctc_matches_torch_mean():
    for seed in range(5):
        lp, tg, il, tl = _rand_case(seed)
        got = float(ctc_loss(jnp.asarray(lp), jnp.asarray(tg), jnp.asarray(il), jnp.asarray(tl)))
        want = float(_torch_ctc(lp, tg, il, tl))
        assert abs(got - want) < 1e-3, (seed, got, want)


def test_ctc_matches_torch_none():
    lp, tg, il, tl = _rand_case(7)
    got = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(tg), jnp.asarray(il), jnp.asarray(tl), reduction="none"))
    crit = torch.nn.CTCLoss(blank=0, reduction="none")
    flat = torch.from_numpy(np.concatenate([t[:l] for t, l in zip(tg, tl)]))
    want = crit(torch.from_numpy(lp).transpose(0, 1), flat,
                torch.from_numpy(il), torch.from_numpy(tl)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_ctc_full_input_length_like_reference():
    """Reference default (--actual-len off): input_lengths = full T for all
    (bin/train_vqvae.py:442)."""
    lp, tg, _, tl = _rand_case(11, T=40)
    il = np.full(lp.shape[0], lp.shape[1], np.int64)
    got = float(ctc_loss(jnp.asarray(lp), jnp.asarray(tg), jnp.asarray(il), jnp.asarray(tl)))
    want = float(_torch_ctc(lp, tg, il, tl))
    assert abs(got - want) < 1e-3


def test_ctc_repeated_labels():
    """Repeats force the no-skip path through the lattice."""
    lp, _, il, _ = _rand_case(13, B=2, T=25, C=6, U=6)
    tg = np.array([[2, 2, 3, 3, 2, 0], [1, 1, 1, 1, 1, 1]], np.int64)
    tl = np.array([5, 6])
    got = float(ctc_loss(jnp.asarray(lp), jnp.asarray(tg), jnp.asarray(il), jnp.asarray(tl)))
    want = float(_torch_ctc(lp, tg, il, tl))
    assert abs(got - want) < 1e-3


def test_ctc_impossible_is_inf_like():
    """Target longer than input frames allow -> +inf in torch; huge here."""
    lp, _, _, _ = _rand_case(17, B=1, T=10, C=6, U=4)
    lp = lp[:, :5]
    tg = np.array([[1, 1, 1, 1]], np.int64)  # needs >= 7 frames
    tl = np.array([4])
    il = np.array([5])
    got = float(ctc_loss(jnp.asarray(lp), jnp.asarray(tg), jnp.asarray(il), jnp.asarray(tl)))
    assert got > 1e20
