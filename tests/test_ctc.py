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


def test_ctc_custom_vjp_matches_autodiff():
    """The alpha-beta custom VJP equals JAX's scan-transpose gradient."""
    import jax

    from semi_tts_tpu.ops.ctc import ctc_loss_autodiff

    for seed in (0, 3):
        lp, tg, il, tl = _rand_case(seed, B=4, T=40, C=12, U=9)
        args = tuple(map(jnp.asarray, (tg, il, tl)))
        for red in ("mean", "sum"):
            g_custom = jax.grad(lambda x: ctc_loss(x, *args, reduction=red))(jnp.asarray(lp))
            g_auto = jax.grad(lambda x: ctc_loss_autodiff(x, *args, reduction=red))(jnp.asarray(lp))
            np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                                       atol=2e-5, err_msg=f"seed={seed} red={red}")


def test_ctc_grad_matches_torch_through_logits():
    """End-to-end logit gradients match torch when chained through the
    reference's ``(softmax + 1e-10).log()`` (bin/train_vqvae.py:236,432).

    (Raw log-prob-level gradients intentionally differ: torch's CTC backward
    bakes in a log_softmax jacobian — `exp(lp) - occupancy` — while ours is
    the true `-occupancy`; both agree once composed with a real softmax.)
    """
    import jax

    rng = np.random.RandomState(5)
    B, T, C, U = 3, 35, 12, 7
    logits = rng.randn(B, T, C).astype(np.float32)
    tl = rng.randint(1, U + 1, size=B)
    tg = np.zeros((B, U), np.int64)
    for b in range(B):
        tg[b, : tl[b]] = rng.randint(1, C, size=tl[b])
    il = np.full(B, T, np.int64)

    lt = torch.from_numpy(logits.copy()).requires_grad_(True)
    lp_t = (torch.softmax(lt, dim=-1) + 1e-10).log().permute(1, 0, 2)
    flat = torch.from_numpy(np.concatenate([t[:l] for t, l in zip(tg, tl)]))
    torch.nn.CTCLoss(blank=0, reduction="mean")(
        lp_t, flat, torch.from_numpy(il), torch.from_numpy(tl)).backward()

    def f(x):
        p = jax.nn.softmax(x, axis=-1)
        return ctc_loss(jnp.log(p + 1e-10), jnp.asarray(tg), jnp.asarray(il),
                        jnp.asarray(tl), reduction="mean")

    gj = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    np.testing.assert_allclose(gj, lt.grad.numpy(), atol=2e-5)


def test_ctc_grad_zero_on_padded_frames_and_impossible_rows():
    import jax

    lp, tg, il, tl = _rand_case(19, B=3, T=30, C=8, U=5)
    il = np.array([30, 18, 2])  # row 2: impossible (needs more frames)
    tl = np.array([3, 4, 5])
    g = np.asarray(jax.grad(
        lambda x: ctc_loss(x, jnp.asarray(tg), jnp.asarray(il), jnp.asarray(tl),
                           reduction="sum"))(jnp.asarray(lp)))
    assert np.all(g[1, 18:] == 0.0)  # past input length
    assert np.all(g[2] == 0.0)  # impossible alignment: zeroed, not NaN
    assert np.all(np.isfinite(g))
