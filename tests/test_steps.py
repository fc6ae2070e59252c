"""Regression tests for train-step plumbing: frame round-up at awkward
``n_frames_per_step``, PER pad-trimming, and the commit/vq-weight guard."""

import numpy as np
import pytest

from helpers import make_paras, tiny_config


def test_round_up():
    from semi_tts_tpu.train.steps import round_up

    assert round_up(10, 3) == 12
    assert round_up(12, 3) == 12
    assert round_up(0, 3) == 0
    # the reference's `x += x % r` idiom fails exactly here (10 -> 11)
    assert (10 + 10 % 3) == 11 != round_up(10, 3)
    # the fake-mel length computation must land on a multiple of r for every
    # text pad length U, including r that does not divide FRAME_PHN_RATIO * U
    for U in range(1, 40):
        for r in (2, 3, 5, 7):
            u_ts = round_up(6 * U, r)
            assert u_ts % r == 0 and 0 <= u_ts - 6 * U < r
    # traced-array form used for --actual-len ctc lengths
    import jax.numpy as jnp

    ulen = round_up(jnp.asarray([6, 10, 24]), 5)
    np.testing.assert_array_equal(np.asarray(ulen), [10, 10, 25])


def test_text_first_cycle_at_awkward_frames_per_step(tmp_path):
    """Full semi-supervised text-first steps with n_frames_per_step=5 (which
    does not divide FRAME_PHN_RATIO*U in general) — mis-shaped fake-mel
    slices would surface as shape errors or non-finite params here."""
    root = str(tmp_path)
    cfg = tiny_config(root, bone="seperate", unpair_text=1.0, max_step=4,
                      valid_step=100)
    cfg["model"]["decoder"]["decoder"]["n_frames_per_step"] = 5
    from semi_tts_tpu.train.train_vqvae import VqvaeTrainer

    solver = VqvaeTrainer(cfg, make_paras(root), "train")
    solver.load_data()
    solver.set_model()
    solver.exec()
    import jax

    assert solver.step >= 4  # steps 1 and 3 ran the text-first cycle
    leaves = jax.tree_util.tree_leaves(solver.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_profile_flag_captures_trace(tmp_path):
    """--profile wraps a window of train steps in a jax.profiler trace."""
    root = str(tmp_path)
    cfg = tiny_config(root, bone="seperate", max_step=2, valid_step=100)
    from semi_tts_tpu.train.train_vqvae import VqvaeTrainer

    paras = make_paras(root)
    paras.profile = True
    solver = VqvaeTrainer(cfg, paras, "train")
    solver.load_data()
    solver.set_model()
    solver.exec()  # profile window = steps 1..2 at max_step=2
    import glob
    import os

    traces = glob.glob(os.path.join(solver.logdir, "plugins", "profile", "*"))
    assert traces, "no profiler trace captured under logdir"


def test_cal_per_trims_pad_junk():
    from semi_tts_tpu.utils.metrics import cal_per

    truth = np.array([[5, 6, 7, 0]])
    clean = np.array([[5, 6, 7, 0, 0, 0, 0, 0]])
    junk = np.array([[5, 6, 7, 9, 8, 9, 8, 9]])  # bucket-pad garbage after len 3
    assert cal_per(clean, truth) == 0.0
    assert cal_per(junk, truth) > 0.0  # unmasked junk inflates PER...
    assert cal_per(junk, truth, pred_lens=[3]) == 0.0  # ...trimming removes it


def test_codebook_rejects_commit_vq_weights():
    import jax

    from semi_tts_tpu.models.embed import CodebookConfig, codebook_init

    cfg = CodebookConfig(bone="l2", use_phn_attr=False, commit_weight=0.25)
    with pytest.raises(ValueError, match="commit_weight"):
        codebook_init(jax.random.PRNGKey(0), cfg)
