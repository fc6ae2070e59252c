"""Pretrain -> graft -> fine-tune e2e: the AudioLM/TextLM trainers emit
checkpoints that `apply_pretrained` grafts into a fresh VQVAE, and training
proceeds from the grafted weights."""

import os

import jax
import numpy as np
import pytest

from helpers import make_paras, tiny_config


@pytest.fixture(scope="module")
def pretrained_ckpts(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lm"))
    cfg = tiny_config(root, bone="l2", max_step=3, valid_step=2)
    paras = make_paras(root)
    from semi_tts_tpu.train.train_lm import AudioLmTrainer, TextLmTrainer

    text = TextLmTrainer(cfg, paras, "train")
    text.load_data()
    text.set_model()
    text.exec()
    audio = AudioLmTrainer(cfg, make_paras(root, seed=1), "train")
    audio.load_data()
    audio.set_model()
    audio.exec()
    emb_ckpt = os.path.join(text.ckpdir, "best_acc.pth")
    tts_ckpt = os.path.join(audio.ckpdir, "best_mel.pth")
    assert os.path.exists(emb_ckpt) and os.path.exists(tts_ckpt)
    return root, cfg, emb_ckpt, tts_ckpt, text, audio


def test_textlm_trains(pretrained_ckpts):
    _, _, emb_ckpt, _, text, _ = pretrained_ckpts
    assert text.step == 3
    leaves = jax.tree_util.tree_leaves(text.lm_params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_audiolm_trains(pretrained_ckpts):
    *_, audio = pretrained_ckpts
    assert audio.step == 3
    leaves = jax.tree_util.tree_leaves(audio.lm_params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_graft_and_finetune(pretrained_ckpts):
    root, cfg, emb_ckpt, tts_ckpt, text, audio = pretrained_ckpts
    import copy

    from semi_tts_tpu.train.train_vqvae import VqvaeTrainer

    cfg2 = copy.deepcopy(cfg)
    cfg2["hparas"]["max_step"] = 2
    cfg2["hparas"]["valid_step"] = 100
    cfg2["model"]["pretrained_emb"] = emb_ckpt
    cfg2["model"]["pretrained_tts"] = tts_ckpt
    cold = VqvaeTrainer(copy.deepcopy(cfg), make_paras(root), "train")
    cold.load_data()
    cold.set_model()
    warm = VqvaeTrainer(cfg2, make_paras(root), "train")
    warm.load_data()
    warm.set_model()

    # the grafted leaves genuinely differ from cold init...
    table_cold = np.asarray(cold.params["codebook"]["learnable_table"])
    table_warm = np.asarray(warm.params["codebook"]["learnable_table"])
    assert not np.allclose(table_cold, table_warm)
    np.testing.assert_array_equal(table_warm, np.asarray(text.lm_params["learnable_table"]))
    dec_warm = jax.tree_util.tree_leaves(warm.params["tts"]["decoder"])
    dec_lm = jax.tree_util.tree_leaves(audio.lm_params["decoder"])
    for a, b in zip(dec_warm, dec_lm):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...the TTS text encoder stays cold-init (reference grafts decoder+postnet only)
    enc_cold = jax.tree_util.tree_leaves(cold.params["tts"]["encoder"])
    enc_warm = jax.tree_util.tree_leaves(warm.params["tts"]["encoder"])
    for a, b in zip(enc_cold, enc_warm):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...and the graft carries BN *running stats* like torch load_state_dict
    # (`src/vqvae.py:71-90`): the warm postnet state equals the AudioLM's
    if "postnet" in warm.state["tts"]:
        st_warm = jax.tree_util.tree_leaves(warm.state["tts"]["postnet"])
        st_lm = jax.tree_util.tree_leaves(audio.lm_state["postnet"])
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(jax.tree_util.tree_leaves(cold.state["tts"]["postnet"]),
                                   st_lm))  # pretraining actually moved the stats
        for a, b in zip(st_warm, st_lm):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # fine-tuning runs from the graft
    warm.exec()
    assert warm.step >= 2
    leaves = jax.tree_util.tree_leaves(warm.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
