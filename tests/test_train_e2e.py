"""End-to-end solver tests on the synthetic corpus: supervised training,
semi-supervised cycles, checkpoint/resume, and gen_specgram inference."""

import glob
import os

import numpy as np
import pytest

from helpers import make_paras, tiny_config


@pytest.fixture(scope="module")
def supervised_run(tmp_path_factory):
    """Train 3 supervised steps (validation at step 1), keep the artifacts."""
    root = str(tmp_path_factory.mktemp("sup"))
    cfg = tiny_config(root, bone="seperate", max_step=3, valid_step=2)
    paras = make_paras(root)
    from semi_tts_tpu.train.train_vqvae import VqvaeTrainer

    solver = VqvaeTrainer(cfg, paras, "train")
    solver.load_data()
    solver.set_model()
    solver.exec()
    # the best-metric policy only saves on dev improvement after step 1
    # (reference quirk, bin/train_vqvae.py:388-395) — save a final one for
    # the downstream inference/resume tests
    solver.save_checkpoint_triple("final.pth", 0.0, params=solver.params,
                                  state=solver.state, opt_state=solver.opt_state)
    return root, cfg, paras, solver


def test_supervised_training_runs(supervised_run):
    _, _, _, solver = supervised_run
    assert solver.step >= 3
    # params updated and finite
    import jax

    leaves = jax.tree_util.tree_leaves(solver.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_checkpoint_saved_and_loadable(supervised_run):
    root, cfg, paras, solver = supervised_run
    # validation at step 2 should have checkpointed (best tts / best per)
    ckpts = glob.glob(os.path.join(solver.ckpdir, "*.pth"))
    assert ckpts, "no checkpoint written"
    from semi_tts_tpu.train.checkpoint import load_checkpoint

    ck = load_checkpoint(ckpts[0])
    assert ck["global_step"] >= 1
    assert "asr" in ck["model"] and "tts" in ck["model"]


def test_gen_specgram_inference(supervised_run):
    root, cfg, paras, solver = supervised_run
    ckpts = sorted(glob.glob(os.path.join(solver.ckpdir, "*.pth")))
    from semi_tts_tpu.train.gen_specgram import SpecgramGenerator

    paras2 = make_paras(root, load=ckpts[-1], gen_wav=True)
    gen = SpecgramGenerator(cfg, paras2, "test")
    gen.load_data()
    gen.set_model()
    gen.exec()
    outdir = gen.logdir + "_%dk" % (gen.step // 1000)
    mels = glob.glob(os.path.join(outdir, "*-mel.npy"))
    specs = glob.glob(os.path.join(outdir, "*-spec.npy"))
    aligns = glob.glob(os.path.join(outdir, "*-align.npy"))
    wavs = glob.glob(os.path.join(outdir, "*-pred.wav"))
    assert len(mels) == 2 and len(specs) == 2 and len(aligns) == 2 and len(wavs) == 2
    m = np.load(mels[0])
    assert m.ndim == 2 and m.shape[1] == 20 and np.isfinite(m).all()
    a = np.load(aligns[0])
    assert a.ndim == 2 and np.isfinite(a).all()
    from semi_tts_tpu.data import wavio

    w, sr = wavio.read(wavs[0])
    assert sr == 22050 and w.shape[1] > 1000


@pytest.mark.parametrize("mesh_arg", ["2x1", "1x2"])
def test_gen_specgram_inference_on_mesh(supervised_run, mesh_arg):
    """Inference solvers honor --mesh: a DP2 run (batch split across chips)
    and a TP2 run (weights split across chips — the lever that halves the
    per-chip weight streaming the AR decode is bound by) both write the same
    artifacts as the single-device run (per-utterance decode has no
    cross-batch math, so outputs must agree to float tolerance)."""
    root, cfg, paras, solver = supervised_run
    ckpts = sorted(glob.glob(os.path.join(solver.ckpdir, "*.pth")))
    from semi_tts_tpu.train.gen_specgram import SpecgramGenerator

    single_dir = os.path.join(root, "log", SpecgramGenerator(
        cfg, make_paras(root, load=ckpts[-1]), "test").exp_name)
    paras2 = make_paras(root, load=ckpts[-1], mesh=mesh_arg,
                        logdir=os.path.join(root, "log_mesh_" + mesh_arg))
    gen = SpecgramGenerator(cfg, paras2, "test")
    gen.load_data()
    gen.set_model()
    d, m = (int(s) for s in mesh_arg.split("x"))
    assert gen.mesh is not None and gen.mesh.shape["data"] == d
    assert gen.mesh.shape["model"] == m
    gen.exec()
    outdir = gen.logdir + "_%dk" % (gen.step // 1000)
    mels = sorted(glob.glob(os.path.join(outdir, "*-mel.npy")))
    assert len(mels) == 2
    # must match the single-device artifacts from test_gen_specgram_inference
    ref_dir = single_dir + "_%dk" % (gen.step // 1000)
    for m in mels:
        ref = os.path.join(ref_dir, os.path.basename(m))
        if os.path.exists(ref):
            np.testing.assert_allclose(np.load(m), np.load(ref), atol=1e-5)


def test_resume_from_checkpoint(supervised_run):
    root, cfg, paras, solver = supervised_run
    ckpts = sorted(glob.glob(os.path.join(solver.ckpdir, "*.pth")))
    from semi_tts_tpu.train.train_vqvae import VqvaeTrainer

    cfg2 = dict(cfg)
    cfg2["hparas"] = dict(cfg["hparas"], max_step=solver.step + 1, valid_step=10**6)
    paras2 = make_paras(root, load=ckpts[-1])
    s2 = VqvaeTrainer(cfg2, paras2, "train")
    s2.load_data()
    s2.set_model()
    assert s2.step >= 1  # resumed
    # best-metric watermarks travel in the checkpoint `extra` so a resumed
    # run cannot re-checkpoint worse-than-best models (improves on the
    # reference, which restores only model/optim/step). The loaded ckpt
    # carries the watermarks as of ITS save time.
    from semi_tts_tpu.train.checkpoint import load_checkpoint

    extra = load_checkpoint(ckpts[-1])["extra"]
    assert extra is not None and "best_tts_loss" in extra and "best_per" in extra
    assert s2.best_tts_loss == extra["best_tts_loss"] < 100.0
    assert s2.best_per == extra["best_per"]
    s2.exec()
    assert s2.step >= s2.max_step


def test_semi_supervised_cycles(tmp_path):
    """4 steps with l2 codebook + unpaired speech & text: exercises the
    speech-first and text-first compiled variants."""
    root = str(tmp_path)
    cfg = tiny_config(root, bone="l2", unpair_speech=10.0, unpair_text=1.0,
                      max_step=4, valid_step=100, separate_postnet=True)
    paras = make_paras(root)
    from semi_tts_tpu.train.train_vqvae import VqvaeTrainer

    solver = VqvaeTrainer(cfg, paras, "train")
    solver.load_data()
    solver.set_model()
    solver.exec()
    assert solver.step >= 4
    import jax

    leaves = jax.tree_util.tree_leaves(solver.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_asr_only_trainer(tmp_path):
    root = str(tmp_path)
    cfg = tiny_config(root, bone="seperate", max_step=2, valid_step=2)
    paras = make_paras(root, store_best_per=True)
    from semi_tts_tpu.train.train_asr import AsrTrainer

    solver = AsrTrainer(cfg, paras, "train")
    solver.load_data()
    solver.set_model()
    solver.exec()
    assert solver.step >= 2


def test_asr_decode_solver(supervised_run):
    root, cfg, paras, solver = supervised_run
    ckpts = sorted(glob.glob(os.path.join(solver.ckpdir, "*.pth")))
    from semi_tts_tpu.train.asr_decode import VqvaeDecoder

    paras2 = make_paras(root, load=ckpts[-1])
    dec = VqvaeDecoder(cfg, paras2, "test")
    dec.load_data()
    dec.set_model()
    dec.exec()
    hyp = os.path.join(dec.logdir + "_decode", "hyp.tsv")
    assert os.path.exists(hyp)
    lines = open(hyp).read().strip().split("\n")
    assert lines[0] == "id\thyp" and len(lines) == 3  # header + 2 test utts


def test_gen_gt_specgram_solver(supervised_run):
    root, cfg, paras, solver = supervised_run
    from semi_tts_tpu.train.gen_gt_specgram import SpecgramGenerator as GT

    paras2 = make_paras(root, gen_wav=False)
    gt = GT(cfg, paras2, "test")
    gt.load_data()
    gt.set_model()
    gt.exec()
    outdir = gt.logdir + "_gt"
    mels = glob.glob(os.path.join(outdir, "*-mel.npy"))
    assert len(mels) == 2
    m = np.load(mels[0])
    assert m.ndim == 2 and m.shape[1] == 20 and np.isfinite(m).all()
    assert (m >= 0).all() and (m <= 1).all()  # normalized dB features


def test_deterministic_seeding(tmp_path):
    """Same seed -> identical params after 2 steps (determinism knobs,
    main.py:9-11,44-47 of the reference)."""
    from semi_tts_tpu.train.train_vqvae import VqvaeTrainer
    import jax

    outs = []
    for run in range(2):
        root = str(tmp_path / f"r{run}")
        os.makedirs(root)
        cfg = tiny_config(root, bone="seperate", max_step=2, valid_step=10**6)
        paras = make_paras(root)
        solver = VqvaeTrainer(cfg, paras, "train")
        solver.load_data()
        solver.set_model()
        solver.exec()
        outs.append([np.asarray(l) for l in jax.tree_util.tree_leaves(solver.params)])
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)
