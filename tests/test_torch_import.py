"""Reference-checkpoint import (`semi_tts_tpu/train/torch_import.py`).

Ground truth: the ACTUAL reference implementation — we instantiate
`/root/reference`'s `src.vqvae.VQVAE` (torch), take its state_dict, convert,
and require (a) the exact pytree structure `vqvae_init` produces, (b)
value-identical leaves, and (c) a working forward pass on the imported
weights. Skipped when the reference snapshot isn't present.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")),
    reason="reference snapshot not available")


def _build_reference_pair(prenet_dropout=None):
    """The reference VQVAE (full size, the semi-multi-spkr config) and the
    matching framework cfg/phn_attr. ``prenet_dropout`` overrides the
    config's value on BOTH sides (0.0 makes every forward deterministic —
    the reference's prenet dropout never turns off, `src/module.py:339`)."""
    import copy

    import torch  # noqa: F401  (reference needs it importable)

    sys.path.insert(0, REF)
    # the reference's util module imports optional deps we don't ship.
    # Remove the stubs afterwards (only those WE added): leaking an empty
    # `soundfile` into sys.modules flips optional-dependency gates elsewhere
    # (solver.write_log skips audio logging when soundfile is absent) for
    # every later test in the process.
    stubbed = [m for m in ("editdistance", "soundfile") if m not in sys.modules]
    for m in stubbed:
        sys.modules[m] = types.ModuleType(m)
    try:
        from src.vqvae import VQVAE
    finally:
        sys.path.remove(REF)
        for m in stubbed:
            sys.modules.pop(m, None)

    import yaml

    import __graft_entry__ as g
    from semi_tts_tpu.models import vqvae as V
    from semi_tts_tpu.utils.metrics import read_phn_attr

    ycfg = yaml.safe_load(open(g._repo("config", "semi-multi-spkr-paired-data.yaml")))
    mc = copy.deepcopy(ycfg["model"])
    mc["codebook"]["phn_attr_pth"] = g._repo("data", "phn_attr.csv")
    for k in ("pretrained_asr", "pretrained_emb", "pretrained_tts"):
        mc.pop(k, None)
    if prenet_dropout is not None:
        mc["decoder"]["decoder"]["prenet_dropout"] = prenet_dropout
    torch_mc = copy.deepcopy(mc)  # both ctors consume/pop their config dict
    phn_attr = read_phn_attr(mc["codebook"]["phn_attr_pth"])
    cfg = V.config_from_yaml(mc, n_mels=80, linear_dim=1025, vocab_size=43,
                             n_spkr=109, attr_dim=phn_attr.shape[1])
    torch_model = VQVAE(80, 1025, 43, 109, **torch_mc)
    return torch_model, cfg, phn_attr


@pytest.fixture(scope="module")
def ref_vqvae():
    return _build_reference_pair()


@pytest.fixture(scope="module")
def ref_vqvae_nodrop():
    """Reference + our config with prenet_dropout=0: the full forward is
    deterministic, so model-level outputs can be compared exactly."""
    return _build_reference_pair(prenet_dropout=0.0)


def test_state_dict_converts_to_init_structure(ref_vqvae):
    from semi_tts_tpu.models.vqvae import vqvae_init
    from semi_tts_tpu.train.torch_import import convert_state_dict

    torch_model, cfg, phn_attr = ref_vqvae
    params, state = convert_state_dict(torch_model.state_dict(), cfg, phn_attr)

    want_p, want_s = vqvae_init(jax.random.PRNGKey(0), cfg, phn_attr)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(want_p)
    assert jax.tree_util.tree_structure(state) == jax.tree_util.tree_structure(want_s)
    for got, want in zip(jax.tree_util.tree_leaves(params),
                         jax.tree_util.tree_leaves(want_p)):
        assert got.shape == want.shape and got.dtype == want.dtype

    # spot-check exact values through distinct mapping branches
    sd = torch_model.state_dict()
    np.testing.assert_array_equal(
        np.asarray(params["tts"]["decoder"]["query_rnn"]["w_ih"]),
        sd["tts.decoder.query_rnn.weight_ih"].numpy())
    np.testing.assert_array_equal(
        np.asarray(params["asr"]["rnn"][1]["bwd"]["w_hh"]),
        sd["asr.rnn.weight_hh_l1_reverse"].numpy())
    np.testing.assert_array_equal(
        np.asarray(params["tts"]["postnet"]["cbhg"]["gru"]["bwd"]["b_hh"]),
        sd["tts.postnet.0.gru.bias_hh_l0_reverse"].numpy())
    np.testing.assert_array_equal(
        np.asarray(state["asr"]["bn"][3]["var"]),
        sd["asr.layer3.bn.running_var"].numpy())
    np.testing.assert_array_equal(
        np.asarray(params["codebook"]["learnable_table"]),
        sd["codebook.learnable_table"].numpy())


def test_embed_text_matches_reference_inference(ref_vqvae):
    """Same text ids through the imported codebook == the torch codebook."""
    import torch

    from semi_tts_tpu.models import vqvae as V
    from semi_tts_tpu.train.torch_import import convert_state_dict

    torch_model, cfg, phn_attr = ref_vqvae
    params, state = convert_state_dict(torch_model.state_dict(), cfg, phn_attr)

    txt = np.array([[3, 7, 11, 0], [5, 5, 9, 2]], np.int32)
    ours = np.asarray(V.embed_text(params, cfg, jnp.asarray(phn_attr),
                                   jnp.asarray(txt)))
    with torch.no_grad():
        want = torch_model.codebook.inference(torch.from_numpy(txt).long()).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-5)


def test_imported_params_run_text_to_speech(ref_vqvae):
    from semi_tts_tpu.models import vqvae as V
    from semi_tts_tpu.train.torch_import import convert_state_dict

    torch_model, cfg, phn_attr = ref_vqvae
    params, state = convert_state_dict(torch_model.state_dict(), cfg, phn_attr)

    txt = jnp.asarray(np.array([[3, 7, 11, 5, 0, 0]], np.int32))
    lat = V.embed_text(params, cfg, jnp.asarray(phn_attr), txt)
    sid = jnp.asarray(np.array([4], np.int32))
    mel, lin, align, stop, _ = V.text_to_speech(
        params, state, jax.random.PRNGKey(0), cfg, lat, sid,
        decode_steps=8, train=False, teacher=None, tf_rate=0.0)
    assert np.isfinite(np.asarray(mel)).all()
    assert np.isfinite(np.asarray(lin)).all()


def test_strict_flags_unconsumed_and_missing(ref_vqvae):
    from semi_tts_tpu.train.torch_import import StateDictMismatch, convert_state_dict

    torch_model, cfg, phn_attr = ref_vqvae
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}

    extra = dict(sd, **{"tts.decoder.surprise.weight": np.zeros((2, 2), np.float32)})
    with pytest.raises(StateDictMismatch, match="unconsumed"):
        convert_state_dict(extra, cfg, phn_attr)

    missing = dict(sd)
    missing.pop("asr.rnn.weight_ih_l0")
    with pytest.raises(StateDictMismatch, match="missing"):
        convert_state_dict(missing, cfg, phn_attr)


def test_import_solver_triple(tmp_path, ref_vqvae):
    """The reference's on-disk triple round-trips into our npz checkpoint."""
    import torch

    from semi_tts_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from semi_tts_tpu.train.torch_import import import_reference_checkpoint

    torch_model, cfg, phn_attr = ref_vqvae
    pth = tmp_path / "best_tts_loss.pth"
    torch.save({"model": torch_model.state_dict(), "optimizer": {},
                "global_step": 4321}, pth)

    ckpt = import_reference_checkpoint(str(pth), cfg, phn_attr)
    assert ckpt["global_step"] == 4321 and ckpt["optimizer"] is None

    out = tmp_path / "imported.pth"
    save_checkpoint(str(out), params=ckpt["model"], state=ckpt["state"],
                    opt_state=None, step=ckpt["global_step"])
    back = load_checkpoint(str(out))
    assert back["global_step"] == 4321
    np.testing.assert_array_equal(
        np.asarray(back["model"]["spkr_embed"]),
        torch_model.state_dict()["spkr_embed.weight"].numpy())


def test_cli_import_then_serve(tmp_path, ref_vqvae):
    """Migration e2e: reference .pth --CLI--> our checkpoint --> TTSServer
    synthesizes from the imported weights."""
    import torch

    import __graft_entry__ as g

    sys.path.insert(0, g._repo("util_cli"))
    try:
        import import_reference_ckpt as cli
    finally:
        sys.path.remove(g._repo("util_cli"))

    torch_model, cfg, phn_attr = ref_vqvae
    pth = tmp_path / "ref.pth"
    torch.save({"model": torch_model.state_dict(), "optimizer": {},
                "global_step": 7}, pth)
    out = tmp_path / "imported.pth"
    cli.main(["--config", g._repo("config", "semi-multi-spkr-paired-data.yaml"),
              "--torch-ckpt", str(pth), "--output", str(out)])

    from semi_tts_tpu.serve import TTSServer

    server = TTSServer.from_checkpoint(
        g._repo("config", "semi-multi-spkr-paired-data.yaml"), str(out),
        step_bucket=4)
    np.testing.assert_array_equal(
        np.asarray(server.params["spkr_embed"]),
        torch_model.state_dict()["spkr_embed.weight"].numpy())
    wav = server.synthesize(np.array([[3, 7, 0, 0]], np.int32),
                            np.array([1], np.int32), decode_steps=4)
    assert wav.shape[0] == 1 and np.isfinite(wav).all()


# ---------------------------------------------------------------------------
# Full-model golden forward parity on imported weights: the BASELINE.md north
# star ("MCD within 0.1 dB of the PyTorch reference") gated at MODEL level,
# not just the featurizer.


def test_speech_to_text_matches_reference_eval(ref_vqvae):
    """Same mel through the imported ASR encoder + codebook == the reference
    in eval mode (deterministic: dropout off, BN running stats —
    `src/asr.py:46-64`, `src/embed.py:105-147`). Gates both the CTC
    posteriors and the quantized latents."""
    import torch

    from semi_tts_tpu.models import vqvae as V
    from semi_tts_tpu.train.torch_import import convert_state_dict

    torch_model, cfg, phn_attr = ref_vqvae
    params, state = convert_state_dict(torch_model.state_dict(), cfg, phn_attr)
    torch_model.eval()

    rng = np.random.RandomState(7)
    mel = rng.uniform(0.0, 1.0, size=(2, 96, 80)).astype(np.float32)
    with torch.no_grad():
        enc = torch_model.asr(torch.from_numpy(mel))
        p_ref, q_ref, _, _ = torch_model.codebook(enc, 0)

    p, q, post, _ = V.speech_to_text(
        params, state, jax.random.PRNGKey(0), cfg, jnp.asarray(phn_attr),
        jnp.asarray(mel), paired_bs=2, train=False)
    assert post is None  # asr_postnet_weight=0 in this config
    np.testing.assert_allclose(np.asarray(p), p_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q), q_ref.numpy(), atol=1e-4)


def test_tts_teacher_forced_matches_reference_eval(ref_vqvae_nodrop):
    """Text encoder + full teacher-forced decode + CBHG postnet on imported
    weights == the reference (`src/module.py:140-317,558-622`,
    `src/tts.py:35-52`), with prenet_dropout pinned to 0 on both sides so
    the coins the reference never stops flipping are out of the picture."""
    import torch

    from semi_tts_tpu.models import vqvae as V
    from semi_tts_tpu.train.torch_import import convert_state_dict

    torch_model, cfg, phn_attr = ref_vqvae_nodrop
    params, state = convert_state_dict(torch_model.state_dict(), cfg, phn_attr)
    torch_model.eval()

    rng = np.random.RandomState(11)
    B, U, T = 2, 8, 24  # 8 macro-steps of n_frames_per_step=3
    text = np.zeros((B, U), np.int32)
    text[:, : U - 1] = rng.randint(3, 43, size=(B, U - 1))
    sid = rng.randint(0, 109, size=B).astype(np.int32)
    teacher = rng.uniform(0.0, 1.0, size=(B, T, 80)).astype(np.float32)

    with torch.no_grad():
        lat_ref = torch_model.codebook.inference(torch.from_numpy(text).long())
        spkr_ref = torch_model.spkr_embed(torch.from_numpy(sid).long())
        mel_ref, lin_ref, align_ref, stop_ref = torch_model.tts(
            lat_ref, None, torch.from_numpy(teacher), spkr_ref, tf_rate=1.0)

    lat = V.embed_text(params, cfg, jnp.asarray(phn_attr), jnp.asarray(text))
    mel, lin, align, stop, _ = V.text_to_speech(
        params, state, jax.random.PRNGKey(0), cfg, lat, jnp.asarray(sid),
        decode_steps=T // cfg.n_frames_per_step, train=False,
        teacher=jnp.asarray(teacher), tf_rate=1.0)

    np.testing.assert_allclose(np.asarray(lat), lat_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mel), mel_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lin), lin_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(align), align_ref.numpy(), atol=1e-4)


def test_tts_free_run_mcd_vs_reference(ref_vqvae_nodrop, ref_vqvae):
    """Full tf_rate=0 synthesis parity, the north-star metric. With
    prenet_dropout=0 both AR loops are deterministic and must agree to MCD
    << 0.1 dB (divergence only from fp accumulation feeding back through 12
    AR steps). With the real config the prenet coins differ by construction
    (`src/module.py:330-340` — dropout never off), so that pair's MCD is
    REPORTED and gated only loosely."""
    import torch

    from semi_tts_tpu.models import vqvae as V
    from semi_tts_tpu.train.torch_import import convert_state_dict
    from semi_tts_tpu.utils.metrics import mcd

    rng = np.random.RandomState(13)
    B, U = 2, 8
    text = np.zeros((B, U), np.int32)
    text[:, : U - 1] = rng.randint(3, 43, size=(B, U - 1))
    sid = rng.randint(0, 109, size=B).astype(np.int32)
    n_frames = 36  # 12 macro-steps

    def synthesize_pair(bundle, key):
        torch_model, cfg, phn_attr = bundle
        params, state = convert_state_dict(torch_model.state_dict(), cfg, phn_attr)
        torch_model.eval()
        with torch.no_grad():
            lat_ref = torch_model.codebook.inference(torch.from_numpy(text).long())
            spkr_ref = torch_model.spkr_embed(torch.from_numpy(sid).long())
            mel_ref, _, _, _ = torch_model.tts(
                lat_ref, None, n_frames, spkr_ref, tf_rate=0.0)
        lat = V.embed_text(params, cfg, jnp.asarray(phn_attr), jnp.asarray(text))
        mel, _, _, _, _ = V.text_to_speech(
            params, state, key, cfg, lat, jnp.asarray(sid),
            decode_steps=n_frames // cfg.n_frames_per_step, train=False,
            teacher=None, tf_rate=0.0)
        return np.asarray(mel), mel_ref.numpy()

    ours, ref = synthesize_pair(ref_vqvae_nodrop, jax.random.PRNGKey(0))
    d_det = float(np.mean([mcd(ours[i], ref[i]) for i in range(B)]))
    assert d_det < 0.1, f"deterministic free-run MCD {d_det} dB >= 0.1 dB"

    ours_s, ref_s = synthesize_pair(ref_vqvae, jax.random.PRNGKey(1))
    d_sto = float(np.mean([mcd(ours_s[i], ref_s[i]) for i in range(B)]))
    print(f"free-run MCD vs reference: deterministic={d_det:.5f} dB, "
          f"with prenet dropout (unpinnable coins)={d_sto:.3f} dB")
    assert np.isfinite(d_sto)
