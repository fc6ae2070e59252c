"""Serving API (`semi_tts_tpu/serve.py`): the online counterpart of the
offline `--gen-specgram --gen-wav` pipeline (`bin/gen_specgram.py:89-129` +
`util/gen_wav_from_specgram.py:37-57`)."""

from __future__ import annotations

import os
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from helpers import tiny_config
from semi_tts_tpu.models import vqvae as V
from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer
from semi_tts_tpu.serve import TTSServer, serving_stages
from semi_tts_tpu.train.checkpoint import save_checkpoint
from semi_tts_tpu.utils.metrics import read_phn_attr


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """A tiny trained-shape model saved as a checkpoint + its config yaml,
    loaded back through `TTSServer.from_checkpoint` (the deployment path)."""
    root = tmp_path_factory.mktemp("serve")
    cfg_dict = tiny_config(str(root), bone="l2")
    cfg_path = join(str(root), "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    model_cfg = dict(cfg_dict["model"])
    phn_attr = read_phn_attr(model_cfg["codebook"]["phn_attr_pth"])
    cfg = V.config_from_yaml(model_cfg, n_mels=20, linear_dim=257,
                             vocab_size=43, n_spkr=3,
                             attr_dim=phn_attr.shape[1])
    params, state = V.vqvae_init(jax.random.PRNGKey(0), cfg, jnp.asarray(phn_attr))
    ckpt_path = join(str(root), "best_tts_loss.pth")
    save_checkpoint(ckpt_path, params=params, state=state, opt_state={"empty": np.zeros(1)},
                    step=1234)
    server = TTSServer.from_checkpoint(cfg_path, ckpt_path)
    return server, cfg, jnp.asarray(phn_attr), params, state


def _requests(B=2, U=9, seed=0):
    rng = np.random.RandomState(seed)
    text = np.zeros((B, U), np.int32)
    for b in range(B):
        n = rng.randint(4, U - 1)
        text[b, :n] = rng.randint(3, 43, size=n)
    sid = rng.randint(0, 3, size=B).astype(np.int32)
    return text, sid


def test_serving_stages_shapes(served):
    server, cfg, phn_attr, params, state = served
    feat = server.featurizer
    synth, vocode = serving_stages(cfg, feat, phn_attr, decode_steps=10)
    text, sid = _requests()
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    amp = synth(params, state, jnp.asarray(text), jnp.asarray(sid), k1)
    T = 10 * cfg.n_frames_per_step
    assert amp.shape == (2, T, feat.cfg.num_freq)
    assert np.isfinite(np.asarray(amp)).all() and float(jnp.min(amp)) >= 0.0
    wav = vocode(amp, k2)
    assert wav.shape[0] == 2 and wav.ndim == 2
    assert np.isfinite(np.asarray(wav)).all()


def test_decode_length_policy(served):
    server, *_ = served
    text, _ = _requests(U=9)
    steps = server.decode_steps_for(text)
    # bucketed to a multiple of step_bucket and >= the FRAME_PHN_RATIO+margin rule
    assert steps % server.step_bucket == 0
    n_tok = int((text != 0).sum(-1).max()) + 1
    r = server.cfg.n_frames_per_step
    assert steps * r >= int(n_tok * V.FRAME_PHN_RATIO) + 40
    # program cache: same bucket -> same compiled stages object
    assert server.stages(steps) is server.stages(steps)


def test_synthesize_roundtrip_and_determinism(served):
    server, *_ = served
    text, sid = _requests()
    key = jax.random.PRNGKey(3)
    wav1 = server.synthesize(text, sid, key)
    wav2 = server.synthesize(text, sid, key)
    assert wav1.shape[0] == 2 and np.isfinite(wav1).all()
    np.testing.assert_array_equal(wav1, wav2)  # same key -> same request result


def test_synthesize_full_artifacts(served):
    """`synthesize_full` returns the offline solver's artifact set with the
    per-utterance alignment crop of `{id}-align.npy`
    (`bin/gen_specgram.py:112-124`), and its waveform/amp agree with the
    throughput-path stages under the same key."""
    server, cfg, *_ = served
    text, sid = _requests()
    key = jax.random.PRNGKey(5)
    out = server.synthesize_full(text, sid, key)
    steps = server.decode_steps_for(text)
    T = steps * cfg.n_frames_per_step
    assert out["mel"].shape == (2, T, 20)
    assert out["linear"].shape == (2, T, 257)
    enc = (text != 0).sum(-1)
    for i in range(2):
        dec = int(enc[i] * V.FRAME_PHN_RATIO) // cfg.n_frames_per_step
        assert out["align"][i].shape == (dec, enc[i])
    wav_fast = server.synthesize(text, sid, key)
    np.testing.assert_allclose(out["wav"], wav_fast, rtol=0, atol=1e-4)
    # and the two synthesis jits produce the same amplitude spectrogram
    synth, _ = server.stages(steps)
    k1, _ = jax.random.split(key)
    amp_fast = np.asarray(synth(server.params, server.state,
                                jnp.asarray(text), jnp.asarray(sid), k1))
    amp_full = np.asarray(server._full_stage(steps)(
        server.params, server.state, jnp.asarray(text), jnp.asarray(sid), k1)[3])
    np.testing.assert_allclose(amp_full, amp_fast, rtol=1e-5, atol=1e-6)


def test_server_mesh_sharded_equals_single(served):
    """A DP2xTP2-sharded server returns the same waveforms as the unsharded
    one (the serving counterpart of the train-step equality test)."""
    from semi_tts_tpu.parallel.mesh import make_mesh

    server, cfg, phn_attr, params, state = served
    mesh = make_mesh(4, model_parallel=2)
    sharded = TTSServer(cfg, server.featurizer, phn_attr, params, state,
                        mesh=mesh, step_bucket=server.step_bucket)
    text, sid = _requests()
    key = jax.random.PRNGKey(11)
    steps = server.decode_steps_for(text)
    k1, _ = jax.random.split(key)
    synth, _ = server.stages(steps)
    ssynth, _ = sharded.stages(steps)
    t, s = jnp.asarray(text), jnp.asarray(sid)
    ref_amp = np.asarray(synth(server.params, server.state, t, s, k1))
    tt, ss = sharded._place(text, sid)
    got_amp = np.asarray(ssynth(sharded.params, sharded.state, tt, ss, k1))
    np.testing.assert_allclose(got_amp, ref_amp, rtol=5e-3, atol=1e-5)
    # and the full request path executes on the mesh end-to-end
    wav = sharded.synthesize(text, sid, key)
    assert wav.shape[0] == 2 and np.isfinite(wav).all()


def test_program_cache_eviction_recompiles(served):
    """The per-instance program cache is BOUNDED (a long-lived endpoint fed
    adversarial text lengths must not grow compiled programs without limit):
    eviction drops the LRU program and a re-requested bucket recompiles to
    an identical result."""
    server, cfg, phn_attr, params, state = served
    small = TTSServer(cfg, server.featurizer, phn_attr, params, state,
                      program_cache_size=1)
    text, sid = _requests()
    key = jax.random.PRNGKey(17)
    wav_a = small.synthesize(text, sid, key, decode_steps=4)
    first = small.stages(4)
    small.synthesize(text, sid, key, decode_steps=8)  # evicts the 4-bucket
    assert ("stages", 4) not in small._programs
    assert len(small._programs) == 1
    wav_b = small.synthesize(text, sid, key, decode_steps=4)  # recompile
    assert small.stages(4) is not first
    np.testing.assert_array_equal(wav_a, wav_b)


def test_server_int8_with_tp_mesh(served):
    """int8 weight streaming COMPOSED with a TP2 mesh — the configuration
    the ICI-economics hypothesis (serve.py `qweights` note) is about. This
    gates correctness of the composition only; whether int8 actually wins
    over ICI-sharded weights is unmeasured on real multi-chip hardware
    (docs/PERFORMANCE.md)."""
    from semi_tts_tpu.parallel.mesh import make_mesh

    server, cfg, phn_attr, params, state = served
    q1 = TTSServer(cfg, server.featurizer, phn_attr, params, state,
                   int8_weights=True)
    mesh = make_mesh(4, model_parallel=2)
    qm = TTSServer(cfg, server.featurizer, phn_attr, params, state,
                   mesh=mesh, int8_weights=True)
    text, sid = _requests()
    steps = server.decode_steps_for(text)
    k1, _ = jax.random.split(jax.random.PRNGKey(19))
    synth1, _ = q1.stages(steps)
    synthm, _ = qm.stages(steps)
    a = np.asarray(synth1(q1.params, q1.state,
                          jnp.asarray(text), jnp.asarray(sid), k1))
    tt, ss = qm._place(text, sid)
    b = np.asarray(synthm(qm.params, qm.state, tt, ss, k1))
    assert np.isfinite(b).all()
    # same math, different placement: mesh reductions reorder float sums
    np.testing.assert_allclose(b, a, rtol=5e-3, atol=1e-4)


def test_server_int8_weights_quality(served):
    """The int8 weight-streaming serving path (off by default; see
    docs/PERFORMANCE.md for why) stays within quantization tolerance."""
    server, cfg, phn_attr, params, state = served
    q = TTSServer(cfg, server.featurizer, phn_attr, params, state,
                  int8_weights=True)
    text, sid = _requests()
    key = jax.random.PRNGKey(13)
    steps = server.decode_steps_for(text)
    synth, _ = server.stages(steps)
    qsynth, _ = q.stages(steps)
    k1, _ = jax.random.split(key)
    a = np.asarray(synth(server.params, server.state, jnp.asarray(text), jnp.asarray(sid), k1))
    b = np.asarray(qsynth(q.params, q.state, jnp.asarray(text), jnp.asarray(sid), k1))
    assert np.isfinite(b).all()
    assert np.abs(a - b).mean() < 5e-2
