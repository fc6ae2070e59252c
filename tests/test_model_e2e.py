"""Composite model integration: encoder/decoder/TTS/VQVAE forward shapes,
teacher-forcing semantics, and gradient flow."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_tts_tpu.models.asr import ASRConfig
from semi_tts_tpu.models.decoder import DecoderConfig, decoder_apply, decoder_init
from semi_tts_tpu.models.embed import CodebookConfig
from semi_tts_tpu.models.tts import TTSConfig
from semi_tts_tpu.models import vqvae as V
from semi_tts_tpu.ops.quantize import padded_concat, trim_merge_segments

# small test-size config (same topology, fewer units)
DEC = DecoderConfig(n_mels=8, n_frames_per_step=3, enc_embed_dim=16, spkr_embed_dim=6,
                    prenet_dim=12, query_rnn_dim=20, dec_rnn_dim=20, attn_dim=10,
                    n_location_filters=4, location_kernel_size=7)
CFG = V.VQVAEConfig(
    n_mels=8, linear_dim=11, vocab_size=9, n_spkr=4, spkr_latent_dim=6,
    max_frames_per_phn=3,
    encoder=ASRConfig(in_dim=8, out_dim=5, dim=12, kernel=(3, 4, 3), stride=(1, 2, 1),
                      residual=(0, 0, 1), rnn_layers=1, rnn_dim=6),
    codebook=CodebookConfig(vocab_size=9, latent_dim=5, use_phn_attr=True, attr_dim=4, proj_attr=2),
    tts=TTSConfig(n_mels=8, linear_dim=11, in_embed_dim=5, spkr_embed_dim=6,
                  enc_n_conv=2, enc_kernel_size=5, enc_rnn_layer=1, enc_embed_dim=16,
                  decoder=dataclasses.replace(DEC, enc_embed_dim=16)),
)


@pytest.fixture(scope="module")
def model():
    attr = jnp.asarray(np.random.RandomState(0).rand(9, 4).astype(np.float32))
    params, state = V.vqvae_init(jax.random.PRNGKey(0), CFG, attr)
    return params, state, attr


def test_decoder_shapes_and_inference_mode(model):
    p = decoder_init(jax.random.PRNGKey(1), DEC)
    B, L = 2, 7
    mem = jnp.asarray(np.random.RandomState(1).randn(B, L, 16).astype(np.float32))
    spk = jnp.asarray(np.random.RandomState(2).randn(B, 6).astype(np.float32))
    mel, align, stop = decoder_apply(p, jax.random.PRNGKey(2), mem, spk, cfg=DEC,
                                     decode_steps=5, train=False)
    assert mel.shape == (B, 15, 8) and align.shape == (B, 5, L) and stop.shape == (B, 15)
    np.testing.assert_allclose(np.asarray(align).sum(-1), 1.0, atol=1e-5)


def test_decoder_full_teacher_forcing_uses_teacher(model):
    """With tf_rate=1.0 and drop_dec_in=0, dec_in must come from the teacher:
    outputs are then independent of the model's own (perturbed) predictions."""
    p = decoder_init(jax.random.PRNGKey(3), DEC)
    B, L, T = 2, 4, 9
    mem = jnp.asarray(np.random.RandomState(3).randn(B, L, 16).astype(np.float32))
    spk = jnp.zeros((B, 6))
    teacher = jnp.asarray(np.random.RandomState(4).randn(B, T, 8).astype(np.float32))
    mel1, _, _ = decoder_apply(p, jax.random.PRNGKey(5), mem, spk, cfg=DEC,
                               decode_steps=3, train=False, teacher=teacher, tf_rate=1.0)
    # perturb proj params -> mel_out changes, but since dec_in is teacher-driven
    # the attention trajectory (thus alignment) must be identical
    p2 = jax.tree_util.tree_map(lambda x: x, p)
    p2 = dict(p2)
    p2["proj"] = {"w": p["proj"]["w"] * 2.0, "b": p["proj"]["b"]}
    _, a1, _ = decoder_apply(p, jax.random.PRNGKey(5), mem, spk, cfg=DEC,
                             decode_steps=3, train=False, teacher=teacher, tf_rate=1.0)
    _, a2, _ = decoder_apply(p2, jax.random.PRNGKey(5), mem, spk, cfg=DEC,
                             decode_steps=3, train=False, teacher=teacher, tf_rate=1.0)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_decoder_no_teacher_feeds_own_output(model):
    """With tf_rate ~ 0 the decoder self-feeds: perturbing proj changes the
    alignment trajectory."""
    p = decoder_init(jax.random.PRNGKey(3), DEC)
    B, L = 2, 4
    mem = jnp.asarray(np.random.RandomState(3).randn(B, L, 16).astype(np.float32))
    spk = jnp.zeros((B, 6))
    p2 = dict(p)
    p2["proj"] = {"w": p["proj"]["w"] * 5.0, "b": p["proj"]["b"] + 1.0}
    _, a1, _ = decoder_apply(p, jax.random.PRNGKey(5), mem, spk, cfg=DEC,
                             decode_steps=4, train=False)
    _, a2, _ = decoder_apply(p2, jax.random.PRNGKey(5), mem, spk, cfg=DEC,
                             decode_steps=4, train=False)
    assert not np.allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_speech_to_text_shapes(model):
    params, state, attr = model
    B, T = 3, 12
    mel = jnp.asarray(np.random.RandomState(5).rand(B, T, 8).astype(np.float32))
    p_code, q, post, new_state = V.speech_to_text(
        params, state, jax.random.PRNGKey(6), CFG, attr, mel, paired_bs=B, train=True)
    assert p_code.shape == (B, T // 2, 9)  # time_reduce_factor 2
    assert q.shape == (B, T // 2, 5)
    assert post is None
    np.testing.assert_allclose(np.asarray(p_code).sum(-1), 1.0, atol=1e-5)


def test_text_to_speech_shapes(model):
    params, state, attr = model
    B, Ltxt = 2, 6
    txt = jnp.asarray(np.random.RandomState(7).randint(0, 9, (B, Ltxt)))
    lat = V.embed_text(params, CFG, attr, txt)
    assert lat.shape == (B, Ltxt, 5)
    sid = jnp.asarray([0, 2])
    teacher = jnp.asarray(np.random.RandomState(8).rand(B, 9, 8).astype(np.float32))
    mel, lin, align, stop, _ = V.text_to_speech(
        params, state, jax.random.PRNGKey(9), CFG, lat, sid,
        decode_steps=3, train=True, teacher=teacher, tf_rate=1.0)
    assert mel.shape == (B, 9, 8) and lin.shape == (B, 9, 11)
    assert align.shape == (B, 3, Ltxt) and stop.shape == (B, 9)


def test_full_unpaired_speech_cycle(model):
    """speech->text->speech with pair+unpair packing, as the trainer wires it."""
    params, state, attr = model
    Bp, Bu, T = 2, 2, 12
    rng = np.random.RandomState(10)
    pair_mel = jnp.asarray(rng.rand(Bp, T, 8).astype(np.float32))
    unpair_mel = jnp.asarray(rng.rand(Bu, T, 8).astype(np.float32))
    _, all_mel = padded_concat(pair_mel, unpair_mel)
    p_code, q, _, state2 = V.speech_to_text(
        params, state, jax.random.PRNGKey(11), CFG, attr, all_mel, paired_bs=Bp, train=True)
    unpair_latent, lens, ok = trim_merge_segments(p_code[Bp:], q[Bp:], max_frames_per_phn=3)
    # pack text latents + unpaired latents for TTS
    txt = jnp.asarray(rng.randint(1, 9, (Bp, 5)))
    pair_lat = V.embed_text(params, CFG, attr, txt)
    pbs, all_lat = padded_concat(pair_lat, unpair_latent)
    teacher = jnp.asarray(rng.rand(Bp, 9, 8).astype(np.float32))
    _, all_teacher = padded_concat(teacher, jnp.asarray(rng.rand(Bu, T, 8).astype(np.float32)))
    sid = jnp.asarray([0, 1, 2, 3])
    mel, lin, align, stop, _ = V.text_to_speech(
        params, state2, jax.random.PRNGKey(12), CFG, all_lat, sid,
        decode_steps=all_teacher.shape[1] // 3, train=True,
        teacher=all_teacher, tf_rate=1.0)
    assert mel.shape[0] == Bp + Bu
    assert np.isfinite(np.asarray(mel)).all() and np.isfinite(np.asarray(lin)).all()


def test_grads_flow_end_to_end(model):
    params, state, attr = model
    B, T = 2, 12
    mel_in = jnp.asarray(np.random.RandomState(13).rand(B, T, 8).astype(np.float32))

    def loss_fn(p):
        p_code, q, _, st = V.speech_to_text(p, state, jax.random.PRNGKey(1), CFG, attr,
                                            mel_in, paired_bs=B, train=True)
        mel, lin, _, _, _ = V.text_to_speech(p, st, jax.random.PRNGKey(2), CFG, q,
                                             jnp.asarray([0, 1]), decode_steps=T // 3,
                                             train=True, teacher=mel_in, tf_rate=1.0)
        return jnp.mean((mel - mel_in) ** 2) + jnp.mean(p_code**2)

    g = jax.grad(loss_fn)(params)
    # gradients reach the ASR conv stack, codebook table, and decoder proj
    assert float(jnp.abs(g["asr"]["convs"][0]["w"]).max()) > 0
    assert float(jnp.abs(g["codebook"]["learnable_table"]).max()) > 0
    assert float(jnp.abs(g["tts"]["decoder"]["proj"]["w"]).max()) > 0
    assert float(jnp.abs(g["spkr_embed"]).max()) > 0


def test_speaker_modes_concat_and_add():
    """The 'concat' and 'add' speaker-injection modes (src/module.py:116-120,
    246-250) produce valid outputs and actually condition on the speaker."""
    for mode in ["concat", "add"]:
        cfg = dataclasses.replace(DEC, spkr_embed_mode=mode)
        from semi_tts_tpu.models.decoder import decoder_apply, decoder_init

        p = decoder_init(jax.random.PRNGKey(7), cfg)
        B, L = 2, 5
        mem = jnp.asarray(np.random.RandomState(8).randn(B, L, 16).astype(np.float32))
        spk1 = jnp.asarray(np.random.RandomState(9).randn(B, 6).astype(np.float32))
        spk2 = spk1 + 1.0
        mel1, _, _ = decoder_apply(p, jax.random.PRNGKey(10), mem, spk1, cfg=cfg,
                                   decode_steps=3, train=False)
        mel2, _, _ = decoder_apply(p, jax.random.PRNGKey(10), mem, spk2, cfg=cfg,
                                   decode_steps=3, train=False)
        assert np.isfinite(np.asarray(mel1)).all(), mode
        assert not np.allclose(np.asarray(mel1), np.asarray(mel2)), mode
