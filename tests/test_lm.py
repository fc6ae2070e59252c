"""LM pretraining components: shapes, causality, loss decrease, prior math."""

import jax
import jax.numpy as jnp
import numpy as np

from semi_tts_tpu.models import lm as L

V, D = 11, 8


def test_rnnlm_shapes_and_causality():
    p = L.rnnlm_init(jax.random.PRNGKey(0), V, D, dim=12, n_layers=2)
    txt = jnp.asarray(np.random.RandomState(0).randint(0, V, (2, 7)))
    out = L.rnnlm_apply(p, jax.random.PRNGKey(1), txt, train=False)
    assert out.shape == (2, 7, V)
    np.testing.assert_allclose(np.asarray(jnp.exp(out)).sum(-1), 1.0, atol=1e-4)
    # causality: changing a future token must not change earlier outputs
    txt2 = txt.at[:, 5].set((txt[:, 5] + 1) % V)
    out2 = L.rnnlm_apply(p, jax.random.PRNGKey(1), txt2, train=False)
    np.testing.assert_allclose(np.asarray(out[:, :5]), np.asarray(out2[:, :5]), atol=1e-6)
    assert not np.allclose(np.asarray(out[:, 5:]), np.asarray(out2[:, 5:]))


def test_textlm_trains_codebook():
    import optax

    p = L.textlm_init(jax.random.PRNGKey(0), V, D, rnn_dim=16)
    rng = np.random.RandomState(1)
    txt = jnp.asarray(rng.randint(1, V, (8, 10)))
    tlen = jnp.full((8,), 10)
    tx = optax.adam(1e-2)
    opt = tx.init(p)
    loss0 = float(L.textlm_loss(p, txt, tlen))

    @jax.jit
    def step(p, opt):
        l, g = jax.value_and_grad(L.textlm_loss)(p, txt, tlen)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(p, up), opt, l

    table0 = np.asarray(p["learnable_table"]).copy()
    for _ in range(30):
        p, opt, l = step(p, opt)
    assert float(l) < loss0, (float(l), loss0)
    assert not np.allclose(np.asarray(p["learnable_table"]), table0)  # codebook moved


def test_denoising_lm_shapes():
    p = L.denoising_lm_init(jax.random.PRNGKey(0), V, 6, D, channels=10, n_conv=2)
    txt = jnp.asarray(np.random.RandomState(2).randint(0, V, (3, 9)))
    out = L.denoising_lm_apply(p, txt)
    assert out.shape == (3, 9, V)
    assert np.isfinite(np.asarray(out)).all()


def test_audiolm_pretrain_decoder():
    from semi_tts_tpu.models.decoder import DecoderConfig

    dec = DecoderConfig(n_mels=6, n_frames_per_step=2, enc_embed_dim=8, spkr_embed_dim=4,
                        prenet_dim=6, query_rnn_dim=10, dec_rnn_dim=10, attn_dim=6,
                        n_location_filters=3, location_kernel_size=5)
    params, state, dec_cfg = L.audiolm_init(jax.random.PRNGKey(0), dec, linear_dim=13)
    mel = jnp.asarray(np.random.RandomState(3).rand(2, 8, 6).astype(np.float32))
    mel_pred, lin_pred, _ = L.audiolm_apply(params, state, jax.random.PRNGKey(1), mel,
                                            dec_cfg=dec_cfg, train=True)
    assert mel_pred.shape == (2, 8, 6) and lin_pred.shape == (2, 8, 13)
    assert np.isfinite(np.asarray(mel_pred)).all()


def test_ngram_prior_token_kld():
    prior = L.NgramPrior(vocab_size=V, n_gram=2, weight=1e-3, reduction="token")
    table = jnp.asarray(np.random.RandomState(4).dirichlet(np.ones(V), size=V).astype(np.float32))
    enc_prob = jnp.asarray(np.random.RandomState(5).dirichlet(np.ones(V), size=(2, 6)).astype(np.float32))
    enc_len = jnp.asarray([6, 4])
    kld = float(prior.compute_loss(table, enc_prob, enc_len))
    assert np.isfinite(kld) and kld > 0
    uni = L.NgramPrior(vocab_size=V, n_gram=1, weight=1e-3, reduction="sentence")
    kld1 = float(uni.compute_loss(jnp.asarray(np.ones(V) / V, jnp.float32), enc_prob, enc_len))
    assert np.isfinite(kld1) and kld1 > 0
