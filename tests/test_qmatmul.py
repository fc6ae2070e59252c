"""Int8 weight-streaming matmul (Pallas, interpret mode on CPU) + the
quantized serving-decode path."""

import jax
import jax.numpy as jnp
import numpy as np

from semi_tts_tpu.ops.qmatmul import (lstm_cell_q, qmatmul, quantize_decoder,
                                      quantize_rows)


def test_quantize_rows_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(240, 384).astype(np.float32)  # 240 -> pads to 256 rows
    q, s = quantize_rows(jnp.asarray(w))
    assert q.shape == (256, 384) and q.dtype == jnp.int8 and s.shape == (256, 1)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    # per-row symmetric quantization: error bounded by scale/2 per element
    err = np.abs(deq[:240] - w)
    assert (err <= np.asarray(s)[:240] * 0.5 + 1e-7).all()
    # padded rows are exact zeros
    np.testing.assert_array_equal(np.asarray(q)[240:], 0)


def test_qmatmul_matches_dequantized_reference():
    rng = np.random.RandomState(1)
    B, D, N = 16, 384, 512
    x = rng.randn(B, D).astype(np.float32)
    w = (rng.randn(N, D) * 0.05).astype(np.float32)
    q, s = quantize_rows(jnp.asarray(w))
    got = np.asarray(qmatmul(jnp.asarray(x), q, s, interpret=True))
    # the kernel must equal the same math done without pallas: bf16 x int8->bf16
    want = np.asarray(
        jnp.asarray(x).astype(jnp.bfloat16) @
        (q.astype(jnp.bfloat16).T).astype(jnp.bfloat16)).astype(np.float32) * \
        np.asarray(s).T
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    # and approximate the full-precision product within quantization error
    ref = x @ w.T
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 0.03


def test_lstm_cell_q_close_to_fp32_cell():
    from semi_tts_tpu.ops.rnn import lstm_cell, lstm_init

    D, H, B = 96, 128, 8
    p = lstm_init(jax.random.PRNGKey(0), D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    h = jnp.zeros((B, H))
    c = jnp.zeros((B, H))
    qp = {"w_ih": quantize_rows(p["w_ih"]), "w_hh": quantize_rows(p["w_hh"])}
    bias = p["b_ih"] + p["b_hh"]
    h1, c1 = lstm_cell(p, x, h, c)
    h2, c2 = lstm_cell_q(qp, bias, x, h, c)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=0.05)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=0.08)


def test_quantized_decoder_serving_close_to_fp32():
    """decoder_apply(qweights=...) tracks the fp32 serving decode closely on
    normalized-mel scale ([0,1] features): the int8 rounding of W must not
    visibly move the generated mel."""
    import __graft_entry__ as g
    from semi_tts_tpu.models import vqvae as V

    cfg, feat, phn_attr, params, state = g._build("small")
    B, U = 4, 16
    rng = np.random.RandomState(2)
    text = np.zeros((B, U), np.int32)
    text[:, : U - 2] = rng.randint(3, 43, size=(B, U - 2))
    text = jnp.asarray(text)
    sid = jnp.asarray(rng.randint(0, 109, size=B).astype(np.int32))
    key = jax.random.PRNGKey(3)
    lat = V.embed_text(params, cfg, phn_attr, text)

    kw = dict(decode_steps=20, train=False, teacher=None, tf_rate=0.0)
    mel_f, lin_f, *_ = V.text_to_speech(params, state, key, cfg, lat, sid, **kw)
    qw = quantize_decoder(params["tts"]["decoder"])
    mel_q, lin_q, *_ = V.text_to_speech(params, state, key, cfg, lat, sid,
                                        qweights=qw, **kw)
    assert mel_q.shape == mel_f.shape
    # AR feedback compounds error; bound the drift on the [0,1] mel scale
    dev = np.abs(np.asarray(mel_q) - np.asarray(mel_f))
    assert dev.mean() < 0.02 and dev.max() < 0.2, (dev.mean(), dev.max())
