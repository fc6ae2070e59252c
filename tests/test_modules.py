"""Building-block parity vs torch (conv/batchnorm/highway) and shape checks."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from semi_tts_tpu.models import common as C


def test_linear_matches_torch():
    p = C.linear_init(jax.random.PRNGKey(0), 8, 5)
    x = np.random.RandomState(0).randn(3, 8).astype(np.float32)
    t = torch.nn.Linear(8, 5)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(np.asarray(p["w"])))
        t.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
    np.testing.assert_allclose(np.asarray(C.linear(p, jnp.asarray(x))),
                               t(torch.from_numpy(x)).detach().numpy(), atol=1e-5)


def test_conv1d_matches_torch():
    for k, s, pad in [(5, 1, None), (4, 2, 1), (1, 1, 0), (31, 1, None)]:
        p = C.conv1d_init(jax.random.PRNGKey(k), 6, 7, k)
        x = np.random.RandomState(k).randn(2, 20, 6).astype(np.float32)
        tpad = pad if pad is not None else (k - 1) // 2
        t = torch.nn.Conv1d(6, 7, k, stride=s, padding=tpad)
        with torch.no_grad():
            t.weight.copy_(torch.from_numpy(np.asarray(p["w"])))
            t.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
        got = np.asarray(C.conv1d(p, jnp.asarray(x), stride=s, padding=pad))
        want = t(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).detach().numpy()
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"k={k} s={s}")


def test_batchnorm_train_and_eval_match_torch():
    p, s = C.batchnorm_init(6)
    x = np.random.RandomState(1).randn(4, 10, 6).astype(np.float32) * 2 + 1
    t = torch.nn.BatchNorm1d(6)
    xt = torch.from_numpy(x).transpose(1, 2)  # torch: (B, C, T)

    # two train steps (running stats accumulate)
    for _ in range(2):
        y, s = C.batchnorm(p, s, jnp.asarray(x), train=True)
        yt = t(xt)
    np.testing.assert_allclose(np.asarray(y), yt.transpose(1, 2).detach().numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s["mean"]), t.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s["var"]), t.running_var.numpy(), atol=1e-4)

    # eval uses running stats
    t.eval()
    y2, _ = C.batchnorm(p, s, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y2), t(xt).transpose(1, 2).detach().numpy(), atol=1e-4)


def test_prenet_dropout_always_on():
    p = C.prenet_init(jax.random.PRNGKey(0), 240, (256, 256))
    x = jnp.ones((4, 240))
    y1 = C.prenet(p, jax.random.PRNGKey(1), x)
    y2 = C.prenet(p, jax.random.PRNGKey(2), x)
    # different rng -> different dropout masks, even in "eval"
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    assert y1.shape == (4, 256)


def test_highway_matches_reference_formula():
    p = C.highway_init(jax.random.PRNGKey(3), 5, 5)
    assert float(jnp.max(jnp.abs(p["H"]["b"]))) == 0.0
    assert np.allclose(np.asarray(p["T"]["b"]), -1.0)
    x = np.random.RandomState(2).randn(3, 5).astype(np.float32)
    got = np.asarray(C.highway(p, jnp.asarray(x)))
    h = np.maximum(x @ np.asarray(p["H"]["w"]).T + np.asarray(p["H"]["b"]), 0)
    tgate = 1 / (1 + np.exp(-(x @ np.asarray(p["T"]["w"]).T + np.asarray(p["T"]["b"]))))
    want = h * tgate + x * (1 - tgate)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_seq_mask():
    m = np.asarray(C.seq_mask(jnp.array([2, 4]), 5))
    assert (m == np.array([[0, 0, 1, 1, 1], [0, 0, 0, 0, 1]], bool)).all()


def test_decoder_batched_wgrad_path_matches_autodiff():
    """The probe-based batched weight-gradient path (wgrad_probes +
    assemble_wgrads) must reproduce plain autodiff's decoder gradients
    exactly: LSTM dW via the outside-the-scan einsum, every other leaf
    untouched."""
    import jax
    import jax.numpy as jnp

    from semi_tts_tpu.models.decoder import (DecoderConfig, assemble_wgrads,
                                             decoder_apply, decoder_init,
                                             wgrad_probes)

    cfg = DecoderConfig(n_mels=12, n_frames_per_step=3, enc_embed_dim=32,
                        spkr_embed_dim=8, prenet_dim=16, query_rnn_dim=24,
                        dec_rnn_dim=24, attn_dim=16, n_location_filters=4,
                        location_kernel_size=7)
    params = decoder_init(jax.random.PRNGKey(0), cfg)
    B, T = 3, 5
    mem = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 32))
    spk = jax.random.normal(jax.random.PRNGKey(2), (B, 8))
    teacher = jax.random.normal(jax.random.PRNGKey(3), (B, T * 3, 12)) * 0.1
    rng = jax.random.PRNGKey(7)

    def loss_plain(p):
        mel, _, stop = decoder_apply(p, rng, mem, spk, cfg=cfg, decode_steps=T,
                                     train=True, teacher=teacher, tf_rate=0.7)
        return jnp.sum(mel**2) + jnp.sum(stop**2)

    def loss_probe(p, probes):
        mel, _, stop, aux = decoder_apply(p, rng, mem, spk, cfg=cfg, decode_steps=T,
                                          train=True, teacher=teacher, tf_rate=0.7,
                                          wgrad_probes=probes)
        return jnp.sum(mel**2) + jnp.sum(stop**2), aux

    g_plain = jax.grad(loss_plain)(params)
    probes = wgrad_probes(cfg, T, B)
    (grads, gprobes), aux = jax.grad(loss_probe, argnums=(0, 1), has_aux=True)(params, probes)
    wg = assemble_wgrads(aux, gprobes)
    for name in ("query_rnn", "dec_rnn"):
        for k in ("w_ih", "w_hh"):
            assert float(jnp.abs(grads[name][k]).max()) == 0.0  # stop-gradiented
            np.testing.assert_allclose(np.asarray(grads[name][k] + wg[name][k]),
                                       np.asarray(g_plain[name][k]),
                                       atol=2e-6, err_msg=f"{name}.{k}")
        np.testing.assert_allclose(np.asarray(grads[name]["b_ih"]),
                                   np.asarray(g_plain[name]["b_ih"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads["proj"]["w"]),
                               np.asarray(g_plain["proj"]["w"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads["attn"]["query_layer"]["w"]),
                               np.asarray(g_plain["attn"]["query_layer"]["w"]), atol=1e-6)


def test_layers_follow_activation_dtype():
    """fp32 params + bf16 activations => bf16 compute/outputs (the decode
    scan's reduced-precision convention, `common.follow_act_dtype`); fp32
    activations stay the exact fp32 path."""
    from semi_tts_tpu.ops import rnn

    key = jax.random.PRNGKey(0)
    lp = C.linear_init(key, 16, 8)
    cp = C.conv1d_init(key, 6, 7, 5)
    rp = rnn.lstm_init(key, 16, 12)
    x = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    xc = np.random.RandomState(1).randn(2, 20, 6).astype(np.float32)
    h = np.zeros((3, 12), np.float32)

    for f, args, want32 in [
        (C.linear, (lp, jnp.asarray(x)), C.linear(lp, jnp.asarray(x))),
        (C.conv1d, (cp, jnp.asarray(xc)), C.conv1d(cp, jnp.asarray(xc))),
    ]:
        lo = f(args[0], args[1].astype(jnp.bfloat16))
        assert lo.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(lo, np.float32),
                                   np.asarray(want32), atol=0.05)
        assert f(*args).dtype == jnp.float32  # fp32 path untouched

    h32, c32 = rnn.lstm_cell(rp, jnp.asarray(x), jnp.asarray(h), jnp.asarray(h))
    hb, cb = rnn.lstm_cell(rp, jnp.asarray(x).astype(jnp.bfloat16),
                           jnp.asarray(h).astype(jnp.bfloat16),
                           jnp.asarray(h).astype(jnp.bfloat16))
    assert hb.dtype == cb.dtype == jnp.bfloat16
    assert h32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(hb, np.float32), np.asarray(h32),
                               atol=0.02)


def test_decoder_follows_memory_dtype():
    """decoder_apply run with bf16 memory/speaker/teacher yields bf16 mel
    close to the fp32 run — the bf16 serving/probe path traces and stays
    in reduced precision end-to-end (tools/proto_bf16_act.py's lever)."""
    from semi_tts_tpu.models.decoder import (DecoderConfig, decoder_apply,
                                             decoder_init)

    cfg = DecoderConfig(n_mels=12, n_frames_per_step=3, enc_embed_dim=32,
                        spkr_embed_dim=8, prenet_dim=16, query_rnn_dim=24,
                        dec_rnn_dim=24, attn_dim=16, n_location_filters=4,
                        location_kernel_size=7)
    params = decoder_init(jax.random.PRNGKey(0), cfg)
    B, T = 2, 4
    mem = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 32)) * 0.3
    spk = jax.random.normal(jax.random.PRNGKey(2), (B, 8)) * 0.3
    teacher = jax.random.normal(jax.random.PRNGKey(3), (B, T * 3, 12)) * 0.1
    rng = jax.random.PRNGKey(7)

    mel32, _, _ = decoder_apply(params, rng, mem, spk, cfg=cfg, decode_steps=T,
                                train=True, teacher=teacher, tf_rate=1.0)
    mel16, _, _ = decoder_apply(params, rng, mem.astype(jnp.bfloat16),
                                spk.astype(jnp.bfloat16), cfg=cfg,
                                decode_steps=T, train=True,
                                teacher=teacher.astype(jnp.bfloat16),
                                tf_rate=1.0)
    assert mel16.dtype == jnp.bfloat16
    assert mel32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(mel16, np.float32),
                               np.asarray(mel32), atol=0.05)
