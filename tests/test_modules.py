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
