"""RNN scans golden-checked against torch.nn.LSTM/LSTMCell/GRU."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from semi_tts_tpu.ops import rnn


def _copy_lstm_layer(params, t_lstm, layer=0, suffix=""):
    with torch.no_grad():
        getattr(t_lstm, f"weight_ih_l{layer}{suffix}").copy_(torch.from_numpy(np.asarray(params["w_ih"])))
        getattr(t_lstm, f"weight_hh_l{layer}{suffix}").copy_(torch.from_numpy(np.asarray(params["w_hh"])))
        getattr(t_lstm, f"bias_ih_l{layer}{suffix}").copy_(torch.from_numpy(np.asarray(params["b_ih"])))
        getattr(t_lstm, f"bias_hh_l{layer}{suffix}").copy_(torch.from_numpy(np.asarray(params["b_hh"])))


def test_lstm_cell_matches_torch():
    D, H, B = 12, 16, 3
    p = rnn.lstm_init(jax.random.PRNGKey(0), D, H)
    cell = torch.nn.LSTMCell(D, H)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(np.asarray(p["w_ih"])))
        cell.weight_hh.copy_(torch.from_numpy(np.asarray(p["w_hh"])))
        cell.bias_ih.copy_(torch.from_numpy(np.asarray(p["b_ih"])))
        cell.bias_hh.copy_(torch.from_numpy(np.asarray(p["b_hh"])))
    x = np.random.RandomState(0).randn(B, D).astype(np.float32)
    h0 = np.random.RandomState(1).randn(B, H).astype(np.float32)
    c0 = np.random.RandomState(2).randn(B, H).astype(np.float32)
    h1, c1 = rnn.lstm_cell(p, jnp.asarray(x), jnp.asarray(h0), jnp.asarray(c0))
    th, tc = cell(torch.from_numpy(x), (torch.from_numpy(h0), torch.from_numpy(c0)))
    np.testing.assert_allclose(np.asarray(h1), th.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), tc.detach().numpy(), atol=1e-5)


def test_bilstm_2layer_matches_torch():
    D, H, B, T = 10, 8, 2, 15
    params = rnn.multi_lstm_init(jax.random.PRNGKey(1), D, H, num_layers=2, bidirectional=True)
    t = torch.nn.LSTM(D, H, num_layers=2, batch_first=True, bidirectional=True)
    for li, layer in enumerate(params):
        _copy_lstm_layer(layer["fwd"], t, layer=li)
        _copy_lstm_layer(layer["bwd"], t, layer=li, suffix="_reverse")
    x = np.random.RandomState(3).randn(B, T, D).astype(np.float32)
    got = np.asarray(rnn.multi_lstm(params, jnp.asarray(x)))
    want, _ = t(torch.from_numpy(x))
    np.testing.assert_allclose(got, want.detach().numpy(), atol=1e-5)


def test_bilstm_grads_match_torch():
    """The custom-VJP recurrence (`rnn._lstm_rec`) must reproduce autodiff's
    weight/bias/input gradients exactly — torch.backward is the independent
    oracle. A weighted loss makes every timestep's cotangent distinct."""
    D, H, B, T = 10, 8, 2, 15
    params = rnn.multi_lstm_init(jax.random.PRNGKey(5), D, H, num_layers=2, bidirectional=True)
    t = torch.nn.LSTM(D, H, num_layers=2, batch_first=True, bidirectional=True)
    for li, layer in enumerate(params):
        _copy_lstm_layer(layer["fwd"], t, layer=li)
        _copy_lstm_layer(layer["bwd"], t, layer=li, suffix="_reverse")
    x = np.random.RandomState(6).randn(B, T, D).astype(np.float32)
    wgt = np.random.RandomState(7).randn(B, T, 2 * H).astype(np.float32)

    def loss(p, xj):
        return jnp.sum(rnn.multi_lstm(p, xj) * jnp.asarray(wgt))

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(x))

    xt = torch.from_numpy(x).requires_grad_(True)
    out, _ = t(xt)
    (out * torch.from_numpy(wgt)).sum().backward()
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), atol=2e-5)
    for li, layer in enumerate(gp):
        for name, suffix in [("fwd", ""), ("bwd", "_reverse")]:
            for jk, tk in [("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
                           ("b_ih", "bias_ih"), ("b_hh", "bias_hh")]:
                want = getattr(t, f"{tk}_l{li}{suffix}").grad.numpy()
                np.testing.assert_allclose(np.asarray(layer[name][jk]), want,
                                           atol=3e-5, err_msg=f"l{li} {name} {jk}")


def test_bigru_grads_match_torch():
    """Same oracle check for the GRU custom VJP (incl. the b_hn-inside-r
    quirk's bias gradient)."""
    D, H, B, T = 9, 7, 2, 12
    params = rnn.bigru_init(jax.random.PRNGKey(8), D, H)
    t = torch.nn.GRU(D, H, num_layers=1, batch_first=True, bidirectional=True)
    for name, suffix in [("fwd", ""), ("bwd", "_reverse")]:
        with torch.no_grad():
            getattr(t, f"weight_ih_l0{suffix}").copy_(torch.from_numpy(np.asarray(params[name]["w_ih"])))
            getattr(t, f"weight_hh_l0{suffix}").copy_(torch.from_numpy(np.asarray(params[name]["w_hh"])))
            getattr(t, f"bias_ih_l0{suffix}").copy_(torch.from_numpy(np.asarray(params[name]["b_ih"])))
            getattr(t, f"bias_hh_l0{suffix}").copy_(torch.from_numpy(np.asarray(params[name]["b_hh"])))
    x = np.random.RandomState(9).randn(B, T, D).astype(np.float32)
    wgt = np.random.RandomState(10).randn(B, T, 2 * H).astype(np.float32)

    def loss(p, xj):
        return jnp.sum(rnn.bigru(p, xj) * jnp.asarray(wgt))

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(x))

    xt = torch.from_numpy(x).requires_grad_(True)
    out, _ = t(xt)
    (out * torch.from_numpy(wgt)).sum().backward()
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), atol=2e-5)
    for name, suffix in [("fwd", ""), ("bwd", "_reverse")]:
        for jk, tk in [("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
                       ("b_ih", "bias_ih"), ("b_hh", "bias_hh")]:
            want = getattr(t, f"{tk}_l0{suffix}").grad.numpy()
            np.testing.assert_allclose(np.asarray(gp[name][jk]), want,
                                       atol=3e-5, err_msg=f"{name} {jk}")


def test_bigru_matches_torch():
    D, H, B, T = 9, 7, 2, 12
    params = rnn.bigru_init(jax.random.PRNGKey(2), D, H)
    t = torch.nn.GRU(D, H, num_layers=1, batch_first=True, bidirectional=True)
    for name, suffix in [("fwd", ""), ("bwd", "_reverse")]:
        with torch.no_grad():
            getattr(t, f"weight_ih_l0{suffix}").copy_(torch.from_numpy(np.asarray(params[name]["w_ih"])))
            getattr(t, f"weight_hh_l0{suffix}").copy_(torch.from_numpy(np.asarray(params[name]["w_hh"])))
            getattr(t, f"bias_ih_l0{suffix}").copy_(torch.from_numpy(np.asarray(params[name]["b_ih"])))
            getattr(t, f"bias_hh_l0{suffix}").copy_(torch.from_numpy(np.asarray(params[name]["b_hh"])))
    x = np.random.RandomState(4).randn(B, T, D).astype(np.float32)
    got = np.asarray(rnn.bigru(params, jnp.asarray(x)))
    want, _ = t(torch.from_numpy(x))
    np.testing.assert_allclose(got, want.detach().numpy(), atol=1e-5)
