"""Codebook quantizer parity vs a torch transcription of src/embed.py."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from semi_tts_tpu.models.embed import CodebookConfig, codebook_forward, codebook_init, codebook_inference, neg_batch_l2


def _setup(bone="l2", use_attr=True, stop_grad=True, seed=0):
    V, D, A, P = 11, 16, 7, 4
    cfg = CodebookConfig(bone=bone, vocab_size=V, latent_dim=D, use_phn_attr=use_attr,
                         attr_dim=A, proj_attr=P if use_attr else 0, stop_grad=stop_grad)
    attr = np.random.RandomState(seed).rand(V, A).astype(np.float32)
    attr[:3] = 0
    params = codebook_init(jax.random.PRNGKey(seed), cfg, jnp.asarray(attr))
    return cfg, params, jnp.asarray(attr)


def test_neg_batch_l2_matches_reference():
    x = np.random.RandomState(0).randn(2, 5, 8).astype(np.float32)
    y = np.random.RandomState(1).randn(11, 8).astype(np.float32)
    got = np.asarray(neg_batch_l2(jnp.asarray(x), jnp.asarray(y)))
    # reference formula (src/embed.py:208-213)
    fx = torch.from_numpy(x.reshape(10, 8))
    fy = torch.from_numpy(y)
    l2 = fx.pow(2).sum(-1, keepdim=True) + fy.pow(2).sum(-1) - 2 * fx @ fy.t()
    np.testing.assert_allclose(got, -l2.reshape(2, 5, 11).numpy(), atol=1e-4)


def test_l2_forward_probabilities_and_quantize():
    cfg, params, attr = _setup()
    x = jnp.asarray(np.random.RandomState(2).randn(2, 6, cfg.latent_dim).astype(np.float32))
    p_code, q = codebook_forward(params, cfg, x, phn_attr=attr)
    p_code, q = np.asarray(p_code), np.asarray(q)
    assert p_code.shape == (2, 6, cfg.vocab_size)
    np.testing.assert_allclose(p_code.sum(-1), 1.0, atol=1e-5)
    # quantized value == picked codebook entry (residual-ST: enc + code - enc)
    table = np.concatenate([
        np.asarray(params["learnable_table"]),
        np.asarray(attr) @ np.asarray(params["proj_attr"]["w"]).T + np.asarray(params["proj_attr"]["b"]),
    ], axis=-1)
    picked = p_code.argmax(-1)
    np.testing.assert_allclose(q, table[picked], atol=1e-5)


def test_l2_gradients_straight_through():
    """d quantized / d enc == identity (residual ST), and the fake-mel rows
    must not produce codebook-table gradients through p_code."""
    cfg, params, attr = _setup()
    x = jnp.asarray(np.random.RandomState(3).randn(4, 5, cfg.latent_dim).astype(np.float32))

    def f(enc):
        _, q = codebook_forward(params, cfg, enc, phn_attr=attr)
        return jnp.sum(q)

    g = np.asarray(jax.grad(f)(x))
    np.testing.assert_allclose(g, np.ones_like(g), atol=1e-5)  # straight-through

    def loss_on_pcode(p, first_n):
        pc, _ = codebook_forward(p, cfg, x, phn_attr=attr, first_n_real_mel=first_n)
        return jnp.sum(pc[first_n or 0:] ** 2) if first_n else jnp.sum(pc**2)

    # all-fake rows (first_n_real_mel=2 of 4): gradient from rows >=2 must be 0
    g_tab = jax.grad(lambda p: jnp.sum(
        codebook_forward(p, cfg, x, phn_attr=attr, first_n_real_mel=2)[0][2:] ** 2
    ))(params)["learnable_table"]
    assert float(jnp.abs(g_tab).max()) == 0.0
    # ...while real rows do move the table
    g_tab2 = jax.grad(lambda p: jnp.sum(
        codebook_forward(p, cfg, x, phn_attr=attr, first_n_real_mel=2)[0][:2] ** 2
    ))(params)["learnable_table"]
    assert float(jnp.abs(g_tab2).max()) > 0.0


def test_inference_lookup():
    cfg, params, attr = _setup()
    txt = jnp.asarray(np.array([[1, 2, 3], [4, 0, 10]], np.int32))
    emb = np.asarray(codebook_inference(params, cfg, txt, attr))
    assert emb.shape == (2, 3, cfg.latent_dim)
    learn = np.asarray(params["learnable_table"])
    proj = np.asarray(attr) @ np.asarray(params["proj_attr"]["w"]).T + np.asarray(params["proj_attr"]["b"])
    np.testing.assert_allclose(emb[0, 1], np.concatenate([learn[2], proj[2]]), atol=1e-5)


def test_seperate_bone():
    cfg, params, attr = _setup(bone="seperate")
    x = jnp.asarray(np.random.RandomState(5).randn(2, 6, cfg.latent_dim).astype(np.float32))
    p_code, q = codebook_forward(params, cfg, x, phn_attr=attr)
    assert p_code.shape == (2, 6, cfg.vocab_size)
    assert q.shape == (2, 6, cfg.latent_dim)
    emb = np.asarray(params["embedding"])
    proj = np.asarray(attr) @ np.asarray(params["proj_attr"]["w"]).T + np.asarray(params["proj_attr"]["b"])
    picked = np.asarray(p_code).argmax(-1)
    want = np.concatenate([emb[picked], proj[picked]], axis=-1)
    np.testing.assert_allclose(np.asarray(q), want, atol=1e-5)
