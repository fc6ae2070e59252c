"""Optional attention masking: masked positions get zero weight, and the
default (parity) config leaves attention unmasked."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from semi_tts_tpu.models.decoder import DecoderConfig, decoder_apply, decoder_init

DEC = DecoderConfig(n_mels=6, n_frames_per_step=2, enc_embed_dim=8, spkr_embed_dim=4,
                    prenet_dim=6, query_rnn_dim=10, dec_rnn_dim=10, attn_dim=6,
                    n_location_filters=3, location_kernel_size=5)


def _run(cfg, lengths=None):
    p = decoder_init(jax.random.PRNGKey(0), cfg)
    B, L = 2, 6
    mem = jnp.asarray(np.random.RandomState(1).randn(B, L, 8).astype(np.float32))
    spk = jnp.zeros((B, 4))
    kw = {} if lengths is None else {"memory_lengths": jnp.asarray(lengths)}
    _, align, _ = decoder_apply(p, jax.random.PRNGKey(2), mem, spk, cfg=cfg,
                                decode_steps=3, train=False, **kw)
    return np.asarray(align)


def test_masked_positions_zero():
    cfg = dataclasses.replace(DEC, mask_attention=True)
    align = _run(cfg, lengths=[4, 6])
    assert (align[0, :, 4:] == 0).all()
    np.testing.assert_allclose(align.sum(-1), 1.0, atol=1e-5)
    assert (align[1] > 0).any()


def test_default_unmasked_parity():
    align = _run(DEC, lengths=[4, 6])  # mask_attention=False -> lengths ignored
    assert (align[0, :, 4:] > 0).any()  # reference behavior: attends over pad
