"""Tacotron2 TTS model: text encoder + AR decoder + CBHG mel->linear postnet.

Parity target: `/root/reference/src/tts.py:9-59` — conv x3 + BiLSTM encoder,
location-sensitive-attention decoder, ``Sequential(CBHG(n_mels, K=8),
Linear(2*n_mels, linear_dim))`` postnet; ``separate_postnet`` detaches the
postnet input (`src/tts.py:47-50`).
"""

from __future__ import annotations

import dataclasses

import jax

from .cbhg import cbhg_apply, cbhg_init
from .common import linear, torch_linear_init
from .decoder import DecoderConfig, decoder_apply, decoder_init
from .encoder import encoder_apply, encoder_init


@dataclasses.dataclass(frozen=True)
class TTSConfig:
    """Mirror of the YAML `model.decoder` block (the reference's `paras`)."""

    n_mels: int = 80
    linear_dim: int | None = 1025
    in_embed_dim: int = 64  # codebook.out_dim
    spkr_embed_dim: int = 128
    separate_postnet: bool = False
    # encoder sub-block
    enc_n_conv: int = 3
    enc_kernel_size: int = 5
    enc_rnn_layer: int = 1
    enc_embed_dim: int = 512
    enc_dropout: float = 0.0
    # decoder sub-block
    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)


def tts_init(key, cfg: TTSConfig):
    k_enc, k_dec, k_cbhg, k_lin = jax.random.split(key, 4)
    enc_p, enc_s = encoder_init(k_enc, cfg.in_embed_dim, cfg.enc_embed_dim,
                                cfg.enc_n_conv, cfg.enc_rnn_layer, cfg.enc_kernel_size)
    params = {"encoder": enc_p, "decoder": decoder_init(k_dec, cfg.decoder)}
    state = {"encoder": enc_s}
    if cfg.linear_dim is not None:
        cbhg_p, cbhg_s = cbhg_init(k_cbhg, cfg.n_mels, K=8)
        params["postnet"] = {"cbhg": cbhg_p,
                             "linear": torch_linear_init(k_lin, cfg.n_mels * 2, cfg.linear_dim)}
        state["postnet"] = cbhg_s
    return params, state


def tts_apply(params, state, rng, txt_embed, spkr_embed, *, cfg: TTSConfig,
              decode_steps: int, train: bool, teacher=None, teacher_rows=None,
              tf_rate=1.0, txt_lengths=None, wgrad_probes=None):
    """txt_embed: (B, L, in_embed_dim) codebook latents.

    Returns (mel, linear, align, stop, new_state) — plus the decoder's
    weight-grad ``aux`` when ``wgrad_probes`` is given (see
    `decoder.decoder_apply`). ``linear`` is None when the model has no
    postnet (use_linear=False configs).
    """
    k_enc, k_dec = jax.random.split(rng)
    memory, enc_s = encoder_apply(params["encoder"], state["encoder"], k_enc,
                                  txt_embed, dropout_rate=cfg.enc_dropout, train=train)
    dec_out = decoder_apply(params["decoder"], k_dec, memory, spkr_embed,
                            cfg=cfg.decoder, decode_steps=decode_steps,
                            train=train, teacher=teacher,
                            teacher_rows=teacher_rows, tf_rate=tf_rate,
                            memory_lengths=txt_lengths, wgrad_probes=wgrad_probes)
    mel, align, stop = dec_out[:3]
    new_state = {"encoder": enc_s}
    lin = None
    if "postnet" in params:
        post_in = jax.lax.stop_gradient(mel) if cfg.separate_postnet else mel
        h, cbhg_s = cbhg_apply(params["postnet"]["cbhg"], state["postnet"], post_in, train=train)
        lin = linear(params["postnet"]["linear"], h)
        new_state["postnet"] = cbhg_s
    if wgrad_probes is not None:
        return mel, lin, align, stop, new_state, dec_out[3]
    return mel, lin, align, stop, new_state


def tacotron2_with_codebook_init(key, cfg: TTSConfig, codebook_cfg, phn_attr=None):
    """Standalone TTS + codebook bundle (`src/tts.py:61-74`,
    ``Tacotron2withCodebook`` — unused by the live path upstream; provided so
    the TTS can be trained/run without the ASR half)."""
    from .embed import codebook_init

    k1, k2 = jax.random.split(key)
    tts_p, tts_s = tts_init(k1, cfg)
    return {"codebook": codebook_init(k2, codebook_cfg, phn_attr), "tts": tts_p}, {"tts": tts_s}


def tacotron2_with_codebook_apply(params, state, rng, txt, spkr_embed, *,
                                  cfg: TTSConfig, codebook_cfg, phn_attr=None,
                                  decode_steps, train, teacher=None, tf_rate=0.0):
    from .embed import codebook_inference

    txt_embed = codebook_inference(params["codebook"], codebook_cfg, txt, phn_attr)
    mel, lin, align, stop, tts_s = tts_apply(params["tts"], state["tts"], rng, txt_embed,
                                             spkr_embed, cfg=cfg, decode_steps=decode_steps,
                                             train=train, teacher=teacher, tf_rate=tf_rate)
    return mel, lin, align, stop, {"tts": tts_s}
