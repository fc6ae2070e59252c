"""VQVAE composite: CTC phoneme-ASR encoder <-> shared codebook <-> Tacotron2.

Parity target: `/root/reference/src/vqvae.py` — ``speech_to_text``
(`:106-141`), ``text_to_speech`` (`:143-207`), the CTC-style blank-trim /
repeat-merge of unpaired latents (``mean_forward`` `:218-257`, here
`ops.quantize.trim_merge_segments`), ``padded_concat`` (`:259-271`), speaker
``nn.Embedding(n_spkr, spkr_latent_dim)`` (`:64`), and the constants
``FRAME_PHN_RATIO = 6.0`` / ``SPEC_PAD_VALUE = 0`` (`:18-19`).

Structure: a frozen config + pure init/apply functions. The pair/unpair
batch packing of the reference's methods lives in the trainers (static batch
layout per compiled step variant); these functions operate on the packed
batch with *static* ``paired_bs`` / ``first_n_real_mel`` split points.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax

from .asr import ASRConfig, asr_apply, asr_init, asr_postnet_apply, asr_postnet_init
from .common import xavier_normal_embedding_init
from .embed import CodebookConfig, codebook_forward, codebook_inference, codebook_init
from .tts import TTSConfig, tts_apply, tts_init

FRAME_BLANK_TXT_RATIO = 4  # (`src/vqvae.py:16`)
FRAME_PHN_RATIO = 6.0  # (`src/vqvae.py:18`)
SPEC_PAD_VALUE = 0.0  # (`src/vqvae.py:19`)


@dataclasses.dataclass(frozen=True)
class VQVAEConfig:
    n_mels: int = 80
    linear_dim: Optional[int] = 1025
    vocab_size: int = 43
    n_spkr: int = 109
    spkr_latent_dim: int = 128
    max_frames_per_phn: int = 3
    stop_threshold: float = 0.5
    txt_update_codebook: bool = False
    asr_postnet_weight: float = 0.0
    encoder: ASRConfig = dataclasses.field(default_factory=ASRConfig)
    codebook: CodebookConfig = dataclasses.field(default_factory=CodebookConfig)
    tts: TTSConfig = dataclasses.field(default_factory=TTSConfig)

    @property
    def use_asr_postnet(self) -> bool:
        return self.asr_postnet_weight > 0

    @property
    def latent_dim(self) -> int:
        return self.codebook.latent_dim

    @property
    def time_reduce_factor(self) -> int:
        return self.encoder.time_reduce_factor

    @property
    def n_frames_per_step(self) -> int:
        return self.tts.decoder.n_frames_per_step


def config_from_yaml(model_cfg: dict, *, n_mels: int, linear_dim, vocab_size: int,
                     n_spkr: int, attr_dim: int = 31) -> VQVAEConfig:
    """Build a VQVAEConfig from the reference YAML `model` block
    (`config/*.yaml`), preserving its field names and defaults."""
    enc = dict(model_cfg["encoder"])
    cb = dict(model_cfg["codebook"])
    dec = dict(model_cfg["decoder"])
    latent_dim = cb["latent_dim"]

    from .decoder import DecoderConfig  # local to avoid cycle at import time

    enc_cfg = ASRConfig(
        in_dim=n_mels, out_dim=latent_dim, dim=enc["dim"],
        kernel=tuple(enc["kernel"]), stride=tuple(enc["stride"]),
        residual=tuple(enc["residual"]), dropout=enc["dropout"],
        activation=enc["activation"], batch_norm=enc["batch_norm"],
        rnn_bid=enc["rnn_bid"], rnn_layers=enc["rnn_layers"],
        rnn_dim=enc["rnn_dim"], layer_norm=enc["layer_norm"],
    )
    phn_attr_pth = cb.get("phn_attr_pth") or ""
    cb_cfg = CodebookConfig(
        bone=cb["bone"], vocab_size=vocab_size, latent_dim=latent_dim,
        commit_weight=cb["commit_weight"], vq_weight=cb["vq_weight"],
        temp=cb["temp"], skip_prob=cb["skip_prob"], stop_grad=cb["stop_grad"],
        softmax=cb["softmax"], use_phn_attr=phn_attr_pth != "",
        attr_dim=attr_dim, proj_attr=cb.get("proj_attr") or 0,
    )
    d = dec["decoder"]
    dec_cfg = DecoderConfig(
        n_mels=n_mels, n_frames_per_step=d["n_frames_per_step"],
        enc_embed_dim=dec["encoder"]["enc_embed_dim"],
        spkr_embed_dim=model_cfg["spkr_latent_dim"],
        prenet_dim=d["prenet_dim"], prenet_dropout=d["prenet_dropout"],
        query_rnn_dim=d["query_rnn_dim"], dec_rnn_dim=d["dec_rnn_dim"],
        query_dropout=d["query_dropout"], dec_dropout=d["dec_dropout"],
        attn_dim=d["attn_dim"], n_location_filters=d["n_location_filters"],
        location_kernel_size=d["location_kernel_size"], loc_aware=d["loc_aware"],
        use_summed_weights=d["use_summed_weights"], drop_dec_in=d["drop_dec_in"],
        spkr_embed_mode=d.get("spkr_embed_mode", "adaIN").lower(),
        mask_attention=d.get("mask_attention", False),
    )
    tts_cfg = TTSConfig(
        n_mels=n_mels, linear_dim=linear_dim, in_embed_dim=latent_dim,
        spkr_embed_dim=model_cfg["spkr_latent_dim"],
        separate_postnet=dec.get("separate_postnet", False),
        enc_n_conv=dec["encoder"]["enc_n_conv"],
        enc_kernel_size=dec["encoder"]["enc_kernel_size"],
        enc_rnn_layer=dec["encoder"]["enc_rnn_layer"],
        enc_embed_dim=dec["encoder"]["enc_embed_dim"],
        enc_dropout=dec["encoder"]["enc_dropout"],
        decoder=dec_cfg,
    )
    return VQVAEConfig(
        n_mels=n_mels, linear_dim=linear_dim, vocab_size=vocab_size, n_spkr=n_spkr,
        spkr_latent_dim=model_cfg["spkr_latent_dim"],
        max_frames_per_phn=model_cfg["max_frames_per_phn"],
        stop_threshold=model_cfg["stop_threshold"],
        txt_update_codebook=model_cfg.get("txt_update_codebook", False),
        asr_postnet_weight=model_cfg.get("asr_postnet_weight", 0.0),
        encoder=enc_cfg, codebook=cb_cfg, tts=tts_cfg,
    )


def vqvae_init(key, cfg: VQVAEConfig, phn_attr=None):
    """Returns (params, state). ``phn_attr``: (vocab_size, attr_dim) frozen
    phonological attribute table (`src/util.py:240-245`) or None."""
    k_asr, k_cb, k_spk, k_tts, k_post = jax.random.split(key, 5)
    asr_p, asr_s = asr_init(k_asr, cfg.encoder)
    tts_p, tts_s = tts_init(k_tts, cfg.tts)
    params = {
        "asr": asr_p,
        "codebook": codebook_init(k_cb, cfg.codebook, phn_attr),
        "spkr_embed": xavier_normal_embedding_init(k_spk, cfg.n_spkr, cfg.spkr_latent_dim),
        "tts": tts_p,
    }
    if cfg.use_asr_postnet:
        params["asr_postnet"] = asr_postnet_init(k_post, cfg.latent_dim, cfg.latent_dim)
    state = {"asr": asr_s, "tts": tts_s}
    return params, state


def speech_to_text(params, state, rng, cfg: VQVAEConfig, phn_attr, all_mel, *,
                   paired_bs: int, first_n_real_mel: int = 0, train: bool):
    """ASR-encode a (possibly pair+unpair packed) mel batch and quantize.

    ``all_mel``: (B_all, T, n_mels), T a multiple of time_reduce_factor.
    Returns (p_code, quantized_latent, paired_post_prob|None, new_state).
    Slicing into pair/unpair halves and the trim/merge of the unpaired part
    (`src/vqvae.py:122-133`) are done by the caller with
    `ops.quantize.trim_merge_segments`.
    """
    k_asr, k_cb, k_post = jax.random.split(rng, 3)
    latents, asr_s = asr_apply(params["asr"], state["asr"], k_asr, all_mel,
                               cfg=cfg.encoder, train=train)
    post_prob = None
    if cfg.use_asr_postnet:
        post_prob = asr_postnet_apply(params["asr_postnet"], k_post,
                                      latents[:paired_bs], train=train)
    p_code, quantized = codebook_forward(params["codebook"], cfg.codebook, latents,
                                         phn_attr=phn_attr,
                                         first_n_real_mel=first_n_real_mel,
                                         rng=k_cb, train=train)
    new_state = dict(state)
    new_state["asr"] = asr_s
    return p_code, quantized, post_prob, new_state


def embed_text(params, cfg: VQVAEConfig, phn_attr, txt):
    """Text ids -> codebook latents (`src/vqvae.py:147`, `src/embed.py:96-103`)."""
    return codebook_inference(params["codebook"], cfg.codebook, txt, phn_attr)


def text_to_speech(params, state, rng, cfg: VQVAEConfig, all_latent, all_sid, *,
                   decode_steps: int, train: bool, teacher=None,
                   teacher_rows=None, tf_rate=1.0, latent_lengths=None,
                   wgrad_probes=None):
    """Decode a packed latent batch to (mel, linear, align, stop, new_state)
    — plus the decoder weight-grad ``aux`` when ``wgrad_probes`` is given
    (training-only fast backward; see `decoder.decoder_apply`).

    ``all_sid``: (B_all,) int speaker ids -> embedding lookup (`src/vqvae.py:163`).
    """
    spkr = params["spkr_embed"][all_sid]
    out = tts_apply(params["tts"], state["tts"], rng,
                    all_latent, spkr, cfg=cfg.tts,
                    decode_steps=decode_steps, train=train,
                    teacher=teacher, teacher_rows=teacher_rows,
                    tf_rate=tf_rate, txt_lengths=latent_lengths,
                    wgrad_probes=wgrad_probes)
    mel, lin, align, stop, tts_s = out[:5]
    new_state = dict(state)
    new_state["tts"] = tts_s
    if wgrad_probes is not None:
        return mel, lin, align, stop, new_state, out[5]
    return mel, lin, align, stop, new_state
