"""Shared phoneme codebook / quantizer.

Parity target: `/root/reference/src/embed.py` —
  * ``L2Embedding`` (`:57-147`): softmax over negative batched L2 distance
    scaled by relu(temp) (`:124-127`, ``neg_batch_l2`` `:208-213`), argmax
    codebook pick, stop-grad lookup (`:134`) or straight-through one-hot
    (`:137-138`), residual-ST quantization ``enc + code - sg(enc)`` (`:145`),
    optional skip connection (`:140-142`), frozen phonological-attribute
    features concatenated through a learned projection (`:75-94`), and the
    ``first_n_real_mel`` table-detach for fake-mel inputs (`:114-122`).
  * ``SeperateEmbedding`` (`:150-205`): plain linear->softmax ASR head plus a
    separate TTS embedding (speech-chain baseline).

All functions are pure; ``stop_gradient`` realizes every ``.detach()``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .common import torch_linear_init, linear, xavier_normal_embedding_init

EPS = 1e-5  # (`src/embed.py:7`)


@dataclasses.dataclass(frozen=True)
class CodebookConfig:
    """Mirror of the YAML `model.codebook` block."""

    bone: str = "l2"  # 'l2' | 'seperate'
    vocab_size: int = 43
    latent_dim: int = 64
    commit_weight: float = 0.0
    vq_weight: float = 0.0
    temp: float = 1.0
    skip_prob: float = 0.0
    stop_grad: bool = True
    softmax: str = "normal"
    use_phn_attr: bool = True
    attr_dim: int = 31
    proj_attr: int = 16

    @property
    def out_dim(self) -> int:
        return self.latent_dim

    @property
    def learn_dim(self) -> int:
        return self.latent_dim - (self.proj_attr if self.use_phn_attr else 0)


def neg_batch_l2(x, table):
    """- ||x - e||^2 for every codebook entry (`src/embed.py:208-213`).

    x: (..., D); table: (V, D) -> (..., V)."""
    x2 = jnp.sum(x**2, axis=-1, keepdims=True)
    e2 = jnp.sum(table**2, axis=-1)
    return -(x2 + e2 - 2.0 * jnp.einsum("...d,vd->...v", x, table))


def codebook_init(key, cfg: CodebookConfig, phn_attr=None):
    """phn_attr: (vocab_size, attr_dim) frozen phonological attributes
    (rows 0..2 zeros for the specials; `src/util.py:240-245`)."""
    if cfg.commit_weight != 0 or cfg.vq_weight != 0:
        # commit/VQ losses are accepted in the YAML schema but not implemented
        # (the reference asserts the same, `src/embed.py:65-66`) — fail loudly
        # rather than silently training without them
        raise ValueError(
            "codebook commit_weight/vq_weight must be 0: the commit/VQ losses "
            "are not implemented (straight-through + CTC/recon losses train "
            f"the codebook), got commit_weight={cfg.commit_weight}, "
            f"vq_weight={cfg.vq_weight}")
    ks = jax.random.split(key, 4)
    p = {}
    if cfg.temp < 0:
        # learnable temperature, init 1.0 (`src/embed.py:33-36`); temp >= 0
        # is a frozen buffer handled as a config constant (not a param, so
        # the optimizer can't drift it)
        p["temp"] = jnp.asarray([1.0], jnp.float32)
    if cfg.use_phn_attr:
        assert phn_attr is not None and phn_attr.shape == (cfg.vocab_size, cfg.attr_dim)
        p["proj_attr"] = torch_linear_init(ks[0], cfg.attr_dim, cfg.proj_attr)
    if cfg.bone == "l2":
        # randn init (`src/embed.py:85`)
        p["learnable_table"] = jax.random.normal(ks[1], (cfg.vocab_size, cfg.learn_dim))
    elif cfg.bone == "seperate":
        p["asr_final"] = torch_linear_init(ks[2], cfg.latent_dim, cfg.vocab_size)
        p["embedding"] = xavier_normal_embedding_init(ks[3], cfg.vocab_size, cfg.learn_dim)
    else:
        raise NotImplementedError(cfg.bone)
    return p


def _full_table(params, cfg: CodebookConfig, phn_attr, *, detach=False):
    table = params["learnable_table"]
    if detach:
        table = jax.lax.stop_gradient(table)
    if cfg.use_phn_attr:
        proj = linear(params["proj_attr"], phn_attr)
        if detach:
            proj = jax.lax.stop_gradient(proj)
        table = jnp.concatenate([table, proj], axis=-1)
    return table  # (V, latent_dim)


def full_codebook_table(params, cfg: CodebookConfig, phn_attr=None):
    """The complete embedding table (learnable part ++ projected attributes)
    — the reference's `.embedding` property (`src/embed.py:87-94`), used for
    the TensorBoard embedding projector log (`bin/train_vqvae.py:425`)."""
    if cfg.bone == "l2":
        return _full_table(params, cfg, phn_attr)
    emb = params["embedding"]
    if cfg.use_phn_attr:
        emb = jnp.concatenate([emb, linear(params["proj_attr"], phn_attr)], axis=-1)
    return emb


def codebook_inference(params, cfg: CodebookConfig, txt, phn_attr=None):
    """Text ids -> latent vectors (TTS input path; `src/embed.py:96-103,180-185`)."""
    if cfg.bone == "l2":
        emb = params["learnable_table"][txt]
    else:
        emb = params["embedding"][txt]
    if cfg.use_phn_attr:
        emb = jnp.concatenate([emb, linear(params["proj_attr"], phn_attr[txt])], axis=-1)
    return emb


def codebook_forward(params, cfg: CodebookConfig, enc_embs, *, phn_attr=None,
                     first_n_real_mel: int = 0, rng=None, train: bool = False):
    """Encoder latents -> (p_code (B,S,V), quantized latents (B,S,D)).

    ``first_n_real_mel``: static count of leading batch rows that are *real*
    mel — for the remaining (fake-mel) rows the table is detached so p_code
    objectives can't move the codebook (`src/embed.py:114-122`).
    """
    if cfg.bone == "seperate":
        p_code = jax.nn.softmax(linear(params["asr_final"], enc_embs), axis=-1)
        picked = jnp.argmax(p_code, axis=-1)
        emb = params["embedding"]
        if cfg.stop_grad:
            new_latent = emb[picked]
            if cfg.use_phn_attr:
                new_latent = jnp.concatenate(
                    [new_latent, linear(params["proj_attr"], phn_attr[picked])], axis=-1)
        else:
            onehot = jax.nn.one_hot(picked, cfg.vocab_size, dtype=p_code.dtype)
            p_hard = p_code + jax.lax.stop_gradient(onehot - p_code)
            new_latent = p_hard @ emb
            if cfg.use_phn_attr:
                attr_soft = linear(params["proj_attr"], p_hard @ phn_attr)
                new_latent = jnp.concatenate([new_latent, attr_soft], axis=-1)
        return p_code, new_latent

    # ---- 'l2' bone ----
    B, S, _ = enc_embs.shape
    table = _full_table(params, cfg, phn_attr)
    temp = jax.nn.relu(params["temp"] if cfg.temp < 0 else jnp.float32(cfg.temp))
    if first_n_real_mel > 0:
        sim_real = temp * neg_batch_l2(enc_embs[:first_n_real_mel], table)
        table_d = _full_table(params, cfg, phn_attr, detach=True)
        sim_fake = temp * neg_batch_l2(enc_embs[first_n_real_mel:], table_d)
        similarity = jnp.concatenate([sim_real, sim_fake], axis=0)
    else:
        similarity = temp * neg_batch_l2(enc_embs, table)
    p_code = jax.nn.softmax(similarity, axis=-1)
    picked = jnp.argmax(p_code, axis=-1)

    if cfg.stop_grad:
        picked_code = table[picked]
    else:
        onehot = jax.nn.one_hot(picked, cfg.vocab_size, dtype=p_code.dtype)
        p_hard = p_code + jax.lax.stop_gradient(onehot - p_code)
        picked_code = p_hard @ table

    quantized = enc_embs + picked_code - jax.lax.stop_gradient(enc_embs)
    if train and cfg.skip_prob > 0 and rng is not None:
        skip = jax.random.uniform(rng, ()) < cfg.skip_prob
        quantized = jnp.where(skip, enc_embs, quantized)
    return p_code, quantized
