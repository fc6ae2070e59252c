"""Language-model pretraining components.

Parity target: `/root/reference/src/lm.py` — upstream this module is
*vestigial dead code* (it imports `VQEmbedding`, `TransformerEncoder`,
`SpeechEncoder`, `ASRDecoder` which do not exist anywhere in the snapshot,
`src/lm.py:9-10`, and nothing imports it). The documented capabilities are
rebuilt here in working form:

  * ``AudioLM`` (`src/lm.py:16-93`): the TTS decoder trained as an
    unconditional audio LM (attention bypassed via the decoder's
    ``pretrain=True`` mode) + CBHG postnet — its weights initialize the TTS
    decoder (``pretrained_tts``).
  * ``TextLM`` (`:96-138`): causal phoneme LM whose output layer is the
    *shared codebook table* under the same negative-L2 measurement as
    ``L2Embedding`` — pretrains the codebook (``pretrained_emb``).
  * ``DenoisingLM`` (`:141-191`): text -> fake-wave embedding -> conv encoder
    -> neg-L2 posteriors over the codebook.
  * ``RNNLM`` (`:193-231`): embedding -> (multi-layer) LSTM/GRU -> projection
    -> neg-L2 log-softmax. (The reference's `log_softmax(+distance)` at
    `:229` is a sign bug — not copied.)
  * ``NgramPrior`` (`:233-339`): KLD of CTC posteriors against an n-gram
    probability table, with token/sentence/batch reductions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rnn import _gru_scan, _lstm_scan, gru_init, lstm_init
from .common import dropout, linear, torch_linear_init, xavier_normal_embedding_init
from .embed import neg_batch_l2

EPS = 1e-10  # (`src/lm.py:13`)


# ---------------- RNNLM ----------------

def rnnlm_init(key, vocab_size, emb_dim, module="lstm", dim=512, n_layers=2):
    ks = jax.random.split(key, n_layers + 2)
    init = lstm_init if module.lower() == "lstm" else gru_init
    layers = [init(ks[i], emb_dim if i == 0 else dim, dim) for i in range(n_layers)]
    return {"emb": xavier_normal_embedding_init(ks[-2], vocab_size, emb_dim),
            "rnn": layers, "post": torch_linear_init(ks[-1], dim, emb_dim, bias=False)}


def rnnlm_apply(params, rng, txt, *, module="lstm", drop_rate=0.0, train=True):
    """txt (B, U) -> next-token log-probs (B, U, V) via neg-L2 to the
    embedding table (`src/lm.py:213-231`)."""
    h = params["emb"][txt]
    if drop_rate > 0:
        rng, sub = jax.random.split(rng)
        h = dropout(sub, h, drop_rate, enabled=train)
    scan = _lstm_scan if module == "lstm" else _gru_scan
    for layer in params["rnn"]:
        h = scan(layer, h)
    h = linear(params["post"], h)
    return jax.nn.log_softmax(neg_batch_l2(h, params["emb"]), axis=-1)


def rnnlm_loss(params, rng, txt, txt_len, *, module="lstm", train=True):
    """Shifted next-token NLL with pad masking."""
    logp = rnnlm_apply(params, rng, txt[:, :-1], module=module, train=train)
    tgt = txt[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = (jnp.arange(tgt.shape[1])[None, :] < (txt_len - 1)[:, None]).astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# ---------------- TextLM (codebook pretraining) ----------------

def textlm_init(key, vocab_size, latent_dim, *, rnn_dim=256, n_layers=1):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {"in_emb": xavier_normal_embedding_init(k1, vocab_size, latent_dim),
            "rnn": [lstm_init(jax.random.fold_in(k2, i),
                              latent_dim if i == 0 else rnn_dim, rnn_dim)
                    for i in range(n_layers)],
            "proj": torch_linear_init(k3, rnn_dim, latent_dim),
            # the table being pretrained — graftable into VQVAE's codebook
            "learnable_table": xavier_normal_embedding_init(k4, vocab_size, latent_dim)}


def textlm_apply(params, txt):
    """Causal LM whose output distribution is softmax(-L2(h, codebook))
    (the `L2Embedding` measurement, `src/embed.py:124-127`)."""
    h = params["in_emb"][txt]
    for layer in params["rnn"]:
        h = _lstm_scan(layer, h)
    h = linear(params["proj"], h)
    return jnp.log(jax.nn.softmax(neg_batch_l2(h, params["learnable_table"]), axis=-1) + EPS)


def textlm_loss(params, txt, txt_len):
    logp = textlm_apply(params, txt[:, :-1])
    tgt = txt[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = (jnp.arange(tgt.shape[1])[None, :] < (txt_len - 1)[:, None]).astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# ---------------- DenoisingLM ----------------

def denoising_lm_init(key, vocab_size, in_dim, latent_dim, *, channels=256, n_conv=3):
    ks = jax.random.split(key, n_conv + 2)
    from .common import conv1d_init

    convs, d = [], in_dim
    for i in range(n_conv):
        convs.append(conv1d_init(ks[i], d, channels if i < n_conv - 1 else latent_dim, 3))
        d = channels if i < n_conv - 1 else latent_dim
    return {"text_to_fake_wave": xavier_normal_embedding_init(ks[-2], vocab_size, in_dim),
            "convs": convs,
            "emb": xavier_normal_embedding_init(ks[-1], vocab_size, latent_dim)}


def denoising_lm_apply(params, txt):
    """Corrupted text -> conv encoder -> neg-L2 log-probs (`src/lm.py:166-191`)."""
    from .common import conv1d

    h = params["text_to_fake_wave"][txt]
    for i, c in enumerate(params["convs"]):
        h = conv1d(c, h)
        if i < len(params["convs"]) - 1:
            h = jax.nn.relu(h)
    return jax.nn.log_softmax(neg_batch_l2(h, params["emb"]), axis=-1)


# ---------------- NgramPrior ----------------

@dataclasses.dataclass(frozen=True)
class NgramPrior:
    """KLD of CTC posteriors vs an n-gram table (`src/lm.py:233-339`).

    ``table``: for n>1 a (vocab^(n-1), vocab) row-stochastic array; for n==1
    a (vocab,) unigram distribution. ``reduction``: token|sentence|batch.
    """

    vocab_size: int
    n_gram: int
    weight: float
    reduction: str = "token"
    start_step: int = 0

    @staticmethod
    def load_table(path):
        return jnp.asarray(np.load(path)) + EPS

    def compute_loss(self, table, enc_prob, enc_len):
        B, T, V = enc_prob.shape
        if self.n_gram > 1:
            idx = jnp.argmax(jax.lax.stop_gradient(enc_prob), axis=-1)
            # prefix: zero pad + <sos>=1 + shifted codes (`src/lm.py:274-277`)
            idx = jnp.concatenate([
                jnp.zeros((B, max(0, self.n_gram - 2)), idx.dtype),
                jnp.ones((B, 1), idx.dtype), idx[:, :-1]], axis=-1)
            # n-1 gram -> flat prefix index (`src/lm.py:250-252`)
            powers = jnp.asarray([self.vocab_size ** (self.n_gram - 2 - i)
                                  for i in range(self.n_gram - 1)], idx.dtype)
            t0 = jnp.arange(T)[:, None] + jnp.arange(self.n_gram - 1)[None, :]
            prefix = jnp.sum(idx[:, t0] * powers[None, None, :], axis=-1)
            prior = table[prefix]  # (B, T, V)
        else:
            prior = jnp.broadcast_to(table[None, None, :], (B, T, V))

        mask = jnp.arange(T)[None, :, None] >= enc_len[:, None, None]
        prior = jnp.where(mask, EPS, prior)
        lens = enc_len.astype(jnp.float32)

        if self.reduction == "token":
            kld = -jnp.sum(enc_prob * jnp.log(prior), axis=-1)
            return jnp.mean(jnp.sum(kld, axis=-1) / lens)
        if self.reduction == "sentence":
            ep = jnp.sum(enc_prob, axis=1) / lens[:, None]
            pp = jnp.sum(prior, axis=1) / lens[:, None]
            return jnp.mean(jnp.sum(-ep * jnp.log(pp), axis=-1))
        if self.reduction == "batch":
            ep = jnp.mean(jnp.sum(enc_prob, axis=1) / lens[:, None], axis=0)
            pp = jnp.mean(jnp.sum(prior, axis=1) / lens[:, None], axis=0)
            return jnp.sum(-ep * jnp.log(pp))
        raise NotImplementedError(self.reduction)


# ---------------- AudioLM ----------------

def audiolm_init(key, dec_cfg, linear_dim=None):
    """Decoder (pretrain mode) + optional CBHG postnet (`src/lm.py:16-62`).

    The param tree is laid out so `train.checkpoint.load_subtree` can graft
    'decoder' / 'postnet' straight into a VQVAE's TTS (``pretrained_tts``).
    """
    import dataclasses as _dc

    from .cbhg import cbhg_init
    from .decoder import decoder_init

    k1, k2, k3 = jax.random.split(key, 3)
    dec_cfg = _dc.replace(dec_cfg, pretrain=True)
    params = {"decoder": decoder_init(k1, dec_cfg)}
    state = {}
    if linear_dim is not None:
        cbhg_p, cbhg_s = cbhg_init(k2, dec_cfg.n_mels, K=8)
        params["postnet"] = {"cbhg": cbhg_p,
                             "linear": torch_linear_init(k3, dec_cfg.n_mels * 2, linear_dim)}
        state["postnet"] = cbhg_s
    return params, state, dec_cfg


def audiolm_apply(params, state, rng, mel_teacher, *, dec_cfg, train=True,
                  wgrad_probes=None):
    """Teacher-forced unconditional decode over the input mel
    (`src/lm.py:71-93`). Returns (mel_pred, linear_pred|None, new_state) —
    plus the decoder weight-grad ``aux`` when ``wgrad_probes`` is given
    (`decoder.decoder_apply` batched-dW path)."""
    from .cbhg import cbhg_apply
    from .decoder import decoder_apply

    B, T, M = mel_teacher.shape
    empty_memory = jnp.zeros((B, 2, dec_cfg.enc_embed_dim))
    spkr = jnp.zeros((B, dec_cfg.spkr_embed_dim))
    out = decoder_apply(params["decoder"], rng, empty_memory, spkr,
                        cfg=dec_cfg, decode_steps=T // dec_cfg.n_frames_per_step,
                        train=train, teacher=mel_teacher, tf_rate=1.0,
                        wgrad_probes=wgrad_probes)
    mel = out[0]
    new_state = dict(state)
    lin = None
    if "postnet" in params:
        h, cbhg_s = cbhg_apply(params["postnet"]["cbhg"], state["postnet"], mel, train=train)
        lin = linear(params["postnet"]["linear"], h)
        new_state["postnet"] = cbhg_s
    if wgrad_probes is not None:
        return mel, lin, new_state, out[3]
    return mel, lin, new_state
