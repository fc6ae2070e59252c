"""Import a trained checkpoint of the PyTorch reference into this framework.

The reference saves ``torch.save({"model": vqvae.state_dict(), "optimizer":
..., "global_step": step})`` (`/root/reference/src/solver.py:204-218`). A
user migrating from the reference brings those ``.pth`` files; this module
converts the model weights + BatchNorm running stats into this framework's
(params, state) pytrees so inference/serving/fine-tuning continue from the
trained model (CLI: ``util_cli/import_reference_ckpt.py``).

The key mapping mirrors the reference's module tree name-for-name
(`src/vqvae.py:48-64` composition; `src/asr.py`, `src/embed.py`,
`src/module.py` leaf modules). Every torch tensor maps 1:1 onto a pytree
leaf with NO value transforms — both sides use torch layout conventions
(Linear (out,in), Conv1d (out,in,k), LSTM/GRU gate stacking), which the
per-module golden tests (tests/test_modules.py, tests/test_rnn.py) already
pin. BatchNorm ``running_mean/var`` land in the ``state`` pytree;
``num_batches_tracked`` and the frozen buffers (``codebook.onehot.weight``,
``codebook.phn_attr.weight``, non-learnable ``codebook.temp``) are consumed
and dropped — their values live in the config / data files here.

The optimizer moments are NOT imported (torch Adam state is index-keyed and
layout-coupled); an imported checkpoint carries ``opt_state=None`` and the
trainers fall back to a fresh ``tx.init`` with the Noam schedule count
fast-forwarded to the carried ``global_step``
(`train/optim.py:advance_lr_schedule`) — the schedule resumes at the
converged-model LR instead of silently restarting warmup.
"""

from __future__ import annotations

import numpy as np


class StateDictMismatch(RuntimeError):
    """A reference state_dict does not match the configured model."""


class _Puller:
    """Pop-and-validate access to a torch state_dict (name -> numpy)."""

    def __init__(self, sd):
        self.sd = dict(sd)

    def take(self, name, shape=None):
        if name not in self.sd:
            raise StateDictMismatch(
                f"reference checkpoint is missing '{name}' — wrong config for "
                f"this checkpoint? ({len(self.sd)} keys left)")
        v = np.asarray(self.sd.pop(name), dtype=np.float32)
        if shape is not None and tuple(v.shape) != tuple(shape):
            raise StateDictMismatch(
                f"'{name}' has shape {tuple(v.shape)}, expected {tuple(shape)}")
        return v

    def drop(self, name):
        self.sd.pop(name, None)

    def linear(self, name, bias=True):
        p = {"w": self.take(f"{name}.weight")}
        if bias:
            p["b"] = self.take(f"{name}.bias")
        return p

    def conv(self, name, bias=True):
        p = {"w": self.take(f"{name}.weight")}
        if bias:
            p["b"] = self.take(f"{name}.bias")
        return p

    def batchnorm(self, name, eps, momentum):
        """Returns (bn_params, bn_state). eps/momentum are config constants
        on this side (they are not tensors in torch state_dicts either)."""
        import jax.numpy as jnp

        p = {"scale": self.take(f"{name}.weight"), "bias": self.take(f"{name}.bias")}
        s = {"mean": self.take(f"{name}.running_mean"),
             "var": self.take(f"{name}.running_var"),
             "eps": jnp.float32(eps), "momentum": jnp.float32(momentum)}
        self.drop(f"{name}.num_batches_tracked")
        return p, s

    def lstm_cell(self, name):
        """nn.LSTMCell: weight_ih/weight_hh/bias_ih/bias_hh."""
        return {"w_ih": self.take(f"{name}.weight_ih"),
                "w_hh": self.take(f"{name}.weight_hh"),
                "b_ih": self.take(f"{name}.bias_ih"),
                "b_hh": self.take(f"{name}.bias_hh")}

    def rnn_layers(self, name, n_layers, bidirectional):
        """nn.LSTM/nn.GRU flat naming -> list of {fwd[, bwd]} dicts."""
        layers = []
        for li in range(n_layers):
            layer = {"fwd": self._rnn_dir(name, li, "")}
            if bidirectional:
                layer["bwd"] = self._rnn_dir(name, li, "_reverse")
            layers.append(layer)
        return layers

    def _rnn_dir(self, name, li, suffix):
        return {"w_ih": self.take(f"{name}.weight_ih_l{li}{suffix}"),
                "w_hh": self.take(f"{name}.weight_hh_l{li}{suffix}"),
                "b_ih": self.take(f"{name}.bias_ih_l{li}{suffix}"),
                "b_hh": self.take(f"{name}.bias_hh_l{li}{suffix}")}


def convert_state_dict(sd, cfg, phn_attr=None, *, strict=True):
    """torch ``VQVAE.state_dict()`` (tensor or numpy values) -> (params,
    state) pytrees matching ``models.vqvae.vqvae_init(cfg)``.

    ``strict``: raise if any checkpoint key is left unconsumed (catches
    config/checkpoint mismatches like a missing asr_postnet).
    """
    import jax
    import jax.numpy as jnp

    pl = _Puller({k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
                  for k, v in sd.items()})
    e, d, t = cfg.encoder, cfg.tts.decoder, cfg.tts

    # --- ASR encoder (`src/asr.py` CTC: layer{i}.conv/.bn, rnn, postnet) ---
    asr_p = {"convs": [pl.conv(f"asr.layer{i}.conv") for i in range(len(e.kernel))],
             "rnn": pl.rnn_layers("asr.rnn", e.rnn_layers, e.rnn_bid),
             "postnet": pl.linear("asr.postnet")}
    asr_s = {"bn": []}
    if e.batch_norm:
        bns = []
        for i in range(len(e.kernel)):
            bp, bs = pl.batchnorm(f"asr.layer{i}.bn", eps=1e-5, momentum=0.1)
            bns.append(bp)
            asr_s["bn"].append(bs)
        asr_p["bn"] = bns
    if e.layer_norm:
        ln = pl.linear("asr.norm_layer")
        asr_p["ln"] = {"scale": ln["w"], "bias": ln["b"]}

    # --- codebook (`src/embed.py` L2Embedding / SeperateEmbedding) ---
    cb = cfg.codebook
    cb_p = {}
    if cb.temp < 0:
        cb_p["temp"] = pl.take("codebook.temp", (1,))
    else:
        # frozen buffer: validate it matches the configured constant
        temp = pl.take("codebook.temp", (1,))
        if abs(float(temp[0]) - float(cb.temp)) > 1e-6:
            raise StateDictMismatch(
                f"checkpoint codebook.temp={float(temp[0])} but the config "
                f"says {cb.temp} (non-learnable)")
    if cb.use_phn_attr:
        cb_p["proj_attr"] = pl.linear("codebook.proj_attr")
        ckpt_attr = pl.take("codebook.phn_attr.weight")
        if phn_attr is not None and not np.allclose(
                np.asarray(phn_attr, np.float32), ckpt_attr, atol=1e-5):
            raise StateDictMismatch(
                "checkpoint's frozen phn_attr table differs from this run's "
                "phn_attr_pth — pass the same attribute CSV")
    pl.drop("codebook.onehot.weight")  # frozen identity buffer
    if cb.bone == "l2":
        cb_p["learnable_table"] = pl.take("codebook.learnable_table")
    elif cb.bone == "seperate":
        cb_p["asr_final"] = pl.linear("codebook.asr_final_layer")
        cb_p["embedding"] = pl.take("codebook.embedding.weight")
    else:  # pragma: no cover - codebook_init already rejects other bones
        raise NotImplementedError(cb.bone)

    # --- TTS text encoder (`src/module.py` Encoder: convs.{i}.{0=conv,1=bn}) ---
    enc_p = {"convs": [], "bn": [],
             "lstm": pl.rnn_layers("tts.encoder.lstm", t.enc_rnn_layer, True)}
    enc_s = {"bn": []}
    for i in range(t.enc_n_conv):
        enc_p["convs"].append(pl.conv(f"tts.encoder.convs.{i}.0.conv"))
        bp, bs = pl.batchnorm(f"tts.encoder.convs.{i}.1", eps=1e-5, momentum=0.1)
        enc_p["bn"].append(bp)
        enc_s["bn"].append(bs)

    # --- decoder (`src/module.py` Decoder) ---
    dec_p = {
        "prenet": [pl.linear(f"tts.decoder.prenet.layers.{i}.linear", bias=False)
                   for i in range(2)],
        "query_rnn": pl.lstm_cell("tts.decoder.query_rnn"),
        "dec_rnn": pl.lstm_cell("tts.decoder.dec_rnn"),
        "proj": pl.linear("tts.decoder.proj.linear"),
        "gate": pl.linear("tts.decoder.gate_layer.linear"),
    }
    attn = {"query_layer": pl.linear("tts.decoder.attn.query_layer.linear", bias=False),
            "memory_layer": pl.linear("tts.decoder.attn.memory_layer.linear", bias=False),
            "v": pl.linear("tts.decoder.attn.v.linear", bias=False)}
    if d.loc_aware:
        attn["loc_conv"] = pl.conv("tts.decoder.attn.loc_conv.conv", bias=False)
        attn["loc_linear"] = pl.linear("tts.decoder.attn.loc_linear.linear", bias=False)
    dec_p["attn"] = attn
    mode = d.spkr_embed_mode.lower()
    if mode == "adain":
        dec_p["pseudo_mean"] = pl.linear("tts.decoder.pseudo_latent_mean")
        dec_p["pseudo_std"] = pl.linear("tts.decoder.pseudo_latent_std.0")
    elif mode == "concat":
        dec_p["spkr_mem_proj"] = pl.linear("tts.decoder.spkr_mem_proj")
    elif mode == "add":
        dec_p["spkr_proj"] = pl.linear("tts.decoder.spkr_proj")
        dec_p["spkr_mem_proj"] = pl.linear("tts.decoder.spkr_mem_proj")

    tts_p = {"encoder": enc_p, "decoder": dec_p}
    tts_s = {"encoder": enc_s}

    # --- CBHG postnet (`src/module.py` CBHG; tts.postnet = [CBHG, Linear]) ---
    if t.linear_dim is not None:
        cbhg = {"banks": [], "projs": [],
                "pre_highway": pl.linear("tts.postnet.0.pre_highway_proj", bias=False),
                "highways": [{"H": pl.linear(f"tts.postnet.0.highways.{h}.H"),
                              "T": pl.linear(f"tts.postnet.0.highways.{h}.T")}
                             for h in range(4)],
                "gru": {}}
        post_s = {"banks": [], "projs": []}
        for i in range(8):  # K=8 conv bank (`src/tts.py` CBHG(K=8)-equivalent)
            cbhg["banks"].append(
                {"conv": pl.conv(f"tts.postnet.0.conv1d_banks.{i}.conv1d", bias=False)})
            bp, bs = pl.batchnorm(f"tts.postnet.0.conv1d_banks.{i}.bn",
                                  eps=1e-3, momentum=0.99)
            cbhg["banks"][-1]["bn"] = bp
            post_s["banks"].append(bs)
        for j in range(2):
            cbhg["projs"].append(
                {"conv": pl.conv(f"tts.postnet.0.conv1d_projs.{j}.conv1d", bias=False)})
            bp, bs = pl.batchnorm(f"tts.postnet.0.conv1d_projs.{j}.bn",
                                  eps=1e-3, momentum=0.99)
            cbhg["projs"][-1]["bn"] = bp
            post_s["projs"].append(bs)
        gru = pl.rnn_layers("tts.postnet.0.gru", 1, True)[0]
        cbhg["gru"] = gru
        tts_p["postnet"] = {"cbhg": cbhg, "linear": pl.linear("tts.postnet.1")}
        tts_s["postnet"] = post_s

    params = {"asr": asr_p, "codebook": cb_p,
              "spkr_embed": pl.take("spkr_embed.weight"), "tts": tts_p}
    state = {"asr": asr_s, "tts": tts_s}

    # --- optional ASRPostnet (`src/vqvae.py:50-53`) ---
    if cfg.use_asr_postnet:
        params["asr_postnet"] = {
            "rnn": pl.rnn_layers("asr_postnet.rnn", 2, True),
            "linear": pl.linear("asr_postnet.linear")}

    if strict and pl.sd:
        raise StateDictMismatch(
            "unconsumed reference keys (checkpoint/config mismatch): "
            + ", ".join(sorted(pl.sd)[:12])
            + (" ..." if len(pl.sd) > 12 else ""))

    to_jnp = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
    return to_jnp(params), to_jnp(state)


def import_reference_checkpoint(pth_path, cfg, phn_attr=None, *, strict=True):
    """Load a reference ``.pth`` (the solver triple or a bare state_dict)
    and return ``{"model": params, "state": state, "optimizer": None,
    "global_step": step}`` — the dict shape `train.checkpoint.load_checkpoint`
    produces, so callers can treat imported and native checkpoints alike."""
    import torch

    raw = torch.load(pth_path, map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "model" in raw:
        sd, step = raw["model"], int(raw.get("global_step", 0))
    else:
        sd, step = raw, 0
    params, state = convert_state_dict(sd, cfg, phn_attr, strict=strict)
    return {"model": params, "state": state, "optimizer": None,
            "global_step": step, "extra": {}}
