"""Online TTS serving: phoneme ids -> waveform, packaged for a production
endpoint on TPU.

The reference has no online serving story — inference is the offline batch
solver `bin/gen_specgram.py:89-129` plus the offline vocoder CLI
`util/gen_wav_from_specgram.py:37-57`. This module is the TPU-native online
counterpart: the identical math (codebook embed -> Tacotron2 AR decode at
tf_rate=0 -> CBHG mel->linear -> denormalize -> Griffin-Lim -> inverse
pre-emphasis) packaged as TWO independently jitted stage programs,

  synthesis: text ids -> linear-amplitude spectrogram
  vocoder:   linear-amplitude spectrogram -> waveform

chained by async dispatch. Two stages rather than one fused jit because

  1. the fused text->decode->Griffin-Lim monolith hits pathological XLA
     compile times at serving batch (never finished at B>=32 on the remote
     tunnel; docs/PERFORMANCE.md "Serving-e2e at larger batch"), while each
     stage compiles in minutes at any batch, and
  2. a deployed endpoint batches the stages independently anyway — the AR
     decode is weight-streaming-bound (~35 MB of bf16-converted weights
     re-read per decode step) so synthesis throughput scales with batch
     until ~B=512, whereas Griffin-Lim is dot-roofline-bound and saturates
     much earlier.

`bench.py` (throughput at B=16/64) and `tools/serve_latency.py` (B=1/4
single-request latency) time exactly the programs built here, so the
published numbers describe this API.

Decode length: pure-text serving has no teacher mel, so the decode budget
follows the reference's own frames-per-phoneme rule — ``FRAME_PHN_RATIO``
(6.0 mel frames per input token, `src/vqvae.py:18,156-159`) plus the
40-frame inference margin (`bin/gen_specgram.py:17`) — rounded up to a
step bucket so a stream of variable-length requests reuses a handful of
compiled programs instead of recompiling per length.
"""

from __future__ import annotations

import threading
from collections import OrderedDict

import numpy as np

import jax
import jax.numpy as jnp

from .models import vqvae as V
from .ops.griffin_lim import specgram_to_waveform

INFERENCE_MARGIN_FRAMES = 40  # (`bin/gen_specgram.py:17`)


def serving_stages(cfg, featurizer, phn_attr, decode_steps, *,
                   mask_text_padding=True):
    """Build the (synth, vocode) stage jits.

    ``synth(params, state, text, sid, key) -> linear amplitude (B, T, F)``
    ``vocode(amp, key) -> waveform (B, S)``

    ``mask_text_padding``: mask attention over padded text positions
    (matches the eval step; the bench pins it True).

    (An int8 weight-streaming option lived here through r4; retired — TP
    strictly dominates it on v5e, docs/PERFORMANCE.md "int8-under-TP byte
    economics".)
    """
    c = featurizer.cfg

    @jax.jit
    def synth(params, state, text, sid, key):
        lat = V.embed_text(params, cfg, phn_attr, text)
        lengths = jnp.sum(text != 0, -1) + 1 if mask_text_padding else None
        mel, lin, align, stop, _ = V.text_to_speech(
            params, state, key, cfg, lat, sid, decode_steps=decode_steps,
            train=False, teacher=None, tf_rate=0.0, latent_lengths=lengths)
        return featurizer.linear_to_amp(lin)

    @jax.jit
    def vocode(amp, key):
        return specgram_to_waveform(
            amp, key, n_fft=c.n_fft, hop=c.hop_length,
            win_length=c.win_length, preemphasis_coeff=c.preemphasis_coeff)

    return synth, vocode


class _Once:
    """Build-once cell: the first ``result()`` runs the build, concurrent
    callers for the SAME key wait on this cell's lock (not the server's LRU
    lock, so other keys keep serving), later callers get the memoized value.
    A failed build leaves the cell retryable."""

    def __init__(self, build):
        self._build = build
        self._lock = threading.Lock()
        self._value = None
        self._done = False

    def result(self):
        with self._lock:
            if not self._done:
                self._value = self._build()
                self._done = True
                self._build = None
            return self._value


class TTSServer:
    """A loaded VQVAE checkpoint wrapped as a synthesis endpoint.

    >>> server = TTSServer.from_checkpoint("config/supervised.yaml",
    ...                                     "ckpt/best_tts_loss.pth")
    >>> wav = server.synthesize(text_ids, speaker_ids)   # (B, S) float32

    Per-length stage programs are compiled once and kept in a bounded
    per-instance LRU (decode lengths are bucketed to multiples of
    ``step_bucket`` macro-steps, so a handful of entries covers real
    traffic; ``program_cache_size`` bounds the worst case — a long-lived
    endpoint fed adversarial text lengths evicts the least-recently-used
    program instead of accumulating compiled executables without limit;
    with ``compile_cache`` set, a re-requested evicted bucket re-loads from
    the on-disk cache instead of re-invoking XLA). Pass a
    `jax.sharding.Mesh` to shard the request batch over the ``data`` axis
    and the weights over the ``model`` axis (batch must divide the data
    axis; TP2 output equality is covered by `tests/test_parallel.py`).

    Thread safety: ``synthesize`` / ``synthesize_full`` may be called from
    many threads concurrently. The program LRU and the RNG counter are
    lock-protected; a cache miss compiles under a per-key cell so two
    threads racing the same decode bucket build once and everyone else
    (hitting other buckets) keeps serving — the global lock is only held
    for dict bookkeeping, never across a compile. Eviction is safe during
    use: an evicted program already handed to a caller stays valid (the
    caller holds the jitted callables); eviction only drops the cache's
    reference — and only ever targets COMPLETED builds, so a mid-compile
    bucket can never be evicted into a duplicate concurrent compile (the
    bound is therefore on *retained compiled programs*; mid-build cells may
    transiently push the dict past it). Covered by `tests/test_serve.py`
    (8-thread hammer against a 2-entry cache).

    Note: the persistent compile cache is process-global and
    last-writer-wins — constructing two servers with different
    ``compile_cache`` dirs in one process re-points later compiles of BOTH
    at the second directory (`utils/compile_cache.py`).
    """

    def __init__(self, cfg, featurizer, phn_attr, params, state, *,
                 mesh=None, step_bucket=25, compile_cache=None,
                 program_cache_size=8):
        if compile_cache:
            from .utils.compile_cache import enable_compilation_cache

            # serving cold-start is compile-dominated (minutes per decode-
            # length bucket on the remote TPU); a rolling-restarted replica
            # with the cache mounted warms up in seconds
            enable_compilation_cache(compile_cache)
        self.cfg = cfg
        self.featurizer = featurizer
        self.phn_attr = phn_attr
        self.mesh = mesh
        if mesh is not None:
            from .parallel.mesh import replicate, shard_params

            params = shard_params(params, mesh)
            state = replicate(state, mesh)
        self.params = params
        self.state = state
        self.step_bucket = int(step_bucket)
        self.program_cache_size = max(1, int(program_cache_size))
        self._programs: OrderedDict = OrderedDict()
        self._counter = 0
        self._lock = threading.Lock()  # guards _programs + _counter

    # ---- construction -----------------------------------------------------

    @classmethod
    def from_checkpoint(cls, config, ckpt_path, *, mesh=None, step_bucket=25,
                        compile_cache=None):
        """Build from a training YAML (path or loaded dict) + checkpoint.

        Mirrors the inference solver's model assembly
        (`train/gen_specgram.py:47-87`, reference `bin/gen_specgram.py:69-82`):
        audio/featurizer settings come from the config's ``data.audio``
        section, the model topology from ``model``, and params/state from the
        checkpoint triple.
        """
        import json

        import yaml

        from .ops.features import AudioConfig, AudioFeaturizer
        from .train.checkpoint import load_checkpoint
        from .utils.metrics import read_phn_attr

        if isinstance(config, str):
            config = yaml.safe_load(open(config))
        audio = config["data"]["audio"]
        acfg = AudioConfig(
            num_freq=audio["num_freq"], num_mels=audio["num_mels"],
            frame_length_ms=audio["frame_length_ms"],
            frame_shift_ms=audio["frame_shift_ms"],
            preemphasis_coeff=audio["preemphasis_coeff"],
            sample_rate=audio["sample_rate"], use_linear=audio["use_linear"],
            snr_range=tuple(audio["snr_range"]),
            time_stretch_range=tuple(audio["time_stretch_range"]))
        featurizer = AudioFeaturizer(acfg)

        from .data.text import load_text_encoder

        tokenizer = load_text_encoder("phoneme",
                                      vocab_file=config["data"]["corpus"]["vocab_file"])
        n_spkr = len(json.load(open(config["data"]["corpus"]["spkr_map"])))

        model_cfg = dict(config["model"])
        for k in ("pretrained_asr", "pretrained_emb", "pretrained_tts"):
            model_cfg.pop(k, None)
        phn_attr_pth = model_cfg["codebook"].get("phn_attr_pth") or ""
        phn_attr = read_phn_attr(phn_attr_pth) if phn_attr_pth else None
        cfg = V.config_from_yaml(
            model_cfg, n_mels=acfg.num_mels,
            linear_dim=acfg.num_freq if acfg.use_linear else None,
            vocab_size=tokenizer.vocab_size, n_spkr=n_spkr,
            attr_dim=0 if phn_attr is None else phn_attr.shape[1])

        ckpt = load_checkpoint(ckpt_path)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt["model"])
        state = jax.tree_util.tree_map(jnp.asarray, ckpt["state"])
        server = cls(cfg, featurizer,
                     None if phn_attr is None else jnp.asarray(phn_attr),
                     params, state, mesh=mesh, step_bucket=step_bucket,
                     compile_cache=compile_cache)
        server.tokenizer = tokenizer
        return server

    # ---- decode-length policy ----------------------------------------------

    def decode_steps_for(self, text) -> int:
        """Macro-step budget for a padded text batch: FRAME_PHN_RATIO frames
        per longest-text token + the 40-frame margin, bucketed up. All-pad
        text (n_tok floors at 1) still yields the margin-sized budget."""
        n_tok = int(np.max(np.sum(np.asarray(text) != 0, -1))) + 1
        r = self.cfg.n_frames_per_step
        steps = (int(n_tok * V.FRAME_PHN_RATIO) + INFERENCE_MARGIN_FRAMES + r - 1) // r
        b = self.step_bucket
        return ((steps + b - 1) // b) * b

    @staticmethod
    def _check_decode_steps(decode_steps):
        if decode_steps is not None and int(decode_steps) < 1:
            raise ValueError(
                "decode_steps must be >= 1 (got %r); omit it to use the "
                "frames-per-phoneme policy (decode_steps_for)" % (decode_steps,))

    def _cached_program(self, kind, decode_steps, build):
        """Bounded LRU over compiled stage programs, keyed by (kind, length).

        Eviction drops the jitted callables (and with them the compiled
        executables); a later request for that bucket rebuilds them — from
        the persistent compile cache in seconds when one is configured.

        Thread-safe: dict bookkeeping (hit/move/insert/evict) happens under
        the server lock; the build itself runs under the entry's own `_Once`
        lock so a slow compile never blocks hits on other buckets. Only
        COMPLETED cells are eviction victims: evicting a mid-build cell
        would let a re-request for the same bucket start a duplicate
        multi-minute compile of the identical program. So the bound holds
        at rest, and during concurrent cold builds the dict may transiently
        hold up to ``program_cache_size`` completed + one mid-build cell per
        distinct in-flight bucket (cells are tiny; the compiled programs
        themselves never exceed the bound)."""
        key = (kind, int(decode_steps))
        with self._lock:
            entry = self._programs.get(key)
            if entry is None:
                entry = _Once(build)
                self._programs[key] = entry
            else:
                self._programs.move_to_end(key)
            self._evict_completed_locked()
        value = entry.result()
        with self._lock:  # this build may have pushed the at-rest count over
            self._evict_completed_locked()
        return value

    def _evict_completed_locked(self):
        """Drop oldest COMPLETED cells until within bound (caller holds
        ``self._lock``). ``_done`` is read without the cell's own lock: a
        stale False only postpones eviction to the post-build trim."""
        excess = len(self._programs) - self.program_cache_size
        if excess > 0:
            for k in [k for k, v in self._programs.items() if v._done][:excess]:
                del self._programs[k]

    def stages(self, decode_steps: int):
        """(synth, vocode) jits for one bucketed decode length (LRU-cached)."""
        return self._cached_program(
            "stages", decode_steps,
            lambda: serving_stages(self.cfg, self.featurizer, self.phn_attr,
                                   decode_steps))

    # ---- request paths -----------------------------------------------------

    def _key(self, key):
        if key is None:
            with self._lock:
                c = self._counter
                self._counter += 1
            key = jax.random.fold_in(jax.random.PRNGKey(0), c)
        return key

    def _place(self, text, sid):
        text, sid = jnp.asarray(text, jnp.int32), jnp.asarray(sid, jnp.int32)
        if self.mesh is not None:
            from .parallel.mesh import shard_batch

            placed = shard_batch(dict(t=text, s=sid), self.mesh)
            text, sid = placed["t"], placed["s"]
        return text, sid

    def synthesize(self, text, sid, key=None, *, decode_steps=None):
        """Text ids (B, U) + speaker ids (B,) -> waveforms (B, S) float32.

        Both stages are dispatched back-to-back (JAX async dispatch keeps
        the device queue full); the return materializes on host.
        """
        self._check_decode_steps(decode_steps)
        text, sid = self._place(text, sid)
        steps = decode_steps or self.decode_steps_for(text)
        synth, vocode = self.stages(steps)
        k1, k2 = jax.random.split(self._key(key))
        wav = vocode(synth(self.params, self.state, text, sid, k1), k2)
        return np.asarray(wav)

    def synthesize_full(self, text, sid, key=None, *, decode_steps=None):
        """Like `synthesize` but also returns the offline-solver artifacts:
        dict(wav, mel, linear, align) with the alignment cropped per
        utterance exactly as `{id}-align.npy` is
        (`train/gen_specgram.py:105-124`, `bin/gen_specgram.py:112-124`)."""
        self._check_decode_steps(decode_steps)
        text, sid = self._place(text, sid)
        steps = decode_steps or self.decode_steps_for(text)
        synth, vocode = self.stages(steps)
        k1, k2 = jax.random.split(self._key(key))

        # A separate jit that keeps the (mel, linear, align) outputs live —
        # the throughput `synth` stage returns only the amplitude spec so
        # XLA can dead-code-eliminate the artifact writes.
        full = self._full_stage(steps)
        mel, lin, align, amp = full(self.params, self.state, text, sid, k1)
        wav = vocode(amp, k2)
        r = self.cfg.n_frames_per_step
        enc = np.sum(np.asarray(text) != 0, -1)
        out_align = []
        align = np.asarray(align)
        for i in range(align.shape[0]):
            dec = int(enc[i] * V.FRAME_PHN_RATIO) // r
            out_align.append(align[i][:dec, :enc[i]])
        return dict(wav=np.asarray(wav), mel=np.asarray(mel),
                    linear=np.asarray(lin), align=out_align)

    def _full_stage(self, decode_steps: int):
        return self._cached_program(
            "full", decode_steps, lambda: self._build_full_stage(decode_steps))

    def _build_full_stage(self, decode_steps: int):
        cfg, featurizer, phn_attr = self.cfg, self.featurizer, self.phn_attr

        @jax.jit
        def full(params, state, text, sid, key):
            lat = V.embed_text(params, cfg, phn_attr, text)
            lengths = jnp.sum(text != 0, -1) + 1
            mel, lin, align, stop, _ = V.text_to_speech(
                params, state, key, cfg, lat, sid, decode_steps=decode_steps,
                train=False, teacher=None, tf_rate=0.0,
                latent_lengths=lengths)
            return mel, lin, align, featurizer.linear_to_amp(lin)

        return full
