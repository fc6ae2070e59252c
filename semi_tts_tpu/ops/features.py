"""On-device batched audio featurization — the reference's per-file, CPU-worker
feature extraction (`/root/reference/src/audio.py`) redesigned as one jitted
TPU program over a padded batch of waveforms.

Numerical parity targets (constants and order of operations):
  * pre-emphasis 0.97 one-tap filter            (`src/audio.py:228-232`)
  * magnitude STFT, n_fft=2048, 50ms/12.5ms     (`src/audio.py:38-45,170`;
    the ``power=2 -> .sqrt()`` torchaudio-bug hack is just ``abs``)
  * Slaney mel-80 projection                    (`src/audio.py:54-67`)
  * amp->dB with 1e-5 floor, minus REF=20 dB    (`src/audio.py:278-279,172-175`)
  * clamp-normalize to [0,1] over -100 dB range (`src/audio.py:284-288`)
  * augmentation: additive noise at uniform SNR (`src/audio.py:411-416,434-437`)
    and time-stretch by re-deriving win/hop from a stretched sample rate
    (`src/audio.py:366-383`) — here a *traced* hop/win so one compiled program
    serves every stretch rate.
  * inverses: dB->amp, denormalize, mel->linear pinv (`src/audio.py:194-205,281-288`)

Throughput design: everything below the host wav decode is a single
``jax.jit`` program — framing is a gather, rFFT is the XLA FFT op, the mel
projection is an MXU matmul, and the per-item augmented pipeline is a
``vmap`` over per-item (snr, stretch) draws. No host<->device ping-pong per
file, no Python per-frame loops.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mel import dct_matrix, mel_filterbank, mel_pinv
from .stft import (dynamic_hann_window, magnitude_dft, reflect_pad_ragged,
                   stft_magnitude, window_support)

GFL_ITER = 30  # Griffin-Lim iterations (`src/audio.py:16`)
MIN_LEVEL_DB = -100  # (`src/audio.py:17`)
REF_LEVEL_DB = 20  # (`src/audio.py:18`)
MFCC_HOP_LEN_MS = 10  # (`src/audio.py:19`)
MFCC_WIN_LEN_MS = 25  # (`src/audio.py:20`)
N_MFCC_NO_DELTA = 13  # (`src/audio.py:21`)

# mel projection precision: bf16x3 — the (F -> 80) projection's error is
# ~1e-6 relative (operand-split matmul of an exactly-representable constant),
# far below the DFT stage's own HIGH-precision error, and ~2x faster than
# fp32 on the MXU. The wide DFT matmuls use AudioConfig.dft_precision.
_MEL_PRECISION = jax.lax.Precision.HIGH


def amp_to_db(x, minimum: float = 1e-5):
    return 20.0 * jnp.log10(jnp.clip(x, min=minimum))


def db_to_amp(x):
    return jnp.power(10.0, 0.05 * x)


def normalize_db(feat):
    return jnp.clip((feat - MIN_LEVEL_DB) / -MIN_LEVEL_DB, 0.0, 1.0)


def denormalize_db(feat):
    return MIN_LEVEL_DB + jnp.clip(feat, 0.0, 1.0) * -MIN_LEVEL_DB


def preemphasis(x: jnp.ndarray, coeff: float) -> jnp.ndarray:
    """y[0] = x[0]; y[n] = x[n] - coeff * x[n-1], along the last axis."""
    return jnp.concatenate([x[..., :1], x[..., 1:] - coeff * x[..., :-1]], axis=-1)


def inv_preemphasis(wav: jnp.ndarray, coeff: float = 0.97) -> jnp.ndarray:
    """IIR y[n] = x[n] + coeff*y[n-1] (`scipy.signal.lfilter([1],[1,-c])`,
    `src/audio.py:274-276`) — an associative scan, O(log S) depth on TPU."""

    def op(a, b):
        # elements are (decay, value): y_combined = b.val + b.decay * a.val
        return (a[0] * b[0], b[1] + b[0] * a[1])

    decays = jnp.full(wav.shape, coeff, wav.dtype)
    _, y = jax.lax.associative_scan(op, (decays, wav), axis=-1)
    return y


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Mirror of the YAML `data.audio` block (`config/*.yaml`)."""

    num_freq: int = 1025
    num_mels: int = 80
    frame_length_ms: float = 50.0
    frame_shift_ms: float = 12.5
    preemphasis_coeff: float = 0.97
    sample_rate: int = 22050
    use_linear: bool = True
    snr_range: tuple = (10, 100)
    time_stretch_range: tuple = (0.9, 1.1)
    # DFT/mel matmul precision. 'high' (bf16x3) keeps mel MCD at ~0.014 dB
    # (7x inside the 0.1 dB budget) and is ~1.7x faster; 'highest' (fp32)
    # is bit-near-exact (<=0.005 dB everywhere) for strict parity work.
    dft_precision: str = "high"

    @property
    def n_fft(self) -> int:
        return (self.num_freq - 1) * 2

    @property
    def hop_length(self) -> int:
        return int(self.frame_shift_ms / 1000 * self.sample_rate)

    @property
    def win_length(self) -> int:
        return int(self.frame_length_ms / 1000 * self.sample_rate)

    @property
    def use_noise(self) -> bool:
        return -1 not in tuple(self.snr_range)

    @property
    def min_stretch_hop(self) -> int:
        """Smallest possible augmented hop (most frames), from min stretch rate."""
        sr_min = int(self.sample_rate * min(self.time_stretch_range))
        return int(self.frame_shift_ms / 1000 * sr_min)

    @property
    def max_stretch_win(self) -> int:
        """Largest possible augmented win_length (same int truncation as the
        per-rate draw, `src/audio.py:366-383`). All smaller windows' nonzero
        supports nest inside this one's when centered in n_fft."""
        sr_max = int(self.sample_rate * max(self.time_stretch_range))
        return int(self.frame_length_ms / 1000 * sr_max)


class AudioFeaturizer:
    """Stateless (config + constant matrices) on-device featurizer.

    All public methods are jit-compatible; the heavy ones are pre-jitted with
    the static config baked in.
    """

    def __init__(self, config: AudioConfig):
        self.cfg = config
        c = config
        self.mel_fb = jnp.asarray(mel_filterbank(c.sample_rate, c.n_fft, n_mels=c.num_mels))  # (M, F)
        self.mel_fb_pinv = jnp.asarray(mel_pinv(np.asarray(self.mel_fb)))  # (F, M)
        self.dct = jnp.asarray(dct_matrix(N_MFCC_NO_DELTA, c.num_mels))  # (13, M)

    # ---------------- clean features ----------------

    def _mel_of_spec(self, spec):
        return jnp.einsum("...f,mf->...m", spec, self.mel_fb, precision=_MEL_PRECISION)

    def _finalize(self, amp):
        return normalize_db(amp_to_db(amp) - REF_LEVEL_DB)

    @partial(jax.jit, static_argnames=("self",))
    def featurize(self, waves: jnp.ndarray, lengths: jnp.ndarray):
        """Clean features for a right-zero-padded batch ``(B, S)``.

        Returns ``(mel (B,T,M), linear (B,T,F), frame_lengths (B,))`` with
        ``T = 1 + S // hop`` static and padded frames zeroed (the reference's
        collate zero-pads, `src/data.py:134-136`).
        """
        c = self.cfg
        x = preemphasis(waves, c.preemphasis_coeff)
        # positions >= length picked up a -coeff*x[L-1] ghost from the pad: mask.
        pos = jnp.arange(x.shape[1], dtype=jnp.int32)[None, :]
        x = jnp.where(pos < lengths[:, None], x, 0.0)
        T = 1 + waves.shape[1] // c.hop_length
        frame_lengths = 1 + lengths // c.hop_length
        spec = stft_magnitude(
            x, lengths, n_fft=c.n_fft, hop=c.hop_length, win_length=c.win_length,
            num_frames=T, frame_lengths=frame_lengths,
            precision=getattr(jax.lax.Precision, c.dft_precision.upper()),
        )
        mel = self._finalize(self._mel_of_spec(spec))
        linear = self._finalize(spec)
        return mel, linear, frame_lengths

    # ---------------- augmented features ----------------

    def _augment_impl(self, waves, lengths, snrs, rate, key):
        """Noise + time-stretch mel for a padded batch.

        Mirrors `src/audio.py:358-383`: noise added to the raw wave at the
        drawn SNR, then pre-emphasis, then an STFT whose win/hop come from a
        stretched sample rate (int-truncated exactly like the reference).

        TPU design note: the stretch ``rate`` (hence hop/win) is ONE draw
        shared by the whole batch — a per-item hop makes frame extraction an
        unaligned gather (~15x slower on TPU) while the reference's per-file
        draw only exists because it featurizes file-by-file. Every step still
        sees a fresh random rate; SNR noise stays per-item. Frames are
        extracted as a ``lax.scan`` of contiguous ``dynamic_slice``s at the
        traced hop, so one compiled program covers all rates at HBM speed.
        """
        c = self.cfg
        B, S = waves.shape
        pos = jnp.arange(S, dtype=jnp.int32)[None, :]
        in_range = pos < lengths[:, None]
        if c.use_noise:
            noise = jax.random.normal(key, waves.shape, waves.dtype)
            pwr_sig = jnp.sum(jnp.where(in_range, waves, 0.0) ** 2, axis=1)
            pwr_noise = jnp.sum(jnp.where(in_range, noise, 0.0) ** 2, axis=1)
            coeff = jnp.sqrt(pwr_sig / pwr_noise * 10.0 ** (-snrs / 10.0))
            waves = jnp.where(in_range, waves + coeff[:, None] * noise, 0.0)

        stretch_sr = jnp.floor(c.sample_rate * rate).astype(jnp.int32)
        win = jnp.floor(c.frame_length_ms / 1000.0 * stretch_sr).astype(jnp.int32)
        hop = jnp.floor(c.frame_shift_ms / 1000.0 * stretch_sr).astype(jnp.int32)

        x = preemphasis(waves, c.preemphasis_coeff)
        x = jnp.where(in_range, x, 0.0)
        n_fft = c.n_fft
        T_max = 1 + S // c.min_stretch_hop
        frame_len = 1 + lengths // hop

        xp = reflect_pad_ragged(x, lengths, n_fft // 2)
        s_last = xp.shape[1] - n_fft

        # every drawn window's nonzero support nests inside the max-rate
        # window's (both centered in n_fft) — slice frames + DFT rows to it
        off, span = window_support(n_fft, c.max_stretch_win)

        # scan over a transposed (S_pad, B) buffer: each frame slice is one
        # contiguous (span, B) block rather than B strided row-chunks
        # (measured -7% on this program, tools/proto_framing_layout.py)
        xpt = xp.T

        def step(_, t):
            s = jnp.minimum(t * hop, s_last) + off
            return None, jax.lax.dynamic_slice(xpt, (s, 0), (span, B))

        _, frames = jax.lax.scan(step, None, jnp.arange(T_max, dtype=jnp.int32),
                                 unroll=8)  # scan launch overhead, ~30% faster
        window = dynamic_hann_window(n_fft, win)[off : off + span]
        spec = magnitude_dft(frames * window[:, None], n_fft,
                             precision=jax.lax.Precision.HIGH,
                             support=(off, span), time_major=True)  # (T, B, F)
        mel = self._finalize(self._mel_of_spec(spec))
        mel = jnp.swapaxes(mel, 0, 1)  # (B, T, M)
        t = jnp.arange(T_max, dtype=jnp.int32)[None, :]
        mel = jnp.where((t < frame_len[:, None])[:, :, None], mel, 0.0)
        return mel, frame_len

    @partial(jax.jit, static_argnames=("self",))
    def featurize_augmented(self, waves: jnp.ndarray, lengths: jnp.ndarray, rng: jax.Array):
        """Augmented mel for a padded batch: per-item SNR draws, per-batch
        stretch draw (see `_augment_impl`).

        Returns ``(aug_mel (B, T_aug, M), aug_frame_lengths (B,))``.
        """
        c = self.cfg
        B = waves.shape[0]
        k_snr, k_rate, k_noise = jax.random.split(rng, 3)
        lo, hi = c.snr_range if c.use_noise else (0.0, 0.0)
        snrs = jax.random.uniform(k_snr, (B,), minval=float(lo), maxval=float(hi))
        rlo, rhi = c.time_stretch_range
        rate = jax.random.uniform(k_rate, (), minval=float(rlo), maxval=float(rhi))
        return self._augment_impl(waves, lengths, snrs, rate, k_noise)

    @partial(jax.jit, static_argnames=("self",))
    def featurize_augmented_at(self, waves, lengths, snrs, rate, rng):
        """Deterministic-parameter variant (parity tests / reproduction)."""
        return self._augment_impl(waves, lengths, snrs, rate, rng)

    # ---------------- inverses ----------------

    def mel_to_linear_amp(self, mel_norm: jnp.ndarray) -> jnp.ndarray:
        """Normalized mel -> linear *amplitude* spectrogram via filterbank
        pseudo-inverse (`src/audio.py:194-205`). Input ``(..., T, M)``."""
        amp = db_to_amp(denormalize_db(mel_norm) + REF_LEVEL_DB)
        return jnp.einsum("...m,fm->...f", amp, self.mel_fb_pinv, precision=_MEL_PRECISION)

    def linear_to_amp(self, linear_norm: jnp.ndarray, power: float = 1.0) -> jnp.ndarray:
        return db_to_amp(denormalize_db(linear_norm) + REF_LEVEL_DB) ** power

    # ---------------- MFCC (dormant segment path in the reference) ----------------

    @partial(jax.jit, static_argnames=("self",))
    def mfcc(self, mel_norm: jnp.ndarray) -> jnp.ndarray:
        """13 MFCC + delta + delta-delta over a normalized log-mel ``(..., T, M)``
        -> ``(..., T, 39)``. DCT-II(ortho) matmul; deltas use the Kaldi-style
        regression filters of `lib/mfcc.py:36-83` (window 2).

        Note: the reference's (dormant) path calls `librosa.feature.mfcc` on the
        normalized mel (`src/audio.py:151-153`), whose delta uses a Savitzky-
        Golay filter; we use the repo's own `lib/mfcc.py` delta definition — the
        path is dead upstream (`src/audio.py:346` references an undefined var).
        """
        mf = jnp.einsum("...tm,cm->...tc", mel_norm, self.dct, precision=_MEL_PRECISION)

        def delta(x):  # regression delta, window N=2, denom 2*sum(n^2)=10
            xp = jnp.concatenate([x[..., :1, :]] * 2 + [x] + [x[..., -1:, :]] * 2, axis=-2)
            T = x.shape[-2]
            idx = jnp.arange(T)
            return sum(n * (xp[..., idx + 2 + n, :] - xp[..., idx + 2 - n, :]) for n in (1, 2)) / 10.0

        d1 = delta(mf)
        d2 = delta(d1)
        return jnp.concatenate([mf, d1, d2], axis=-1)


def cmvn(x, axis=-2, eps: float = 1e-10):
    """Global cepstral mean/variance normalization over the time axis
    (`lib/mfcc.py:10-33`; std is torch's unbiased default)."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    n = x.shape[axis]
    var = jnp.var(x, axis=axis, keepdims=True) * (n / max(n - 1, 1))
    return (x - mean) / (eps + jnp.sqrt(var))


def segment_features(feat, boundary_ratios, min_segment_len: int = 2):
    """Slice a (T, D) feature into per-phone segments (S, T_seg_max, D) from
    boundary ratios (`src/audio.py:94-117` + `compute_len_ratio` `:425-432`).
    Host-side numpy utility — the segment path is offline/dormant upstream.
    """
    feat = np.asarray(feat)
    T, D = feat.shape
    points, prev, max_len = [], 0, 0
    for b in boundary_ratios:
        sp = round(b * T)
        if sp - prev >= min_segment_len:
            points.append((prev, sp))
            max_len = max(max_len, sp - prev)
            prev = sp
    out = np.zeros((len(points), max_len, D), feat.dtype)
    for i, (l, r) in enumerate(points):
        out[i, : r - l] = feat[l:r]
    return out


def compute_len_ratio(v: str):
    """'12_34_56' boundary string -> ratios over the max (`src/audio.py:425-432`)."""
    vals = list(map(float, v.split("_")))
    return [t / vals[-1] for t in vals]
