"""Batched STFT / iSTFT as pure jittable JAX functions.

Parity targets:
  * forward STFT — ``torch.stft(center=True, pad_mode='reflect',
    onesided=True)`` semantics used throughout the reference
    (`/root/reference/src/audio.py:234-246`). The reference's
    ``Spectrogram(power=2).sqrt()`` hack is simply the magnitude here.
  * inverse STFT — the vendored batched overlap-add iSTFT
    (`/root/reference/lib/istft.py:3-155`): irfft each frame, window,
    overlap-add at ``hop`` stride, divide by the squared-window envelope,
    trim ``n_fft//2`` from both ends (NOLA condition assumed/checked).

TPU-first design notes:
  * The whole wave->frames->|rDFT| pipeline compiles to one fused XLA
    program. The rDFT is windowed-DFT MXU *matmuls* (`magnitude_dft`), not
    the XLA FFT op, which runs far below the systolic array's rate here;
    framing is shifted reshapes (static hop) or a scan of contiguous
    `dynamic_slice`s (traced hop) — never an element gather.
  * ``hop``/``win_length`` may be *traced* scalars (per-item random
    time-stretch draws a new hop/win every batch): the frame gather uses
    dynamic start indices and the Hann window is evaluated as a masked
    closed-form expression over the static ``n_fft`` grid. One compiled
    program covers every stretch rate — no shape-specializing recompiles.
  * Overlap-add in the iSTFT is a set of shifted-slice adds (no scatter).
  * Pallas note: frame extraction at arbitrary (hop-dependent) offsets was
    prototyped as a Pallas kernel and is NOT expressible on current Mosaic —
    vector loads need 128-lane-aligned starts and DMAs need tile-aligned
    (1024 for 1-D) offsets. The scan-of-``dynamic_slice`` forms below are the
    fast path XLA actually supports.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def dynamic_hann_window(n_fft: int, win_length) -> jnp.ndarray:
    """Periodic Hann window of (possibly traced) length ``win_length``,
    zero-padded and centered in an ``n_fft`` buffer exactly like torch.stft
    centers a short window inside the FFT frame."""
    win_length = jnp.asarray(win_length, jnp.int32)
    left = (n_fft - win_length) // 2
    i = jnp.arange(n_fft, dtype=jnp.int32)
    k = i - left
    inside = (k >= 0) & (k < win_length)
    w = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * k.astype(jnp.float32) / win_length.astype(jnp.float32))
    return jnp.where(inside, w, 0.0)


def reflect_pad_ragged(x: jnp.ndarray, lengths: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad each row of a right-zero-padded batch ``x`` of shape
    ``(B, S)`` around its *own* end ``lengths[b]`` (and around 0 on the left),
    producing ``(B, S + 2*pad)``.

    This reproduces, inside one static-shape batch, the per-file
    ``pad_mode='reflect'`` behavior the reference gets by featurizing files
    one at a time in DataLoader workers — frames that straddle an utterance
    boundary stay bit-comparable. Requires ``lengths > pad`` (true for any
    real utterance; pad is n_fft//2 ≈ 46 ms).

    Perf note: implemented with contiguous dynamic slices (the left mirror is
    static; the right mirror is one ``pad``-sample slice + placement per row)
    — a whole-row element gather here costs ~100x more on TPU.
    """
    B, S = x.shape
    L = lengths.astype(jnp.int32)
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    xm = jnp.where(pos < L[:, None], x, 0.0)
    left = xm[:, 1 : pad + 1][:, ::-1]
    y = jnp.concatenate([left, xm, jnp.zeros((B, pad), x.dtype)], axis=1)

    # right mirror: y[L+pad+k] = x[L-2-k] for k in [0, pad)
    def tail(xrow, l):
        return jax.lax.dynamic_slice(xrow, (l - (pad + 1),), (pad,))[::-1]

    tails = jax.vmap(tail)(xm, L)

    def place(yrow, trow, l):
        return jax.lax.dynamic_update_slice(yrow, trow, (l + pad,))

    return jax.vmap(place)(y, tails, L)


def window_support(n_fft: int, win_length: int) -> tuple:
    """(offset, span) of the nonzero region of a ``win_length`` window
    centered in an ``n_fft`` frame. Everything outside is an exact zero after
    windowing, so frames and DFT-matrix rows can be sliced to this support —
    numerically identical, ~``win_length/n_fft`` of the MACs and framing
    traffic (46% savings at the reference's 1102-in-2048 geometry)."""
    return (n_fft - win_length) // 2, win_length


def frame_signal(x_padded: jnp.ndarray, n_fft: int, hop, num_frames: int,
                 *, support: tuple | None = None) -> jnp.ndarray:
    """Extract ``num_frames`` frames at (possibly traced) stride ``hop`` from
    a padded batch ``(B, S_pad)`` -> ``(B, T, span)``.

    ``support``: optional (offset, span) — slice only that sub-range of each
    nominal ``n_fft`` frame (the window's nonzero region). Default: whole
    frames.

    Static ``hop`` takes the reshape fast path (`frame_signal_static`).
    Traced ``hop`` uses per-frame contiguous ``dynamic_slice`` (XLA gather
    with ``slice_sizes=(span,)``) rather than a materialized (T, span) index
    gather — the latter is an element-wise gather and ~50x slower on TPU.
    """
    offset, span = support if support is not None else (0, n_fft)
    if isinstance(hop, (int, np.integer)):
        return frame_signal_static(x_padded, int(hop), num_frames, support=(offset, span))
    starts = jnp.arange(num_frames, dtype=jnp.int32) * jnp.asarray(hop, jnp.int32) + offset

    def row(xp):
        return jax.vmap(lambda s: jax.lax.dynamic_slice(xp, (s,), (span,)))(starts)

    return jax.vmap(row)(x_padded)


def frame_signal_static(x_padded: jnp.ndarray, hop: int, num_frames: int,
                        *, support: tuple) -> jnp.ndarray:
    """Framing at STATIC hop as K shifted reshapes + one concat.

    With ``xpr = x_padded[:, off:]`` viewed as rows of ``hop`` samples,
    frame ``t``'s k-th hop-chunk is row ``t + k`` — so the whole (B, T,
    span) frames tensor is a concat of K = ceil(span/hop) static row-slices
    of one reshape. No gather and no per-frame loop: the per-frame
    ``dynamic_slice`` form lowers to a sequential while loop on TPU
    (~1.7 us/frame of loop overhead — 30 ms across a 30-iteration
    Griffin-Lim of 600-frame utterances); this is a handful of fused copies.

    Out-of-bounds behavior: frames whose tail extends past ``x_padded`` are
    ZERO-padded here, whereas the traced-hop path's ``dynamic_slice`` CLAMPS
    the start (duplicating the final samples). All current callers size
    ``num_frames`` so the last frame is in-bounds (centered STFT framing),
    where the two paths are identical; a future caller overrunning the pad
    gets zeros from this path, which matches a zero-padded signal and is the
    saner convention.
    """
    off, span = support
    B = x_padded.shape[0]
    K = -(-span // hop)
    rows = num_frames - 1 + K
    need = off + rows * hop
    if x_padded.shape[1] < need:
        x_padded = jnp.pad(x_padded, ((0, 0), (0, need - x_padded.shape[1])))
    xpr = x_padded[:, off : off + rows * hop].reshape(B, rows, hop)
    parts = []
    for k in range(K):
        w = min(hop, span - k * hop)
        parts.append(xpr[:, k : k + num_frames, :w])
    return jnp.concatenate(parts, axis=-1)


@lru_cache(maxsize=4)
def _dft_matrices(n_fft: int):
    """Real-DFT projection matrices (n_fft, n_fft//2+1) for cos and -sin.

    On TPU the XLA FFT op runs far below the MXU's matmul rate; a 2048-point
    magnitude spectrum as two (n_fft x F) matmuls is ~3-4x faster and keeps
    the whole featurizer on the systolic array. fp32 (HIGHEST) keeps the
    result within ~1e-5 relative of a true FFT.

    numpy/f64 form — kept as the golden builder for tests and measurement
    tools; the compiled paths use `_dft_basis_ingraph` (identical to ~4e-7).
    """
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def _dft_basis_ingraph(n_fft: int, fold_window: int | None,
                       support: tuple | None):
    """(cos, -sin) windowed-DFT projection matrices, GENERATED IN-GRAPH.

    Materializing the 8-17 MB basis tables as numpy closures embeds them as
    HLO literals: every featurizer/Griffin-Lim executable carries 20-100 MB
    of constants, XLA passes chew on them (measured 3.5x slower compiles),
    and persistent-cache hits must push those megabytes through the remote
    TPU tunnel (~1.2 MB/s — a 97 MB entry loads SLOWER than it recompiles).
    Generating the basis from ``iota`` costs ~2M transcendentals (~us on the
    VPU, fused) and shrinks executables to the size of the actual program.

    Exactness: the phase is reduced with INTEGER arithmetic first —
    ``2*pi * ((n*k) mod n_fft) / n_fft`` with n*k < 2^31 exact in int32 — so
    cos/sin see arguments in [0, 2*pi) and match the float64-then-cast
    tables to ~4e-7 (vs the ~1e-4 error of naively evaluating cos at
    unreduced phases up to ~1e4 radians in fp32).

    ``fold_window``: fold a centered periodic Hann of this length into the
    rows (frames then arrive unwindowed). ``support``: (offset, span) row
    slice of the nominal n_fft frame. Mirrors `_support_dft_matrices`.
    """
    off, span = support if support is not None else (0, n_fft)
    F = n_fft // 2 + 1
    n = off + jax.lax.iota(jnp.int32, span)
    k = jax.lax.iota(jnp.int32, F)[None, :]
    phase = (n[:, None] * k) % n_fft  # exact: n < 2048, k <= 1024
    ang = (2.0 * jnp.pi / n_fft) * phase.astype(jnp.float32)
    C, S = jnp.cos(ang), -jnp.sin(ang)
    if fold_window is not None:
        left = (n_fft - fold_window) // 2
        kw = n - left
        inside = (kw >= 0) & (kw < fold_window)
        w = 0.5 - 0.5 * jnp.cos((2.0 * jnp.pi / fold_window)
                                * kw.astype(jnp.float32))
        w = jnp.where(inside, w, 0.0)[:, None]
        C, S = w * C, w * S
    return C, S


def _centered_hann_np(n_fft: int, win_length: int) -> np.ndarray:
    """float64 periodic Hann of ``win_length``, centered in ``n_fft`` zeros —
    the single static-window definition every matrix/envelope builder uses."""
    w = np.zeros(n_fft)
    left = (n_fft - win_length) // 2
    k = np.arange(win_length, dtype=np.float64)
    w[left : left + win_length] = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / win_length)
    return w


@lru_cache(maxsize=8)
def _static_ola_envelope(n_fft: int, hop: int, win_length: int, num_frames: int) -> np.ndarray:
    """Squared-window overlap-add envelope (compile-time constant)."""
    w2 = _centered_hann_np(n_fft, win_length) ** 2
    expected = n_fft + hop * (num_frames - 1)
    env = np.zeros(expected)
    for t in range(num_frames):
        env[t * hop : t * hop + n_fft] += w2
    return env


@lru_cache(maxsize=4)
def _windowed_dft_matrices(n_fft: int, win_length: int):
    """DFT matrices with a static centered Hann window folded in — saves a
    full elementwise pass over the (huge) frames tensor on the clean path."""
    C, S = _dft_matrices(n_fft)
    w = _centered_hann_np(n_fft, win_length)
    return (w[:, None] * C).astype(np.float32), (w[:, None] * S).astype(np.float32)


@lru_cache(maxsize=8)
def _support_dft_matrices(n_fft: int, fold_window: int | None, support: tuple):
    """Row-sliced DFT matrices for a window support (see `window_support`)."""
    if fold_window is not None:
        C, S = _windowed_dft_matrices(n_fft, fold_window)
    else:
        C, S = _dft_matrices(n_fft)
    off, span = support
    return C[off : off + span], S[off : off + span]


def magnitude_dft(frames: jnp.ndarray, n_fft: int,
                  precision=jax.lax.Precision.HIGHEST,
                  fold_window: int | None = None,
                  support: tuple | None = None,
                  time_major: bool = False) -> jnp.ndarray:
    """|rFFT| of frames ``(..., n_fft)`` (or ``(..., span)``) via MXU matmuls.

    ``fold_window``: a *static* win_length to fold into the DFT matrices
    (frames must then be unwindowed); None means frames are pre-windowed.
    ``support``: optional (offset, span) — frames hold only that sub-range of
    each nominal frame (everything else is an exact zero after windowing);
    DFT matrices are row-sliced to match. Numerically identical, fewer MACs.
    ``time_major``: frames are ``(..., span, B)`` (sample axis second-to-
    last) — used by the aug path, whose framing scan slices a transposed
    ``(S, B)`` buffer so every frame is ONE contiguous block instead of B
    strided row-chunks (measured −7 % on the aug program); output is then
    ``(..., B, F)``.

    Precision: HIGHEST (fp32, ~0.001 dB max error vs float64 FFT) for the
    fidelity-critical clean path; HIGH (bf16x3, ~0.04 dB max error) is fine
    for the augmentation path whose output is noise-dominated by design.
    """
    C, S = _dft_basis_ingraph(n_fft, fold_window,
                              tuple(support) if support is not None else None)
    if time_major:
        assert frames.shape[-2] == C.shape[0], (frames.shape, C.shape)
        re = jnp.einsum("...nb,nf->...bf", frames, C, precision=precision)
        im = jnp.einsum("...nb,nf->...bf", frames, S, precision=precision)
    else:
        assert frames.shape[-1] == C.shape[0], (frames.shape, C.shape)
        re = jnp.einsum("...n,nf->...f", frames, C, precision=precision)
        im = jnp.einsum("...n,nf->...f", frames, S, precision=precision)
    return jnp.sqrt(re * re + im * im)


def stft_magnitude(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    n_fft: int,
    hop,
    win_length,
    num_frames: int,
    frame_lengths: jnp.ndarray | None = None,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Magnitude STFT of a right-zero-padded batch ``(B, S)``.

    Returns ``(B, num_frames, n_fft//2 + 1)`` with frames at
    ``t >= frame_lengths[b]`` zeroed (matching the reference's
    zero-padded collate, `src/data.py:134-136`).

    ``hop``/``win_length`` may be traced scalars (see module docstring);
    ``frame_lengths`` is the per-item true frame count ``1 + L // hop``.
    """
    pad = n_fft // 2
    xp = reflect_pad_ragged(x, lengths, pad)
    if isinstance(win_length, int):
        # slice frames + DFT rows to the window's nonzero support — identical
        # output, ~win/n_fft of the MACs and framing traffic
        sup = window_support(n_fft, win_length)
        frames = frame_signal(xp, n_fft, hop, num_frames, support=sup)
        spec = magnitude_dft(frames, n_fft, precision=precision,
                             fold_window=win_length, support=sup)
    else:
        frames = frame_signal(xp, n_fft, hop, num_frames)
        window = dynamic_hann_window(n_fft, win_length)
        spec = magnitude_dft(frames * window[None, None, :], n_fft, precision=precision)
    if frame_lengths is not None:
        t = jnp.arange(num_frames, dtype=jnp.int32)[None, :]
        mask = t < frame_lengths.astype(jnp.int32)[:, None]
        spec = jnp.where(mask[:, :, None], spec, 0.0)
    return spec


@lru_cache(maxsize=4)
def _inv_dft_window_matrices(n_fft: int, win_length: int):
    """Windowed inverse-rDFT projection matrices (F, span) for re and im.

    ``irfft(X)[n] * w[n]`` restricted to the window's nonzero support:
    x_n = (1/N)[X_0 + 2 sum_{k=1}^{N/2-1}(re_k cos - im_k sin) + re_{N/2} cos(pi n)]
    with the centered Hann window folded into the columns. Lets the
    Griffin-Lim inner loop run irfft+window as two MXU matmuls over only the
    ``win_length`` samples the overlap-add actually consumes.
    """
    F = n_fft // 2 + 1
    off, span = window_support(n_fft, win_length)
    n = np.arange(off, off + span, dtype=np.float64)[None, :]
    k = np.arange(F, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full((F, 1), 2.0)
    c[0] = c[-1] = 1.0
    wn = _centered_hann_np(n_fft, win_length)[off : off + span][None, :]
    A = (c * np.cos(ang) * wn / n_fft).astype(np.float32)
    B = (-c * np.sin(ang) * wn / n_fft).astype(np.float32)
    return A, B


def _inv_basis_ingraph(n_fft: int, win_length: int):
    """Windowed inverse-rDFT matrices (F, span), generated in-graph: the
    transposed windowed forward basis scaled by c_k/n_fft (c = 2 except the
    DC and Nyquist rows; both scales are exact powers of two at n_fft=2048).
    In-graph counterpart of `_inv_dft_window_matrices`."""
    off, span = window_support(n_fft, win_length)
    F = n_fft // 2 + 1
    Cw, Sw = _dft_basis_ingraph(n_fft, win_length, (off, span))
    k = jax.lax.iota(jnp.int32, F)
    c = jnp.where((k == 0) | (k == F - 1), 1.0, 2.0)[:, None] / n_fft
    return c * Cw.T, c * Sw.T


def stft_reim(x: jnp.ndarray, *, n_fft: int, hop: int, win_length: int,
              precision=jax.lax.Precision.HIGHEST, basis: tuple | None = None):
    """Complex STFT of ``(..., S)`` as a (re, im) pair of real arrays — the
    matmul fast path of `stft_complex` (identical math; frames come from
    contiguous ``dynamic_slice``s over the window support and the windowed
    DFT runs as two MXU matmuls instead of ``jnp.fft.rfft`` over a whole-
    frame element gather). Static geometry only.

    ``basis``: optional precomputed `_dft_basis_ingraph(n_fft, win_length,
    support)` pair — pass it when calling from inside a loop (Griffin-Lim)
    so the basis is generated once per program, not once per round
    (~0.9 ms/round at the 2048/1102 geometry)."""
    pad = n_fft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    S = x.shape[-1]
    num_frames = 1 + S // hop
    sup = window_support(n_fft, win_length)
    lead = xp.shape[:-1]
    frames = frame_signal(xp.reshape((-1, xp.shape[-1])), n_fft, hop, num_frames,
                          support=sup)
    frames = frames.reshape(lead + frames.shape[1:])
    C, Sm = basis if basis is not None else _dft_basis_ingraph(n_fft, win_length, sup)
    re = jnp.einsum("...n,nf->...f", frames, C, precision=precision)
    im = jnp.einsum("...n,nf->...f", frames, Sm, precision=precision)
    return re, im


def istft_reim(re: jnp.ndarray, im: jnp.ndarray, *, n_fft: int, hop: int,
               win_length: int, precision=jax.lax.Precision.HIGHEST,
               basis: tuple | None = None) -> jnp.ndarray:
    """Inverse STFT of a (re, im) spectrum pair ``(..., T, F)`` — the matmul
    fast path of `istft` (same windowed overlap-add semantics; irfft+window
    is two MXU matmuls over the window support, OLA is shifted-slice adds).
    Static geometry, ``length=None`` trim only.

    ``basis``: optional precomputed `_inv_basis_ingraph(n_fft, win_length)`
    pair — see `stft_reim`."""
    T = re.shape[-2]
    off, span = window_support(n_fft, win_length)
    A, Bm = basis if basis is not None else _inv_basis_ingraph(n_fft, win_length)
    frames = (jnp.einsum("...f,fn->...n", re, A, precision=precision)
              + jnp.einsum("...f,fn->...n", im, Bm, precision=precision))

    expected = n_fft + hop * (T - 1)
    lead_shape = frames.shape[:-2]
    flat = frames.reshape((-1, T, span))
    B = flat.shape[0]

    # OLA: out[q*hop + r] = sum_k frames[q - k, k*hop + r - off] restricted to
    # the support — a sum of K statically-padded chunk tensors over a
    # (B, T+K-1, hop) grid. (`.at[slice].add` compiles to a real XLA
    # scatter-add even with static indices — measured ~11 ms across a
    # 30-iteration Griffin-Lim; `jnp.pad`+add fuses into one pass.)
    K = -(-(off + span) // hop)
    rows = T + K - 1
    acc = jnp.zeros((B, rows, hop), frames.dtype)
    for k in range(K):
        lo = max(k * hop, off)
        hi = min((k + 1) * hop, off + span)
        if hi <= lo:
            continue
        chunk = flat[:, :, lo - off : hi - off]
        acc = acc + jnp.pad(chunk, ((0, 0), (k, rows - T - k),
                                    (lo - k * hop, (k + 1) * hop - hi)))
    sig = acc.reshape(B, rows * hop)[:, :expected]

    env = jnp.asarray(_static_ola_envelope(n_fft, hop, win_length, T), frames.dtype)

    half = n_fft // 2
    sig = sig[:, half : expected - half] / jnp.maximum(env[half : expected - half], 1e-11)
    return sig.reshape(lead_shape + (sig.shape[-1],))


def stft_complex(x: jnp.ndarray, *, n_fft: int, hop: int, win_length: int) -> jnp.ndarray:
    """Complex STFT of ``(..., S)`` with whole-array reflect padding.

    Test-reference form (element-gather framing + ``jnp.fft``): the hot
    paths use the matmul forms (`stft_magnitude`, `stft_reim`); round-trip
    tests check those against this independent implementation."""
    pad = n_fft // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    S = x.shape[-1]
    num_frames = 1 + S // hop
    t = jnp.arange(num_frames, dtype=jnp.int32)[:, None]
    i = jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    frames = xp[..., t * hop + i]                                    # (..., T, n_fft)
    window = dynamic_hann_window(n_fft, win_length)
    return jnp.fft.rfft(frames * window, n=n_fft, axis=-1)


@partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "length"))
def istft(y: jnp.ndarray, *, n_fft: int, hop: int, win_length: int, length: int | None = None) -> jnp.ndarray:
    """Inverse STFT by windowed overlap-add (batched).

    ``y``: complex, shape ``(..., T, n_fft//2+1)`` (note: frame axis second
    to last — the transpose-free layout; callers adapting reference-layout
    ``(freq, time)`` data should swap axes first).
    Returns ``(..., S)`` with ``S = hop * (T - 1)`` when ``length`` is None
    (i.e. ``center=True`` trim of ``n_fft//2`` per side).
    """
    T = y.shape[-2]
    window = dynamic_hann_window(n_fft, win_length)
    frames = jnp.fft.irfft(y, n=n_fft, axis=-1) * window             # (..., T, n_fft)

    expected = n_fft + hop * (T - 1)
    lead_shape = frames.shape[:-2]
    flat = frames.reshape((-1, T, n_fft))
    B = flat.shape[0]

    # Overlap-add WITHOUT scatter: out[q*hop + r] = sum_k frames[q - k,
    # k*hop + r] as a sum of K statically-padded chunk tensors over a
    # (B, T+K-1, hop) grid (`.at[slice].add` compiles to a real scatter-add
    # even with static indices; `jnp.pad`+add fuses).
    K = -(-n_fft // hop)  # ceil
    rows = T + K - 1
    acc = jnp.zeros((B, rows, hop), frames.dtype)
    for k in range(K):
        w_k = min((k + 1) * hop, n_fft) - k * hop
        chunk = flat[:, :, k * hop : k * hop + w_k]                  # (B, T, w_k)
        acc = acc + jnp.pad(chunk, ((0, 0), (k, rows - T - k), (0, hop - w_k)))
    sig = acc.reshape(B, rows * hop)[:, :expected]

    # squared-window envelope via the same OLA
    if isinstance(win_length, int):  # static window: compile-time constant
        env = jnp.asarray(_static_ola_envelope(n_fft, hop, win_length, T), frames.dtype)
    else:  # traced window: padded-add OLA on device
        acc_e = jnp.zeros((rows, hop), frames.dtype)
        w2 = jnp.broadcast_to((window**2)[None, :], (T, n_fft))
        for k in range(K):
            w_k = min((k + 1) * hop, n_fft) - k * hop
            acc_e = acc_e + jnp.pad(w2[:, k * hop : k * hop + w_k],
                                    ((k, rows - T - k), (0, hop - w_k)))
        env = acc_e.reshape(rows * hop)[:expected]

    half = n_fft // 2
    end = expected - half if length is None else half + length
    sig = sig[:, half:end] / jnp.maximum(env[half:end], 1e-11)
    return sig.reshape(lead_shape + (sig.shape[-1],))


def nola_check(n_fft: int, hop: int, win_length: int, num_frames: int = 16) -> float:
    """Minimum of the squared-window overlap-add envelope over the valid
    region (reference asserts > 1e-11, `lib/istft.py:146-149`)."""
    window = np.asarray(dynamic_hann_window(n_fft, win_length))
    expected = n_fft + hop * (num_frames - 1)
    env = np.zeros(expected)
    for t in range(num_frames):
        env[t * hop : t * hop + n_fft] += window**2
    half = n_fft // 2
    return float(np.abs(env[half : expected - half]).min())
