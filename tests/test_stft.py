"""STFT/iSTFT parity vs torch.stft (the reference's DSP substrate) and
round-trip properties."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from semi_tts_tpu.ops import stft as S

SR = 22050
N_FFT = 2048
HOP = int(12.5 / 1000 * SR)  # 275
WIN = int(50 / 1000 * SR)  # 1102


def _torch_stft_mag(x_np, n_fft=N_FFT, hop=HOP, win=WIN):
    x = torch.from_numpy(x_np.astype(np.float64))
    w = torch.hann_window(win, dtype=torch.float64)
    y = torch.stft(x, n_fft=n_fft, hop_length=hop, win_length=win, window=w,
                   center=True, pad_mode="reflect", normalized=False,
                   onesided=True, return_complex=True)
    return y.abs().numpy()  # (F, T)


def test_hann_window_matches_torch():
    got = np.asarray(S.hann_window(WIN))
    want = torch.hann_window(WIN).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dynamic_hann_window_centering():
    w = np.asarray(S.dynamic_hann_window(N_FFT, WIN))
    left = (N_FFT - WIN) // 2
    assert (w[:left] == 0).all() and (w[left + WIN:] == 0).all()
    np.testing.assert_allclose(w[left:left + WIN], torch.hann_window(WIN).numpy(), atol=1e-6)


def test_stft_magnitude_matches_torch():
    rng = np.random.RandomState(0)
    L = 30011
    x = rng.randn(L).astype(np.float32) * 0.1
    want = _torch_stft_mag(x).T  # (T, F)

    Spad = 32768
    xb = np.zeros((2, Spad), np.float32)
    xb[0, :L] = x
    L2 = 22050
    xb[1, :L2] = rng.randn(L2).astype(np.float32) * 0.1
    lengths = jnp.array([L, L2])
    T = 1 + Spad // HOP
    fl = 1 + lengths // HOP
    got = S.stft_magnitude(jnp.asarray(xb), lengths, n_fft=N_FFT, hop=HOP,
                           win_length=WIN, num_frames=T, frame_lengths=fl)
    got = np.asarray(got)
    T0 = want.shape[0]
    assert T0 == 1 + L // HOP
    np.testing.assert_allclose(got[0, :T0], want, atol=2e-3, rtol=1e-3)
    # frames past the item's true frame count are exactly zero
    assert (got[0, T0:] == 0).all()
    want2 = _torch_stft_mag(xb[1, :L2]).T
    np.testing.assert_allclose(got[1, : want2.shape[0]], want2, atol=2e-3, rtol=1e-3)


def test_stft_dynamic_hop_win_matches_torch():
    """Traced (stretched) hop/win must agree with torch at those values."""
    rng = np.random.RandomState(1)
    L = 25000
    x = rng.randn(L).astype(np.float32) * 0.1
    stretch_sr = int(SR * 1.07)
    hop2, win2 = int(0.0125 * stretch_sr), int(0.05 * stretch_sr)
    want = _torch_stft_mag(x, hop=hop2, win=win2).T

    Spad = 28000
    xb = np.zeros((1, Spad), np.float32)
    xb[0, :L] = x

    @jax.jit
    def run(xb, L, hop, win):
        T = 1 + Spad // 200  # generous static bound
        return S.stft_magnitude(xb, jnp.array([L]), n_fft=N_FFT, hop=hop,
                                win_length=win, num_frames=T,
                                frame_lengths=1 + jnp.array([L]) // hop)

    got = np.asarray(run(jnp.asarray(xb), L, hop2, win2))[0]
    T0 = want.shape[0]
    np.testing.assert_allclose(got[:T0], want, atol=2e-3, rtol=1e-3)
    assert (got[T0:] == 0).all()


def test_istft_roundtrip():
    """stft -> istft reproduces the interior of the signal (least squares)."""
    rng = np.random.RandomState(2)
    L = HOP * 80
    x = rng.randn(L).astype(np.float32) * 0.3
    y = S.stft_complex(jnp.asarray(x), n_fft=N_FFT, hop=HOP, win_length=WIN)
    back = np.asarray(S.istft(y, n_fft=N_FFT, hop=HOP, win_length=WIN))
    assert back.shape[0] == HOP * (y.shape[0] - 1)
    n = min(L, back.shape[0])
    np.testing.assert_allclose(back[:n], x[:n], atol=1e-3)


def test_istft_batched():
    rng = np.random.RandomState(3)
    x = rng.randn(3, HOP * 40).astype(np.float32)
    y = S.stft_complex(jnp.asarray(x), n_fft=N_FFT, hop=HOP, win_length=WIN)
    back = np.asarray(S.istft(y, n_fft=N_FFT, hop=HOP, win_length=WIN))
    assert back.shape[0] == 3
    n = back.shape[1]
    np.testing.assert_allclose(back[:, :n], x[:, :n], atol=1e-3)


def test_stft_reim_matches_stft_complex():
    """The Griffin-Lim matmul fast path agrees with the reference-semantics
    complex/FFT forms."""
    rng = np.random.RandomState(4)
    x = rng.randn(2, HOP * 40).astype(np.float32) * 0.3
    y = S.stft_complex(jnp.asarray(x), n_fft=N_FFT, hop=HOP, win_length=WIN)
    re, im = S.stft_reim(jnp.asarray(x), n_fft=N_FFT, hop=HOP, win_length=WIN)
    np.testing.assert_allclose(np.asarray(re), np.asarray(y).real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im), np.asarray(y).imag, atol=2e-3)


def test_istft_reim_matches_istft():
    rng = np.random.RandomState(5)
    x = rng.randn(2, HOP * 40).astype(np.float32) * 0.3
    y = S.stft_complex(jnp.asarray(x), n_fft=N_FFT, hop=HOP, win_length=WIN)
    want = np.asarray(S.istft(y, n_fft=N_FFT, hop=HOP, win_length=WIN))
    got = np.asarray(S.istft_reim(jnp.asarray(np.asarray(y).real),
                                  jnp.asarray(np.asarray(y).imag),
                                  n_fft=N_FFT, hop=HOP, win_length=WIN))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_nola_positive():
    assert S.nola_check(N_FFT, HOP, WIN) > 1e-11


def test_frame_signal_static_matches_dynamic():
    """The shifted-reshape framing (static hop) must equal the per-frame
    dynamic_slice form at awkward geometries: span < hop, span % hop == 0,
    offset 0 / nonzero, frames reaching exactly the end of the signal."""
    import jax.numpy as jnp

    from semi_tts_tpu.ops.stft import frame_signal, frame_signal_static

    rng = np.random.RandomState(0)
    for (S, hop, off, span, T) in [
        (2000, 275, 473, 1102, 1 + (2000 - 1575) // 275),
        (2000, 300, 0, 900, 4),     # span % hop == 0
        (2000, 500, 10, 300, 3),    # span < hop
        (1000, 100, 0, 1000, 1),    # single frame, whole signal
        (1650, 275, 473, 1102, 1),  # frame ends exactly at the signal end
    ]:
        x = jnp.asarray(rng.randn(3, S).astype(np.float32))
        got = frame_signal_static(x, hop, T, support=(off, span))
        # reference: dynamic_slice framing with a traced hop (bypasses the
        # static fast path inside frame_signal)
        want = frame_signal(x, span + off, jnp.asarray(hop), T, support=(off, span))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=str((S, hop, off, span, T)))


def test_ingraph_basis_matches_float64_tables():
    """The in-graph DFT bases (integer-exact phase reduction, generated from
    iota so executables carry no multi-MB literals — docs/PERFORMANCE.md r4)
    must match the float64-computed numpy tables to fp32 rounding."""
    n_fft, win = 2048, 1102
    sup = S.window_support(n_fft, win)

    # plain, windowed+support, and inverse forms
    C0, S0 = S._dft_matrices(n_fft)
    C1, S1 = jax.jit(lambda: S._dft_basis_ingraph(n_fft, None, None))()
    assert float(jnp.abs(C1 - C0).max()) < 1e-6
    assert float(jnp.abs(S1 - S0).max()) < 1e-6

    Cw0, Sw0 = S._support_dft_matrices(n_fft, win, sup)
    Cw1, Sw1 = jax.jit(lambda: S._dft_basis_ingraph(n_fft, win, sup))()
    assert float(jnp.abs(Cw1 - Cw0).max()) < 1e-6
    assert float(jnp.abs(Sw1 - Sw0).max()) < 1e-6

    A0, B0 = S._inv_dft_window_matrices(n_fft, win)
    A1, B1 = jax.jit(lambda: S._inv_basis_ingraph(n_fft, win))()
    assert float(jnp.abs(A1 - A0).max()) < 1e-9  # rows carry a 1/n_fft scale
    assert float(jnp.abs(B1 - B0).max()) < 1e-9
