"""reflect_pad_ragged alternatives, fused with a consumer (sum) so XLA's
fusion decides the real cost:
  a) current: vmap(dynamic_slice) tails + vmap(dynamic_update_slice) place
  b) tails by one (B, pad) take_along_axis gather, place unchanged
  c) tails by gather, place by a 2D scatter .at[rows, cols].set
  d) tails by gather, place by where-mask + aligned gather of a shifted
     canvas — no per-row dynamic ops at all? (place via gather again; skip)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

B, sec, sr = 128, 8.0, 22050
S = int(sec * sr)
pad = 1024
rng = np.random.RandomState(0)
waves = jnp.asarray((rng.randn(B, S) * 0.1).astype(np.float32))
lengths = jnp.asarray(rng.randint(int(0.7 * S), S + 1, size=B).astype(np.int32))
iters = 20


def base(x, L):
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    xm = jnp.where(pos < L[:, None], x, 0.0)
    left = xm[:, 1 : pad + 1][:, ::-1]
    y = jnp.concatenate([left, xm, jnp.zeros((B, pad), x.dtype)], axis=1)
    return xm, y


def pad_a(x, L):
    xm, y = base(x, L)

    def tail(xrow, l):
        return lax.dynamic_slice(xrow, (l - (pad + 1),), (pad,))[::-1]

    tails = jax.vmap(tail)(xm, L)

    def place(yrow, trow, l):
        return lax.dynamic_update_slice(yrow, trow, (l + pad,))

    return jax.vmap(place)(y, tails, L)


def pad_b(x, L):
    xm, y = base(x, L)
    k = jnp.arange(pad, dtype=jnp.int32)[None, :]
    idx = L[:, None] - 2 - k  # (B, pad)
    tails = jnp.take_along_axis(xm, idx, axis=1)

    def place(yrow, trow, l):
        return lax.dynamic_update_slice(yrow, trow, (l + pad,))

    return jax.vmap(place)(y, tails, L)


def pad_c(x, L):
    xm, y = base(x, L)
    k = jnp.arange(pad, dtype=jnp.int32)[None, :]
    idx = L[:, None] - 2 - k
    tails = jnp.take_along_axis(xm, idx, axis=1)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None].repeat(pad, 1)
    cols = L[:, None] + pad + k
    return y.at[rows, cols].set(tails)


def make(fn):
    @jax.jit
    def chained(x, L):
        def body(i, s):
            yp = fn(x + i * 1e-6, L)
            return s + yp[0, 0] + yp[-1, -1]
        return lax.fori_loop(0, iters, body, 0.0)
    float(chained(waves, lengths))
    return chained


progs = {n: make(f) for n, f in (("a_vmapDS", pad_a), ("b_gather", pad_b), ("c_scatter", pad_c))}
# correctness
ref = pad_a(waves, lengths)
for n, f in (("b", pad_b), ("c", pad_c)):
    d = float(jnp.max(jnp.abs(f(waves, lengths) - ref)))
    print(f"{n} max|diff| = {d}")
times = {n: [] for n in progs}
for _ in range(4):
    for n, p in progs.items():
        t0 = time.perf_counter()
        float(p(waves, lengths))
        times[n].append((time.perf_counter() - t0) / iters * 1e3)
for n, ts in times.items():
    print(n, [f"{t:.3f}" for t in ts], f"best {min(ts):.3f} ms")
