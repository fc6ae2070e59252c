"""The scan-aware FLOP counter behind bench.py's MFU numbers."""

import jax
import jax.numpy as jnp

from semi_tts_tpu.utils.flops import matmul_flops


def test_plain_matmul():
    f = lambda a, b: a @ b
    assert matmul_flops(f, jnp.ones((64, 32)), jnp.ones((32, 16))) == 2 * 64 * 32 * 16


def test_batched_einsum():
    e = lambda a, b: jnp.einsum("btn,nf->btf", a, b)
    assert matmul_flops(e, jnp.ones((2, 3, 5)), jnp.ones((5, 7))) == 2 * 2 * 3 * 5 * 7


def test_scan_multiplies_by_length():
    def g(a, b):
        def body(c, _):
            return c @ b, ()
        out, _ = jax.lax.scan(body, a, None, length=7)
        return out

    assert matmul_flops(g, jnp.ones((8, 8)), jnp.ones((8, 8))) == 7 * 2 * 8 * 8 * 8


def test_fori_loop_counts_trips():
    def fl(a, b):
        return jax.lax.fori_loop(0, 5, lambda i, c: c @ b, a)

    assert matmul_flops(fl, jnp.ones((8, 8)), jnp.ones((8, 8))) == 5 * 2 * 8 * 8 * 8


def test_grad_counts_transposed_dots():
    h = lambda a, b: jnp.sum(a @ b)
    # forward dot + two transpose dots in the backward pass
    got = matmul_flops(jax.grad(h), jnp.ones((4, 4)), jnp.ones((4, 4)))
    assert got >= 2 * 2 * 4 * 4 * 4


def test_conv_flops():
    c = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1,), "VALID", dimension_numbers=("NCH", "OIH", "NCH"))
    # out (2, 4, 8): 2 * prod(out) * in_ch * kernel
    assert matmul_flops(c, jnp.ones((2, 3, 10)), jnp.ones((4, 3, 3))) == 2 * 2 * 4 * 8 * 3 * 3


def test_nested_jit_is_traversed():
    inner = jax.jit(lambda a, b: a @ b)
    f = lambda a, b: inner(a, b) + inner(a, b)
    assert matmul_flops(f, jnp.ones((8, 8)), jnp.ones((8, 8))) == 2 * 2 * 8 * 8 * 8
