"""Analytic FLOP accounting by jaxpr traversal.

XLA's ``compiled.cost_analysis()`` counts a loop body ONCE, so any program
built on ``lax.scan``/``fori_loop`` (AR decoders, RNNs, chained benchmark
iterations) is undercounted by the trip count. This walker multiplies scan
bodies by their static ``length`` and counts ``dot_general``/``conv`` FLOPs
from shapes — *useful* FLOPs: a dot at HIGH (bf16x3) precision executes 3
hardware passes but still computes one dot's worth of math.

Used by bench.py for MFU; ``while`` bodies (dynamic trip count) are counted
once, matching the convention that untraceable work is a lower bound.
"""

from __future__ import annotations

import jax


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _dot_flops(eqn) -> float:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    a = eqn.invars[0].aval.shape
    b = eqn.invars[1].aval.shape
    batch = _prod(a[i] for i in lb)
    k = _prod(a[i] for i in lc)
    m = _prod(a[i] for i in range(len(a)) if i not in tuple(lb) + tuple(lc))
    n = _prod(b[i] for i in range(len(b)) if i not in tuple(rb) + tuple(rc))
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    dn = eqn.params["dimension_numbers"]
    out = eqn.outvars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    kernel_spatial = _prod(rhs[i] for i in dn.rhs_spec[2:])
    in_ch = rhs[dn.rhs_spec[1]]  # already per-group
    return 2.0 * _prod(out) * in_ch * kernel_spatial


def _sub_jaxprs(eqn):
    for name in ("jaxpr", "call_jaxpr", "body_jaxpr", "cond_jaxpr", "fun_jaxpr"):
        sub = eqn.params.get(name)
        if sub is not None:
            yield sub.jaxpr if hasattr(sub, "jaxpr") else sub
    for name in ("branches",):
        for sub in eqn.params.get(name, ()):
            yield sub.jaxpr if hasattr(sub, "jaxpr") else sub


def _count(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            total += _dot_flops(eqn)
        elif prim == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif prim == "scan":
            body = eqn.params["jaxpr"]
            total += int(eqn.params["length"]) * _count(
                body.jaxpr if hasattr(body, "jaxpr") else body)
        elif prim == "cond":
            branches = [_count(b.jaxpr if hasattr(b, "jaxpr") else b)
                        for b in eqn.params["branches"]]
            total += max(branches) if branches else 0.0
        else:
            for sub in _sub_jaxprs(eqn):
                total += _count(sub)
    return total


def matmul_flops(fn, *args, **kwargs) -> float:
    """Total dot/conv FLOPs of one call of ``fn(*args)`` (scan-aware)."""
    closed = jax.make_jaxpr(fn, **kwargs)(*args)
    return _count(closed.jaxpr)
