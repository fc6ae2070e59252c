"""Location-sensitive additive attention (one decode-step worth).

Parity target: `/root/reference/src/module.py:343-407` — additive
(query + location + memory) energy with a conv over the stacked
[previous, summed] attention weights. The live decoder passes ``mask=None``
(`src/module.py:163`), so masking is optional here too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import conv1d, conv1d_init, linear, linear_init


def attention_init(key, query_dim, memory_dim, hidden_dim, n_location_filters,
                   location_kernel_size, *, loc_aware=True, use_summed_weights=True):
    ks = jax.random.split(key, 5)
    p = {
        "query_layer": linear_init(ks[0], query_dim, hidden_dim, bias=False, w_init_gain="tanh"),
        "memory_layer": linear_init(ks[1], memory_dim, hidden_dim, bias=False, w_init_gain="tanh"),
        "v": linear_init(ks[2], hidden_dim, 1, bias=False),
    }
    if loc_aware:
        in_ch = 2 if use_summed_weights else 1
        p["loc_conv"] = conv1d_init(ks[3], in_ch, n_location_filters, location_kernel_size,
                                    bias=False, w_init_gain="linear")
        p["loc_linear"] = linear_init(ks[4], n_location_filters, hidden_dim,
                                      bias=False, w_init_gain="tanh")
    return p


def process_memory(params, memory):
    """Hoisted once per utterance (`src/module.py:367-369`)."""
    return linear(params["memory_layer"], memory)


def attention_step(params, query, memory, processed_memory, attn_history, mask=None):
    """One attention step.

    Args:
      query: (B, query_dim) — query-RNN hidden state.
      memory: (B, L, memory_dim); processed_memory: (B, L, hidden_dim).
      attn_history: (B, C, L) stacked [weights, summed] (C=2) or (B, 1, L).
    Returns (context (B, memory_dim), weights (B, L)).
    """
    pq = linear(params["query_layer"], query)[:, None, :]  # (B, 1, H)
    if "loc_conv" in params:
        loc = conv1d(params["loc_conv"], jnp.swapaxes(attn_history, 1, 2).astype(pq.dtype))
        # conv1d here operates (B, T=L, C); reference convs over L with C channels
        loc = linear(params["loc_linear"], loc)  # (B, L, H)
    else:
        loc = 0.0
    energy = linear(params["v"], jnp.tanh(pq + loc + processed_memory))[..., 0]  # (B, L)
    if mask is not None:
        energy = jnp.where(mask, -jnp.inf, energy)
    weights = jax.nn.softmax(energy, axis=1)
    context = jnp.einsum("bl,bld->bd", weights, memory)
    return context, weights
