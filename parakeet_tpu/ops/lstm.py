"""Hand-rolled LSTM matching the reference cell exactly (src/lstm.cpp:7-67).

Gates = input_proj(x) + hidden_proj(h); input_proj carries the merged NeMo
bias (bias_ih + bias_hh, convert_nemo.py:409-417); hidden_proj is bias-free.
Gate order after chunk(4): i, f, g, o;
  c' = σ(f)·c + σ(i)·tanh(g);  h' = σ(o)·tanh(c').

State is a (num_layers, 2, B, H) array: [:, 0] = h, [:, 1] = c — a single
fixed-shape tensor so transducer decode loops can save/restore it with one
`jnp.where` (the blank-branch state restore, tdt.cpp:88-92).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parakeet_tpu.ops.layers import linear
from parakeet_tpu.params import Params


def lstm_zero_state(num_layers: int, batch: int, hidden: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.zeros((num_layers, 2, batch, hidden), dtype=dtype)


def _cell(p: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    gates = linear(p.sub("input_proj_"), x) + linear(p.sub("hidden_proj_"), h)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_step(
    p: Params, x: jnp.ndarray, state: jnp.ndarray, num_layers: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One timestep through all layers.

    p: Params at the `lstm_` prefix (cells_.{l}.…). x: (B, in).
    Returns (output (B, H), new_state (L, 2, B, H)).
    """
    new_layers = []
    for l in range(num_layers):
        cell = p.sub("cells_").sub(str(l))
        h, c = _cell(cell, x, state[l, 0], state[l, 1])
        new_layers.append(jnp.stack([h, c]))
        x = h
    return x, jnp.stack(new_layers)


def lstm_forward(
    p: Params, xs: jnp.ndarray, state: jnp.ndarray, num_layers: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sequence forward: xs (B, T, in) → (B, T, H) via lax.scan over time."""

    def step(carry, x_t):
        out, new_state = lstm_step(p, x_t, carry, num_layers)
        return new_state, out

    final, outs = jax.lax.scan(step, state, jnp.swapaxes(xs, 0, 1))
    return jnp.swapaxes(outs, 0, 1), final


__all__ = ["lstm_zero_state", "lstm_step", "lstm_forward"]
