"""LSTM parity vs torch.nn.LSTM (mirrors the converter's bias-merge contract,
convert_nemo.py:409-417)."""

import numpy as np
import jax.numpy as jnp
import pytest

from parakeet_tpu.ops.lstm import lstm_forward, lstm_step, lstm_zero_state
from parakeet_tpu.params import Params


def test_lstm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    layers, hidden, batch, t = 2, 12, 3, 7

    tl = torch.nn.LSTM(hidden, hidden, num_layers=layers, batch_first=True)
    flat = {}
    with torch.no_grad():
        for l in range(layers):
            w_ih = getattr(tl, f"weight_ih_l{l}").numpy()
            w_hh = getattr(tl, f"weight_hh_l{l}").numpy()
            b_ih = getattr(tl, f"bias_ih_l{l}").numpy()
            b_hh = getattr(tl, f"bias_hh_l{l}").numpy()
            flat[f"lstm_.cells_.{l}.input_proj_.weight"] = jnp.asarray(w_ih)
            # NeMo's two biases merge into input_proj_.bias; hidden_proj_ bias-free
            flat[f"lstm_.cells_.{l}.input_proj_.bias"] = jnp.asarray(b_ih + b_hh)
            flat[f"lstm_.cells_.{l}.hidden_proj_.weight"] = jnp.asarray(w_hh)

    x = rng.randn(batch, t, hidden).astype(np.float32)
    with torch.no_grad():
        ref, (h_n, c_n) = tl(torch.from_numpy(x))

    p = Params(flat).sub("lstm_")
    state = lstm_zero_state(layers, batch, hidden)
    ours, final = lstm_forward(p, jnp.asarray(x), state, layers)

    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(final[:, 0]), h_n.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(final[:, 1]), c_n.numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_step_equals_forward():
    rng = np.random.RandomState(1)
    layers, hidden, batch, t = 1, 8, 2, 5
    flat = {}
    for l in range(layers):
        flat[f"lstm_.cells_.{l}.input_proj_.weight"] = jnp.asarray(
            rng.randn(4 * hidden, hidden).astype(np.float32) * 0.3
        )
        flat[f"lstm_.cells_.{l}.input_proj_.bias"] = jnp.asarray(
            rng.randn(4 * hidden).astype(np.float32) * 0.1
        )
        flat[f"lstm_.cells_.{l}.hidden_proj_.weight"] = jnp.asarray(
            rng.randn(4 * hidden, hidden).astype(np.float32) * 0.3
        )
    p = Params(flat).sub("lstm_")
    xs = jnp.asarray(rng.randn(batch, t, hidden).astype(np.float32))

    seq_out, seq_final = lstm_forward(p, xs, lstm_zero_state(layers, batch, hidden), layers)

    state = lstm_zero_state(layers, batch, hidden)
    outs = []
    for i in range(t):
        o, state = lstm_step(p, xs[:, i], state, layers)
        outs.append(np.asarray(o))
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(seq_out), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state), np.asarray(seq_final), rtol=1e-5, atol=1e-6)
