"""CTC head + greedy decode.

Reference: CTCDecoder (src/ctc.cpp:10-25) is a 1×1 Conv1d + log_softmax;
greedy decode (ctc.cpp:40-127) is per-frame argmax → collapse repeats →
drop blank, with first-max tie-breaking.

TPU design: log-probs, per-frame argmax and max stay on device (one fused
XLA program over the whole batch); only the tiny (B, T) argmax/confidence
arrays cross to host, where the collapse is a vectorized numpy pass — the
reference's per-frame scalar loop is gone.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from parakeet_tpu.decode.timestamp import TimestampedToken
from parakeet_tpu.ops.layers import conv1d
from parakeet_tpu.params import Params


def ctc_log_probs(p: Params, encoder_out: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H) → (B, T, V) log-probs. `p` at the ctc head prefix
    (e.g. root.sub('ctc_decoder_'))."""
    x = jnp.swapaxes(encoder_out, 1, 2)  # (B, H, T)
    x = conv1d(p.sub("proj_"), x)  # (B, V, T)
    x = jnp.swapaxes(x, 1, 2)
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


@jax.jit
def _argmax_and_max(log_probs: jnp.ndarray):
    best = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
    best_lp = jnp.max(log_probs, axis=-1)
    return best, best_lp


def _collapse(best: np.ndarray, blank_id: int, length: int) -> list[int]:
    best = best[:length]
    prev = np.concatenate([[-1], best[:-1]])
    emit = (best != blank_id) & (best != prev)
    return best[emit].tolist()


def ctc_greedy_decode(log_probs, blank_id: int = 1024, lengths=None) -> list[list[int]]:
    """(B, T, V) log-probs → per-batch token lists (ctc.cpp:40-75).

    `lengths`: optional per-item valid frame counts (padded batches).
    """
    best, _ = _argmax_and_max(jnp.asarray(log_probs))
    best = np.asarray(best)
    b, t = best.shape
    lens = [t] * b if lengths is None else [int(l) for l in np.asarray(lengths)]
    return [_collapse(best[i], blank_id, lens[i]) for i in range(b)]


def ctc_greedy_decode_with_timestamps(
    log_probs, blank_id: int = 1024, lengths=None
) -> list[list[TimestampedToken]]:
    """Same with per-token {start, end, confidence=exp(max_lp)} spans
    (ctc.cpp:79-127): a token's span closes when the argmax changes; the
    final token's end is T-1."""
    best, best_lp = _argmax_and_max(jnp.asarray(log_probs))
    best, best_lp = np.asarray(best), np.asarray(best_lp)
    b, t = best.shape
    lens = [t] * b if lengths is None else [int(l) for l in np.asarray(lengths)]

    results: list[list[TimestampedToken]] = []
    for i in range(b):
        n = lens[i]
        seq, lps = best[i][:n], best_lp[i][:n]
        prev = np.concatenate([[-1], seq[:-1]])
        change = seq != prev
        emit_idx = np.nonzero(change & (seq != blank_id))[0]
        change_idx = np.nonzero(change)[0]
        toks: list[TimestampedToken] = []
        for start in emit_idx:
            # span ends just before the next argmax change
            nxt = change_idx[np.searchsorted(change_idx, start + 1)] if (
                np.searchsorted(change_idx, start + 1) < len(change_idx)
            ) else n
            toks.append(
                TimestampedToken(int(seq[start]), int(start), int(nxt - 1), float(np.exp(lps[start])))
            )
        if toks:
            toks[-1].end_frame = n - 1
        results.append(toks)
    return results


__all__ = ["ctc_log_probs", "ctc_greedy_decode", "ctc_greedy_decode_with_timestamps"]
