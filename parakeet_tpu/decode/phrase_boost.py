"""Phrase boosting: ContextTrie + boosted greedy decodes.

Reference: phrase_boost.cpp — a token-id trie built from boost phrases;
during greedy decode, tokens reachable from active trie states get
`boost_score` added to their log-prob BEFORE argmax; the trie advances only
on actual emissions; root stays active; confidence always uses the
unboosted log-prob (phrase_boost.cpp:152-153, 315-317).

TPU design: the trie compiles to two dense arrays —
  transitions (n_nodes, vocab) int32, -1 = no child
  (node 0 = root)
so the boosted-token mask and the advance step are pure array ops that ride
inside the jitted transducer while_loop (decode/transducer.py). The boosted
CTC variants run a host loop over the few hundred frames, fed by a
device-side reduction (global argmax/max + candidate columns) — boosting
with a non-negative score can only flip the argmax TO a trie token, so the
full (T, V) matrix never leaves the device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from parakeet_tpu.decode.timestamp import TimestampedToken
from parakeet_tpu.text.tokenizer import Tokenizer

DEFAULT_BOOST_SCORE = 5.0


class ContextTrie:
    """Vector-backed token-id trie (phrase_boost.cpp:9-66)."""

    def __init__(self):
        self._children: list[dict[int, int]] = [{}]
        self._is_end: list[bool] = [False]
        self._vocab_hint = 0

    def insert(self, token_ids: list[int]) -> None:
        if not token_ids:
            return
        node = 0
        for tid in token_ids:
            nxt = self._children[node].get(tid)
            if nxt is None:
                nxt = len(self._children)
                self._children[node][tid] = nxt
                self._children.append({})
                self._is_end.append(False)
            node = nxt
            self._vocab_hint = max(self._vocab_hint, tid + 1)
        self._is_end[node] = True

    def build(self, phrases: list[str], tokenizer: Tokenizer) -> None:
        for phrase in phrases:
            ids = tokenizer.encode(phrase)
            if ids:
                self.insert(ids)

    @property
    def num_nodes(self) -> int:
        return len(self._children)

    def empty(self) -> bool:
        return len(self._children) == 1 and not self._children[0]

    # ── Host set semantics (parity with the reference API) ───────────────

    def get_boosted_tokens(self, active_states: set[int]) -> set[int]:
        boosted: set[int] = set()
        for state in active_states:
            if 0 <= state < len(self._children):
                boosted.update(self._children[state].keys())
        return boosted

    def advance(self, active_states: set[int], token_id: int) -> set[int]:
        nxt = {0}  # root always active
        for state in active_states:
            if 0 <= state < len(self._children):
                child = self._children[state].get(token_id)
                if child is not None:
                    nxt.add(child)
        return nxt

    # ── Dense form for jitted decode ─────────────────────────────────────

    def to_arrays(self, vocab_size: int) -> np.ndarray:
        """(n_nodes, vocab) int32 transition table, -1 = no child."""
        trans = np.full((len(self._children), vocab_size), -1, dtype=np.int32)
        for node, children in enumerate(self._children):
            for tid, child in children.items():
                if tid < vocab_size:
                    trans[node, tid] = child
        return trans

    def device_boost(self, vocab_size: int, batch: int, boost_score: float):
        """(transitions, initial_active, score) triple for transducer decode."""
        trans = jnp.asarray(self.to_arrays(vocab_size))
        active0 = jnp.zeros((batch, len(self._children)), bool).at[:, 0].set(True)
        return trans, active0, float(boost_score)


# ─── Boosted CTC greedy decode (phrase_boost.cpp:70-173) ─────────────────────
#
# Boosting adds boost_score only to tokens reachable in the trie, so the
# boosted argmax is either (a) the unboosted global argmax or (b) one of the
# trie's candidate tokens. The host loop therefore only needs the per-frame
# global argmax/max plus the candidate token columns — not the full (T, V)
# log-prob matrix (a 30+ MB device→host transfer per batch at vocab 1025).


def _boosted_ctc_one(
    best_ids: np.ndarray,  # (T,) unboosted global argmax
    best_vals: np.ndarray,  # (T,) unboosted global max log-prob
    cand_vals: np.ndarray,  # (T, C) log-probs of the trie's candidate tokens
    cand_tokens: np.ndarray,  # (C,) candidate token ids
    trans: np.ndarray,  # (N, V)
    boost_score: float,
    blank_id: int,
    want_timestamps: bool,
):
    t_len = best_ids.shape[0]
    n_nodes = trans.shape[0]
    # per-node candidate reachability: (N, C)
    reach_c = trans[:, cand_tokens] >= 0 if len(cand_tokens) else np.zeros((n_nodes, 0), bool)
    active = np.zeros(n_nodes, bool)
    active[0] = True

    tokens: list[int] = []
    toks_ts: list[TimestampedToken] = []
    prev = -1
    for t in range(t_len):
        best = int(best_ids[t])
        raw_lp = float(best_vals[t])
        if len(cand_tokens):
            boosted_mask = reach_c[active].any(axis=0)  # (C,)
            if boosted_mask.any():
                vals = cand_vals[t] + boost_score * boosted_mask
                ci = int(np.argmax(vals))
                # first-max tie-breaking: the reference scans v=0..V-1 and
                # takes a later token only on a strictly greater value
                cand_tok = int(cand_tokens[ci])
                take = vals[ci] > best_vals[t] or (
                    vals[ci] == best_vals[t] and cand_tok < best
                )
                if take:
                    best = cand_tok
                    raw_lp = float(cand_vals[t, ci])
        if want_timestamps:
            if best != prev:
                if prev != -1 and prev != blank_id and toks_ts:
                    toks_ts[-1].end_frame = t - 1
                if best != blank_id:
                    toks_ts.append(TimestampedToken(best, t, t, float(np.exp(raw_lp))))
                    nxt = trans[active, best]
                    active = np.zeros(n_nodes, bool)
                    active[0] = True
                    active[nxt[nxt >= 0]] = True
        else:
            if best != blank_id and best != prev:
                tokens.append(best)
                nxt = trans[active, best]
                active = np.zeros(n_nodes, bool)
                active[0] = True
                active[nxt[nxt >= 0]] = True
        prev = best
    if want_timestamps:
        if toks_ts:
            toks_ts[-1].end_frame = t_len - 1
        return toks_ts
    return tokens


def _candidate_tokens(trie: ContextTrie, vocab: int) -> np.ndarray:
    toks = sorted(
        {tid for children in trie._children for tid in children if tid < vocab}
    )
    return np.asarray(toks, dtype=np.int64)


def _prepare_boosted(log_probs, trie: ContextTrie, lengths, boost_score: float):
    """Device-side reduction: per-frame argmax/max + candidate columns only.

    Valid only for boost_score >= 0 (boosting can then only flip the argmax
    TO a candidate token). Negative scores (phrase suppression) would need
    the full matrix — rejected explicitly rather than silently misdecoding.
    """
    if boost_score < 0:
        raise ValueError(
            "boost_score must be >= 0 (negative suppression is not supported "
            "by the candidate-column reduction)"
        )
    lp = jnp.asarray(log_probs)
    b, t, v = lp.shape
    cand_tokens = _candidate_tokens(trie, v)
    best_ids = np.asarray(jnp.argmax(lp, axis=-1))
    best_vals = np.asarray(jnp.max(lp, axis=-1))
    if len(cand_tokens):
        cand_vals = np.asarray(lp[:, :, jnp.asarray(cand_tokens)])
    else:
        cand_vals = np.zeros((b, t, 0), np.float32)
    trans = trie.to_arrays(v)
    lens = [t] * b if lengths is None else [int(l) for l in np.asarray(lengths)]
    return b, best_ids, best_vals, cand_vals, cand_tokens, trans, lens


def ctc_greedy_decode_boosted(
    log_probs,
    trie: ContextTrie,
    boost_score: float = DEFAULT_BOOST_SCORE,
    blank_id: int = 1024,
    lengths=None,
) -> list[list[int]]:
    b, bi, bv, cv, ct, trans, lens = _prepare_boosted(log_probs, trie, lengths, boost_score)
    return [
        _boosted_ctc_one(bi[i, : lens[i]], bv[i, : lens[i]], cv[i, : lens[i]],
                         ct, trans, boost_score, blank_id, False)
        for i in range(b)
    ]


def ctc_greedy_decode_with_timestamps_boosted(
    log_probs,
    trie: ContextTrie,
    boost_score: float = DEFAULT_BOOST_SCORE,
    blank_id: int = 1024,
    lengths=None,
) -> list[list[TimestampedToken]]:
    b, bi, bv, cv, ct, trans, lens = _prepare_boosted(log_probs, trie, lengths, boost_score)
    return [
        _boosted_ctc_one(bi[i, : lens[i]], bv[i, : lens[i]], cv[i, : lens[i]],
                         ct, trans, boost_score, blank_id, True)
        for i in range(b)
    ]


__all__ = [
    "ContextTrie",
    "DEFAULT_BOOST_SCORE",
    "ctc_greedy_decode_boosted",
    "ctc_greedy_decode_with_timestamps_boosted",
]
