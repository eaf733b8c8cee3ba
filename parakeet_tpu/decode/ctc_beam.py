"""CTC prefix beam search (capability beyond the reference's greedy-only
CTC path, src/ctc.cpp:40-127).

Standard prefix beam search (Hannun et al. 2014): beams are label prefixes
scored by the pair (p_blank, p_nonblank) — the posterior mass of all
alignments mapping to the prefix and ending in blank / in the prefix's
last token. Exact when beam_size ≥ number of distinct prefixes; pruned
otherwise.

Division of labor mirrors the rest of the framework: the encoder + CTC
head produce (T, V) log-probs on device (models/ctc.py), and this search —
branchy, data-dependent, tiny — runs on host over the fetched matrix, like
the reference's host-side CTC collapse. Per-step cost is bounded by
`token_top_k` candidate extensions per beam.

Timestamps: each appended token records the frame that first extended the
prefix with it — the same "first frame of the run" convention as the
greedy path (ctc.cpp:76-87).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

_NEG = -math.inf


def _lse(a: float, b: float) -> float:
    if a == _NEG:
        return b
    if b == _NEG:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


@dataclass
class BeamHypothesis:
    tokens: list[int]
    score: float  # total log posterior of the prefix
    frames: list[int]  # first-emission frame per token


def ctc_beam_search(
    log_probs: np.ndarray,
    blank_id: int,
    *,
    beam_size: int = 16,
    token_top_k: int = 16,
    prune_logp: float = -12.0,
    n_best: int = 1,
) -> list[BeamHypothesis]:
    """Prefix beam search over (T, V) CTC log-probs.

    Args:
      log_probs: (T, V) per-frame log-softmax outputs (np or jax array).
      blank_id: CTC blank index.
      beam_size: beams kept per step.
      token_top_k: non-blank extension candidates per step (by frame logp).
      prune_logp: skip extension tokens with frame logp below this.
      n_best: hypotheses to return (≤ beam_size), best first.

    Returns: n_best BeamHypothesis, sorted by descending score.
    """
    lp = np.asarray(log_probs, np.float64)
    t_len, v = lp.shape
    if not 0 <= blank_id < v:
        raise ValueError(f"blank_id {blank_id} outside vocab {v}")

    # prefix -> [p_blank, p_nonblank, frames-tuple]
    beams: dict[tuple[int, ...], list] = {(): [0.0, _NEG, ()]}

    for t in range(t_len):
        frame = lp[t]
        cand = np.argpartition(frame, -min(token_top_k + 1, v))[-(token_top_k + 1):]
        cand = [int(c) for c in cand if c != blank_id and frame[c] >= prune_logp]
        p_blank_t = float(frame[blank_id])

        nxt: dict[tuple[int, ...], list] = {}

        def bump(key, pb, pnb, frames):
            e = nxt.get(key)
            if e is None:
                nxt[key] = [pb, pnb, frames]
            else:
                e[0] = _lse(e[0], pb)
                e[1] = _lse(e[1], pnb)

        for prefix, (pb, pnb, frames) in beams.items():
            total = _lse(pb, pnb)
            # stay: blank after anything
            bump(prefix, total + p_blank_t, _NEG, frames)
            # stay: repeat of the last token extends its alignment run
            if prefix:
                bump(prefix, _NEG, pnb + float(frame[prefix[-1]]), frames)
            for c in cand:
                p_c = float(frame[c])
                if prefix and c == prefix[-1]:
                    # same token again only via an intervening blank
                    grow = pb + p_c
                else:
                    grow = total + p_c
                if grow == _NEG:
                    continue
                bump(prefix + (c,), _NEG, grow, frames + (t,))

        scored = sorted(nxt.items(), key=lambda kv: -_lse(kv[1][0], kv[1][1]))
        beams = dict(scored[:beam_size])

    out = [
        BeamHypothesis(list(prefix), _lse(pb, pnb), list(frames))
        for prefix, (pb, pnb, frames) in beams.items()
    ]
    out.sort(key=lambda h: -h.score)
    return out[: max(1, n_best)]


__all__ = ["BeamHypothesis", "ctc_beam_search"]
