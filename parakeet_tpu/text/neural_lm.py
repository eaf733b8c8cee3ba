"""Neural (transformer) language model for n-best rescoring and fusion.

Implements the reference's Tier-2 roadmap item "Neural LM rescoring"
(/root/reference/README.md:514) as a real capability, not a hook: a small
causal transformer LM over tokenizer ids, trainable with the package's own
stack (optax + the Sortformer-head transformer blocks from
models/transformer.py reused with a causal mask), persisted as
dependency-free safetensors, and exposing the SAME scoring protocol the
n-gram LM uses (`score_sequence`, `start_state`/`advance`) — so it plugs
into `rescore_nbest`, the transducer-beam rescoring path, and the CTC
beam's shallow fusion unchanged.

Vocab convention: ids 0..vocab_size-1 are the tokenizer's (the blank row
exists but never appears in hypotheses); BOS = vocab_size and
EOS = vocab_size + 1 are appended to the embedding/output tables.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from parakeet_tpu.config import TransformerConfig
from parakeet_tpu.models.transformer import transformer_encode
from parakeet_tpu.ops.layers import embedding, linear
from parakeet_tpu.params import Params, init_params, transformer_spec

_F32 = jnp.float32


@dataclass(frozen=True)
class NeuralLMConfig:
    vocab_size: int  # tokenizer vocab (incl. blank); BOS/EOS appended after
    hidden: int = 128
    num_layers: int = 2
    num_heads: int = 4
    ffn_intermediate: int = 256
    max_len: int = 128  # longest scored/trained sequence incl. BOS

    @property
    def bos(self) -> int:
        return self.vocab_size

    @property
    def eos(self) -> int:
        return self.vocab_size + 1

    def transformer(self) -> TransformerConfig:
        return TransformerConfig(
            hidden_size=self.hidden, num_layers=self.num_layers,
            num_heads=self.num_heads, ffn_intermediate=self.ffn_intermediate,
            pre_ln=True, has_final_norm=True,
        )


def neural_lm_spec(cfg: NeuralLMConfig, prefix: str = "lm_") -> dict:
    spec: dict = {
        f"{prefix}.embed_.weight": ((cfg.vocab_size + 2, cfg.hidden), "emb"),
        f"{prefix}.pos_.weight": ((cfg.max_len, cfg.hidden), "emb"),
        f"{prefix}.out_.weight": ((cfg.vocab_size + 2, cfg.hidden), "w"),
        f"{prefix}.out_.bias": ((cfg.vocab_size + 2,), "b"),
    }
    spec.update(transformer_spec(cfg.transformer(), f"{prefix}.transformer_"))
    return spec


def lm_log_probs(params: dict, cfg: NeuralLMConfig, ids: jnp.ndarray) -> jnp.ndarray:
    """ids (B, U) int32 (BOS-prefixed inputs) → (B, U, V+2) next-token
    log-probs under a causal mask."""
    p = Params(params).sub("lm_")
    b, u = ids.shape
    x = embedding(p.sub("embed_"), ids) + p["pos_.weight"][:u][None]
    causal = jnp.triu(jnp.ones((u, u), bool), k=1)[None, None]  # True = masked
    h = transformer_encode(p.sub("transformer_"), cfg.transformer(), x, causal)
    logits = linear(p.sub("out_"), h).astype(_F32)
    return jax.nn.log_softmax(logits, axis=-1)


class NeuralLM:
    """Scoring facade over a trained (or random) LM param dict.

    Protocol-compatible with BoundNgramLM: `score_sequence(token_ids,
    eos=False)`, `start_state()`, `advance(state, token_id)` — usable for
    rescore_nbest, transducer-beam rescoring, and CTC shallow fusion.
    """

    def __init__(self, params: dict, cfg: NeuralLMConfig):
        self.params = dict(params)
        self.cfg = cfg
        self._score_jit = jax.jit(
            lambda p, ids: lm_log_probs(p, cfg, ids), static_argnums=()
        )
        self._next_cache: dict[tuple, np.ndarray] = {}

    # ── construction / persistence ───────────────────────────────────────
    @classmethod
    def random(cls, cfg: NeuralLMConfig, seed: int = 0) -> "NeuralLM":
        return cls(init_params(neural_lm_spec(cfg), seed=seed), cfg)

    def save(self, path: str | Path) -> None:
        from parakeet_tpu.io.safetensors import save_safetensors

        blob = {k: np.asarray(v) for k, v in self.params.items()}
        blob["##config"] = np.frombuffer(
            json.dumps(asdict(self.cfg)).encode("utf-8"), np.uint8
        ).copy()
        save_safetensors(blob, path)

    @classmethod
    def load(cls, path: str | Path) -> "NeuralLM":
        from parakeet_tpu.io.safetensors import load_safetensors

        blob = dict(load_safetensors(path))
        cfg = NeuralLMConfig(**json.loads(bytes(blob.pop("##config")).decode("utf-8")))
        return cls({k: v.copy() for k, v in blob.items()}, cfg)

    # ── scoring ──────────────────────────────────────────────────────────
    def _bucket(self, u: int) -> int:
        """Pad scored lengths to multiples of 16 so arbitrary hypothesis
        lengths reuse a bounded set of compiled programs."""
        return min(self.cfg.max_len, -(-u // 16) * 16)

    def score_batch(self, sequences, *, eos: bool = False) -> list[float]:
        """Sum of next-token log-probs per sequence, ONE device call for the
        whole n-best list."""
        if not any(len(s) for s in sequences) and not eos:
            return [0.0] * len(sequences)
        cfg = self.cfg
        n = max((len(s) for s in sequences), default=0)
        u = self._bucket(n + 1)  # BOS + tokens (+ EOS target slot)
        ids = np.full((len(sequences), u), cfg.eos, np.int32)
        tgt = np.full((len(sequences), u), -1, np.int32)
        for i, seq in enumerate(sequences):
            seq = [min(int(t), cfg.vocab_size - 1) for t in seq][: u - 1]
            ids[i, 0] = cfg.bos
            ids[i, 1 : 1 + len(seq)] = seq
            tgt[i, : len(seq)] = seq
            if eos:
                tgt[i, len(seq)] = cfg.eos
        lp = np.asarray(self._score_jit(self.params, jnp.asarray(ids)))
        out = []
        for i in range(len(sequences)):
            valid = tgt[i] >= 0
            out.append(float(lp[i, valid, tgt[i, valid]].sum()) if valid.any() else 0.0)
        return out

    def score_sequence(self, token_ids, *, bos: bool = True, eos: bool = False) -> float:
        # bos accepted for NgramLM signature parity; BOS is always implicit
        return self.score_batch([list(token_ids)], eos=eos)[0]

    # ── incremental protocol (CTC shallow fusion) ────────────────────────
    def start_state(self) -> tuple:
        return ()

    def _next_logprobs(self, prefix: tuple) -> np.ndarray:
        cached = self._next_cache.get(prefix)
        if cached is not None:
            return cached
        cfg = self.cfg
        u = self._bucket(len(prefix) + 1)
        ids = np.full((1, u), cfg.eos, np.int32)
        ids[0, 0] = cfg.bos
        seq = [min(int(t), cfg.vocab_size - 1) for t in prefix][-(u - 1):]
        ids[0, 1 : 1 + len(seq)] = seq
        lp = np.asarray(self._score_jit(self.params, jnp.asarray(ids)))[0, len(seq)]
        if len(self._next_cache) > 4096:  # bound beam-search memory
            self._next_cache.clear()
        self._next_cache[prefix] = lp
        return lp

    def advance(self, state: tuple, token_id: int):
        lp = self._next_logprobs(tuple(state))
        tok = min(int(token_id), self.cfg.vocab_size - 1)
        return tuple(state) + (tok,), float(lp[tok])


def train_neural_lm(
    sequences,
    cfg: NeuralLMConfig,
    *,
    steps: int = 200,
    learning_rate: float = 3e-3,
    batch_size: int = 32,
    seed: int = 0,
) -> NeuralLM:
    """Train a NeuralLM on token-id sequences with the package's own train
    stack (optax adam, next-token cross-entropy incl. EOS). Returns the
    trained facade; `.save()` persists it."""
    import optax

    params = init_params(neural_lm_spec(cfg), seed=seed)
    u = min(cfg.max_len, max(max((len(s) for s in sequences), default=1) + 1, 2))
    ids = np.full((len(sequences), u), cfg.eos, np.int32)
    tgt = np.full((len(sequences), u), -1, np.int32)
    for i, seq in enumerate(sequences):
        seq = [min(int(t), cfg.vocab_size - 1) for t in seq][: u - 1]
        ids[i, 0] = cfg.bos
        ids[i, 1 : 1 + len(seq)] = seq
        tgt[i, : len(seq)] = seq
        tgt[i, len(seq)] = cfg.eos

    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o, bi, bt):
        def loss_fn(p):
            lp = lm_log_probs(p, cfg, bi)
            mask = (bt >= 0).astype(_F32)
            picked = jnp.take_along_axis(
                lp, jnp.clip(bt, 0)[..., None], axis=-1
            )[..., 0]
            return -(picked * mask).sum() / jnp.maximum(mask.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.RandomState(seed)
    loss = np.inf
    for _ in range(steps):
        pick = rng.randint(0, len(sequences), size=min(batch_size, len(sequences)))
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(ids[pick]), jnp.asarray(tgt[pick])
        )
    lm = NeuralLM({k: np.asarray(v) for k, v in params.items()}, cfg)
    lm.final_loss = float(loss)
    return lm


__all__ = ["NeuralLM", "NeuralLMConfig", "neural_lm_spec", "lm_log_probs", "train_neural_lm"]
