"""Streaming transcribers: EOU (StreamingTranscriber) and Nemotron.

Mirrors the reference facades (include/parakeet/eou.hpp:101-160,
nemotron.hpp:78-133): feed raw PCM chunks, get text deltas; partial-result
callback; reset(); accumulated text + timestamped tokens.

Pipeline per chunk (call stack SURVEY §3.2): StreamingAudioPreprocessor →
fixed-shape streaming encoder chunk → jitted TDT chunk decode with carried
(LSTM, last_token) state → detokenize delta. All streaming state is either
a fixed-shape device pytree (encoder caches, decode state) or a tiny host
remainder buffer, so every chunk after warmup reuses compiled programs.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from parakeet_tpu import params as P
from parakeet_tpu.audio.frontend import StreamingAudioPreprocessor
from parakeet_tpu.config import (
    AudioConfig,
    EOUConfig,
    NemotronConfig,
    make_eou_120m_config,
    make_nemotron_600m_config,
)
from parakeet_tpu.decode.timestamp import TimestampedToken
from parakeet_tpu.decode.transducer import transducer_greedy_decode
from parakeet_tpu.models.rnnt import prediction_zero_state
from parakeet_tpu.models.streaming_encoder import StreamingEncoderSession
from parakeet_tpu.params import cast_params
from parakeet_tpu.text.tokenizer import Tokenizer

PartialResultCallback = Callable[[str], None]


class _StreamingBase:
    joint_prefix = "tdt_joint_"

    def _spec(self):
        raise NotImplementedError

    def __init__(
        self,
        weights_path: str | None = None,
        vocab_path: str | None = None,
        config=None,
        *,
        params: dict | None = None,
        compute_dtype: str = "float32",
        seed: int = 0,
        quantize: str | None = None,
    ):
        """quantize: "int8"/"int4" weight-only quantization (quantize.py).
        Streaming decode re-reads the prediction/joint weights from HBM
        every chunk — the one path where quantization buys throughput,
        not just footprint (TUNING.md "decode is weight-streaming-bound")."""
        self.config = config
        if params is not None:
            self.params = dict(params)
        else:
            self.params = P.load_params(self._spec(), weights_path, seed=seed,
                                        warn=lambda m: print(f"[parakeet] {m}"))
        if compute_dtype != "float32":
            from parakeet_tpu.transcribe import _dtype_of

            self.params = cast_params(self.params, _dtype_of(compute_dtype))
        if quantize:
            from parakeet_tpu.quantize import quantize_params

            self.params = quantize_params(self.params, mode=quantize)
        self.tokenizer = Tokenizer(vocab_path) if vocab_path else Tokenizer()
        self._blank_id = config.joint.vocab_size - 1
        self._audio_cfg = AudioConfig(n_mels=config.encoder.mel_bins)
        self._partial_cb: PartialResultCallback | None = None
        self.preprocessor = StreamingAudioPreprocessor(self._audio_cfg)
        self.encoder_session = StreamingEncoderSession(self.params, config.encoder, batch=1)
        self._init_decode_state()

    def _init_decode_state(self) -> None:
        self._last_token = jnp.full((1,), self._blank_id, jnp.int32)
        self._lstm = prediction_zero_state(
            self.config.prediction.num_lstm_layers, 1, self.config.prediction.pred_hidden
        )
        self._tokens: list[int] = []
        self._timestamped: list[TimestampedToken] = []
        self._frame_offset = 0

    # ── Public API (eou.hpp:113-158) ─────────────────────────────────────

    def transcribe_chunk(self, samples) -> str:
        """Raw PCM chunk (float32 or int16 1-D) → new text from this chunk."""
        x = np.asarray(samples)
        if x.dtype == np.int16:
            x = x.astype(np.float32) / 32768.0
        feats = self.preprocessor.process_chunk(x.astype(np.float32).reshape(-1))
        if feats is None:
            return ""
        enc = self.encoder_session.forward_chunk(np.asarray(feats))
        if enc is None:
            return ""

        chunk_len = enc.shape[1]
        res = transducer_greedy_decode(
            self.params,
            enc,
            pred_hidden=self.config.prediction.pred_hidden,
            num_lstm_layers=self.config.prediction.num_lstm_layers,
            durations=tuple(self.config.durations),
            blank_id=self._blank_id,
            is_tdt=True,
            joint_prefix=self.joint_prefix,
            init_token=self._last_token,
            init_lstm=self._lstm,
            frame_offset=self._frame_offset,
            clamp_end=False,  # streaming decode does not clamp (eou.cpp:81-84)
        )
        self._last_token = res.last_token
        self._lstm = res.lstm_state
        self._frame_offset += chunk_len

        new_tokens = res.tokens[0]
        self._tokens.extend(new_tokens)
        self._timestamped.extend(res.timestamped[0])
        if new_tokens and self.tokenizer.loaded:
            text = self.tokenizer.decode(new_tokens)
            if self._partial_cb:
                self._partial_cb(text)
            return text
        return ""

    def reset(self) -> None:
        self.preprocessor.reset()
        self.encoder_session.reset()
        self._init_decode_state()

    def get_text(self) -> str:
        if self.tokenizer.loaded and self._tokens:
            return self.tokenizer.decode(self._tokens)
        return ""

    def get_tokens(self) -> list[int]:
        return list(self._tokens)

    def get_timestamped_tokens(self) -> list[TimestampedToken]:
        return list(self._timestamped)

    def set_partial_callback(self, cb: PartialResultCallback) -> None:
        self._partial_cb = cb

    def to_gpu(self) -> None:
        """API-compatibility no-op (reference: move weights to Metal GPU).
        JAX places arrays on the default device (the TPU) automatically."""



class StreamingTranscriber(_StreamingBase):
    """EOU-120m streaming transcriber (eou.hpp:101-160)."""

    joint_prefix = "tdt_joint_"

    def __init__(self, weights_path=None, vocab_path=None, config: EOUConfig | None = None, **kw):
        self._cfg = config or make_eou_120m_config()
        super().__init__(weights_path, vocab_path, self._cfg, **kw)

    def _spec(self):
        cfg = self._cfg
        spec = P.encoder_spec(cfg.encoder, "encoder_")
        spec.update(P.prediction_spec(cfg.prediction, "prediction_"))
        spec.update(P.tdt_joint_spec(cfg.joint, len(cfg.durations), "tdt_joint_"))
        spec.update(P.ctc_spec(cfg.ctc_vocab_size, cfg.encoder.hidden_size, "ctc_decoder_"))
        return spec


class NemotronTranscriber(_StreamingBase):
    """Nemotron-600m multilingual streaming transcriber with latency modes
    (nemotron.hpp:78-133); right context = latency_frames."""

    joint_prefix = "joint_"

    def __init__(self, weights_path=None, vocab_path=None, config: NemotronConfig | None = None, **kw):
        self._cfg = config or make_nemotron_600m_config()
        super().__init__(weights_path, vocab_path, self._cfg, **kw)

    def _spec(self):
        return P.nemotron_spec(self._cfg)


class StreamingBatchTranscriber:
    """Serve B concurrent streaming sessions in lockstep (TPU addition —
    the reference is strictly single-stream).

    Fixed B slots share ONE compiled program per step. Two frontend modes
    (see __init__): per_push — each slot has its own mel preprocessor and
    a mel-frame queue, step readiness = `mel_frames_per_step` frames
    buffered; fused (the serving configuration) — slots hold RAW-sample
    queues, readiness = `_chunk_samples` raw samples, and the whole
    cohort's mel is computed inside the fused step. Inactive slots feed
    zeros and their decoded tokens are discarded. Streams leave with
    `deactivate_slot(i)` and (re)join with `reset_slot(i)` — both are
    in-place state edits; nothing recompiles.
    """

    def __init__(
        self,
        batch: int,
        weights_path: str | None = None,
        vocab_path: str | None = None,
        config=None,
        *,
        model: str = "eou",  # "eou" | "nemotron" — picks preset + weight schema
        frontend: str = "per_push",  # "per_push" | "fused" (see below)
        wire_dtype: str = "float32",  # "float32" | "int16" (fused only)
        params: dict | None = None,
        mel_frames_per_step: int = 16,  # multiple of 8 (subsampling stride)
        seed: int = 0,
        quantize: str | None = None,  # "int8"/"int4" weight-only (see _StreamingBase)
        mesh=None,  # jax.sharding.Mesh with a 'data' axis — shard the cohort
        compute_dtype: str = "float32",  # "bfloat16": MXU-rate encoder chunks
    ):
        """frontend="per_push": each push() runs the slot's mel frontend
        (reference StreamingAudioPreprocessor semantics — the mel grid
        restarts at every push, so output depends on push cadence; one
        device program per push).

        frontend="fused": push() only buffers RAW samples on the host; the
        fused batch step slices a fixed `mel_frames_per_step*hop +
        (win-hop)` samples per slot and computes the WHOLE cohort's mel
        inside the same jitted program as the encoder/decoder — zero
        per-slot frontend dispatches, and output is independent of client
        push cadence (the grid is the internal fixed step). This is the
        serving configuration (serve.StreamingService capacity numbers are
        measured with it); numerics per slot equal per_push fed exactly
        step-sized chunks.

        wire_dtype="int16" (fused only): raw queues and the per-step device
        upload stay s16le — HALF the host→device bytes (the upload is the
        dominant batch-scaling cost on tunnel-attached TPUs), converted to
        float on device exactly like the int16 read path (x/32768).
        Numerics identical for clients that feed int16 PCM (what
        /stream receives); float inputs are quantized to int16 on push.

        mesh: optional jax.sharding.Mesh — the serving cohort (streaming
        caches, decode state, and each step's input batch) shards over the
        mesh's 'data' axis and params replicate, so one lockstep step
        drives batch/dp slots per device with XLA running the per-device
        slices in parallel (no cross-device collectives: every slot's
        state is self-contained, so dp sharding is embarrassingly
        parallel). Tokens are bit-identical to the single-device run
        (pinned by test + the driver dryrun leg). batch must divide by
        mesh.shape['data']. TP ('model' axis > 1) composes via the same
        param rules the offline Transcriber uses."""
        from parakeet_tpu.models.streaming_encoder import (
            init_encoder_cache,
            streaming_encoder_chunk,
        )

        if mel_frames_per_step % 8:
            raise ValueError("mel_frames_per_step must be a multiple of 8")
        if model not in ("eou", "nemotron"):
            raise ValueError(f"model must be 'eou' or 'nemotron', got {model!r}")
        if frontend not in ("per_push", "fused"):
            raise ValueError(f"frontend must be 'per_push' or 'fused', got {frontend!r}")
        if wire_dtype not in ("float32", "int16"):
            raise ValueError(f"wire_dtype must be 'float32' or 'int16', got {wire_dtype!r}")
        if wire_dtype == "int16" and frontend != "fused":
            raise ValueError("wire_dtype='int16' requires frontend='fused'")
        proto_cls = StreamingTranscriber if model == "eou" else NemotronTranscriber
        self.batch = batch
        self.config = config or (
            make_eou_120m_config() if model == "eou" else None
        )
        self._mel_step = mel_frames_per_step
        self._frontend = frontend
        self._wire_dtype = np.int16 if wire_dtype == "int16" else np.float32
        self._chunk_fn = streaming_encoder_chunk
        self._init_cache_fn = init_encoder_cache
        self._joint_prefix = proto_cls.joint_prefix

        proto = proto_cls(weights_path, vocab_path, self.config,
                          params=params, seed=seed, quantize=quantize,
                          compute_dtype=compute_dtype)
        self.config = proto.config  # resolved preset when config was None
        self.params = proto.params
        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as PS

            from parakeet_tpu.parallel.mesh import shard_params

            dp = dict(mesh.shape).get("data", 1)
            if batch % dp:
                raise ValueError(
                    f"batch {batch} must divide by the mesh's data axis ({dp})"
                )
            self.params = shard_params(self.params, mesh)
            # vocab padding may have grown the logit dim; blank stays at
            # vocab_size-1 and padded lanes carry -inf bias (mesh.py), so
            # decode semantics are unchanged.
            self._shardings = {
                # batch dim per state leaf (init_encoder_cache layout)
                "conv": NamedSharding(mesh, PS(None, "data", None, None)),
                "kv": NamedSharding(mesh, PS(None, "data", None, None, None)),
                "valid": NamedSharding(mesh, PS("data")),
                "last_token": NamedSharding(mesh, PS("data")),
                "lstm": NamedSharding(mesh, PS(None, None, "data", None)),
                "raw": NamedSharding(mesh, PS("data", None)),
                "prev": NamedSharding(mesh, PS("data")),
                "mel": NamedSharding(mesh, PS("data", None, None)),
            }
        self.tokenizer = proto.tokenizer
        self._blank_id = proto._blank_id
        self._audio_cfg = proto._audio_cfg

        # ONE jitted program per step: encoder chunk + full decode loop +
        # output packing co-traced, so a serving step pays a single device
        # dispatch and a single host fetch (each dispatch/fetch is a full
        # round trip on relay-attached TPUs — TUNING.md "Streaming
        # multiplexing"). Traced bodies are exactly the ones the unfused
        # paths run; bit-identity is pinned by the batch/hold oracles.
        from parakeet_tpu.decode import transducer as TR

        enc_cfg = self.config.encoder
        chunk_out = mel_frames_per_step // 8
        self._decode_max_out = chunk_out * 10
        decode_kw = dict(
            num_lstm_layers=self.config.prediction.num_lstm_layers,
            durations=tuple(self.config.durations),
            blank_id=self._blank_id, max_symbols=10,
            max_out=self._decode_max_out, is_tdt=True,
            joint_prefix=self._joint_prefix, boost_score=0.0,
            clamp_end=False,  # streaming decode does not clamp (eou.cpp:81-84)
        )

        def _decode_pack(p, enc, last_token, lstm):
            enc_len = jnp.full((enc.shape[0],), enc.shape[1], jnp.int32)
            outs = TR._decode_loop(p, enc, enc_len, last_token, lstm, None, None,
                                   **decode_kw)
            packed = TR._pack_outputs(outs[0], outs[1], outs[2], outs[3], outs[4])
            return packed, outs[5], outs[6]

        def _step_fused(p, mel, cache, last_token, lstm):
            enc, new_cache = streaming_encoder_chunk(p, mel, cache, cfg=enc_cfg)
            packed, last, lstm2 = _decode_pack(p, enc, last_token, lstm)
            return packed, last, lstm2, new_cache

        self._step_fused = jax.jit(_step_fused)

        acfg = self._audio_cfg
        self._chunk_samples = (
            mel_frames_per_step * acfg.hop_length + acfg.win_length - acfg.hop_length
        )
        if frontend == "fused":
            from parakeet_tpu.audio.frontend import streaming_log_mel_batch

            n_mel_frames = mel_frames_per_step

            def _step_fused_audio(p, raw, prev, cache, last_token, lstm):
                if raw.dtype == jnp.int16:
                    raw = raw.astype(jnp.float32) / 32768.0
                mel = streaming_log_mel_batch(raw, prev, acfg, n_mel_frames)
                enc, new_cache = streaming_encoder_chunk(p, mel, cache, cfg=enc_cfg)
                packed, last, lstm2 = _decode_pack(p, enc, last_token, lstm)
                return packed, last, lstm2, new_cache

            self._step_fused_audio = jax.jit(_step_fused_audio)

        self.reset()

    def reset(self) -> None:
        cfg = self.config
        # cache follows the compute dtype (bf16 serving keeps bf16 K/V;
        # streaming_encoder_chunk casts the f32 mel to match)
        from parakeet_tpu.models.streaming_encoder import encoder_compute_dtype

        self._cache = self._init_cache_fn(
            cfg.encoder, self.batch, encoder_compute_dtype(self.params)
        )
        # fused mode never touches per-slot preprocessors (the carry lives
        # in _preemph_prev; mel runs on device) — don't allocate dead state
        self._pre = (
            [] if self._frontend == "fused"
            else [StreamingAudioPreprocessor(self._audio_cfg) for _ in range(self.batch)]
        )
        if self._frontend == "fused":
            # raw-sample queues; mel is computed inside the fused step
            self._queues = [np.zeros((0,), self._wire_dtype) for _ in range(self.batch)]
            self._preemph_prev = np.zeros(self.batch, np.float32)
        else:
            self._queues = [np.zeros((0, cfg.encoder.mel_bins), np.float32) for _ in range(self.batch)]
        self._last_token = jnp.full((self.batch,), self._blank_id, jnp.int32)
        self._lstm = prediction_zero_state(
            cfg.prediction.num_lstm_layers, self.batch, cfg.prediction.pred_hidden
        )
        if self._mesh is not None:
            sh = self._shardings
            self._cache = {
                "conv": jax.device_put(self._cache["conv"], sh["conv"]),
                "key": jax.device_put(self._cache["key"], sh["kv"]),
                "value": jax.device_put(self._cache["value"], sh["kv"]),
                "valid": jax.device_put(self._cache["valid"], sh["valid"]),
            }
            self._last_token = jax.device_put(self._last_token, sh["last_token"])
            self._lstm = jax.device_put(self._lstm, sh["lstm"])
        self._tokens: list[list[int]] = [[] for _ in range(self.batch)]
        self._timestamped: list[list[TimestampedToken]] = [[] for _ in range(self.batch)]
        self._frame_offset = [0] * self.batch
        self._active = [True] * self.batch

    def deactivate_slot(self, slot: int) -> None:
        """Mark a slot vacant: it feeds zero frames and its decode output is
        discarded, so the remaining streams keep flowing."""
        self._active[slot] = False

    def reset_slot(self, slot: int) -> None:
        """Clear one stream's state in place and (re)activate it."""
        self._active[slot] = True
        if self._frontend == "per_push":
            self._pre[slot].reset()
        if self._frontend == "fused":
            self._queues[slot] = np.zeros((0,), self._wire_dtype)
            self._preemph_prev[slot] = 0.0
        else:
            self._queues[slot] = np.zeros((0, self.config.encoder.mel_bins), np.float32)
        self._cache = {
            "conv": self._cache["conv"].at[:, slot].set(0.0),
            "key": self._cache["key"].at[:, slot].set(0.0),
            "value": self._cache["value"].at[:, slot].set(0.0),
            "valid": self._cache["valid"].at[slot].set(0),
        }
        self._last_token = self._last_token.at[slot].set(self._blank_id)
        self._lstm = self._lstm.at[:, :, slot].set(0.0)
        self._tokens[slot] = []
        self._timestamped[slot] = []
        self._frame_offset[slot] = 0

    def push(self, slot: int, samples) -> None:
        """Feed raw PCM to one slot. per_push: runs the slot's mel frontend
        now (one device program). fused: host-side buffer only — the mel is
        computed for the whole cohort inside step()."""
        x = np.asarray(samples).reshape(-1)
        if self._frontend == "fused" and self._wire_dtype == np.int16:
            if x.dtype != np.int16:  # float callers: quantize to the wire
                x = np.clip(x.astype(np.float32) * 32768.0, -32768, 32767).astype(np.int16)
            self._queues[slot] = np.concatenate([self._queues[slot], x])
            return
        if x.dtype == np.int16:
            x = x.astype(np.float32) / 32768.0
        x = x.astype(np.float32)
        if self._frontend == "fused":
            self._queues[slot] = np.concatenate([self._queues[slot], x])
            return
        feats = self._pre[slot].process_chunk(x)
        if feats is not None:
            self._queues[slot] = np.concatenate(
                [self._queues[slot], np.asarray(feats)[0]], axis=0
            )

    @property
    def _step_units(self) -> int:
        """Queue units one step consumes: mel frames (per_push) or raw
        samples (fused)."""
        return self._mel_step if self._frontend == "per_push" else self._chunk_samples

    def ready(self) -> bool:
        return any(self._active) and all(
            q.shape[0] >= self._step_units
            for q, act in zip(self._queues, self._active)
            if act
        )

    def lagging_slots(self) -> list[int]:
        """Active slots without enough buffered mel frames for a step —
        candidates for `step(hold=...)` so they don't stall the cohort."""
        return [
            i for i, (q, act) in enumerate(zip(self._queues, self._active))
            if act and q.shape[0] < self._step_units
        ]

    def ready_any(self) -> bool:
        """True when at least one active slot can step (lagging slots can be
        passed as `hold`) — the serving-cadence variant of ready()."""
        return any(
            act and q.shape[0] >= self._step_units
            for q, act in zip(self._queues, self._active)
        )

    def step(self, hold=()) -> list[list[int]]:
        """Run one uniform batch step; returns new tokens per ACTIVE slot
        (empty lists for inactive slots).

        hold: slot indices whose streams lag. Held slots ride through the
        batched encoder/decoder (shapes stay uniform, nothing recompiles)
        but ALL their state — KV/conv caches, valid counters, LSTM state,
        last token, token lists, frame offsets, mel queues — is restored
        afterwards, exactly as if the step never happened for them. This is
        what lets a serving layer keep fast streams flowing while one
        client's audio is late (see serve.StreamingService).
        """
        hold = {int(i) for i in hold}
        for i in hold:
            if not 0 <= i < self.batch:
                raise ValueError(f"hold slot {i} out of range for batch {self.batch}")
        runnable = [
            act and (i not in hold) for i, act in enumerate(self._active)
        ]
        if not any(runnable):
            raise RuntimeError("no active un-held slot to step")
        if any(
            self._queues[i].shape[0] < self._step_units
            for i, r in enumerate(runnable) if r
        ):
            raise RuntimeError(
                "not every active un-held slot has enough buffered input; "
                "check ready()/lagging_slots()"
            )
        if self._frontend == "fused":
            cs = self._chunk_samples
            zeros = np.zeros((cs,), self._wire_dtype)
            raw = np.stack([
                q[:cs] if r else zeros for q, r in zip(self._queues, runnable)
            ])
            prev = self._preemph_prev.copy()
        else:
            zeros = np.zeros((self._mel_step, self.config.encoder.mel_bins), np.float32)
            mel = np.stack([
                q[: self._mel_step] if r else zeros
                for q, r in zip(self._queues, runnable)
            ])
        held = sorted(i for i in hold if self._active[i])
        if held:
            idx = np.asarray(held)
            old = {
                "conv": self._cache["conv"][:, idx],
                "key": self._cache["key"][:, idx],
                "value": self._cache["value"][:, idx],
                "valid": self._cache["valid"][idx],
                "last_token": self._last_token[idx],
                "lstm": self._lstm[:, :, idx],
            }

        if self._frontend == "fused":
            raw_j, prev_j = jnp.asarray(raw), jnp.asarray(prev)
            if self._mesh is not None:
                raw_j = jax.device_put(raw_j, self._shardings["raw"])
                prev_j = jax.device_put(prev_j, self._shardings["prev"])
            packed, new_last, new_lstm, new_cache = self._step_fused_audio(
                self.params, raw_j, prev_j,
                self._cache, self._last_token, self._lstm,
            )
        else:
            mel_j = jnp.asarray(mel)
            if self._mesh is not None:
                mel_j = jax.device_put(mel_j, self._shardings["mel"])
            packed, new_last, new_lstm, new_cache = self._step_fused(
                self.params, mel_j, self._cache, self._last_token, self._lstm
            )

        # ONE host fetch for the whole step's decode output (see __init__).
        # The fetch is ALSO the commit point: on this relay the jit call
        # returns async futures and errors surface only at the fetch
        # (CLAUDE.md), so nothing — queues, caches, LSTM/token state,
        # preemphasis carries — is rebound until the step's results are in
        # hand. A transient relay/device error leaves the transcriber
        # exactly at the pre-step state and a retrying serving worker
        # replays the same chunk (ADVICE r2, tightened r3 review).
        packed = np.asarray(packed)
        self._last_token, self._lstm, self._cache = new_last, new_lstm, new_cache
        if self._frontend == "fused":
            for i, r in enumerate(runnable):
                if r:  # held/inactive slots keep their preemphasis carry
                    last = raw[i, -1]
                    self._preemph_prev[i] = (
                        last / 32768.0 if raw.dtype == np.int16 else last
                    )
        self._queues = [
            q[self._step_units :] if r else q
            for q, r in zip(self._queues, runnable)
        ]
        if held:
            # un-step the held slots: restore every piece of their state
            self._cache = {
                "conv": self._cache["conv"].at[:, idx].set(old["conv"]),
                "key": self._cache["key"].at[:, idx].set(old["key"]),
                "value": self._cache["value"].at[:, idx].set(old["value"]),
                "valid": self._cache["valid"].at[idx].set(old["valid"]),
            }
            self._last_token = self._last_token.at[idx].set(old["last_token"])
            self._lstm = self._lstm.at[:, :, idx].set(old["lstm"])
        m = self._decode_max_out
        conf = np.ascontiguousarray(packed[:, 3 * m : 4 * m]).view(np.float32)
        chunk_len = self._mel_step // 8
        out: list[list[int]] = []
        for i in range(self.batch):
            if not self._active[i] or i in hold:
                out.append([])
                continue
            n = int(packed[i, 4 * m])
            toks = packed[i, :n].tolist()
            self._tokens[i].extend(toks)
            off = self._frame_offset[i]
            self._timestamped[i].extend(
                TimestampedToken(
                    int(packed[i, j]),
                    int(packed[i, m + j]) + off,
                    int(packed[i, 2 * m + j]) + off,
                    float(conf[i, j]),
                )
                for j in range(n)
            )
            self._frame_offset[i] += chunk_len
            out.append(toks)
        return out

    def get_text(self, slot: int) -> str:
        if self.tokenizer.loaded and self._tokens[slot]:
            return self.tokenizer.decode(self._tokens[slot])
        return ""

    def get_timestamped_tokens(self, slot: int) -> list[TimestampedToken]:
        """Stream-absolute timestamped tokens for one slot."""
        return list(self._timestamped[slot])


__all__ = [
    "StreamingTranscriber",
    "NemotronTranscriber",
    "StreamingBatchTranscriber",
    "PartialResultCallback",
]
