"""High-level transcription API: Transcriber (TDT-CTC) and TDTTranscriber.

Mirrors the reference facades (include/parakeet/transcribe.hpp:55-299):
construct from safetensors + vocab, `transcribe(path | samples | bytes)`
with decoder choice (CTC/TDT), timestamps, and phrase boosting. The
pipeline is read → mel frontend → jitted encoder (+CTC head) → decode →
detokenize → word grouping (call stack SURVEY §3.1).

TPU-native extensions over the reference:
  * `transcribe_batch`: padded, length-masked batched inference (the
    reference is batch-1 only; README.md:513 roadmap item).
  * `compute_dtype="bfloat16"` for MXU-speed inference (f32 default
    matches reference numerics).
  * decode runs as one on-device while_loop (no per-step host syncs).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field, replace
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from parakeet_tpu import params as P
from parakeet_tpu.audio.frontend import preprocess_audio
from parakeet_tpu.audio.io import read_audio
from parakeet_tpu.config import AudioConfig, TDTCTCConfig, TDTConfig, RNNTConfig, make_110m_config
from parakeet_tpu.decode.phrase_boost import ContextTrie, DEFAULT_BOOST_SCORE
from parakeet_tpu.decode.phrase_boost import (
    ctc_greedy_decode_boosted,
    ctc_greedy_decode_with_timestamps_boosted,
)
from parakeet_tpu.decode.timestamp import (
    FRAME_DURATION_S,
    TimestampedToken,
    TimestampMode,
    WordTimestamp,
    group_timestamps,
    group_token_words,
)
from parakeet_tpu.decode.transducer import transducer_greedy_decode
from parakeet_tpu.models.ctc import (
    ctc_greedy_decode,
    ctc_greedy_decode_with_timestamps,
    ctc_log_probs,
)
from parakeet_tpu.models.encoder import encoded_lengths, fastconformer_encode
from parakeet_tpu.params import Params
from parakeet_tpu.text.tokenizer import Tokenizer


class Decoder(enum.Enum):
    CTC = "ctc"
    TDT = "tdt"


@dataclass
class TranscribeResult:
    text: str = ""
    token_ids: list[int] = field(default_factory=list)
    timestamped_tokens: list[TimestampedToken] = field(default_factory=list)
    word_timestamps: list[WordTimestamp] = field(default_factory=list)


@dataclass
class TranscribeOptions:
    decoder: Decoder = Decoder.TDT
    timestamps: bool = False
    boost_phrases: list[str] = field(default_factory=list)
    boost_score: float = DEFAULT_BOOST_SCORE
    # word grouping granularity (timestamp.hpp TimestampMode; Sentences
    # merges words at ./?/! — timestamp.cpp:84-111)
    timestamp_mode: TimestampMode = TimestampMode.WORDS
    # Beam width; 0 = greedy (the reference's only mode). CTC uses host-side
    # prefix beam search (decode/ctc_beam.py); TDT/RNNT use the jitted
    # device-side beam (decode/beam_transducer.py). Beyond-reference.
    beam_size: int = 0
    # Optional n-gram LM (text.ngram_lm.BoundNgramLM) + fusion weight λ:
    # CTC beams fuse token-by-token (shallow fusion); transducer beams
    # rescore the n-best list. Needs beam_size > 0. Reference roadmap
    # Tier-1 item, implemented here.
    lm: object | None = None
    lm_weight: float = 0.0
    # Progress callback (reference Tier-1 roadmap item README.md:505 —
    # "Progress callbacks for long files"). Called as
    # on_progress(stage: str, done: int, total: int) at host-observable
    # pipeline boundaries: "load" (per source file decoded), "preprocess"
    # (mel frontend done), "decode" (encoder+decode results fetched back to
    # host — one unit, since both run inside one device program), and
    # "window" (per window batch in transcribe_long). Exceptions propagate
    # to the caller (same contract as streaming partial callbacks).
    on_progress: object | None = None


def _emit_progress(opts: "TranscribeOptions", stage: str, done: int, total: int) -> None:
    cb = getattr(opts, "on_progress", None)
    if cb is not None:
        cb(stage, done, total)


def _dtype_of(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class _TranscriberBase:
    """Shared pipeline for the TDT-CTC / TDT-only / RNNT facades."""

    has_ctc = False
    joint_prefix = "tdt_joint_"
    is_tdt = True

    def __init__(
        self,
        weights_path: str | None = None,
        vocab_path: str | None = None,
        config=None,
        *,
        params: dict | None = None,
        compute_dtype: str = "float32",
        seed: int = 0,
        mesh=None,
        kernels: str | bool | None = None,
        quantize: str | None = None,
        long_audio: str = "window",
        long_threshold_s: float = 40.0,
        long_window_s: float = 10.0,
        long_overlap_s: float = 2.0,
    ):
        """mesh: optional jax.sharding.Mesh with a 'data' axis — batched
        inference shards the batch over it (data parallelism; weights are
        replicated). Build one with parakeet_tpu.parallel.make_mesh().
        A mesh with a 'seq' axis (make_mesh(seq_parallel=…)) additionally
        shards encoder activations over time — sequence parallelism for
        long clips, XLA inserting the halo/gather collectives. Requires
        the XLA attention path (kernels=None/False).

        quantize: "int8" (per-out-channel scales, dequant folded into the
        linear results) or "int4" (packed nibbles + group-wise scales,
        dequant fused into the weight read) for weight-only quantized
        inference — quantize.py; reference roadmap Tier-3 item.
        Activations stay compute_dtype; Pallas kernels auto-fall back to
        the XLA path for quantized weights.

        kernels: opt into the fused Pallas encoder kernels (True = the
        measured-best TPU config for this model's scale: "block4hp" at
        d_model<1024, plain "block" at d_model>=1024 where the 4-item
        batch packing's VMEM footprint triggers the NB downgrade chain
        and costs ~12% — TUNING.md r4 "600m-scale batch knees"; the hp
        head-pair packing degrades to per-head automatically where it
        wouldn't pay). Pass an explicit mode string to override.
        NOTE: sets process-global encoder state (models.encoder.
        set_fused_attention) — it affects every model in this process; pass
        kernels=False to restore the XLA path globally, or None (default)
        to leave the current global setting untouched. The XLA path is the
        bit-stable reference-parity path; the kernels match it to ~1e-3
        (tolerance-tested), which can flip near-tie argmax decisions on
        pathological inputs.

        long_audio: "window" (default) auto-routes offline clips longer
        than `long_threshold_s` through overlapping-window decode
        (transcribe_long_batch with `long_window_s`/`long_overlap_s`
        windows, windows batched ACROSS clips) — dense attention cost
        grows with T² and the measured encoder throughput collapses past
        the ~10 s batch knee (60 s dense = 46% of the 10 s operating
        point, TUNING.md), so windowing is the throughput-correct default
        for long audio. "dense" opts out (one dense decode regardless of
        length — the r4 behavior). Routing applies to greedy decodes only;
        beam/LM calls always run dense. Windowed results always carry
        timestamps (the merge needs them)."""
        self.config = config
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        if long_audio not in ("window", "dense"):
            raise ValueError(
                f"long_audio must be 'window' or 'dense', got {long_audio!r}"
            )
        if not 0 <= long_overlap_s < long_window_s:
            raise ValueError(
                f"long_overlap_s ({long_overlap_s}) must be >= 0 and < "
                f"long_window_s ({long_window_s})"
            )
        self.long_audio = long_audio
        self.long_threshold_s = long_threshold_s
        self.long_window_s = long_window_s
        self.long_overlap_s = long_overlap_s
        # Validate the kernels × mesh combination BEFORE touching the
        # process-global kernel mode, against the EFFECTIVE mode (kernels
        # is None = keep whatever global is already set): Pallas kernels
        # are per-device programs and can't ride a sequence-parallel
        # (GSPMD-partitioned-over-time) encoder.
        if mesh is not None:
            from parakeet_tpu.models.encoder import get_fused_attention
            from parakeet_tpu.parallel.mesh import activation_sharding

            effective = (get_fused_attention() if kernels is None
                         else False if kernels is False else kernels)
            if activation_sharding(mesh) is not None and effective:
                raise ValueError(
                    "sequence-parallel mesh requires the XLA attention path; "
                    "pass kernels=False (Pallas kernels are per-device programs)"
                )
        if kernels is not None:
            from parakeet_tpu.models.encoder import set_fused_attention

            if kernels is True:
                # Measured-best mode by scale (TUNING.md r4): block4hp at
                # d=512-class models; plain block at d>=1024 (batch packing
                # loses to VMEM pressure there, −12% measured at 600m).
                kernels = ("block" if config.encoder.hidden_size >= 1024
                           else "block4hp")
            set_fused_attention(kernels)
        spec = self._spec()
        if params is not None:
            self.params = dict(params)
        else:
            self.params = P.load_params(spec, weights_path, seed=seed, warn=lambda m: print(f"[parakeet] {m}"))
        if compute_dtype != "float32":
            self.params = P.cast_params(self.params, _dtype_of(compute_dtype))
        if quantize:
            from parakeet_tpu.quantize import quantize_params

            self.params = quantize_params(self.params, mode=quantize)
        self._act_sharding = None
        if mesh is not None:
            from parakeet_tpu.parallel.mesh import activation_sharding, shard_params

            self.params = shard_params(self.params, mesh)  # replicated (no TP rules hit at batch DP)
            self._act_sharding = activation_sharding(mesh)  # validated above
        self.tokenizer = Tokenizer(vocab_path) if vocab_path else Tokenizer()
        self._audio_cfg = AudioConfig(n_mels=config.encoder.mel_bins)
        self._blank_id = config.joint.vocab_size - 1

        enc_cfg = config.encoder

        act_sh = self._act_sharding

        def _encode(p, feats, lengths):
            x = feats.astype(_dtype_of(compute_dtype))
            out = fastconformer_encode(
                Params(p).sub("encoder_"), enc_cfg, x, lengths, act_sharding=act_sh
            )
            return out

        self._encode = jax.jit(_encode)

        if self.has_ctc:

            def _encode_ctc(p, feats, lengths):
                enc = _encode(p, feats, lengths)
                return enc, ctc_log_probs(Params(p).sub("ctc_decoder_"), enc)

            self._encode_ctc = jax.jit(_encode_ctc)

    def _spec(self):
        raise NotImplementedError

    def to_gpu(self) -> None:
        """API-compatibility no-op (reference: move weights to Metal GPU).
        JAX places arrays on the default device (the TPU) automatically."""

    # ── Input handling ───────────────────────────────────────────────────

    def _to_samples(self, source) -> np.ndarray:
        if isinstance(source, (str, Path)):
            return read_audio(source, self._audio_cfg.sample_rate).samples
        if isinstance(source, (bytes, bytearray)):
            return read_audio(bytes(source), self._audio_cfg.sample_rate).samples
        arr = np.asarray(source)
        if arr.dtype == np.int16 or arr.ndim > 1:
            # int16 needs the 1/32768 scaling and (frames, channels) arrays
            # need a downmix — blind reshape(-1) would interleave channels
            # into spectrally corrupted "mono"; read_audio's raw-PCM overload
            # handles both (and rejects >2-D)
            return read_audio(arr, sample_rate=self._audio_cfg.sample_rate).samples
        return arr.astype(np.float32).reshape(-1)

    # ── Public API ───────────────────────────────────────────────────────

    def transcribe(
        self,
        source,
        decoder: Decoder = Decoder.TDT,
        timestamps: bool = False,
        *,
        boost_phrases: list[str] | None = None,
        boost_score: float = DEFAULT_BOOST_SCORE,
        timestamp_mode: TimestampMode = TimestampMode.WORDS,
        beam_size: int = 0,
        lm=None,
        lm_weight: float = 0.0,
    ) -> TranscribeResult:
        opts = TranscribeOptions(
            decoder, timestamps, list(boost_phrases or []), boost_score,
            timestamp_mode, beam_size, lm, lm_weight
        )
        return self.transcribe_batch([source], opts)[0]

    def transcribe_batch(
        self,
        sources: list,
        opts: TranscribeOptions | None = None,
        *,
        pad_to_multiple: int | None = None,
    ) -> list[TranscribeResult]:
        """Batched inference. `pad_to_multiple` (mel frames) buckets the
        padded length so arbitrary-length workloads reuse a bounded set of
        compiled programs (e.g. 200 ≙ 2 s granularity); None = exact length
        (one compile per distinct max length).

        Clips longer than `long_threshold_s` are auto-routed through
        overlapping-window decode when the facade was built with
        long_audio="window" (the default — see __init__); short clips in
        the same batch still decode densely together, and result order is
        preserved."""
        opts = opts or TranscribeOptions()
        if (self.long_audio == "window" and sources
                and opts.beam_size == 0 and opts.lm is None):
            sr = self._audio_cfg.sample_rate
            thr = int(self.long_threshold_s * sr)
            waves = [self._to_samples(s) for s in sources]
            long_ix = {i for i, w in enumerate(waves) if len(w) > thr}
            if long_ix:
                results: list = [None] * len(waves)
                short_ix = [i for i in range(len(waves)) if i not in long_ix]
                if short_ix:
                    for i, r in zip(short_ix, self._transcribe_batch_dense(
                            [waves[i] for i in short_ix], opts,
                            pad_to_multiple=pad_to_multiple)):
                        results[i] = r
                order = sorted(long_ix)
                for i, r in zip(order, self.transcribe_long_batch(
                        [waves[i] for i in order], opts.decoder, opts=opts)):
                    results[i] = r
                return results
            sources = waves  # already loaded; fall through to dense
        return self._transcribe_batch_dense(
            sources, opts, pad_to_multiple=pad_to_multiple
        )

    def _transcribe_batch_dense(
        self,
        sources: list,
        opts: TranscribeOptions | None = None,
        *,
        pad_to_multiple: int | None = None,
    ) -> list[TranscribeResult]:
        """One dense decode regardless of clip length (no window routing)."""
        prepared = self.prepare_batch(sources, opts, pad_to_multiple=pad_to_multiple)
        return self.decode_prepared(prepared)

    def prepare_batch(
        self,
        sources: list,
        opts: TranscribeOptions | None = None,
        *,
        pad_to_multiple: int | None = None,
    ):
        """Pipeline stage 1: load audio + run the mel frontend (device work
        dispatches asynchronously; nothing blocks on results). Returns an
        opaque prepared-batch handle for `decode_prepared`.

        The split exists so a serving layer can overlap batch N+1's
        load/frontend with batch N's encoder/decode (serve.py's pipelined
        worker) — `transcribe_batch` is exactly
        `decode_prepared(prepare_batch(...))`."""
        opts = opts or TranscribeOptions()
        if not sources:
            return ("empty", opts, pad_to_multiple, None, None)

        waves = []
        for i, s in enumerate(sources):
            waves.append(self._to_samples(s))
            _emit_progress(opts, "load", i + 1, len(sources))
        if len(waves) > 1:
            # one device call for the whole batch (exact per-clip equality);
            # features STAY on device — normalized pad frames are exactly 0
            # (masked normalization), identical to host zero-padding, so no
            # device→host→device round trip is needed
            from parakeet_tpu.audio.frontend import preprocess_audio_batch

            batched, n_frames = preprocess_audio_batch(waves, self._audio_cfg)
            _emit_progress(opts, "preprocess", 1, 1)
            if not self._audio_cfg.normalize:
                # unnormalized pad frames are log-guard values, not 0 —
                # re-pad on host (not hit by the ASR facades)
                arr = np.asarray(batched)
                feats = [arr[i, : n_frames[i]] for i in range(len(waves))]
                return ("feats", opts, pad_to_multiple, feats, None)
            return ("padded", opts, pad_to_multiple, batched, list(n_frames))
        feats = [np.asarray(preprocess_audio(w, self._audio_cfg))[0] for w in waves]
        _emit_progress(opts, "preprocess", 1, 1)
        return ("feats", opts, pad_to_multiple, feats, None)

    def decode_prepared(self, prepared) -> list[TranscribeResult]:
        """Pipeline stage 2: encoder + decode + result assembly for a
        `prepare_batch` handle."""
        kind, opts, pad_to_multiple, payload, n_frames = prepared
        if kind == "empty":
            return []
        if kind == "feats":
            return self._decode_features(payload, opts, pad_to_multiple=pad_to_multiple)
        return self._decode_padded(payload, n_frames, opts, pad_to_multiple=pad_to_multiple)

    def transcribe_features(self, features, opts: TranscribeOptions | None = None):
        """Decode precomputed mel features — the reference CLI's --features
        path (main.cpp --features flag). Accepts (T, mel) or (B, T, mel);
        returns a single TranscribeResult for 2-D / batch-1 input, else a
        list of results (one per batch row)."""
        f = np.asarray(features, np.float32)
        if f.ndim == 2:
            return self._decode_features([f], opts or TranscribeOptions())[0]
        if f.ndim != 3:
            raise ValueError(f"expected (T, mel) or (B, T, mel) features, got {f.shape}")
        results = self._decode_features(list(f), opts or TranscribeOptions())
        return results[0] if len(results) == 1 else results

    def _decode_features(
        self,
        feats: list[np.ndarray],
        opts: TranscribeOptions,
        *,
        pad_to_multiple: int | None = None,
    ) -> list[TranscribeResult]:
        mel_lens = [f.shape[0] for f in feats]
        t_max = max(mel_lens)
        if pad_to_multiple:
            t_max = -(-t_max // pad_to_multiple) * pad_to_multiple
        batch = np.zeros((len(feats), t_max, self._audio_cfg.n_mels), np.float32)
        for i, f in enumerate(feats):
            batch[i, : f.shape[0]] = f
        return self._decode_padded(batch, mel_lens, opts)

    def _decode_padded(
        self,
        batch,
        mel_lens: list[int],
        opts: TranscribeOptions,
        *,
        pad_to_multiple: int | None = None,
    ) -> list[TranscribeResult]:
        """Encoder + decode + result assembly; emits the "decode" progress
        stage once results are back on the host (encoder and decode run
        inside one device program — see TranscribeOptions.on_progress)."""
        results = self._decode_padded_impl(
            batch, mel_lens, opts, pad_to_multiple=pad_to_multiple
        )
        _emit_progress(opts, "decode", 1, 1)
        return results

    def _decode_padded_impl(
        self,
        batch,  # (B, T, mel) np or device array, zero-padded per item
        mel_lens: list[int],
        opts: TranscribeOptions,
        *,
        pad_to_multiple: int | None = None,
    ) -> list[TranscribeResult]:
        n = len(mel_lens)
        if n == 0:
            return []
        # validate BEFORE any device work: every public entry point funnels
        # here, and the first encoder dispatch can cost a 30-120 s remote
        # compile — option errors must be free
        if opts.decoder == Decoder.CTC and not self.has_ctc:
            raise ValueError("this model has no CTC head; use Decoder.TDT")
        if opts.beam_size > 0 and opts.boost_phrases:
            raise ValueError(
                "phrase boosting composes with greedy decode only; "
                "use beam_size=0 with boost_phrases"
            )
        t_max = batch.shape[1]
        pad_t = 0
        if pad_to_multiple:
            pad_t = -(-t_max // pad_to_multiple) * pad_to_multiple - t_max
        pad_items = 0
        if self.mesh is not None:
            # batch must divide over the 'data' axis; pad with empty items
            dp = self.mesh.shape["data"]
            pad_items = (-n) % dp
        if pad_t or pad_items:
            batch = jnp.pad(batch, ((0, pad_items), (0, pad_t), (0, 0)))
        lengths = jnp.asarray(mel_lens + [1] * pad_items, jnp.int32)
        feats_j = jnp.asarray(batch)
        if self.mesh is not None:
            from parakeet_tpu.parallel.mesh import batch_sharding

            feats_j = jax.device_put(feats_j, batch_sharding(self.mesh, 3))
            lengths = jax.device_put(lengths, batch_sharding(self.mesh, 1))

        trie = None
        if opts.boost_phrases:
            trie = ContextTrie()
            trie.build(opts.boost_phrases, self.tokenizer)
            if trie.empty():
                trie = None

        enc_lens = [int(l) for l in np.asarray(encoded_lengths(np.asarray(mel_lens)))]
        enc_lens += [1] * pad_items  # mesh padding items (discarded below)

        if opts.decoder == Decoder.CTC:
            _, log_probs = self._encode_ctc(self.params, feats_j, lengths)
            if opts.beam_size > 0:  # beam x boost rejected above
                return self._ctc_beam_results(log_probs, enc_lens, opts, n)
            if opts.timestamps:
                if trie is not None:
                    ts = ctc_greedy_decode_with_timestamps_boosted(
                        log_probs, trie, opts.boost_score, self._ctc_blank(), enc_lens
                    )
                else:
                    ts = ctc_greedy_decode_with_timestamps(log_probs, self._ctc_blank(), enc_lens)
                return [self._result_from_ts(t, opts.timestamp_mode) for t in ts[:n]]
            if trie is not None:
                toks = ctc_greedy_decode_boosted(
                    log_probs, trie, opts.boost_score, self._ctc_blank(), enc_lens
                )
            else:
                toks = ctc_greedy_decode(log_probs, self._ctc_blank(), enc_lens)
            return [self._result_from_tokens(t) for t in toks[:n]]

        # Transducer path (TDT or RNNT)
        enc = self._encode(self.params, feats_j, lengths)
        if opts.beam_size > 0:  # beam x boost rejected above
            return self._transducer_beam_results(enc, enc_lens, opts, n)
        boost = trie.device_boost(self.config.joint.vocab_size, enc.shape[0], opts.boost_score) if trie else None
        res = transducer_greedy_decode(
            self.params,
            enc,
            pred_hidden=self.config.prediction.pred_hidden,
            num_lstm_layers=self.config.prediction.num_lstm_layers,
            durations=tuple(getattr(self.config, "durations", (0,))) if self.is_tdt else (0,),
            blank_id=self._blank_id,
            is_tdt=self.is_tdt,
            joint_prefix=self.joint_prefix,
            enc_lengths=enc_lens,
            boost=boost,
        )
        if opts.timestamps:
            return [self._result_from_ts(t, opts.timestamp_mode) for t in res.timestamped[:n]]
        return [self._result_from_tokens(t) for t in res.tokens[:n]]

    def _transducer_beam_results(self, enc, enc_lens, opts, n):
        """Device-side transducer beam search (decode/beam_transducer.py);
        beyond-reference capability (tdt.cpp is greedy-only). Timestamps use
        each token's emission frame, span closing at the next emission."""
        from parakeet_tpu.decode.beam_transducer import transducer_beam_decode

        use_lm = opts.lm is not None and opts.lm_weight != 0.0
        hyps = transducer_beam_decode(
            self.params,
            enc,
            num_lstm_layers=self.config.prediction.num_lstm_layers,
            durations=tuple(getattr(self.config, "durations", (0,))) if self.is_tdt else (0,),
            blank_id=self._blank_id,
            is_tdt=self.is_tdt,
            joint_prefix=self.joint_prefix,
            enc_lengths=enc_lens,
            beam_size=opts.beam_size,
            n_best=opts.beam_size if use_lm else 1,
        )
        if use_lm:
            from parakeet_tpu.text.ngram_lm import rescore_nbest

            hyps = [rescore_nbest(h, opts.lm, opts.lm_weight) for h in hyps]
        out = []
        for i in range(n):
            best = hyps[i][0]
            if not opts.timestamps:
                out.append(self._result_from_tokens(best.tokens))
                continue
            toks = []
            for j, (tok, fr, lp) in enumerate(
                zip(best.tokens, best.frames, best.token_logprobs)
            ):
                end = (best.frames[j + 1] - 1) if j + 1 < len(best.frames) else enc_lens[i] - 1
                toks.append(TimestampedToken(
                    token_id=tok, start_frame=fr, end_frame=max(fr, end),
                    confidence=float(np.exp(lp)),
                ))
            out.append(self._result_from_ts(toks, opts.timestamp_mode))
        return out

    def _ctc_beam_results(self, log_probs, enc_lens, opts, n):
        """CTC prefix beam search over fetched log-probs (host-side, like
        the reference's CTC collapse); timestamps use each token's
        first-emission frame, span closing at the next token's frame."""
        from parakeet_tpu.decode.ctc_beam import ctc_beam_search

        lp_np = np.asarray(log_probs, np.float32)
        blank = self._ctc_blank()
        out = []
        for i in range(n):
            t_i = enc_lens[i]
            hyp = ctc_beam_search(
                lp_np[i, :t_i], blank, beam_size=opts.beam_size,
                lm=opts.lm, lm_weight=opts.lm_weight,
            )[0]
            if not opts.timestamps:
                out.append(self._result_from_tokens(hyp.tokens))
                continue
            toks = []
            for j, (tok, fr) in enumerate(zip(hyp.tokens, hyp.frames)):
                end = (hyp.frames[j + 1] - 1) if j + 1 < len(hyp.frames) else t_i - 1
                toks.append(TimestampedToken(
                    token_id=tok, start_frame=fr, end_frame=max(fr, end),
                    confidence=float(np.exp(lp_np[i, fr, tok])),
                ))
            out.append(self._result_from_ts(toks, opts.timestamp_mode))
        return out

    def transcribe_long(
        self,
        source,
        decoder: Decoder = Decoder.TDT,
        *,
        window_s: float = 60.0,
        overlap_s: float = 10.0,
        boost_phrases: list[str] | None = None,
        boost_score: float = DEFAULT_BOOST_SCORE,
        timestamp_mode: TimestampMode = TimestampMode.WORDS,
        on_progress=None,
        progress_batch: int = 8,
    ) -> TranscribeResult:
        """Long-form transcription via overlapping windows + timestamp merge.

        The reference caps offline audio at ~4-5 minutes (dense attention;
        its README lists 'long-form chunking with overlap-merge' as an
        unchecked roadmap item). This implements it: windows of `window_s`
        with `overlap_s` overlap are decoded with timestamps; from each
        window we keep tokens whose START falls in its exclusive half of
        the overlap, so every instant is owned by exactly one window.

        on_progress: optional (stage, done, total) callback. When set, the
        windows run in sub-batches of `progress_batch` so ("window", done,
        total) fires as the file actually advances (an hour-long file is no
        longer one opaque device call); without it all windows run as ONE
        batched device call (fastest). Sub-batching is decode-equivalent —
        windows are independent and batching is token-identical.
        """
        if overlap_s < 0 or overlap_s >= window_s:
            # hop <= 0 would silently decode nothing (negative) or crash
            # in range() (zero)
            raise ValueError(
                f"overlap_s ({overlap_s}) must be >= 0 and < window_s ({window_s})"
            )
        samples = self._to_samples(source)
        sr = self._audio_cfg.sample_rate
        win = int(window_s * sr)
        hop = int((window_s - overlap_s) * sr)
        if len(samples) <= win:
            # DENSE, explicitly: self.transcribe() would re-enter the
            # transcribe_batch auto-windowing and silently override the
            # caller's window geometry with the facade defaults (a 50 s
            # clip under window_s=60 must decode densely, not re-window
            # at 10 s/2 s)
            opts1 = TranscribeOptions(
                decoder, True, list(boost_phrases or []), boost_score,
                timestamp_mode,
            )
            return self._transcribe_batch_dense([samples], opts1)[0]

        starts = self._long_window_starts(len(samples), win, hop)
        opts = TranscribeOptions(decoder, True, list(boost_phrases or []), boost_score)
        windows = [samples[s0 : s0 + win] for s0 in starts]
        if on_progress is None:
            # ONE batched device call for all windows (they pad to a uniform
            # length inside the dense path) instead of a dispatch per window
            results = self._transcribe_batch_dense(windows, opts)
        else:
            results = []
            step = max(1, int(progress_batch))
            for lo in range(0, len(windows), step):
                results.extend(
                    self._transcribe_batch_dense(windows[lo : lo + step], opts)
                )
                on_progress("window", min(lo + step, len(windows)), len(windows))
        return self._merge_long_results(
            len(samples), starts, results, win, window_s, overlap_s, timestamp_mode
        )

    def _long_window_starts(self, n_samples: int, win: int, hop: int) -> list[int]:
        """Window start offsets. A trailing sliver window is redundant ONLY
        when the previous window already reaches the end of the audio (its
        keep_hi is then unbounded); otherwise the sliver must run or its
        words would be owned by no window."""
        sr = self._audio_cfg.sample_rate
        starts = []
        for s0 in range(0, n_samples, hop):
            if (n_samples - s0 < sr // 4 and starts
                    and starts[-1] + win >= n_samples):
                break
            starts.append(s0)
            if s0 + win >= n_samples:
                break
        return starts

    def _merge_long_results(
        self,
        n_samples: int,
        starts: list[int],
        results: list[TranscribeResult],
        win: int,
        window_s: float,
        overlap_s: float,
        timestamp_mode: TimestampMode,
    ) -> TranscribeResult:
        """Overlap-merge of per-window decodes. Ownership is WORD-level: a
        window owns every word whose start falls in its exclusive half of
        the overlap, and contributes that word's tokens wholesale — a word
        straddling the seam can't be split across two windows' (possibly
        disagreeing) decodes. Without a tokenizer, every token is its own
        "word" (token-level ownership). Word boundary rule shared with
        group_timestamps (group_token_words)."""
        sr = self._audio_cfg.sample_rate
        pieces = self.tokenizer.pieces if self.tokenizer.loaded else None
        owned_words: list[list[TimestampedToken]] = []
        for wi, (s0, res) in enumerate(zip(starts, results)):
            offset_s = s0 / sr
            # exclusive ownership range for this window (in seconds, absolute)
            keep_lo = 0.0 if wi == 0 else offset_s + overlap_s / 2.0
            keep_hi = (
                float("inf")
                if s0 + win >= n_samples or wi == len(starts) - 1
                else offset_s + window_s - overlap_s / 2.0
            )
            frame_off = int(round(offset_s / FRAME_DURATION_S))
            shifted = [
                TimestampedToken(
                    t.token_id,
                    t.start_frame + frame_off,
                    t.end_frame + frame_off,
                    t.confidence,
                )
                for t in res.timestamped_tokens
            ]
            for word in group_token_words(shifted, pieces):
                abs_start_s = word[0].start_frame * FRAME_DURATION_S
                if keep_lo <= abs_start_s < keep_hi:
                    owned_words.append(word)
        owned_words.sort(key=lambda w: w[0].start_frame)
        merged = [t for w in owned_words for t in w]
        return self._result_from_ts(merged, timestamp_mode)

    def transcribe_long_batch(
        self,
        sources: list,
        decoder: Decoder = Decoder.TDT,
        *,
        window_s: float | None = None,
        overlap_s: float | None = None,
        boost_phrases: list[str] | None = None,
        boost_score: float = DEFAULT_BOOST_SCORE,
        timestamp_mode: TimestampMode = TimestampMode.WORDS,
        max_batch: int = 192,
        opts: TranscribeOptions | None = None,
    ) -> list[TranscribeResult]:
        """Long-form transcription of MANY clips with the windows batched
        ACROSS clips — the long-audio THROUGHPUT path (TPU addition; the
        reference caps offline audio at ~4-5 min and has no long-form
        story at all, README.md:527).

        Dense attention cost grows with T² and the measured encoder
        throughput collapses past the ~10 s batch knee (TUNING.md: 60 s
        dense = 46% of the 10 s operating point). This cuts every clip
        into `window_s` windows with `overlap_s` overlap (defaults: the
        facade's long_window_s/long_overlap_s — 10 s/2 s, the measured
        knee), decodes ALL clips' windows together in `max_batch`-sized
        device calls (the B=192 knee), and overlap-merges per clip
        (word-ownership rule of transcribe_long). Emits ("window", done,
        total) progress on opts.on_progress per sub-batch.

        `opts` (internal routing use): inherit decoder/boost/progress from
        an existing options object; timestamps are forced on (the merge
        needs them) and beam/LM are unsupported here (route those dense).
        """
        window_s = self.long_window_s if window_s is None else window_s
        overlap_s = self.long_overlap_s if overlap_s is None else overlap_s
        if overlap_s < 0 or overlap_s >= window_s:
            raise ValueError(
                f"overlap_s ({overlap_s}) must be >= 0 and < window_s ({window_s})"
            )
        base = opts or TranscribeOptions(
            decoder, True, list(boost_phrases or []), boost_score, timestamp_mode
        )
        if base.beam_size > 0 or base.lm is not None:
            raise ValueError(
                "windowed long-form decode is greedy-only; use beam/LM with "
                "a dense decode (long_audio='dense' or transcribe_batch)"
            )
        timestamp_mode = base.timestamp_mode
        wopts = replace(base, timestamps=True)
        sr = self._audio_cfg.sample_rate
        win = int(window_s * sr)
        hop = int((window_s - overlap_s) * sr)

        all_windows: list[np.ndarray] = []
        spans: list[tuple[int, list[int], int]] = []
        for s in sources:
            w = self._to_samples(s)
            if len(w) <= win:
                starts = [0]
                wins = [w]
            else:
                starts = self._long_window_starts(len(w), win, hop)
                wins = [w[s0 : s0 + win] for s0 in starts]
            spans.append((len(all_windows), starts, len(w)))
            all_windows.extend(wins)

        results: list[TranscribeResult] = []
        step = max(1, int(max_batch))
        for lo in range(0, len(all_windows), step):
            results.extend(
                self._transcribe_batch_dense(all_windows[lo : lo + step], wopts)
            )
            _emit_progress(
                base, "window", min(lo + step, len(all_windows)), len(all_windows)
            )

        out: list[TranscribeResult] = []
        for off, starts, n_samples in spans:
            rs = results[off : off + len(starts)]
            if len(starts) == 1:
                out.append(
                    self._result_from_ts(rs[0].timestamped_tokens, timestamp_mode)
                )
            else:
                out.append(
                    self._merge_long_results(
                        n_samples, starts, rs, win, window_s, overlap_s,
                        timestamp_mode,
                    )
                )
        return out

    def transcribe_vad(
        self,
        source,
        decoder: Decoder = Decoder.TDT,
        *,
        opts: TranscribeOptions | None = None,
        vad_config=None,
        boost_phrases: list[str] | None = None,
        boost_score: float = DEFAULT_BOOST_SCORE,
        timestamp_mode: TimestampMode = TimestampMode.WORDS,
    ) -> TranscribeResult:
        """Transcribe only VAD-detected speech regions (energy VAD,
        audio/vad.py — the reference's unchecked Tier-2 roadmap item "skip
        silent regions, reduce compute"). All speech segments run as ONE
        batched device call; timestamps are shifted back to absolute time
        in the original audio, so word spans match the untrimmed file.

        opts: full decode configuration (beam_size, lm, boosting, …) — the
        same object every other facade entry point takes; timestamps are
        forced on (required for the absolute-time shift). The legacy
        keyword args apply only when opts is None."""
        import dataclasses

        from parakeet_tpu.audio.vad import vad_segments

        if opts is None:
            opts = TranscribeOptions(
                decoder, True, list(boost_phrases or []), boost_score,
                timestamp_mode,
            )
        else:
            opts = dataclasses.replace(opts, timestamps=True)
            timestamp_mode = opts.timestamp_mode
        samples = self._to_samples(source)
        sr = self._audio_cfg.sample_rate
        segments = vad_segments(samples, sr, vad_config)
        if not segments:
            return TranscribeResult()
        chunks = [samples[lo:hi] for lo, hi in segments]
        results = self.transcribe_batch(chunks, opts)
        merged: list[TimestampedToken] = []
        for (lo, _), res in zip(segments, results):
            frame_off = int(round(lo / sr / FRAME_DURATION_S))
            merged.extend(
                TimestampedToken(
                    t.token_id, t.start_frame + frame_off,
                    t.end_frame + frame_off, t.confidence,
                )
                for t in res.timestamped_tokens
            )
        return self._result_from_ts(merged, timestamp_mode)

    # ── Result assembly ──────────────────────────────────────────────────

    def align(
        self,
        source,
        text: str,
        *,
        timestamp_mode: TimestampMode = TimestampMode.WORDS,
    ) -> TranscribeResult:
        """Forced alignment: word/token timings for a KNOWN transcript.

        Runs the frontend + encoder + CTC head, then Viterbi-aligns the
        tokenized `text` to the log-probs (decode/align.ctc_forced_align)
        — the max-probability CTC path constrained to emit exactly that
        transcript. Needs the CTC head (tdt-ctc models) and a loaded
        vocab. Raises ValueError when the clip is too short to emit the
        transcript. Beyond-reference capability (the reference only
        timestamps its own greedy decode, ctc.cpp:79-127)."""
        return self.align_batch([source], [text], timestamp_mode=timestamp_mode)[0]

    def align_batch(
        self,
        sources: list,
        texts: list[str],
        *,
        timestamp_mode: TimestampMode = TimestampMode.WORDS,
        pad_to_multiple: int | None = None,
    ) -> list[TranscribeResult]:
        """Forced-align several clips in ONE padded device call (same
        compile-reuse discipline as transcribe_batch; a per-clip loop
        would pay one 30-120 s remote TPU compile per distinct length)."""
        if not self.has_ctc:
            raise ValueError("forced alignment needs the CTC head (tdt-ctc models)")
        if not self.tokenizer.loaded:
            raise ValueError("forced alignment needs a vocab (tokenizer not loaded)")
        if len(sources) != len(texts):
            raise ValueError(f"{len(sources)} sources vs {len(texts)} texts")
        token_lists = [self.tokenizer.encode(t) for t in texts]
        for text, toks in zip(texts, token_lists):
            if not toks:
                raise ValueError(f"text tokenized to zero tokens: {text!r}")

        from parakeet_tpu.decode.align import ctc_forced_align

        feats = [
            np.asarray(preprocess_audio(self._to_samples(s), self._audio_cfg))[0]
            for s in sources
        ]
        mel_lens = [f.shape[0] for f in feats]
        t_max = max(mel_lens)
        if pad_to_multiple:
            t_max = -(-t_max // pad_to_multiple) * pad_to_multiple
        batch = np.zeros((len(feats), t_max, self._audio_cfg.n_mels), np.float32)
        for i, f in enumerate(feats):
            batch[i, : f.shape[0]] = f
        lengths = jnp.asarray(mel_lens, jnp.int32)
        _, log_probs = self._encode_ctc(self.params, jnp.asarray(batch), lengths)
        lp_np = np.asarray(log_probs, np.float32)
        enc_lens = np.asarray(encoded_lengths(np.asarray(mel_lens)))
        return [
            self._result_from_ts(
                ctc_forced_align(lp_np[i], token_lists[i], self._ctc_blank(),
                                 length=int(enc_lens[i])),
                timestamp_mode,
            )
            for i in range(len(sources))
        ]

    def align_long(
        self,
        source,
        text: str,
        *,
        window_s: float = 60.0,
        overlap_s: float = 10.0,
        timestamp_mode: TimestampMode = TimestampMode.WORDS,
    ) -> TranscribeResult:
        """Forced alignment for audio past the dense-attention limit
        (reference: ~4-5 min, README 'Offline models have ~4-5 minute
        audio length limits'): overlapping windows (transcribe_long's
        scheme) produce per-window CTC log-probs, each absolute frame is
        owned by exactly one window (exclusive half-overlap,
        decode/align.stitch_frame_ownership), and ONE Viterbi pass aligns
        the whole transcript over the stitched timeline. Window-boundary
        frames see less context than a (infeasible) full dense pass —
        the same tradeoff transcribe_long makes.

        The window hop is snapped to the encoder frame grid (0.08 s) so
        stitched rows carry exact absolute frame indices."""
        if not self.has_ctc:
            raise ValueError("forced alignment needs the CTC head (tdt-ctc models)")
        if not self.tokenizer.loaded:
            raise ValueError("forced alignment needs a vocab (tokenizer not loaded)")
        if overlap_s < 0 or overlap_s >= window_s:
            raise ValueError(
                f"overlap_s ({overlap_s}) must be >= 0 and < window_s ({window_s})")
        samples = self._to_samples(source)
        sr = self._audio_cfg.sample_rate
        win = int(window_s * sr)
        if len(samples) <= win:
            return self.align(samples, text, timestamp_mode=timestamp_mode)
        tokens = self.tokenizer.encode(text)
        if not tokens:
            raise ValueError("text tokenized to zero tokens")

        from parakeet_tpu.decode.align import ctc_forced_align, stitch_frame_ownership

        # snap the hop to the encoder frame grid so every window start is
        # an exact absolute frame index
        frame_samples = 8 * self._audio_cfg.hop_length
        hop_frames = max(1, round((window_s - overlap_s) * sr / frame_samples))
        hop = hop_frames * frame_samples
        starts = list(range(0, max(len(samples) - win, 0) + hop, hop))

        feats = [
            np.asarray(preprocess_audio(samples[s0:s0 + win], self._audio_cfg))[0]
            for s0 in starts
        ]
        mel_lens = [f.shape[0] for f in feats]
        batch = np.zeros((len(feats), max(mel_lens), self._audio_cfg.n_mels), np.float32)
        for i, f in enumerate(feats):
            batch[i, : f.shape[0]] = f
        _, log_probs = self._encode_ctc(
            self.params, jnp.asarray(batch), jnp.asarray(mel_lens, jnp.int32))
        lp_np = np.asarray(log_probs, np.float32)
        enc_lens = [int(l) for l in np.asarray(encoded_lengths(np.asarray(mel_lens)))]

        abs_starts = [s0 // frame_samples for s0 in starts]
        win_frames = win // frame_samples
        ranges = stitch_frame_ownership(abs_starts, enc_lens, win_frames - hop_frames)
        stitched = np.concatenate(
            [lp_np[i, lo:hi] for i, (lo, hi) in enumerate(ranges)], axis=0)
        abs_frames = np.concatenate(
            [np.arange(lo, hi) + abs_starts[i] for i, (lo, hi) in enumerate(ranges)])

        # host DP footprint guard: the (T, S) backpointer table is the cost
        n_states = 2 * len(tokens) + 1
        if stitched.shape[0] * n_states > 1_500_000_000:
            raise ValueError(
                f"alignment lattice too large ({stitched.shape[0]} frames × "
                f"{n_states} states); split the transcript and align sections")
        ts = ctc_forced_align(stitched, tokens, self._ctc_blank())
        remapped = [
            TimestampedToken(t.token_id, int(abs_frames[t.start_frame]),
                             int(abs_frames[t.end_frame]), t.confidence)
            for t in ts
        ]
        return self._result_from_ts(remapped, timestamp_mode)

    def _ctc_blank(self) -> int:
        return self._blank_id

    def _result_from_tokens(self, token_ids: list[int]) -> TranscribeResult:
        r = TranscribeResult(token_ids=token_ids)
        if self.tokenizer.loaded:
            r.text = self.tokenizer.decode(token_ids)
        return r

    def _result_from_ts(
        self, ts: list[TimestampedToken], mode: TimestampMode = TimestampMode.WORDS
    ) -> TranscribeResult:
        r = TranscribeResult(
            token_ids=[t.token_id for t in ts], timestamped_tokens=ts
        )
        if self.tokenizer.loaded:
            r.text = self.tokenizer.decode(r.token_ids)
            r.word_timestamps = group_timestamps(ts, self.tokenizer.pieces, mode)
        return r


class Transcriber(_TranscriberBase):
    """Offline TDT-CTC transcriber (transcribe.hpp:55-190); default 110m."""

    has_ctc = True
    joint_prefix = "tdt_joint_"

    def __init__(self, weights_path=None, vocab_path=None, config: TDTCTCConfig | None = None, **kw):
        super().__init__(weights_path, vocab_path, config or make_110m_config(), **kw)

    def _spec(self):
        return P.tdt_ctc_spec(self.config)


class TDTTranscriber(_TranscriberBase):
    """TDT-only transcriber for the 600m models (transcribe.hpp:200-299)."""

    has_ctc = False
    joint_prefix = "joint_"

    def __init__(self, weights_path=None, vocab_path=None, config: TDTConfig | None = None, **kw):
        from parakeet_tpu.config import make_tdt_600m_config

        super().__init__(weights_path, vocab_path, config or make_tdt_600m_config(), **kw)

    def _spec(self):
        return P.tdt_spec(self.config)


class RNNTTranscriber(_TranscriberBase):
    """RNNT transcriber for parakeet-rnnt-0.6b (main.cpp:296-375 mode)."""

    has_ctc = False
    joint_prefix = "joint_"
    is_tdt = False

    def __init__(self, weights_path=None, vocab_path=None, config: RNNTConfig | None = None, **kw):
        from parakeet_tpu.config import make_rnnt_600m_config

        super().__init__(weights_path, vocab_path, config or make_rnnt_600m_config(), **kw)

    def _spec(self):
        return P.rnnt_spec(self.config)


__all__ = [
    "Decoder",
    "TranscribeOptions",
    "TranscribeResult",
    "Transcriber",
    "TDTTranscriber",
    "RNNTTranscriber",
]
