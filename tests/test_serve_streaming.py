"""StreamingService: concurrent multiplexed live streams over one batched
device program (serve.py). Verifies bit-identity with a direct
StreamingBatchTranscriber run, slot reuse after close, no head-of-line
blocking (late-opening/slow sessions), and stall-timeout eviction."""

import time

import numpy as np
import pytest

from parakeet_tpu import config as C
from parakeet_tpu.serve import StreamingService
from parakeet_tpu.streaming import StreamingBatchTranscriber

MEL_STEP = 16
HOP = 160
FLUSH = (MEL_STEP + 8) * HOP  # silence StreamingService pushes at close


def tiny_cfg():
    return C.EOUConfig(
        encoder=C.StreamingEncoderConfig(
            mel_bins=80, subsampling_channels=8, hidden_size=16, num_layers=1,
            num_heads=2, ffn_intermediate=32, conv_kernel_size=9,
            att_context_left=4, att_context_right=0, chunk_size=2,
        ),
        prediction=C.PredictionConfig(vocab_size=13, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=13),
        ctc_vocab_size=13,
    )


def reference_tokens(cfg, audio, seed=31, chunk=3200):
    """Single-stream ground truth including the close-flush silence.

    Pushes audio with the SAME chunk cadence the session under test feeds:
    the streaming mel frontend's grid-restart-at-`consumed` semantics
    (inherited from the reference, audio.cpp:232-235) makes output depend
    on push boundaries, so only cadence-matched runs are bit-comparable."""
    bt = StreamingBatchTranscriber(1, None, None, cfg, seed=seed,
                                   mel_frames_per_step=MEL_STEP)
    for i in range(0, len(audio), chunk):
        bt.push(0, audio[i : i + chunk])
    bt.push(0, np.zeros(FLUSH, np.float32))
    while bt.ready():
        bt.step()
    return list(bt._tokens[0])


@pytest.fixture(scope="module")
def cfg():
    return tiny_cfg()


def wait_until(pred, timeout=30.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.01)
    return False


def test_streaming_service_matches_direct_run(cfg):
    rng = np.random.RandomState(3)
    audio_a = (rng.randn(12800) * 0.1).astype(np.float32)
    audio_b = (rng.randn(9600) * 0.1).astype(np.float32)
    ref_a = reference_tokens(cfg, audio_a)
    ref_b = reference_tokens(cfg, audio_b)

    bt = StreamingBatchTranscriber(2, None, None, cfg, seed=31,
                                   mel_frames_per_step=MEL_STEP)
    partials = []
    with StreamingService(bt, poll_ms=1.0) as svc:
        s_a = svc.open(on_partial=lambda s, d: partials.append((s.slot, d)))
        # session B opens LATE and feeds slowly — must not block A
        for i in range(0, 12800, 3200):
            s_a.feed(audio_a[i : i + 3200])
        s_b = svc.open()
        for i in range(0, 9600, 3200):
            s_b.feed(audio_b[i : i + 3200])
            time.sleep(0.05)
        final_a = s_a.close()
        final_b = s_b.close()
        assert s_a.closed and s_b.closed
        assert svc.free_slots == 2  # both slots reclaimed

        assert s_a.tokens() == ref_a, "session A must match a direct single-stream run"
        assert s_b.tokens() == ref_b, "late/slow session B must match too"
        # random weights → tokenizer not loaded → empty text, but the
        # surface must be consistent
        assert final_a == "" and final_b == ""

        # slot reuse after close: a third session on a freed slot works
        audio_c = (rng.randn(6400) * 0.1).astype(np.float32)
        ref_c = reference_tokens(cfg, audio_c, chunk=len(audio_c))  # fed in one call
        s_c = svc.open()
        s_c.feed(audio_c)
        s_c.close()
        assert s_c.tokens() == ref_c
    assert svc.stats.requests == 3


def test_streaming_service_slot_exhaustion(cfg):
    bt = StreamingBatchTranscriber(1, None, None, cfg, seed=5,
                                   mel_frames_per_step=MEL_STEP)
    with StreamingService(bt) as svc:
        s = svc.open()
        with pytest.raises(RuntimeError, match="slots busy"):
            svc.open()
        s.close()
        svc.open()  # freed slot is reusable


def test_streaming_service_stall_eviction(cfg):
    rng = np.random.RandomState(9)
    audio = (rng.randn(6400) * 0.1).astype(np.float32)
    ref = reference_tokens(cfg, audio, chunk=len(audio))  # fed in one call

    bt = StreamingBatchTranscriber(1, None, None, cfg, seed=31,
                                   mel_frames_per_step=MEL_STEP)
    with StreamingService(bt, poll_ms=1.0, stall_timeout_s=0.3) as svc:
        s = svc.open()
        s.feed(audio)
        # wait for the worker to drain the feed, then go silent
        assert wait_until(lambda: s.closed, timeout=30.0), "stalled session not evicted"
        assert s.tokens() == ref  # eviction flushes buffered audio first
        assert svc.free_slots == 1
        with pytest.raises(RuntimeError, match="closed"):
            s.feed(audio)


def test_streaming_service_close_flushes_all(cfg):
    rng = np.random.RandomState(11)
    audio = (rng.randn(6400) * 0.1).astype(np.float32)
    ref = reference_tokens(cfg, audio, chunk=len(audio))  # fed in one call
    bt = StreamingBatchTranscriber(2, None, None, cfg, seed=31,
                                   mel_frames_per_step=MEL_STEP)
    svc = StreamingService(bt, poll_ms=1.0)
    s = svc.open()
    s.feed(audio)
    svc.close()  # service-level close must flush the live session
    assert s.closed
    assert s.tokens() == ref


def test_streaming_service_fused_int16_production_config(cfg):
    """The production serving configuration (frontend='fused',
    wire_dtype='int16' — what serve_http hardcodes) through the FULL
    service lifecycle: open/feed int16/close-flush, hold handling, and
    equivalence with a direct fused run of the same audio."""
    rng = np.random.RandomState(23)
    pcm = (rng.randn(12800) * 3000).astype(np.int16)

    def make_bt(batch):
        return StreamingBatchTranscriber(batch, None, None, cfg, seed=31,
                                         mel_frames_per_step=MEL_STEP,
                                         frontend="fused", wire_dtype="int16")

    # direct reference incl. the service's close-flush silence (fused mode
    # is push-cadence independent, so one blob is fine)
    ref = make_bt(1)
    ref.push(0, pcm)
    ref.push(0, np.zeros(FLUSH, np.float32))
    while ref.ready():
        ref.step()
    ref_tokens = list(ref._tokens[0])

    with StreamingService(make_bt(2), poll_ms=1.0) as svc:
        s = svc.open()
        for i in range(0, len(pcm), 3200):
            s.feed(pcm[i : i + 3200])
        final = s.close()
        assert s.tokens() == ref_tokens
        assert final == ""  # random weights: tokenizer not loaded
        assert svc.free_slots == 2


def test_streaming_batch_dp_sharded_matches_single_device(cfg):
    """mesh= shards the serving cohort over the 'data' axis (VERDICT r4 #8:
    the one subsystem without multi-device evidence). Tokens from a dp8
    fused-frontend run must be bit-identical to the unsharded run on the
    same audio, including a held slot and a deactivated slot."""
    import jax

    from parakeet_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(41)
    batch = 8
    clips = [(rng.randn(12800) * 0.1).astype(np.float32) for _ in range(batch)]

    def run(mesh):
        bt = StreamingBatchTranscriber(batch, None, None, cfg, seed=31,
                                       mel_frames_per_step=MEL_STEP,
                                       frontend="fused", mesh=mesh)
        bt.deactivate_slot(5)
        for i, clip in enumerate(clips):
            bt.push(i, clip)
        steps = 0
        while bt.ready_any():
            # hold slot 2 on the first step (state restore must shard too);
            # afterwards hold whatever lags (slot 2 runs one chunk behind)
            hold = {2} if steps == 0 else set(bt.lagging_slots())
            toks = bt.step(hold=hold)
            assert len(toks) == batch
            steps += 1
        assert steps > 1
        return [list(t) for t in bt._tokens]

    mesh = make_mesh(8)
    assert dict(mesh.shape)["data"] == 8
    ref = run(None)
    with mesh:
        got = run(mesh)
    assert got == ref
    assert got[5] == []  # deactivated slot stayed silent
    assert any(got[i] for i in range(batch) if i != 5)
