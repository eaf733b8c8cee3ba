"""Dynamic-batching service tests: correctness (batching must be
caller-invisible), coalescing, error fan-out, close semantics."""

import threading
import time

import numpy as np
import pytest

from parakeet_tpu import config as C
from parakeet_tpu.serve import TranscriptionService
from parakeet_tpu.transcribe import Transcriber


@pytest.fixture(scope="module")
def tr():
    cfg = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=16, hidden_size=32,
                                num_layers=2, num_heads=4, ffn_intermediate=64),
        prediction=C.PredictionConfig(vocab_size=21, pred_hidden=16, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=32, pred_hidden=16, joint_hidden=16,
                            vocab_size=21),
        ctc_vocab_size=21,
    )
    return Transcriber(None, None, cfg, seed=42)


def _clips(n, seed=0):
    rng = np.random.RandomState(seed)
    return [(0.1 * rng.randn(8000 + 1600 * i)).astype(np.float32) for i in range(n)]


def test_results_match_direct_transcription(tr):
    clips = _clips(5)
    direct = tr.transcribe_batch(clips, pad_to_multiple=200)
    with TranscriptionService(tr, max_batch=8, max_wait_ms=50) as svc:
        futs = [svc.submit(c) for c in clips]
        got = [f.result(timeout=120) for f in futs]
    for d, g in zip(direct, got):
        assert d.token_ids == g.token_ids


def test_concurrent_submitters_coalesce(tr):
    clips = _clips(8, seed=1)
    svc = TranscriptionService(tr, max_batch=8, max_wait_ms=200)
    results = [None] * len(clips)

    def worker(i):
        results[i] = svc.submit(clips[i]).result(timeout=120)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(clips))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    svc.close()
    assert all(r is not None for r in results)
    assert svc.stats.requests == 8
    # near-simultaneous submits must share batches
    assert svc.stats.batches < 8, svc.stats
    assert svc.stats.mean_batch > 1.0


def test_max_batch_respected(tr):
    clips = _clips(5, seed=2)
    svc = TranscriptionService(tr, max_batch=2, max_wait_ms=200)
    futs = [svc.submit(c) for c in clips]
    for f in futs:
        f.result(timeout=120)
    svc.close()
    assert max(svc.stats.batch_sizes) <= 2
    assert sum(svc.stats.batch_sizes) == 5


def test_error_fans_out(tr):
    svc = TranscriptionService(tr, max_batch=4, max_wait_ms=100)
    bad = "/nonexistent/file.wav"
    f1 = svc.submit(bad)
    with pytest.raises(Exception):
        f1.result(timeout=60)
    # the service survives an erroring batch
    good = svc.submit(_clips(1, seed=3)[0]).result(timeout=120)
    assert isinstance(good.token_ids, list)
    svc.close()
    assert svc.stats.errors >= 1


def test_close_rejects_new_work(tr):
    svc = TranscriptionService(tr)
    svc.close()
    with pytest.raises(RuntimeError, match="closed"):
        svc.submit(_clips(1)[0])
    svc.close()  # idempotent


def test_pipelined_matches_unpipelined(tr):
    """pipeline=True (prepare/decode overlap across cohorts) must produce
    identical results, FIFO order, and identical error fan-out vs the
    single-thread worker."""
    from parakeet_tpu.serve import TranscriptionService

    rng = np.random.RandomState(9)
    clips = [rng.randn(6000 + 800 * i).astype(np.float32) * 0.1 for i in range(6)]

    with TranscriptionService(tr, max_batch=3, max_wait_ms=5, pipeline=False) as svc:
        ref = [svc.submit(c).result(timeout=300) for c in clips]
    with TranscriptionService(tr, max_batch=3, max_wait_ms=5, pipeline=True) as svc:
        assert svc._pipeline
        futs = [svc.submit(c) for c in clips]
        got = [f.result(timeout=300) for f in futs]
    assert [r.token_ids for r in got] == [r.token_ids for r in ref]

    # a bad source fails its own future, later cohorts keep working
    with TranscriptionService(tr, max_batch=2, max_wait_ms=5, pipeline=True) as svc:
        bad = svc.submit("/nonexistent/clip.wav")
        with pytest.raises(Exception):
            bad.result(timeout=300)
        good = svc.submit(clips[0])
        assert good.result(timeout=300).token_ids == ref[0].token_ids
