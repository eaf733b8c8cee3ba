"""HTTP frontend (parakeet_tpu/serve_http.py): /transcribe over the
dynamic batcher, /stream chunked-PCM live ingestion, /stats, error codes.
Runs a real ThreadingHTTPServer on an ephemeral port with tiny models."""

import http.client
import io
import json
import threading
import wave

import numpy as np
import pytest

from parakeet_tpu import config as C
from parakeet_tpu.serve import StreamingService, TranscriptionService
from parakeet_tpu.serve_http import make_server
from parakeet_tpu.streaming import StreamingBatchTranscriber
from parakeet_tpu.transcribe import Transcriber


def tiny_offline_cfg():
    return C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=16, hidden_size=32,
                                num_layers=2, num_heads=4, ffn_intermediate=64),
        prediction=C.PredictionConfig(vocab_size=21, pred_hidden=16, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=32, pred_hidden=16, joint_hidden=16,
                            vocab_size=21),
        ctc_vocab_size=21,
    )


def tiny_streaming_cfg():
    return C.EOUConfig(
        encoder=C.StreamingEncoderConfig(
            mel_bins=80, subsampling_channels=8, hidden_size=16, num_layers=1,
            num_heads=2, ffn_intermediate=32, conv_kernel_size=9,
            att_context_left=4, att_context_right=0, chunk_size=2),
        prediction=C.PredictionConfig(vocab_size=13, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=13),
        ctc_vocab_size=13,
    )


@pytest.fixture(scope="module")
def server():
    tr = Transcriber(None, None, tiny_offline_cfg(), seed=42)
    service = TranscriptionService(tr, max_batch=4, max_wait_ms=10.0)
    bt = StreamingBatchTranscriber(2, None, None, tiny_streaming_cfg(), seed=7,
                                   mel_frames_per_step=16)
    stream_service = StreamingService(bt, poll_ms=1.0)
    httpd = make_server(service, stream_service, host="127.0.0.1", port=0, quiet=True)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address
    httpd.shutdown()
    service.close()
    stream_service.close()


def _wav_bytes(samples: np.ndarray) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((samples * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def test_transcribe_endpoint(server):
    host, port = server
    rng = np.random.RandomState(0)
    body = _wav_bytes((0.1 * rng.randn(8000)).astype(np.float32))
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("POST", "/transcribe", body=body)
    resp = conn.getresponse()
    assert resp.status == 200
    payload = json.loads(resp.read())
    assert set(payload) == {"text", "token_ids"}
    assert isinstance(payload["token_ids"], list)


def test_transcribe_bad_audio_is_400(server):
    host, port = server
    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("POST", "/transcribe", body=b"not audio at all")
    assert conn.getresponse().status == 400


def test_stream_endpoint_chunked(server):
    host, port = server
    rng = np.random.RandomState(1)
    pcm = (0.1 * rng.randn(12800) * 32767).astype(np.int16).tobytes()

    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.putrequest("POST", "/stream")
    conn.putheader("Transfer-Encoding", "chunked")
    conn.endheaders()
    step = 6400  # 3200 samples per chunk
    for i in range(0, len(pcm), step):
        chunk = pcm[i : i + step]
        conn.send(b"%x\r\n" % len(chunk) + chunk + b"\r\n")
    conn.send(b"0\r\n\r\n")
    resp = conn.getresponse()
    assert resp.status == 200
    payload = json.loads(resp.read())
    assert set(payload) == {"text", "token_ids", "tokens"}
    assert payload["token_ids"]  # random weights emit plenty of tokens
    assert len(payload["tokens"]) == len(payload["token_ids"])
    frames = [(t["start_frame"], t["end_frame"]) for t in payload["tokens"]]
    assert frames == sorted(frames), "timestamps must be stream-absolute and monotone"


def test_stream_endpoint_content_length(server):
    host, port = server
    rng = np.random.RandomState(2)
    pcm = (0.1 * rng.randn(6400) * 32767).astype(np.int16).tobytes()
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("POST", "/stream", body=pcm)
    resp = conn.getresponse()
    assert resp.status == 200
    assert json.loads(resp.read())["token_ids"]


def test_stats_endpoint(server):
    host, port = server
    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("GET", "/stats")
    resp = conn.getresponse()
    assert resp.status == 200
    payload = json.loads(resp.read())
    assert payload["requests"] >= 1
    assert "stream_sessions" in payload and "stream_free_slots" in payload


def test_unknown_paths_404(server):
    host, port = server
    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("GET", "/nope")
    assert conn.getresponse().status == 404
    conn = http.client.HTTPConnection(host, port, timeout=60)
    conn.request("POST", "/nope")
    assert conn.getresponse().status == 404


def test_stream_disabled_404():
    tr = Transcriber(None, None, tiny_offline_cfg(), seed=42)
    service = TranscriptionService(tr, max_batch=2, max_wait_ms=5.0)
    httpd = make_server(service, None, host="127.0.0.1", port=0, quiet=True)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address
        conn = http.client.HTTPConnection(host, port, timeout=60)
        conn.request("POST", "/stream", body=b"\x00\x00")
        assert conn.getresponse().status == 404
    finally:
        httpd.shutdown()
        service.close()


def test_transcribe_endpoint_chunked(server):
    """/transcribe must honor chunked transfer-encoding like /stream."""
    host, port = server
    rng = np.random.RandomState(3)
    body = _wav_bytes((0.1 * rng.randn(8000)).astype(np.float32))
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.putrequest("POST", "/transcribe")
    conn.putheader("Transfer-Encoding", "chunked")
    conn.endheaders()
    for i in range(0, len(body), 4096):
        chunk = body[i : i + 4096]
        conn.send(b"%x\r\n" % len(chunk) + chunk + b"\r\n")
    conn.send(b"0\r\n\r\n")
    resp = conn.getresponse()
    assert resp.status == 200
    assert isinstance(json.loads(resp.read())["token_ids"], list)


@pytest.fixture(scope="module")
def align_server(tmp_path_factory):
    vocab = tmp_path_factory.mktemp("align") / "vocab.txt"
    vocab.write_text("\n".join(["<unk>", "▁a", "▁b", "a", "b"]) + "\n")
    cfg = tiny_offline_cfg()
    cfg = C.TDTCTCConfig(
        encoder=cfg.encoder,
        prediction=C.PredictionConfig(vocab_size=6, pred_hidden=16, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=32, pred_hidden=16, joint_hidden=16,
                            vocab_size=6),
        ctc_vocab_size=6,
    )
    tr = Transcriber(None, str(vocab), cfg, seed=42)
    service = TranscriptionService(tr, max_batch=4, max_wait_ms=10.0)
    httpd = make_server(service, None, host="127.0.0.1", port=0, quiet=True)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address
    httpd.shutdown()
    service.close()


def test_align_endpoint(align_server):
    host, port = align_server
    t = np.arange(24000) / 16000.0
    wav = _wav_bytes(0.4 * np.sin(2 * np.pi * 330 * t).astype(np.float32))

    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("POST", "/align?text=a%20b%20ab", body=wav)
    resp = conn.getresponse()
    assert resp.status == 200
    payload = json.loads(resp.read())
    assert len(payload["words"]) == 3
    starts = [w["start"] for w in payload["words"]]
    assert starts == sorted(starts)

    # missing transcript → 400
    conn.request("POST", "/align", body=wav)
    assert conn.getresponse().status == 400

    # transcript the clip can't emit → 400, not a hang/crash
    conn.request("POST", "/align?text=" + "a%20b%20" * 300, body=wav)
    assert conn.getresponse().status == 400
    conn.close()


def test_align_endpoint_needs_vocab(server):
    host, port = server
    wav = _wav_bytes(np.zeros(8000, np.float32))
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("POST", "/align?text=hello", body=wav)
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()
