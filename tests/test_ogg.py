"""OGG Vorbis decode tests (libvorbisfile binding) against a libvorbisenc
round-trip fixture."""

import numpy as np
import pytest

from parakeet_tpu.audio.codecs import ogg_available, ogg_decode
from parakeet_tpu.audio.io import read_audio
from tests.helpers.ogg_writer import encode_ogg, ogg_encoder_available

pytestmark = pytest.mark.skipif(
    not (ogg_available() and ogg_encoder_available()),
    reason="system vorbis libs not present",
)


def _sine(seconds=1.0, freq=440.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_ogg_roundtrip_tone():
    x = _sine()
    data = encode_ogg(x, 16000)
    assert data[:4] == b"OggS"
    out, sr, ch = ogg_decode(data)
    assert sr == 16000 and ch == 1
    assert abs(len(out) - len(x)) < 2000  # lossy; duration approximately kept
    mid = out[1000:-1000]
    spec = np.abs(np.fft.rfft(mid * np.hanning(len(mid))))
    peak = np.argmax(spec) * sr / len(mid)
    assert abs(peak - 440.0) < 5.0
    assert 0.3 < np.percentile(np.abs(mid), 99) < 0.7


def test_read_audio_ogg_path(tmp_path):
    p = tmp_path / "clip.ogg"
    p.write_bytes(encode_ogg(_sine(0.5), 16000))
    audio = read_audio(p)
    assert audio.format == "ogg"
    assert audio.sample_rate == 16000
    assert abs(audio.duration - 0.5) < 0.2


def test_ogg_garbage_raises():
    with pytest.raises(ValueError):
        ogg_decode(b"OggS" + b"\x00" * 64)


def test_ogg_decode_in_memory_no_tempfile(monkeypatch, tmp_path):
    """The fmemopen path must not touch the filesystem (serving paths stay
    file-free); force-failing tempfile proves ov_open handled the buffer."""
    import tempfile as _tf

    from parakeet_tpu.audio import codecs as CC
    from tests.helpers.ogg_writer import encode_ogg, ogg_encoder_available

    if not (CC.ogg_available() and ogg_encoder_available()):
        pytest.skip("vorbis libs unavailable")

    x = (0.25 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)).astype(np.float32)
    blob = encode_ogg(x, 16000)

    def no_tempfile(*a, **k):
        raise AssertionError("ogg_decode used the temp-file fallback")

    monkeypatch.setattr(_tf, "NamedTemporaryFile", no_tempfile)
    samples, rate, ch = CC.ogg_decode(blob)
    assert rate == 16000 and ch == 1
    assert abs(float(np.max(samples)) - 0.25) < 0.05
