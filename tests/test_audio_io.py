"""Audio IO tests (strategy from reference test_all.cpp:483-672)."""

import numpy as np
import pytest

from parakeet_tpu.audio.io import (
    AudioFormat,
    detect_format_by_extension,
    detect_format_by_magic,
    downmix_to_mono,
    get_audio_duration,
    read_audio,
    resample,
    write_wav,
)


def _sine(seconds=0.5, freq=440.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_detect_by_extension():
    assert detect_format_by_extension("a.wav") == AudioFormat.WAV
    assert detect_format_by_extension("a.WAV") == AudioFormat.WAV
    assert detect_format_by_extension("a.flac") == AudioFormat.FLAC
    assert detect_format_by_extension("a.mp3") == AudioFormat.MP3
    assert detect_format_by_extension("a.ogg") == AudioFormat.OGG
    assert detect_format_by_extension("a.txt") == AudioFormat.UNKNOWN


def test_detect_by_magic():
    assert detect_format_by_magic(b"RIFF\x00\x00\x00\x00WAVEfmt ") == AudioFormat.WAV
    assert detect_format_by_magic(b"fLaC....") == AudioFormat.FLAC
    assert detect_format_by_magic(b"OggS....") == AudioFormat.OGG
    assert detect_format_by_magic(b"ID3.....") == AudioFormat.MP3
    assert detect_format_by_magic(b"\xff\xfb\x90\x00") == AudioFormat.MP3
    assert detect_format_by_magic(b"nonsense") == AudioFormat.UNKNOWN


def test_wav_roundtrip(tmp_path):
    x = _sine(0.25)
    p = tmp_path / "t.wav"
    write_wav(p, x, 16000)
    audio = read_audio(p)
    assert audio.sample_rate == 16000
    assert audio.num_channels == 1
    assert audio.format == "wav"
    assert abs(audio.duration - 0.25) < 1e-3
    assert len(audio.samples) == len(x)
    np.testing.assert_allclose(audio.samples, x, atol=2e-4)  # 16-bit quantization


def test_wav_resampled_on_load(tmp_path):
    x = _sine(0.5, sr=8000)
    p = tmp_path / "8k.wav"
    write_wav(p, x, 8000)
    audio = read_audio(p, target_sample_rate=16000)
    assert audio.original_sample_rate == 8000
    assert audio.sample_rate == 16000
    assert abs(len(audio.samples) - 16000 * 0.5) <= 2


def test_raw_pcm_overloads():
    f = _sine(0.1)
    a = read_audio(f, sample_rate=16000)
    np.testing.assert_array_equal(a.samples, f)
    # int16 path scales by 1/32768 (test_all.cpp:638-672)
    i16 = (f * 32768).astype(np.int16)
    b = read_audio(i16, sample_rate=16000)
    np.testing.assert_allclose(b.samples, i16.astype(np.float32) / 32768.0, atol=1e-7)


def test_downmix_mean():
    inter = np.array([1.0, 3.0, 2.0, 4.0], np.float32)  # 2 channels
    np.testing.assert_allclose(downmix_to_mono(inter, 2), [2.0, 3.0])


# ─── Resampler properties (test_all.cpp:553-615) ─────────────────────────────


def test_resample_identity():
    x = _sine(0.2)
    np.testing.assert_array_equal(resample(x, 16000, 16000), x)


def test_resample_duration():
    x = _sine(1.0, sr=16000)
    up = resample(x, 16000, 48000)
    down = resample(x, 16000, 8000)
    assert abs(len(up) - 48000) <= 2
    assert abs(len(down) - 8000) <= 2


def test_resample_sine_integrity():
    """A 440 Hz sine resampled 16k→8k must stay a 440 Hz sine (no aliasing,
    amplitude preserved within window ripple)."""
    sr_in, sr_out, freq = 16000, 8000, 440.0
    x = _sine(1.0, freq, sr_in)
    y = resample(x, sr_in, sr_out)
    # Check dominant DFT bin
    spec = np.abs(np.fft.rfft(y[200:-200] * np.hanning(len(y) - 400)))
    peak_hz = np.argmax(spec) * sr_out / (len(y) - 400)
    assert abs(peak_hz - freq) < 5.0
    # Amplitude preserved
    assert abs(np.percentile(np.abs(y[200:-200]), 99) - 0.5) < 0.02


def test_resample_vs_scipy():
    """Cross-check against scipy.signal.resample_poly (different algorithm;
    agreement within a small tolerance away from edges)."""
    from scipy.signal import resample_poly

    x = _sine(0.5, 300.0, 16000)
    ours = resample(x, 16000, 8000)
    ref = resample_poly(x, 1, 2).astype(np.float32)
    n = min(len(ours), len(ref))
    np.testing.assert_allclose(ours[100 : n - 100], ref[100 : n - 100], atol=0.01)


def test_duration_query(tmp_path):
    p = tmp_path / "d.wav"
    write_wav(p, _sine(0.73), 16000)
    assert abs(get_audio_duration(p) - 0.73) < 1e-3


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        read_audio("/nonexistent/file.wav")


def test_unknown_format():
    with pytest.raises(ValueError):
        read_audio(b"garbage data not audio")


def test_wave_format_extensible_pcm32(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE: the real format tag comes from the SubFormat
    GUID, not a bit-depth guess — 32-bit int PCM must not parse as float."""
    import struct

    sr, n = 16000, 100
    pcm = (np.linspace(-0.5, 0.5, n) * 2147483647).astype("<i4")
    # fmt chunk: extensible (0xFFFE), 40 bytes, SubFormat GUID = PCM (1)
    sub_format = struct.pack("<H", 1) + b"\x00\x00" + bytes.fromhex("000010008000" + "00aa00389b71")
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 4, 4, 32)
    fmt += struct.pack("<HHI", 22, 32, 1) + sub_format
    data_chunk = pcm.tobytes()
    riff = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(data_chunk)) + data_chunk
    blob = b"RIFF" + struct.pack("<I", 4 + len(riff)) + riff
    p = tmp_path / "ext.wav"
    p.write_bytes(blob)

    audio = read_audio(p)
    np.testing.assert_allclose(audio.samples, pcm.astype(np.float64) / 2147483648.0, atol=1e-6)


def test_wav_24bit(tmp_path):
    import struct

    sr, n = 16000, 64
    vals = (np.linspace(-0.9, 0.9, n) * 8388607).astype(np.int32)
    b24 = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 3, 3, 24)
    riff = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(b24)) + b24
    p = tmp_path / "p24.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(riff)) + riff)
    audio = read_audio(p)
    np.testing.assert_allclose(audio.samples, vals / 8388608.0, atol=1e-6)


def test_wav_parser_fuzz_no_crash():
    """Random bytes behind a RIFF/WAVE magic must raise, never crash."""
    import numpy as _np

    rng = _np.random.RandomState(1)
    for _ in range(50):
        blob = b"RIFF" + rng.bytes(4) + b"WAVE" + rng.bytes(int(rng.randint(0, 300)))
        try:
            read_audio(blob)
        except (ValueError, RuntimeError):
            pass


def test_raw_pcm_2d_stereo_downmixes():
    """(frames, channels) raw arrays downmix like the byte overloads
    (review finding: 2D input was silently mislabeled mono and left 2D)."""
    left = np.linspace(-0.5, 0.5, 1600, dtype=np.float32)
    right = -left
    stereo = np.stack([left, right], axis=1)  # (N, 2)
    a = read_audio(stereo, sample_rate=16000)
    assert a.num_channels == 2
    assert a.samples.ndim == 1 and a.num_samples == 1600
    np.testing.assert_allclose(a.samples, (left + right) / 2, atol=1e-7)
    with pytest.raises(ValueError, match="1D or"):
        read_audio(np.zeros((4, 2, 2), np.float32), sample_rate=16000)


def test_g711_table_known_values():
    """Decode tables pinned to ITU-T G.711 ground truth (the values any
    conformant implementation — incl. dr_wav, reference README.md:503 —
    produces for these codes)."""
    from parakeet_tpu.audio.io import _ALAW_TABLE, _MULAW_TABLE

    assert _MULAW_TABLE[0x00] == -32124
    assert _MULAW_TABLE[0x80] == 32124
    assert _MULAW_TABLE[0xFF] == 0
    assert _MULAW_TABLE[0x7F] == 0
    assert _ALAW_TABLE[0x55] == -8
    assert _ALAW_TABLE[0xD5] == 8
    assert _ALAW_TABLE[0x2A] == -32256
    assert _ALAW_TABLE[0xAA] == 32256
    # both codecs are symmetric: flipping the sign bit negates the sample
    codes = np.arange(128)
    np.testing.assert_array_equal(
        _MULAW_TABLE[codes], -_MULAW_TABLE[codes | 0x80].astype(np.int32)
    )
    np.testing.assert_array_equal(
        _ALAW_TABLE[codes], -_ALAW_TABLE[codes | 0x80].astype(np.int32)
    )


def _g711_wav(codes: np.ndarray, fmt_tag: int, sr: int = 16000) -> bytes:
    import struct

    fmt = struct.pack("<HHIIHH", fmt_tag, 1, sr, sr, 1, 8)
    riff = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(codes)) + codes.astype(np.uint8).tobytes()
    return b"RIFF" + struct.pack("<I", 4 + len(riff)) + riff


@pytest.mark.parametrize("fmt_tag", [6, 7])
def test_g711_wav_roundtrip(tmp_path, fmt_tag):
    """Encode a sine by nearest-code search over the decode table, decode
    through read_audio, and require the logarithmic quantization error
    bound (G.711 SNR ≈ 38 dB: relative error < ~6% + small floor)."""
    from parakeet_tpu.audio.io import _ALAW_TABLE, _MULAW_TABLE

    table = _ALAW_TABLE if fmt_tag == 6 else _MULAW_TABLE
    x = (_sine(0.05, freq=440.0) * 30000).astype(np.int32)  # 800 samples
    codes = np.abs(table[None, :].astype(np.int32) - x[:, None]).argmin(axis=1)
    p = tmp_path / f"g711_{fmt_tag}.wav"
    p.write_bytes(_g711_wav(codes, fmt_tag))

    audio = read_audio(p)
    assert audio.format == "wav"
    assert audio.num_samples == len(x)
    err = np.abs(audio.samples * 32768.0 - x)
    assert np.all(err <= 0.062 * np.abs(x) + 34.0)
