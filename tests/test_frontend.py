"""Mel frontend tests: torch.stft cross-framework parity + streaming
equivalence (strategy from reference compare_features.py + test_all.cpp:368-428,
727-753)."""

import numpy as np
import pytest

from parakeet_tpu.audio.frontend import (
    LOG_GUARD,
    StreamingAudioPreprocessor,
    mel_filterbank,
    preprocess_audio,
)
from parakeet_tpu.config import AudioConfig


def _sine(seconds=1.0, freq=440.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_output_shape():
    x = _sine(1.0)
    feats = preprocess_audio(x)
    assert feats.shape == (1, 16000 // 160 + 1, 80)


def test_determinism():
    x = _sine(0.5)
    a = np.asarray(preprocess_audio(x))
    b = np.asarray(preprocess_audio(x))
    np.testing.assert_array_equal(a, b)


def test_normalization_stats():
    # Per-feature normalize → per-bin mean ~0, unbiased std ~1 for active bins.
    x = np.random.RandomState(0).randn(16000).astype(np.float32) * 0.1
    feats = np.asarray(preprocess_audio(x))[0]  # (T, 80)
    np.testing.assert_allclose(feats.mean(axis=0), 0.0, atol=1e-4)
    stds = feats.std(axis=0, ddof=1)
    np.testing.assert_allclose(stds, 1.0, atol=1e-2)


def test_unnormalized_mode():
    x = _sine(0.25)
    cfg = AudioConfig(normalize=False)
    feats = np.asarray(preprocess_audio(x, cfg))[0]
    # log(power+guard) of a loud sine must have large dynamic range and a
    # floor no lower than log(LOG_GUARD).
    assert feats.min() >= np.log(LOG_GUARD) - 1e-3
    assert feats.max() > feats.min() + 5


def test_mel_filterbank_vs_librosa_formula():
    """Independent oracle: reconstruct the Slaney filterbank the librosa way
    (mel_frequencies + triangle/area-normalize) and compare."""
    n_freqs, n_mels, sr = 257, 80, 16000.0
    fb = mel_filterbank(n_freqs, n_mels, sr, 0.0, sr / 2)

    # librosa-style construction
    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3.0)
        log_region = f >= 1000.0
        mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-12) / 1000.0) / (np.log(6.4) / 27.0), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3.0)
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2), n_mels + 2)
    hz = mel_to_hz(mels)
    freqs = np.linspace(0, sr / 2, n_freqs)
    weights = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lower = (freqs - hz[m]) / (hz[m + 1] - hz[m])
        upper = (hz[m + 2] - freqs) / (hz[m + 2] - hz[m + 1])
        weights[:, m] = np.maximum(0, np.minimum(lower, upper)) * (2.0 / (hz[m + 2] - hz[m]))
    np.testing.assert_allclose(fb, weights, atol=2e-6)


def test_stft_power_vs_torch():
    """Cross-framework parity: our center=True STFT power vs torch.stft with
    NeMo's exact parameters."""
    torch = pytest.importorskip("torch")
    from parakeet_tpu.audio.frontend import _preemphasis, _stft_power
    import jax.numpy as jnp

    rng = np.random.RandomState(42)
    x = rng.randn(8000).astype(np.float32) * 0.3
    cfg = AudioConfig()
    n_frames = len(x) // cfg.hop_length + 1

    ours = np.asarray(_stft_power(jnp.asarray(x), cfg, center=True, n_frames=n_frames))

    xt = torch.from_numpy(x)
    win = torch.hann_window(cfg.win_length, periodic=False)
    ref = torch.stft(
        xt, n_fft=cfg.n_fft, hop_length=cfg.hop_length, win_length=cfg.win_length,
        window=win, center=True, pad_mode="reflect", return_complex=True,
    )  # (freq, T)
    ref_power = (ref.real**2 + ref.imag**2).numpy().T  # (T, freq)

    assert ours.shape == ref_power.shape
    np.testing.assert_allclose(ours, ref_power, rtol=1e-3, atol=1e-4)


def test_full_pipeline_vs_torch_oracle():
    """End-to-end: preemph→stft→mel→log→normalize vs a torch/numpy oracle."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(7)
    x = rng.randn(16000).astype(np.float32) * 0.2
    cfg = AudioConfig()

    ours = np.asarray(preprocess_audio(x, cfg))[0]  # (T, 80)

    # Oracle in torch/numpy
    pre = x.copy()
    pre[1:] = x[1:] - 0.97 * x[:-1]
    xt = torch.from_numpy(pre)
    win = torch.hann_window(cfg.win_length, periodic=False)
    spec = torch.stft(xt, 512, 160, 400, window=win, center=True,
                      pad_mode="reflect", return_complex=True)
    power = (spec.real**2 + spec.imag**2).numpy()  # (257, T)
    fb = mel_filterbank(257, 80, 16000.0, 0.0, 8000.0)
    mel = fb.T @ power  # (80, T)
    log_mel = np.log(mel + LOG_GUARD)
    mean = log_mel.mean(axis=1, keepdims=True)
    centered = log_mel - mean
    var = (centered**2).sum(axis=1, keepdims=True) / (log_mel.shape[1] - 1)
    oracle = (centered / (np.sqrt(var) + 1e-5)).T  # (T, 80)

    assert ours.shape == oracle.shape
    # f32 accumulation order differs between XLA and numpy matmuls; log of
    # near-guard bins amplifies that. Observed max |diff| ≈ 6e-3.
    np.testing.assert_allclose(ours, oracle, atol=2e-2)


# ─── Streaming ───────────────────────────────────────────────────────────────


def test_streaming_not_enough_samples():
    p = StreamingAudioPreprocessor()
    assert p.process_chunk(np.zeros(100, np.float32)) is None
    assert p.process_chunk(np.zeros(200, np.float32)) is None
    # 100+200+200 = 500 >= 400 → produces frames
    out = p.process_chunk(np.zeros(200, np.float32))
    assert out is not None and out.shape[2] == 80


def test_streaming_reset():
    p = StreamingAudioPreprocessor()
    p.process_chunk(np.ones(1000, np.float32))
    p.reset()
    assert p.process_chunk(np.zeros(399, np.float32)) is None


def test_streaming_frame_accounting():
    """Per-chunk frame counts must follow the reference overlap-buffer
    arithmetic exactly (audio.cpp:210-235): n = (total-win)//hop + 1,
    consumed = (n-1)*hop + win, remainder carried. Note the reference grid
    intentionally restarts at `consumed`, so chunked frame totals are fewer
    than offline (straddling windows are dropped)."""
    cfg = AudioConfig()
    x = _sine(1.0, 220.0)
    p = StreamingAudioPreprocessor(cfg)
    counts = []
    for start in range(0, len(x), 2560):
        out = p.process_chunk(x[start : start + 2560])
        counts.append(0 if out is None else np.asarray(out).shape[1])

    # Reference-simulated accounting
    expected = []
    buffered = 0
    for start in range(0, len(x), 2560):
        buffered += min(2560, len(x) - start)
        if buffered < cfg.win_length:
            expected.append(0)
            continue
        n = (buffered - cfg.win_length) // cfg.hop_length + 1
        consumed = (n - 1) * cfg.hop_length + cfg.win_length
        buffered -= consumed
        expected.append(n)
    assert counts == expected  # 2560-sample chunks → [14, 15, 14, 15, 14, 15, 2]


def test_streaming_single_chunk_matches_offline_unnormalized():
    """Feeding the whole signal as ONE chunk == one-shot center=False
    processing of the preemphasized signal (consumed prefix)."""
    import jax.numpy as jnp
    from parakeet_tpu.audio.frontend import _preemphasis, _process_chunk_jit

    cfg = AudioConfig()
    rng = np.random.RandomState(3)
    x = rng.randn(8000).astype(np.float32) * 0.1

    p = StreamingAudioPreprocessor(cfg)
    streamed = np.asarray(p.process_chunk(x))[0]

    pre = np.asarray(_preemphasis(jnp.asarray(x)))
    n_frames = (len(x) - cfg.win_length) // cfg.hop_length + 1
    consumed = (n_frames - 1) * cfg.hop_length + cfg.win_length
    offline = np.asarray(_process_chunk_jit(jnp.asarray(pre[:consumed]), cfg, n_frames))

    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-4, atol=1e-5)


def test_streaming_preemphasis_continuity():
    """Preemphasis state must carry across chunk boundaries: splitting the
    input must not change the preemphasized buffer the STFT sees. Verified
    indirectly: two chunkings that consume identical sample spans produce
    identical frames for the shared prefix."""
    cfg = AudioConfig()
    rng = np.random.RandomState(5)
    x = rng.randn(4000).astype(np.float32)

    # Chunking A: one shot. Chunking B: split at a hop multiple so the
    # consumed grid coincides for the first chunk's frames.
    pa = StreamingAudioPreprocessor(cfg)
    one = np.asarray(pa.process_chunk(x))[0]

    pb = StreamingAudioPreprocessor(cfg)
    first = np.asarray(pb.process_chunk(x[:2480]))[0]  # consumed = 2480 exactly
    assert first.shape[0] == 14
    np.testing.assert_allclose(first, one[:14], rtol=1e-4, atol=1e-6)


def test_batched_frontend_matches_per_clip():
    """preprocess_audio_batch must equal per-clip preprocess_audio exactly
    for every valid frame (normalization incl.)."""
    from parakeet_tpu.audio.frontend import preprocess_audio_batch

    rng = np.random.RandomState(9)
    waves = [rng.randn(n).astype(np.float32) * 0.2 for n in (16000, 9600, 12345)]
    batched, n_frames = preprocess_audio_batch(waves)
    for i, w in enumerate(waves):
        solo = np.asarray(preprocess_audio(w))[0]
        assert solo.shape[0] == n_frames[i]
        np.testing.assert_allclose(
            np.asarray(batched)[i, : n_frames[i]], solo, rtol=1e-4, atol=1e-5,
            err_msg=f"clip {i}",
        )


def test_batched_frontend_unnormalized():
    from parakeet_tpu.audio.frontend import preprocess_audio_batch

    cfg = AudioConfig(normalize=False)
    rng = np.random.RandomState(10)
    waves = [rng.randn(8000).astype(np.float32), rng.randn(6400).astype(np.float32)]
    batched, n_frames = preprocess_audio_batch(waves, cfg)
    for i, w in enumerate(waves):
        solo = np.asarray(preprocess_audio(w, cfg))[0]
        np.testing.assert_allclose(
            np.asarray(batched)[i, : n_frames[i]], solo, rtol=1e-4, atol=1e-5)


class TestGemmStft:
    """Hop-block GEMM STFT (frontend._stft_power_gemm): exact-math
    equivalence with the strided-conv lowering (same windowed DFT, only
    the summation grouping differs) across offsets, raggedness, and both
    frontend entry points. The gemm mode exists because XLA's strided-conv
    lowering measured ~4x its GEMM FLOP floor on TPU (TUNING.md r4)."""

    def _restore(self):
        from parakeet_tpu.audio.frontend import set_stft_mode

        set_stft_mode("gemm")  # the library default (TUNING.md r4)

    @pytest.mark.parametrize("n", [16000, 16001, 8081, 4000])
    def test_matches_conv_power(self, n):
        import jax.numpy as jnp

        from parakeet_tpu.audio import frontend as F

        cfg = AudioConfig()
        rng = np.random.RandomState(n)
        nf = n // cfg.hop_length + 1
        need = (nf - 1) * cfg.hop_length + cfg.n_fft
        x = (0.3 * rng.randn(2, need)).astype(np.float32)
        win = F._hann_symmetric(cfg.win_length)
        lpad = (cfg.n_fft - cfg.win_length) // 2
        wfull = jnp.pad(
            jnp.asarray(win), (lpad, cfg.n_fft - cfg.win_length - lpad)
        )
        a = np.asarray(F._stft_power_conv(jnp.asarray(x), cfg, wfull))[:, :nf]
        b = np.asarray(F._stft_power_gemm(jnp.asarray(x), cfg, win, lpad, nf))
        assert b.shape == (2, nf, cfg.n_fft // 2 + 1)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)

    def test_mode_toggle_single_clip(self):
        from parakeet_tpu.audio.frontend import set_stft_mode

        x = np.random.RandomState(3).randn(12345).astype(np.float32) * 0.2
        g = np.asarray(preprocess_audio(x))  # default mode = gemm
        try:
            set_stft_mode("conv")
            c = np.asarray(preprocess_audio(x))
        finally:
            self._restore()
        np.testing.assert_allclose(g, c, rtol=1e-3, atol=2e-4)

    def test_mode_toggle_batch_ragged(self):
        from parakeet_tpu.audio.frontend import preprocess_audio_batch, set_stft_mode

        rng = np.random.RandomState(11)
        waves = [
            (0.2 * rng.randn(n)).astype(np.float32) for n in (16000, 9000, 24001)
        ]
        g, nf_g = preprocess_audio_batch(waves)  # default mode = gemm
        try:
            set_stft_mode("conv")
            c, nf_c = preprocess_audio_batch(waves)
        finally:
            self._restore()
        assert nf_g == nf_c
        np.testing.assert_allclose(np.asarray(g), np.asarray(c), rtol=1e-3, atol=2e-4)

    def test_rejects_unknown_mode(self):
        from parakeet_tpu.audio.frontend import set_stft_mode

        with pytest.raises(ValueError):
            set_stft_mode("fft")


class TestGemm1Stft:
    """Merged single-GEMM STFT lowering ("gemm1", VERDICT r4 #5): the nblk
    hop-block GEMMs concatenated into one deep-K GEMM. Same windowed-DFT
    math as "gemm" — only the f32 accumulation grouping differs."""

    def test_gemm1_matches_gemm(self):
        import jax.numpy as jnp

        from parakeet_tpu.audio import frontend as F

        cfg = AudioConfig()
        rng = np.random.RandomState(77)
        nf = 16000 // cfg.hop_length + 1
        need = (nf - 1) * cfg.hop_length + cfg.n_fft
        x = (0.3 * rng.randn(2, need)).astype(np.float32)
        win = F._hann_symmetric(cfg.win_length)
        lpad = (cfg.n_fft - cfg.win_length) // 2
        a = np.asarray(F._stft_power_gemm(jnp.asarray(x), cfg, win, lpad, nf))
        try:
            F.set_stft_mode("gemm1")
            b = np.asarray(F._stft_power_gemm(jnp.asarray(x), cfg, win, lpad, nf))
        finally:
            F.set_stft_mode("gemm")
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_gemm1_full_frontend_toggle(self):
        from parakeet_tpu.audio.frontend import set_stft_mode

        x = np.random.RandomState(5).randn(12345).astype(np.float32) * 0.2
        g = np.asarray(preprocess_audio(x))
        try:
            set_stft_mode("gemm1")
            m = np.asarray(preprocess_audio(x))
        finally:
            set_stft_mode("gemm")
        np.testing.assert_allclose(g, m, rtol=1e-3, atol=2e-4)

    def test_bad_mode_rejected(self):
        from parakeet_tpu.audio.frontend import set_stft_mode

        with pytest.raises(ValueError, match="stft mode"):
            set_stft_mode("fft")
