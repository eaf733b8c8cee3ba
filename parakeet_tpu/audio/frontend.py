"""NeMo-compatible mel-spectrogram frontend, in JAX.

Numerics mirror the reference pipeline (src/audio.cpp:100-158):
  preemphasis(0.97) → STFT(n_fft 512, hop 160, win 400, symmetric Hann,
  center=True, reflect pad) → |X|² → Slaney mel filterbank (area-normalized,
  f64 construction) → log(x + 2⁻²⁴) → per-feature normalization (per-mel-bin
  mean / unbiased N−1 std over time, eps 1e-5) → (1, T, n_mels).

The streaming variant (src/audio.cpp:171-259) carries preemphasis state and
a sample overlap buffer across chunks, uses center=False framing by
win_length, and does NOT normalize (full-sequence stats unavailable).

`AudioConfig.dither` is declared but never applied — parity with the
reference, whose output is deterministic (test_all.cpp:739-753).

Design: the mel filterbank and window are host-built f64 constants; the
per-utterance transform is a single jitted function (one fused XLA program:
pad→windowed-DFT-GEMM→matmul→log→normalize; see _stft_power_gemm for the
hop-block GEMM lowering of the windowed DFT — the default — and
_stft_power_conv for the strided-conv alternative and why the FFT is not
used at all). Batched use goes through preprocess_audio_batch.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from parakeet_tpu.config import AudioConfig

# NeMo's log guard: 2^-24 (audio.cpp:134-135).
LOG_GUARD = 5.96046448e-8

# Slaney mel scale constants (audio.cpp:18-21): linear below 1 kHz, log above.
_MEL_BREAK_FREQ = 1000.0
_MEL_BREAK_MEL = 15.0  # 1000 / (200/3)
_MEL_LINEAR_SCALE = 200.0 / 3.0
_MEL_LOG_STEP = math.log(6.4) / 27.0


def _hz_to_mel_slaney(freq: float) -> float:
    if freq < _MEL_BREAK_FREQ:
        return freq / _MEL_LINEAR_SCALE
    return _MEL_BREAK_MEL + math.log(freq / _MEL_BREAK_FREQ) / _MEL_LOG_STEP


def _mel_to_hz_slaney(mel: float) -> float:
    if mel < _MEL_BREAK_MEL:
        return mel * _MEL_LINEAR_SCALE
    return _MEL_BREAK_FREQ * math.exp((mel - _MEL_BREAK_MEL) * _MEL_LOG_STEP)


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    n_freqs: int, n_mels: int, sample_rate: float, f_min: float, f_max: float
) -> np.ndarray:
    """Slaney-scale, Slaney-normalized mel filterbank, (n_freqs, n_mels) f32.

    Constructed in float64 exactly as audio.cpp:40-94 (librosa/NeMo
    compatible): n_mels+2 evenly spaced mel points, triangular filters,
    area normalization 2/(right-left).
    """
    mel_min = _hz_to_mel_slaney(f_min)
    mel_max = _hz_to_mel_slaney(f_max)
    mel_pts = mel_min + np.arange(n_mels + 2, dtype=np.float64) * (
        (mel_max - mel_min) / (n_mels + 1)
    )
    hz_pts = np.array([_mel_to_hz_slaney(m) for m in mel_pts], dtype=np.float64)
    fft_freqs = np.arange(n_freqs, dtype=np.float64) * (sample_rate / (2.0 * (n_freqs - 1)))

    fb = np.zeros((n_freqs, n_mels), dtype=np.float64)
    for m in range(n_mels):
        left, center, right = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        enorm = 2.0 / (right - left)
        f = fft_freqs
        up = (f - left) / (center - left) if center > left else np.zeros_like(f)
        down = (right - f) / (right - center) if right > center else np.zeros_like(f)
        tri = np.where((f >= left) & (f <= center), up, 0.0) + np.where(
            (f > center) & (f <= right), down, 0.0
        )
        fb[:, m] = tri * enorm
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _hann_symmetric(win_length: int) -> np.ndarray:
    """Symmetric (periodic=False) Hann window, f64→f32 (matches torch)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * math.pi * n / (win_length - 1)))).astype(np.float32)


def _fb_for(cfg: AudioConfig) -> np.ndarray:
    f_max = cfg.f_max if cfg.f_max > 0 else cfg.sample_rate / 2.0
    return mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, float(cfg.sample_rate), cfg.f_min, f_max)


@functools.lru_cache(maxsize=8)
def _dft_power_mats(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin matrices (n_fft, n_fft//2+1), f64 construction, f32
    storage. power[k] = (x·cos_k)² + (x·sin_k)² ≡ |rfft(x)[k]|² exactly (the
    imaginary sign cancels in the square)."""
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    n = np.arange(n_fft, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _stft_power_conv(
    padded: jnp.ndarray,  # (B, L) preemphasized + padded waveforms
    cfg: AudioConfig,
    window: jnp.ndarray,  # (K,) analysis window, K = kernel length
) -> jnp.ndarray:
    """Windowed power spectrum as ONE strided convolution (B, T, F).

    The FFT is the wrong tool on TPU: XLA's rfft lowering measured 8.6 ms
    of a 62 ms e2e pipeline at B=128 (r3 trace), plus ~3 ms of framing
    gathers. frame→window→DFT is algebraically one conv with stride =
    hop and 2·(n_fft/2+1) windowed cos/sin filters — an MXU op (~67 GFLOP
    at B=128×10 s → ~1 ms). Numerics: f64-constructed filters, f32 HIGHEST
    accumulation; |diff| vs rfft ~1e-5 relative on power."""
    k = window.shape[0]
    cos_m, sin_m = _dft_power_mats(cfg.n_fft)
    wmat = jnp.asarray(np.concatenate([cos_m[:k], sin_m[:k]], axis=1))
    wmat = wmat * window[:, None]  # (K, 2F)
    spec = jax.lax.conv_general_dilated(
        padded[:, :, None],
        wmat[:, None, :],  # "HIO": (K, 1, 2F)
        window_strides=(cfg.hop_length,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, T, 2F)
    f = cfg.n_fft // 2 + 1
    re, im = spec[..., :f], spec[..., f:]
    return re * re + im * im


_STFT_MODE = "gemm"


def set_stft_mode(mode: str) -> None:
    """Select the offline STFT lowering: "gemm" (nblk hop-block GEMMs —
    see _stft_power_gemm), "gemm1" (the hop blocks concatenated into ONE
    deep-K GEMM: K = nblk·hop ≈ 480 → 4 full 128-deep MXU K-tiles instead
    of 3 shallow K=160 passes, and one output write instead of three
    partial-sum round trips; costs one materialized (B, T, nblk·hop)
    input copy), or "conv" (one strided windowed-DFT convolution). Math
    is identical to f32 rounding; "gemm" measured ~2.5× faster than conv
    at B=192 (TUNING.md r4); gemm-vs-gemm1 is the VERDICT r4 #5
    measurement. Clears the offline jit caches so the toggle takes effect
    mid-process (tests, benchmarks)."""
    global _STFT_MODE
    if mode not in ("conv", "gemm", "gemm1"):
        raise ValueError(f"stft mode must be 'conv', 'gemm' or 'gemm1', got {mode!r}")
    _STFT_MODE = mode
    for fn in (_preprocess_jit, _preprocess_batch_jit):
        fn.clear_cache()


def _stft_power_gemm(
    padded: jnp.ndarray,  # (B, L) preemphasized + padded waveforms
    cfg: AudioConfig,
    window: np.ndarray,  # (K,) analysis window (numpy, f32)
    lpad: int,  # window's offset within the n_fft analysis frame
    n_frames: int,
) -> jnp.ndarray:
    """Windowed power spectrum as ceil(K/hop) hop-block GEMMs (B, T, F).

    Same math as _stft_power_conv with the window at offset lpad of the
    n_fft frame — minus the conv lowering. Frame t's nonzero taps are
    padded[t·hop+lpad : t·hop+lpad+K]; every frame starts on a hop
    boundary of the padded buffer, so reshaping to hop blocks turns the
    windowed DFT into sum_j blocks[:, t+j] @ W_j with W_j the j-th hop
    slice of the (zero-row-extended, lpad-shifted) window·DFT matrix —
    nblk plain MXU GEMMs over contiguous slices, no im2col, no
    strided-conv lowering, and the n_fft−K zero taps cost nothing beyond
    hop round-up."""
    k = int(window.shape[0])
    hop, f = cfg.hop_length, cfg.n_fft // 2 + 1
    cos_m, sin_m = _dft_power_mats(cfg.n_fft)
    # sin columns k=0 and k=n_fft/2 are sin(0·n)=0 and sin(π·n)≈0 (≤1e-13
    # f64 residue, squared ≤1e-21 in power — below f32 ulp of any mel sum):
    # drop them when n_fft is even, so the GEMM's N dim is exactly n_fft
    # (512 → full 128-lane tiles) instead of 2F=n_fft+2 (→ 25% lane-pad
    # waste at n_fft=512). Bin 0's im is bit-exactly zero; bin F-1's is the
    # only (immeasurable) deviation vs _stft_power_conv.
    trim = cfg.n_fft % 2 == 0
    sin_cols = sin_m[:, 1 : f - 1] if trim else sin_m
    nim = sin_cols.shape[1]
    wmat = np.concatenate(
        [cos_m[lpad : lpad + k], sin_cols[lpad : lpad + k]], axis=1
    ) * window[:, None].astype(np.float32)  # (K, F + nim)
    # Fold lpad into the weight rows (zeros above) instead of slicing the
    # waveform: frame t's taps are padded[t·hop : t·hop + lpad + K] against
    # rows [0, lpad+K) of the padded weights — bit-identical (f32 x+0·w
    # adds nothing) and keeps the GEMM input a reshape of the contiguous
    # padded buffer, not of a lane-shifted slice (which XLA materializes
    # as a relayout copy, ~0.5 ms at B=192).
    nblk = -(-(lpad + k) // hop)
    wfull = np.zeros((nblk * hop, f + nim), np.float32)
    wfull[lpad : lpad + k] = wmat
    wj = jnp.asarray(wfull.reshape(nblk, hop, f + nim))
    y = padded
    need = (n_frames - 1 + nblk) * hop
    y = jnp.pad(y, ((0, 0), (0, max(0, need - y.shape[1]))))[:, :need]
    blocks = y.reshape(y.shape[0], n_frames - 1 + nblk, hop)
    if _STFT_MODE == "gemm1":
        # ONE deep-K GEMM: frame t's taps y[t·hop+r] for r ∈ [0, nblk·hop)
        # are blocks[:, t+j, r−j·hop], i.e. the nblk hop views concatenated
        # along the tap axis, against wfull's rows in the same order. Same
        # FLOPs, 4 full K-tiles instead of 3×(160→256-padded) shallow
        # passes, one output write instead of nblk partial-sum round trips;
        # pays one (B, T, nblk·hop) materialized input copy. f32
        # accumulation order differs from the summed 3-GEMM form (~1e-7).
        stack = jnp.concatenate(
            [blocks[:, j : j + n_frames] for j in range(nblk)], axis=2
        )  # (B, T, nblk·hop)
        spec = jax.lax.dot_general(
            stack,
            jnp.asarray(wfull),
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (B, T, F + nim)
    else:
        spec = None
        for j in range(nblk):
            term = jax.lax.dot_general(
                blocks[:, j : j + n_frames],
                wj[j],
                dimension_numbers=(((2,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )  # (B, T, F + nim)
            spec = term if spec is None else spec + term
    re, im = spec[..., :f], spec[..., f:]
    p = re * re
    if trim:
        return jnp.concatenate(
            [p[..., :1], p[..., 1 : f - 1] + im * im, p[..., f - 1 :]],
            axis=-1,
        )
    return p + im * im


def _stft_power(
    x: jnp.ndarray, cfg: AudioConfig, *, center: bool, n_frames: int
) -> jnp.ndarray:
    """Power spectrum (n_frames, n_fft//2+1).

    center=True: torch-compatible — reflect-pad n_fft//2, window zero-padded
    centered to n_fft, frames of n_fft at hop stride (NeMo's torch.stft).
    center=False (streaming): frames of win_length at hop stride, windowed
    then zero-padded to n_fft — matches the reference streaming buffer
    arithmetic (audio.cpp:222-235); pad placement only shifts phase, power
    is unaffected.
    """
    win_np = _hann_symmetric(cfg.win_length)
    window = jnp.asarray(win_np)
    if center:
        pad = cfg.n_fft // 2
        x = jnp.pad(x, (pad, pad), mode="reflect")
        lpad = (cfg.n_fft - cfg.win_length) // 2
        kernel_w = jnp.pad(window, (lpad, cfg.n_fft - cfg.win_length - lpad))
    else:
        # zero-padding the windowed frame to n_fft ≡ truncating the DFT
        # matrix rows to win_length — the conv kernel is just the window
        lpad = 0
        kernel_w = window
    if _STFT_MODE in ("gemm", "gemm1"):
        return _stft_power_gemm(x[None].astype(jnp.float32), cfg, win_np, lpad, n_frames)[0]
    # defensive tail pad: the old gather clamped out-of-range indices;
    # VALID conv instead needs (n_frames-1)*hop + K samples present
    need = (n_frames - 1) * cfg.hop_length + kernel_w.shape[0]
    x = jnp.pad(x.astype(jnp.float32), (0, max(0, need - x.shape[0])))[:need]
    return _stft_power_conv(x[None], cfg, kernel_w)[0]


def _preemphasis(x: jnp.ndarray, coeff: float = 0.97, prev: jnp.ndarray | float = 0.0):
    shifted = jnp.concatenate([jnp.full((1,), prev, x.dtype), x[:-1]])
    return x - coeff * shifted


@functools.partial(jax.jit, static_argnums=(1, 2))
def _preprocess_jit(x: jnp.ndarray, cfg: AudioConfig, n_frames: int) -> jnp.ndarray:
    x = _preemphasis(x)
    power = _stft_power(x, cfg, center=True, n_frames=n_frames)  # (T, F)
    fb = jnp.asarray(_fb_for(cfg))  # (F, M)
    mel = jnp.matmul(power, fb, precision=jax.lax.Precision.HIGHEST)  # (T, M)
    log_mel = jnp.log(mel + LOG_GUARD)
    if cfg.normalize:
        # Per-feature (per mel bin) over time; unbiased N-1 variance;
        # divide by (std + 1e-5) — audio.cpp:139-149.
        mean = jnp.mean(log_mel, axis=0, keepdims=True)
        centered = log_mel - mean
        var = jnp.sum(centered * centered, axis=0, keepdims=True) / (n_frames - 1)
        log_mel = centered / (jnp.sqrt(var) + 1e-5)
    return log_mel


def preprocess_audio(samples, config: AudioConfig = AudioConfig()) -> jnp.ndarray:
    """Waveform (num_samples,) float32 → features (1, n_frames, n_mels).

    n_frames = num_samples // hop + 1 (torch.stft center=True convention).
    """
    x = jnp.asarray(samples, dtype=jnp.float32)
    if x.ndim != 1:
        raise ValueError(f"expected 1D waveform, got shape {x.shape}")
    n = x.shape[0]
    if n < 1:
        raise ValueError("empty waveform")
    n_frames = n // config.hop_length + 1
    return _preprocess_jit(x, config, n_frames)[None, :, :]


@functools.partial(jax.jit, static_argnums=(2, 3))
def _preprocess_batch_jit(
    padded: jnp.ndarray,  # (B, L): preemphasized + reflect-padded + zero-padded
    n_frames: jnp.ndarray,  # (B,) valid frame counts
    cfg: AudioConfig,
    t_max: int,
) -> jnp.ndarray:
    win_np = _hann_symmetric(cfg.win_length)
    lpad = (cfg.n_fft - cfg.win_length) // 2
    # frame→window→rFFT as strided windowed-DFT conv or hop-block GEMMs
    # (XLA's TPU rfft + framing gathers cost ~11 ms of the B=128 e2e
    # pipeline; the conv is one MXU op; gemm avoids the conv lowering)
    if _STFT_MODE in ("gemm", "gemm1"):
        power = _stft_power_gemm(padded, cfg, win_np, lpad, t_max)
    else:
        win_full = jnp.pad(
            jnp.asarray(win_np), (lpad, cfg.n_fft - cfg.win_length - lpad)
        )
        power = _stft_power_conv(padded, cfg, win_full)  # (B, T, F)
    fb = jnp.asarray(_fb_for(cfg))
    log_mel = jnp.log(jnp.matmul(power, fb, precision=jax.lax.Precision.HIGHEST) + LOG_GUARD)
    if cfg.normalize:
        # masked per-feature normalization over each item's valid frames
        valid = (jnp.arange(t_max)[None, :] < n_frames[:, None]).astype(jnp.float32)
        n = n_frames.astype(jnp.float32)[:, None, None]
        vmask = valid[:, :, None]
        mean = jnp.sum(log_mel * vmask, axis=1, keepdims=True) / n
        centered = (log_mel - mean) * vmask
        var = jnp.sum(centered * centered, axis=1, keepdims=True) / (n - 1)
        log_mel = centered / (jnp.sqrt(var) + 1e-5)
    return log_mel


def preprocess_audio_batch(waves, config: AudioConfig = AudioConfig()):
    """Batched frontend: list of waveforms → ((B, T_max, n_mels), frame counts).

    ONE device call for the whole batch (the per-clip path costs a device
    round-trip per clip — ~25 ms each on remote TPU relays). Exact
    per-clip equality with preprocess_audio: preemphasis and reflect
    padding happen per clip on host, so every valid frame sees identical
    samples; normalization is masked to each clip's valid frames. Pad
    frames come out as exactly 0 (post-normalization) / log-guard values.
    """
    cfg = config
    pres = []
    n_frames_list = []
    for w in waves:
        x = np.asarray(w, np.float32).reshape(-1)
        pre = x.copy()
        pre[1:] -= 0.97 * x[:-1]
        pre = np.pad(pre, (cfg.n_fft // 2, cfg.n_fft // 2), mode="reflect")
        pres.append(pre)
        n_frames_list.append(len(x) // cfg.hop_length + 1)
    t_max = max(n_frames_list)
    need = (t_max - 1) * cfg.hop_length + cfg.n_fft
    padded = np.zeros((len(pres), need), np.float32)
    for i, pre in enumerate(pres):
        padded[i, : len(pre)] = pre[:need]
    feats = _preprocess_batch_jit(
        jnp.asarray(padded), jnp.asarray(n_frames_list, jnp.int32), cfg, t_max
    )
    return feats, n_frames_list


def preprocess_audio_fused(samples, config: AudioConfig = AudioConfig()) -> jnp.ndarray:
    """preprocess_audio via the fused Pallas mel kernel
    (ops/pallas_frontend.py). Same numerics to ~1e-4 in log space; one
    VMEM-resident kernel instead of separate frame/FFT/matmul HLOs."""
    from parakeet_tpu.ops.pallas_frontend import fused_log_mel

    x = jnp.asarray(samples, dtype=jnp.float32)
    if x.ndim != 1:
        raise ValueError(f"expected 1D waveform, got shape {x.shape}")
    f_max = config.f_max if config.f_max > 0 else config.sample_rate / 2.0

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(wave, cfg: AudioConfig):
        pre = _preemphasis(wave)
        padded = jnp.pad(pre, (cfg.n_fft // 2, cfg.n_fft // 2), mode="reflect")
        log_mel = fused_log_mel(
            padded, n_fft=cfg.n_fft, hop=cfg.hop_length, win_length=cfg.win_length,
            n_mels=cfg.n_mels, sample_rate=float(cfg.sample_rate),
            f_min=cfg.f_min, f_max=f_max,
        )
        if cfg.normalize:
            n_frames = log_mel.shape[0]
            mean = jnp.mean(log_mel, axis=0, keepdims=True)
            centered = log_mel - mean
            var = jnp.sum(centered * centered, axis=0, keepdims=True) / (n_frames - 1)
            log_mel = centered / (jnp.sqrt(var) + 1e-5)
        return log_mel

    return run(x, config)[None, :, :]


# ─── Streaming ───────────────────────────────────────────────────────────────


def _streaming_log_mel(x: jnp.ndarray, cfg: AudioConfig, n_frames: int) -> jnp.ndarray:
    """center=False power → Slaney fb matmul (HIGHEST) → log guard; no
    normalization mid-stream. THE streaming mel body — both the per-push
    path and the batched fused path call this, so their numerics cannot
    drift."""
    power = _stft_power(x, cfg, center=False, n_frames=n_frames)
    fb = jnp.asarray(_fb_for(cfg))
    mel = jnp.matmul(power, fb, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(mel + LOG_GUARD)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _process_chunk_jit(x: jnp.ndarray, cfg: AudioConfig, n_frames: int) -> jnp.ndarray:
    return _streaming_log_mel(x, cfg, n_frames)


def streaming_log_mel_batch(
    x: jnp.ndarray, prev: jnp.ndarray, cfg: AudioConfig, n_frames: int
) -> jnp.ndarray:
    """Batched streaming mel: (B, S) raw samples + (B,) preemphasis
    carry-in → (B, n_frames, n_mels) unnormalized log-mel, center=False.

    The per-slot frontend of the whole serving cohort as ONE traced
    computation — StreamingBatchTranscriber(frontend="fused") calls this
    inside its fused step so a B-stream step pays zero per-slot frontend
    dispatches (each dispatch is a full round trip on relay-attached TPUs).
    S must equal (n_frames-1)*hop + win: every step consumes exactly
    n_frames windows with the (win-hop) overlap inside the slice — the
    reference's grid-restart-at-consumed semantics (audio.cpp:232-235)
    applied at a fixed step size. Same math per slot as
    StreamingAudioPreprocessor.process_chunk fed S-sample pushes."""
    need = (n_frames - 1) * cfg.hop_length + cfg.win_length
    if x.shape[1] != need:
        # JAX clamps out-of-bounds gather indices, so a short buffer would
        # silently build the last frames from repeated edge samples
        raise ValueError(
            f"streaming_log_mel_batch needs exactly (n_frames-1)*hop + win "
            f"= {need} samples per row, got {x.shape[1]}"
        )

    def one(xi, pi):
        pre = _preemphasis(xi, 0.97, pi)
        return _streaming_log_mel(pre, cfg, n_frames)

    return jax.vmap(one)(x, prev)


class StreamingAudioPreprocessor:
    """Stateful chunk-wise mel frontend (reference: audio.cpp:171-259).

    State: last raw sample for preemphasis continuity + an overlap buffer of
    already-preemphasized samples shorter than one window. Output is
    unnormalized log-mel, (1, n_frames, n_mels); returns None while fewer
    than win_length samples are buffered.
    """

    def __init__(self, config: AudioConfig = AudioConfig()):
        self.config = config
        self.reset()

    def reset(self) -> None:
        self._preemph_last = 0.0
        self._overlap = np.zeros(0, dtype=np.float32)

    def process_chunk(self, samples) -> jnp.ndarray | None:
        cfg = self.config
        x = np.asarray(samples, dtype=np.float32).reshape(-1)
        if x.size:
            pre = x.copy()
            pre[0] -= 0.97 * self._preemph_last
            pre[1:] -= 0.97 * x[:-1]
            self._preemph_last = float(x[-1])
            buf = np.concatenate([self._overlap, pre])
        else:
            buf = self._overlap

        total = buf.shape[0]
        if total < cfg.win_length:
            self._overlap = buf
            return None
        n_frames = (total - cfg.win_length) // cfg.hop_length + 1
        consumed = (n_frames - 1) * cfg.hop_length + cfg.win_length
        self._overlap = buf[consumed:].copy()
        feats = _process_chunk_jit(jnp.asarray(buf[:consumed]), cfg, n_frames)
        return feats[None, :, :]


__all__ = [
    "LOG_GUARD",
    "mel_filterbank",
    "preprocess_audio",
    "streaming_log_mel_batch",
    "StreamingAudioPreprocessor",
]
