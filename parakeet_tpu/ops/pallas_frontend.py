"""Fused mel-spectrogram Pallas kernel.

One kernel computes frame → window → |DFT|² → mel → log entirely in VMEM,
tile by tile over frames (the jnp path materializes the (T, n_fft) frame
matrix and (T, 257) spectrum in HBM between ops). The DFT is expressed as
two MXU matmuls against cos/sin matrices (n_fft × n_freqs ≈ 0.5 MB each in
VMEM) — TPU has no FFT unit, and at n_fft=512 the O(T·n_fft·n_freqs)
matmul form runs on the MXU at full tilt, which beats an FFT lowered to
VPU shuffles.

Framing trick: a frame tile needs samples [t0·hop, t0·hop + (TM−1)·hop+win)
— overlapping windows, which BlockSpecs can't express. The kernel DMAs the
span once, then builds the (TM, n_fft) frame matrix with THREE shifted
reshapes + one column slice (n_fft = 512 = 3·160 + 32 for hop 160), all
static ops — no gather.

Host wrapper pads so every tile is full; per-feature normalization (a
global reduction over T) stays outside the kernel.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parakeet_tpu.audio.frontend import LOG_GUARD, _hann_symmetric, mel_filterbank

_TM = 128  # frames per tile


@functools.lru_cache(maxsize=4)
def _dft_mats(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-input DFT as two real matrices (n_fft, n_fft//2+1), f64→f32."""
    n = np.arange(n_fft)[:, None]
    f = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * math.pi * n * f / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _frontend_kernel(
    x_ref,  # (1, TM+3, hop) f32 VMEM — hop-sample rows for this tile
    cos_ref,  # (n_fft, n_freqs) — window-weighted cos DFT
    sin_ref,  # (n_fft, n_freqs) — window-weighted sin DFT
    fb_ref,  # (n_freqs, n_mels)
    out_ref,  # (TM, n_mels)
    *,
    hop: int,
    n_fft: int,
):
    tm = out_ref.shape[0]
    # frame[t] = rows t..t+3 of x (first n_fft = 3*hop + rem samples), so
    # (frames ⊙ win) @ D = Σ_k x[k:tm+k] @ Dw[k·hop:(k+1)·hop] where Dw is
    # the window-weighted DFT matrix. Four shifted sublane slices feed four
    # MXU matmuls — no frame materialization, no lane concat (both of which
    # Mosaic rejects for these layouts).
    rem = n_fft - 3 * hop
    x = x_ref[0]  # (TM+3, hop)

    hi = jax.lax.Precision.HIGHEST  # f32 MXU passes truncate otherwise

    def dft_part(mat_ref):
        acc = jnp.dot(x[0:tm], mat_ref[0:hop], preferred_element_type=jnp.float32, precision=hi)
        acc += jnp.dot(x[1 : tm + 1], mat_ref[hop : 2 * hop],
                       preferred_element_type=jnp.float32, precision=hi)
        acc += jnp.dot(x[2 : tm + 2], mat_ref[2 * hop : 3 * hop],
                       preferred_element_type=jnp.float32, precision=hi)
        acc += jnp.dot(x[3 : tm + 3, :rem], mat_ref[3 * hop : 3 * hop + rem],
                       preferred_element_type=jnp.float32, precision=hi)
        return acc

    re = dft_part(cos_ref)
    im = dft_part(sin_ref)
    power = re * re + im * im
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32, precision=hi)
    out_ref[:] = jnp.log(mel + LOG_GUARD)


def _span(tm: int, hop: int, n_fft: int) -> int:
    return (tm + 3) * hop  # covers (tm-1)*hop + n_fft for n_fft <= 4*hop... see below


def fused_log_mel(
    x: jnp.ndarray,
    *,
    n_fft: int = 512,
    hop: int = 160,
    win_length: int = 400,
    n_mels: int = 80,
    sample_rate: float = 16000.0,
    f_min: float = 0.0,
    f_max: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Preemphasized, center-padded samples (N,) → log-mel (N//hop? , n_mels).

    Caller must have already reflect-padded for center=True semantics; this
    computes T = (len(x) - n_fft) // hop + 1 frames. Requires
    n_fft <= 4*hop (true for 512/160).
    """
    if n_fft > 4 * hop:
        raise ValueError("fused_log_mel requires n_fft <= 4*hop")
    n_freqs = n_fft // 2 + 1
    t_frames = (x.shape[0] - n_fft) // hop + 1
    tiles = -(-t_frames // _TM)  # cdiv
    t_padded = tiles * _TM
    span = _span(_TM, hop, n_fft)

    # pad so every tile's span is in range, then materialize per-tile row
    # blocks (tiles, TM+3, hop): overlapping by 3 rows (~2% duplication);
    # pallas BlockSpecs can't express overlapping blocks directly.
    need = (tiles - 1) * _TM * hop + span
    x = jnp.pad(x.astype(jnp.float32), (0, max(0, need - x.shape[0])))
    rows = x[: (need // hop) * hop].reshape(-1, hop)  # (total_rows, hop)
    row_idx = jnp.arange(tiles)[:, None] * _TM + jnp.arange(_TM + 3)[None, :]
    x_tiles = rows[row_idx]  # (tiles, TM+3, hop)

    window = np.zeros(n_fft, np.float32)
    lpad = (n_fft - win_length) // 2
    window[lpad : lpad + win_length] = _hann_symmetric(win_length)
    cos_m, sin_m = _dft_mats(n_fft)
    fmax = f_max if f_max else sample_rate / 2.0
    fb = mel_filterbank(n_freqs, n_mels, sample_rate, f_min, fmax)

    kernel = functools.partial(_frontend_kernel, hop=hop, n_fft=n_fft)
    out = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, _TM + 3, hop), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs, n_mels), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TM, n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_padded, n_mels), jnp.float32),
        interpret=interpret,
    )(
        x_tiles,
        jnp.asarray(window[:, None] * cos_m),
        jnp.asarray(window[:, None] * sin_m),
        jnp.asarray(fb),
    )
    return out[:t_frames]


__all__ = ["fused_log_mel"]
