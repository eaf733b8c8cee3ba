"""Fused conv-subsampling front kernel: conv1 → dw1 → conv2 in VMEM.

The r3 trace (TUNING.md) shows the subsampling chain's first three convs
are bandwidth-bound: conv1 (1→C, 3×3 s2) writes a ~1.3 GB (B, T/2, F/2, C)
intermediate to HBM at B=128 just for dw1 to read it back (conv1 1.98 ms +
dw1/conv2 2.41 ms of the 40.6 ms encoder forward). This kernel keeps that
intermediate in VMEM.

TPU-native formulation (NOT a translation of the reference's im2col+GEMM
subsampling, encoder.cpp:208-241 — the reference materializes every stage):

  * Host/XLA prep (`_im2col_blocked`): the 3×3 stride-2 conv1 over a
    1-channel input is a 9-tap im2col whose tensor is (…, 9) — ~46 MB at
    B=128, 28× SMALLER than conv1's (…, C=256) output. Rows are emitted in
    (t-tile, t-parity, f-parity, f-half) order so every stride-2 access
    downstream becomes a contiguous slice (same roll-free algebra idea as
    the attention kernel's rel_shift): stage-2's 3×3 stride-2 taps read
    even/odd planes at ±1 offsets instead of strided gathers, which Mosaic
    can't do on tiled dims. T-tiles carry a 2-frame halo (blocks overlap),
    so each grid program is self-contained.
  * Kernel, per (batch, t-tile) program: ONE (R, 9) @ (9, C) MXU matmul
    materializes the conv1 tile in VMEM (f32) → ReLU → dw1 as 9
    aligned-slice broadcast FMAs (VPU) → pointwise conv2 as ONE
    (R4, C) @ (C, C) GEMM → bias + ReLU → write the (T4t, F4, C) block.

Per-program VMEM ≈ 6 MB at C=256; HBM traffic for the three convs drops
from ~3× the conv1 intermediate to one im2col read + one stage-2 write.

The caller (models/encoder.py::conv_subsampling) finishes dw2+conv3+proj
in XLA — those tensors are 4× smaller and XLA already fuses them well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _act(x: jnp.ndarray, activation: str) -> jnp.ndarray:
    if activation == "relu":
        return jnp.maximum(x, 0.0)
    # SiLU inlined — jax.nn.silu lowers via closed_call, which crashes this
    # jax version's lowering cache next to pallas_call (CLAUDE.md).
    return x * (1.0 / (1.0 + jnp.exp(-x)))


def _sub_len(n: int) -> int:
    return (n - 1) // 2 + 1


def _im2col_blocked(x: jnp.ndarray, t4_tile: int, n_tiles: int):
    """(B, T, F) → (B, nT, R, 10) halo-blocked parity-ordered conv1 patches.

    Row r of a tile enumerates (tk, tp, fq, j): tk = local stage-1
    frame-pair, tp = its parity, fq = output-frequency parity, j = f-half
    index. Stage-1 frame t2' (1-shifted: t2' = t2 + 1, so tile starts are
    non-negative) lives at rows [(2·tk+tp)·F2, …); tap (dt, df) of conv1
    output (t2, f2) is x[2·t2+dt-1, 2·f2+df-1].

    Column 9 is a VALIDITY GATE: 1 on stage-1 frames t2 ∈ [0, T2), 0 on
    the halo rows outside (t2 = -1 and t2 ≥ T2). The kernel's weight
    matrix carries conv1's bias as row 9, so invalid rows come out of the
    conv1 GEMM as exactly 0 — matching dw1's zero padding (conv1 evaluated
    on zero-padded input would be relu(bias) ≠ 0 there).
    """
    b, t, f = x.shape
    f2 = _sub_len(f)
    f2h = f2 // 2  # F2 is even for every preset (mel 80/128)
    t2 = _sub_len(t)
    t1t = 2 * t4_tile + 2  # stage-1 frames per tile (incl. 2-frame halo)
    t2x = 2 * t4_tile * n_tiles + 2  # stage-1 frames needed globally

    # x index for (t2', dt): 2·(t2'-1)+dt-1 = 2·t2'+dt-3 ∈ [-3, 2·t2x-2]
    back = max(0, 2 * t2x - 2 - (t - 1))
    xp = jnp.pad(x, ((0, 0), (3, back), (1, 1)))
    taps = []
    for dt in range(3):
        for df in range(3):
            taps.append(
                lax.slice(
                    xp,
                    (0, dt, df),
                    (b, dt + 2 * t2x - 1, df + 2 * f2 - 1),
                    (1, 2, 2),
                )
            )
    t2p = jnp.arange(t2x)
    gate = ((t2p >= 1) & (t2p <= t2)).astype(x.dtype)  # t2' = t2_idx + 1
    taps.append(jnp.broadcast_to(gate[None, :, None], (b, t2x, f2)))
    pat = jnp.stack(taps, axis=-1)  # (B, T2X, F2, 10)
    # f-parity reorder: (B, T2X, 2, F2h, 10) — even f2 plane then odd
    pat = jnp.stack([pat[:, :, 0::2], pat[:, :, 1::2]], axis=2)
    # halo-blocked t2' tiles: starts 2·i·T4t, length T1t (overlap 2).
    # Static slices + stack, NOT a dynamic gather — XLA lowers index-array
    # gathers on this tensor to a catastrophically slow generic gather
    # (measured +18 ms on the B=192 encoder forward, r4).
    blk = jnp.stack(
        [pat[:, 2 * t4_tile * i : 2 * t4_tile * i + t1t] for i in range(n_tiles)],
        axis=1,
    )  # (B, nT, T1t, 2, F2h, 10)
    # rows ordered (tk, tp, fq, j): T1t = 2·(T1t//2) with parity minor
    blk = blk.reshape(b, n_tiles, t1t // 2, 2, 2, f2h, 10)
    return blk.reshape(b, n_tiles, t1t * 2 * f2h, 10), f2h


def _subsample_kernel(
    x_ref,                 # (1, 1, R, 10) im2col rows + validity gate
    w1_ref,                # (10, C) — row 9 is conv1's bias (gated)
    wd_ref, bd_ref,        # (9, C), (1, C) depthwise taps (dt*3+df major)
    w2_ref, b2_ref,        # (C, C) torch (out, in), (1, C)
    out_ref,               # (1, T4t, F4, C)
    *,
    t4_tile: int,
    f4: int,
    activation: str,
    f32_inputs: bool,
):
    c = w1_ref.shape[1]
    tkh = t4_tile + 1  # T1t // 2
    prec = lax.Precision.HIGHEST if f32_inputs else lax.Precision.DEFAULT

    # conv1 as one im2col GEMM; f32 accumulate, stays f32 in VMEM
    y = lax.dot_general(
        x_ref[0, 0], w1_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=_F32, precision=prec,
    )
    y = _act(y, activation)  # bias rides the gate column (row 9 of W1)
    y5 = y.reshape(tkh, 2, 2, f4, c)  # (tk, tp, fq, j, C) — leading-dim only

    # dw1: 9 taps, each a contiguous slice + broadcast FMA.
    #   t1_local = 2·Δt4 + dt → (tk, tp) = (Δt4 + dt//2, dt % 2)
    #   f2 = 2·f4 + df - 1    → (fq, j) = ((df+1) % 2, f4 - (df == 0))
    acc = bd_ref[0].astype(_F32) * jnp.ones((t4_tile, f4, c), _F32)
    for dt in range(3):
        tp = dt % 2
        tk0 = dt // 2
        for df in range(3):
            fq = (df + 1) % 2
            wv = wd_ref[dt * 3 + df].astype(_F32)  # (C,)
            if df == 0:
                # j = f4 - 1: output column 0 reads the zero pad. jnp.pad
                # (a sublane-dim concat), NOT .at[].add — Mosaic has no
                # scatter-add lowering.
                term = y5[tk0:tk0 + t4_tile, tp, fq, : f4 - 1] * wv
                acc = acc + jnp.pad(term, ((0, 0), (1, 0), (0, 0)))
            else:
                acc = acc + y5[tk0:tk0 + t4_tile, tp, fq] * wv

    # pointwise conv2 as one GEMM over (T4t·F4, C); operands at input dtype
    # (the XLA path's dw1 output is bf16 in bf16 mode), f32 accumulate
    z = lax.dot_general(
        acc.reshape(t4_tile * f4, c).astype(x_ref.dtype), w2_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=_F32, precision=prec,
    )
    z = _act(z + b2_ref[0].astype(_F32), activation)
    out_ref[0] = z.reshape(t4_tile, f4, c).astype(out_ref.dtype)


def fused_subsample_block1(
    x: jnp.ndarray,   # (B, T, F) mel features
    w1, b1,           # torch Conv2d (C, 1, 3, 3), (C,)
    wd, bd,           # torch depthwise (C, 1, 3, 3), (C,)
    w2, b2,           # torch pointwise (C, C, 1, 1), (C,)
    activation: str = "relu",
    t4_tile: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """conv1 → dw1 → conv2 fused; returns after_block1 (B, T4, F4, C).

    Bit-exact layout match with the XLA path's NHWC chain up to f32
    accumulation order (tests pin a small tolerance). Caller guards apply:
    use only when T4 ≥ t4_tile (offline clips; streaming chunks fall back).
    """
    b, t, f = x.shape
    c = w1.shape[0]
    t2 = _sub_len(t)
    t4 = _sub_len(t2)
    f4 = _sub_len(_sub_len(f))
    n_tiles = -(-t4 // t4_tile)

    xb, f2h = _im2col_blocked(x, t4_tile, n_tiles)
    assert f2h == f4
    r = xb.shape[2]

    w1m = jnp.concatenate(
        [w1[:, 0].transpose(1, 2, 0).reshape(9, c), b1.reshape(1, c)]
    ).astype(x.dtype)
    wdm = wd[:, 0].transpose(1, 2, 0).reshape(9, c)
    w2m = w2[:, :, 0, 0].astype(x.dtype)

    kernel = functools.partial(
        _subsample_kernel,
        t4_tile=t4_tile, f4=f4, activation=activation,
        f32_inputs=x.dtype == _F32,
    )

    def whole(a):
        return pl.BlockSpec(a.shape, lambda bi, ti: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    args = (
        xb,
        w1m,
        wdm, bd.reshape(1, c),
        w2m, b2.reshape(1, c).astype(x.dtype),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, r, 10), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            *[whole(a) for a in args[1:]],
        ],
        out_specs=pl.BlockSpec((1, t4_tile, f4, c),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * t4_tile, f4, c), x.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :t4]


__all__ = ["fused_subsample_block1"]
