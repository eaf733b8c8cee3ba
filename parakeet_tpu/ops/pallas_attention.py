"""Fused rel-pos attention Pallas kernel (offline encoder hot path).

Profiling (B=256, T=125): attention is ~60% of encoder time and HBM-bound —
XLA materializes the (B,H,T,2T-1) position scores, the pad/reshape/slice
rel_shift copies, and the (B,H,T,T) score/softmax tensors in HBM every
layer. This kernel keeps the whole per-(batch, head) attention in VMEM:

    content = (Q+u) Kᵀ                  (T,T)   MXU
    raw     = (Q+v) Pᵀ                  (T,2T-1) MXU
    shift   : row t ← raw[t, T-1-t : 2T-1-t]
    softmax((content+shift)·scale) @ V  (T,hd)  MXU

Mosaic constraints shape the implementation: dynamic lane slicing must be
128-aligned and `pltpu.roll` needs aligned operands, so inputs are padded
to lane-aligned shapes (T→⌈T/128⌉·128) and the shift is realized as
⌈log₂T⌉ static full-matrix roll rounds with masked selects (binary
decomposition of the per-row shift amounts; pad columns masked to -inf);
only Q/K/V/P and the (T,hd) output touch HBM. Scores/softmax in f32 (same
as the XLA path). The block/mega variants avoid the rolls entirely via
the angle-addition factorization (see _attention_core).

Grid: (B, H). T≈125, hd=64 → all operands ≪ 1 MB.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parakeet_tpu.ops.pallas_utils import (
    ffn_body,
    kernel_layer_norm,
    kernel_precision,
    round_up,
    silu_kernelside,
    whole_block,
)

_F32 = jnp.float32
_NEG_INF = -1e9


def _attn_kernel(
    len_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, out_ref, *, scale: float, t_real: int
):
    # blocks per (b, h): q/k/v (1,1,TP,hd); p (1,PLEN,hd); scratch (TP,PLEN)/(TP,TP)
    qu = qu_ref[0, 0]
    qv = qv_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    p = p_ref[0]
    tp = qu.shape[0]

    # HIGHEST only matters (and is only Mosaic-supported) for f32 operands;
    # bf16 MXU products accumulate in f32 regardless.
    hi = kernel_precision(qu.dtype)
    content = jax.lax.dot_general(
        qu, k, (((1,), (1,)), ((), ())), preferred_element_type=_F32, precision=hi
    )  # (TP, TP)
    raw = jax.lax.dot_general(
        qv, p, (((1,), (1,)), ((), ())), preferred_element_type=_F32, precision=hi
    )  # (TP, PLEN)

    # rel_shift, vectorized: row i needs a left-roll by (t_real-1-i). Apply
    # the per-row shifts via binary decomposition — ceil(log2 T) static
    # full-matrix rolls + masked selects instead of T serialized row rolls.
    plen = raw.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tp, plen), 0)
    shifts = jnp.where(rows < t_real, t_real - 1 - rows, 0)
    mat = raw
    bit = 1
    while bit < t_real:  # static python loop
        rolled = pltpu.roll(mat, plen - bit, 1)  # left-roll by bit (shift ≥ 0)
        mat = jnp.where((shifts & bit) > 0, rolled, mat)
        bit <<= 1
    shifted = mat[:, :tp]

    scores = (content + shifted) * scale
    # mask pad key columns (s >= per-item valid length); pad query rows give
    # garbage but are zero-filled/sliced downstream (same as the XLA path)
    kv_len = jnp.minimum(len_ref[pl.program_id(0), 0], t_real)
    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    scores = jnp.where(col >= kv_len, _NEG_INF, scores)
    # inline softmax (jax.nn.softmax lowers via closed_call; see module note)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=_F32, precision=hi,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


def fused_rel_attention(
    # no inner jit: nested closed_call trips this jax version's cached
    # lowering; callers are always inside an outer jit.
    q_u: jnp.ndarray,  # (B, H, T, hd): Q + pos_bias_u
    q_v: jnp.ndarray,  # (B, H, T, hd): Q + pos_bias_v
    k: jnp.ndarray,  # (B, H, T, hd)
    v: jnp.ndarray,  # (B, H, T, hd)
    p: jnp.ndarray,  # (H, 2T-1, hd): per-head projected position table
    lengths: jnp.ndarray | None = None,  # (B,) valid key counts (pad masking)
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, t, hd = q_u.shape
    scale = 1.0 / math.sqrt(hd)
    tp = round_up(t, 128)
    plen = round_up(2 * t - 1, 128)
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    lengths = lengths.astype(jnp.int32).reshape(b, 1)  # SMEM scalars are 2D

    def pad_t(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))

    q_u, q_v, k, v = pad_t(q_u), pad_t(q_v), pad_t(k), pad_t(v)
    p = jnp.pad(p, ((0, 0), (0, plen - (2 * t - 1)), (0, 0)))

    kernel = functools.partial(_attn_kernel, scale=scale, t_real=t)

    def qspec():
        return pl.BlockSpec((1, 1, tp, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            # whole (B,1) lengths vector in SMEM for every program; indexed
            # by program_id (block dims must equal SMEM array dims)
            pl.BlockSpec((b, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            qspec(),
            qspec(),
            qspec(),
            qspec(),
            pl.BlockSpec((1, plen, hd), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tp, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, hd), q_u.dtype),
        interpret=interpret,
    )(lengths, q_u, q_v, k, v, p)
    return out[:, :, :t, :]


def _attention_core(
    x,                       # (NB·TP, D) post-norm attention input (VALUE, not ref)
    kv_lens,                 # list of NB scalar valid key counts (static unroll)
    wqkv_ref,                # (3D, D) stacked q|k|v projection weights (torch layout)
    bqkv_ref,                # (1, 3D) stacked biases
    u_ref, v_ref,            # (1, D) rel-pos biases flattened head-major
    wpos_ref,                # (H, hd, D) pos-proj blocks, pe-components permuted sin|cos
                             #   (headpair: (H/2, 2hd, 2D) block-diagonal pair blocks)
    sin_ref, cos_ref,        # (TP, D/2) sin(t·ω_k) / cos(t·ω_k) tables
    wo_ref,                  # (D, D) out-proj weight (torch layout)
    bo_ref,                  # (1, D)
    acc_ref,                 # VMEM scratch (NB·TP, D) f32 — per-head AV assembly
    *,
    scale: float,
    t_real: int,
    heads: int,
    blockdiag: bool = False,
    headpair: bool = False,
    score_bf16: bool = False,
):
    """Shared attention body for the fused kernels; returns (NB·TP, D) f32.

    score_bf16: store the (TP, TP)/(TP, 2TP) score and softmax
    intermediates in bfloat16 between the MXU and VPU stages (matmul
    accumulation stays f32 inside the MXU; only the materialized tensors
    halve). This is the VERDICT r4 #2 control experiment for the
    "remaining 2×-FLOP gap is f32 score-tensor VMEM round trips" theory —
    it halves exactly that traffic and nothing else. NOT bit-parity with
    the f32 path (~1e-3 relative score noise, like W8A8); default off.

    Structured as FEW, LARGE MXU ops (small matmuls stall the systolic
    array on pipeline fill): q/k/v are ONE (NB·TP,D)@(D,3D) matmul; per
    (item, head) the content and position scores are ONE merged matmul
    [ṽa|ṽb|qu_h] @ [cos|sin|k_h]ᵀ (the contractions simply concatenate);
    per-head attention outputs are assembled into a (NB·TP, D) scratch and
    leave through ONE (NB·TP,D)@(D,D) out-projection. Heads are STATIC lane
    slices (hd-aligned static slices are fine; only dynamic lane slicing
    needs 128 alignment). NB > 1 (batch-blocking) multiplies the M dim of
    the projection/rotation matmuls, amortizing MXU pipeline fill — the
    trace showed the NB=1 kernel at ~3× its FLOP floor (TUNING.md r3)."""
    nbtp, d = x.shape
    hd = d // heads
    d2 = sin_ref.shape[1]
    nb = len(kv_lens)
    tp = nbtp // nb
    hi = kernel_precision(x.dtype)
    sdt = jnp.bfloat16 if score_bf16 else _F32  # score-tensor storage dtype

    col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    sin_t = sin_ref[...].astype(_F32)
    cos_t = cos_ref[...].astype(_F32)
    sin_x = sin_ref[...].astype(x.dtype)
    cos_x = cos_ref[...].astype(x.dtype)

    qkv = (
        jax.lax.dot_general(
            x, wqkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=_F32, precision=hi,
        )
        + bqkv_ref[0].astype(_F32)
    )  # (NB·TP, 3D) f32; same per-element contraction as 3 matmuls
    # Fold the 1/sqrt(hd) score scale into q (and the u/v biases) HERE: one
    # (NB·TP, D) multiply instead of a per-(item, head) multiply on every
    # (TP, TP) score tile — the kernel is softmax/VPU-bound, not MXU-bound
    # (TUNING.md r4), so score-tile VPU ops are the ones that cost.
    q_full = (qkv[:, :d] * scale).astype(x.dtype)
    k_full = qkv[:, d : 2 * d].astype(x.dtype)
    v_full = qkv[:, 2 * d :].astype(x.dtype)
    qu_full = q_full + (u_ref[0].astype(_F32) * scale).astype(x.dtype)
    qv_full = q_full + (v_ref[0].astype(_F32) * scale).astype(x.dtype)

    # head-loop invariants, built once: the nb-tiled trig rows and the
    # [cos|sin] score RHS
    sin_n = sin_t if nb == 1 else jnp.concatenate([sin_t] * nb, axis=0)
    cos_n = cos_t if nb == 1 else jnp.concatenate([cos_t] * nb, axis=0)
    cossin_x = jnp.concatenate([cos_x, sin_x], axis=1)
    blockdiag = blockdiag and nb > 1
    if blockdiag:
        # block-diagonal path invariants: the cross-item mask (item i's
        # queries may only see item i's keys) and the per-item kv-length
        # mask stacked over row blocks
        rowblk = jax.lax.broadcasted_iota(jnp.int32, (nbtp, nbtp), 0) // tp
        colblk = jax.lax.broadcasted_iota(jnp.int32, (nbtp, nbtp), 1) // tp
        offdiag = rowblk != colblk
        kv_mask = jnp.concatenate([col >= kv_lens[i] for i in range(nb)], axis=0)

    if headpair:
        # Head-PAIR packing (the "hpN" modes). At hd=64 the per-(item, head)
        # content matmul is K=64 deep and the AV matmul is N=64 wide — each
        # occupies a full 128-lane MXU tile pass with half the lanes zero.
        # Packing two heads block-diagonally fills the tile exactly:
        #   content: [qu_h1|qu_h2](TP,2hd) · [[k_h1|0];[0|k_h2]](2TP,2hd)ᵀ
        #            = [S_h1 | S_h2]  (TP, 2TP), K=2hd=128 — one full K tile
        #   AV:      [attn_h1|attn_h2](TP,2TP) · [[v_h1|0];[0|v_h2]](2TP,2hd)
        #            = [av_h1 | av_h2] (TP, 2hd=128) — one full N tile
        # Same MXU result-tile count as the two singles, HALF the matmul
        # instructions/pipeline fills. The zero blocks are exact (x+0 = x in
        # f32), so this is bit-identical to the per-head path. The packed
        # masks are two (TP, 2hd) VPU multiplies per (item, pair) — cheap.
        # The rotation matmul packs the same way via a block-diagonal
        # (2hd, 2D) weight pair built host-side (wpos_ref is (H/2, 2hd, 2D)),
        # and the two heads' position matmuls share their RHS so they stack
        # along M into one (2·NB·TP, D) @ (D, TP) product.
        hd2 = 2 * hd
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, hd2), 1)
        mask_lo = (lane < hd).astype(x.dtype)
        mask_hi = (lane >= hd).astype(x.dtype)
        for j in range(heads // 2):
            psl = slice(j * hd2, (j + 1) * hd2)
            vproj = jax.lax.dot_general(
                qv_full[:, psl], wpos_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=_F32, precision=hi,
            )  # (NB·TP, 2D) = [va1|vb1 | va2|vb2]
            tvs = []
            for off in (0, d):
                va = vproj[:, off : off + d2]
                vb = vproj[:, off + d2 : off + 2 * d2]
                tva = (va * sin_n + vb * cos_n).astype(x.dtype)
                tvb = (vb * sin_n - va * cos_n).astype(x.dtype)
                tvs.append(jnp.concatenate([tva, tvb], axis=1))
            # Mosaic requires 32-bit matmul accumulators: accumulate f32,
            # cast the RESULT to the storage dtype (sdt) — it is the
            # materialized (TP, ·TP) tensors that score_bf16 halves
            pos_pair = jax.lax.dot_general(
                jnp.concatenate(tvs, axis=0), cossin_x, (((1,), (1,)), ((), ())),
                preferred_element_type=_F32, precision=hi,
            ).astype(sdt)  # (2·NB·TP, TP): head1 rows then head2 rows
            for i in range(nb):
                rows = slice(i * tp, (i + 1) * tp)
                qu_p = qu_full[rows, psl]
                k_p, v_p = k_full[rows, psl], v_full[rows, psl]
                kv_pack = jnp.concatenate([k_p * mask_lo, k_p * mask_hi], axis=0)
                cpair = jax.lax.dot_general(
                    qu_p, kv_pack, (((1,), (1,)), ((), ())),
                    preferred_element_type=_F32, precision=hi,
                ).astype(sdt)  # (TP, 2TP) = [S_h1 | S_h2]; f32 acc (Mosaic)
                attns, recips = [], []
                for hh in range(2):
                    sc = (
                        pos_pair[hh * nbtp + i * tp : hh * nbtp + (i + 1) * tp]
                        + cpair[:, hh * tp : (hh + 1) * tp]
                    )  # scale pre-folded into q/u (see qkv split)
                    sc = jnp.where(col >= kv_lens[i], _NEG_INF, sc)
                    m = jnp.max(sc, axis=-1, keepdims=True)
                    e = jnp.exp(sc - m)
                    # normalize AFTER the AV matmul: a (TP, hd) multiply by
                    # the reciprocal row-sum instead of a (TP, TP) divide —
                    # softmax VPU work is the kernel's bound (TUNING.md r4)
                    recips.append(
                        jnp.broadcast_to(
                            1.0 / jnp.sum(e, axis=-1, keepdims=True), (tp, hd)
                        )
                    )
                    attns.append(e.astype(x.dtype))
                v_pack = jnp.concatenate([v_p * mask_lo, v_p * mask_hi], axis=0)
                acc_ref[rows, psl] = jax.lax.dot_general(
                    jnp.concatenate(attns, axis=1), v_pack, (((1,), (0,)), ((), ())),
                    preferred_element_type=_F32, precision=hi,
                ) * jnp.concatenate(recips, axis=1)  # (TP, 2hd) = [av_h1 | av_h2]
        out = jax.lax.dot_general(
            acc_ref[...].astype(x.dtype), wo_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=_F32, precision=hi,
        )
        return out + bo_ref[0].astype(_F32)

    for h in range(heads):  # static loop; all temporaries stay in VMEM/regs
        sl = slice(h * hd, (h + 1) * hd)

        # Roll-free rel-pos scores. pos_score[t,s] = (Q+v)[t]·W_p·pe(t−s)
        # (the pad-reshape rel_shift's index algebra: r = t−s). pe is
        # sinusoidal, so the angle-addition identity factors pe(t−s) into a
        # per-row 2×2 rotation times per-column basis vectors:
        #     pos[t,s] = ṽa[t]·cos(sω) + ṽb[t]·sin(sω)
        #     ṽa = va·sin(tω) + vb·cos(tω),  ṽb = vb·sin(tω) − va·cos(tω)
        # where (va|vb) = qv @ W_p[head]ᵀ with pe components PERMUTED to
        # sin-block|cos-block layout (done host-side on the weight), so the
        # pairwise mixing is two 128-aligned lane halves — no strided lanes,
        # no rolls. This replaced the binary-decomposition roll rounds,
        # which were VMEM-bandwidth-bound (measured 4.8 ms of the 30 ms
        # B=64 forward). The rotation runs over all NB items at once; the
        # per-item trig rows repeat every TP rows (jnp.tile below).
        vproj = jax.lax.dot_general(
            qv_full[:, sl], wpos_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=_F32, precision=hi,
        )  # (NB·TP, D) — wpos block is (hd, D)
        va, vb = vproj[:, :d2], vproj[:, d2:]
        tva = (va * sin_n + vb * cos_n).astype(x.dtype)
        tvb = (vb * sin_n - va * cos_n).astype(x.dtype)

        # Position scores pos[t,s] = ṽa[t]·cos(sω) + ṽb[t]·sin(sω): the RHS
        # ([cos|sin]) is SHARED across batch items, so all NB items' rows go
        # through ONE (NB·TP, 2·d2)@(2·d2, TP) matmul. Only the content part
        # qu·kᵀ has per-item RHS — and its contraction is just hd deep, so
        # the per-item matmuls shrink from (2·d2+hd) to hd fill cycles.
        # Measured: 44.6 → 40.6 ms/fwd at B=128/NB=4 (the fused
        # [ṽa|ṽb|qu]·[cos|sin|k] single matmul re-paid the 2·d2-deep fill
        # once PER ITEM). At NB=1 the split would ADD a fill instead of
        # amortizing one, so the single fused matmul is kept there.
        if nb > 1:
            pos_all = jax.lax.dot_general(
                jnp.concatenate([tva, tvb], axis=1), cossin_x,
                (((1,), (1,)), ((), ())), preferred_element_type=_F32, precision=hi,
            ).astype(sdt)  # (NB·TP, TP); f32 acc (Mosaic requires 32-bit)

        if blockdiag:
            # block-diagonal variant: ONE cross-item content matmul and ONE
            # AV matmul per head instead of NB small ones each. The full
            # (NB·TP, NB·TP) score product is computed, its diagonal blocks
            # (lane-aligned slices) extracted for the per-item softmax, and
            # the probabilities scattered back (off-diagonal = 0) so the
            # AV contraction over all NB items' keys is EXACT.
            s_all = jax.lax.dot_general(
                qu_full[:, sl], k_full[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=_F32, precision=hi,
            ).astype(sdt)  # (NB·TP, NB·TP), hd-deep; f32 acc (Mosaic)
            diag = jnp.concatenate(
                [s_all[i * tp : (i + 1) * tp, i * tp : (i + 1) * tp] for i in range(nb)],
                axis=0,
            )  # (NB·TP, TP)
            scores = pos_all + diag  # scale pre-folded into q/u
            scores = jnp.where(kv_mask, _NEG_INF, scores)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)  # (NB·TP, 1)
            probs = jnp.where(
                offdiag,
                jnp.zeros((), x.dtype),
                jnp.concatenate([e.astype(x.dtype)] * nb, axis=1),
            )  # (NB·TP, NB·TP) block-diagonal, unnormalized
            acc_ref[:, sl] = jax.lax.dot_general(
                probs, v_full[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=_F32, precision=hi,
            ) * recip  # post-AV normalize (see hp path note)
            continue

        for i in range(nb):  # per-item score/softmax/AV (static unroll)
            rows = slice(i * tp, (i + 1) * tp)
            qu, k, v = qu_full[rows, sl], k_full[rows, sl], v_full[rows, sl]

            if nb > 1:
                content = jax.lax.dot_general(
                    qu, k, (((1,), (1,)), ((), ())), preferred_element_type=_F32,
                    precision=hi,
                ).astype(sdt)  # (TP, TP), hd-deep; f32 acc (Mosaic)
                scores = pos_all[rows] + content  # scale pre-folded into q/u
            else:
                lhs = jnp.concatenate([tva, tvb, qu], axis=1)
                rhs = jnp.concatenate([cossin_x, k], axis=1)
                scores = jax.lax.dot_general(
                    lhs, rhs, (((1,), (1,)), ((), ())),
                    preferred_element_type=_F32, precision=hi,
                ).astype(sdt)  # scale pre-folded into q/u; f32 acc (Mosaic)
            scores = jnp.where(col >= kv_lens[i], _NEG_INF, scores)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            recip = 1.0 / jnp.sum(e, axis=-1, keepdims=True)  # (TP, 1)

            acc_ref[rows, sl] = jax.lax.dot_general(
                e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=_F32, precision=hi,
            ) * recip  # (TP, hd) post-AV normalize — see hp path note

    out = jax.lax.dot_general(
        acc_ref[...].astype(x.dtype), wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=_F32, precision=hi,
    )
    return out + bo_ref[0].astype(_F32)


def _attn_block_kernel(
    len_ref,  # SMEM (B_padded, 1)
    x_ref,    # (NB, TP, D): post-norm input, or BLOCK input when norm fused
    wqkv_ref, bqkv_ref,
    u_ref, v_ref,
    wpos_ref, sin_ref, cos_ref,
    wo_ref, bo_ref,
    *rest,                   # [nw_ref, nb_ref,] out_ref, acc_ref
    scale: float,
    t_real: int,
    heads: int,
    nb: int,
    eps: float | None,       # not None → pre-LN + residual fused in-kernel
    blockdiag: bool = False,
    headpair: bool = False,
    score_bf16: bool = False,
):
    if eps is not None:
        nw_ref, nbias_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    nb_, tp, d = x_ref.shape
    x = x_ref[...].reshape(nb * tp, d)  # leading-dim merge, layout no-op
    attn_in = x
    if eps is not None:
        # attention pre-LayerNorm inside the kernel: saves one HBM write +
        # read of the normed (B,T,D) activations per layer, and the
        # residual add below saves another elementwise round trip
        attn_in = kernel_layer_norm(x, nw_ref[0], nbias_ref[0], eps).astype(x.dtype)
    kv_lens = [
        jnp.minimum(len_ref[pl.program_id(0) * nb + i, 0], t_real)
        for i in range(nb)
    ]
    att = _attention_core(
        attn_in, kv_lens, wqkv_ref, bqkv_ref,
        u_ref, v_ref, wpos_ref, sin_ref, cos_ref, wo_ref, bo_ref, acc_ref,
        scale=scale, t_real=t_real, heads=heads, blockdiag=blockdiag,
        headpair=headpair, score_bf16=score_bf16,
    )
    if eps is not None:
        att = x.astype(_F32) + att  # residual rides in-kernel
    out_ref[...] = att.reshape(nb, tp, d).astype(out_ref.dtype)


def _ffn_attn_kernel(
    len_ref,  # SMEM (B, 1)
    x_ref,    # (1, TP, D) BLOCK INPUT (pre-ffn1)
    fnw_ref, fnb_ref,        # ffn1 LN (1, D)
    f1_ref, g1_ref,          # fc1 (F, D), (1, F)
    f2_ref, g2_ref,          # fc2 (D, F), (1, D)
    anw_ref, anb_ref,        # attention pre-LN (1, D)
    wqkv_ref, bqkv_ref,
    u_ref, v_ref,
    wpos_ref, sin_ref, cos_ref,
    wo_ref, bo_ref,
    out_ref,                 # (1, TP, D): x + 0.5·ffn1 + attention
    acc_ref,                 # VMEM scratch (TP, D) f32
    *,
    eps: float,
    scale: float,
    t_real: int,
    heads: int,
):
    x = x_ref[0]

    # macaron FFN 1 — the shared body every fused variant runs
    x2 = ffn_body(x, fnw_ref[0], fnb_ref[0], f1_ref[...], g1_ref[0],
                  f2_ref[...], g2_ref[0], eps)

    attn_in = kernel_layer_norm(x2, anw_ref[0], anb_ref[0], eps)
    kv_len = jnp.minimum(len_ref[pl.program_id(0), 0], t_real)
    att = _attention_core(
        attn_in, [kv_len], wqkv_ref, bqkv_ref,
        u_ref, v_ref, wpos_ref, sin_ref, cos_ref, wo_ref, bo_ref, acc_ref,
        scale=scale, t_real=t_real, heads=heads,
    )
    out_ref[0] = (x2.astype(_F32) + att).astype(out_ref.dtype)


@functools.lru_cache(maxsize=16)
def _trig_tables_np(tp: int, d: int):
    """sin(t·ω_k), cos(t·ω_k) for t=0..TP-1, k=0..d/2-1 — the frequencies of
    sinusoidal_position_embedding (f64 construction, f32 storage)."""
    import numpy as np

    k = np.arange(0, d, 2, dtype=np.float64)
    omega = np.exp(k * (-math.log(10000.0) / d))[None, :]
    t = np.arange(tp, dtype=np.float64)[:, None]
    return np.sin(t * omega).astype("float32"), np.cos(t * omega).astype("float32")


def fused_rel_attention_block(
    x: jnp.ndarray,  # (B, T, D) post-norm attention input
    wq: jnp.ndarray, bq: jnp.ndarray,  # torch Linear layouts (D, D) / (D,)
    wk: jnp.ndarray, bk: jnp.ndarray,
    wv: jnp.ndarray, bv: jnp.ndarray,
    bias_u: jnp.ndarray, bias_v: jnp.ndarray,  # (H, hd)
    pos_w: jnp.ndarray,  # pos_proj weight, torch layout (D, D), bias-free
    wo: jnp.ndarray, bo: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    batch_block: int = 1,
    blockdiag: bool = False,
    headpair: bool = False,
    score_bf16: bool = False,
    norm_w: jnp.ndarray | None = None,
    norm_b: jnp.ndarray | None = None,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-block fused attention: QKV projections + rel-pos attention +
    out projection in ONE kernel, grid over batch only.

    norm_w/norm_b (optional): fuse the attention pre-LayerNorm AND the
    residual add into the kernel — `x` is then the raw block input and the
    return value is `x + attention(LN(x))`. Saves two (B,T,D) HBM round
    trips per layer vs norming in XLA.

    vs `fused_rel_attention` (grid (B,H), projections outside): the q/k/v/
    out intermediates never touch HBM, every weight block's index map is
    constant along the single grid axis so Mosaic keeps all weights
    VMEM-resident across programs, and the rel_shift is ROLL-FREE — the
    sinusoidal position table factors through the angle-addition identity
    (see the kernel comment), turning the shift into one elementwise
    rotation + two matmuls. HBM traffic per layer is one read of x and one
    write of the output. VMEM high-water: ~3.5 MB for 110m (D=512).

    batch_block (NB): items per program. NB>1 merges NB items' rows into
    the projection/rotation matmuls ((NB·TP, D) M-dims), amortizing MXU
    pipeline fill that dominates at TP=128 (r3 trace: NB=1 ran ~3× above
    its FLOP floor); scores/softmax/AV stay per-item."""
    b, t, d = x.shape
    heads, hd = bias_u.shape[0], bias_u.shape[1]
    scale = 1.0 / math.sqrt(hd)
    tp = round_up(t, 128)
    # clamp to the actual batch: a single-clip call under block4 must not
    # compute scores/softmax/AV for three pad items
    nb = max(1, min(int(batch_block), b))
    pad_b = (-b) % nb
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    lengths = jnp.pad(lengths.astype(jnp.int32), (0, pad_b), constant_values=t)
    lengths = lengths.reshape(b + pad_b, 1)

    x = jnp.pad(x, ((0, pad_b), (0, tp - t), (0, 0)))
    bp = b + pad_b

    # q|k|v stacked along the output axis → ONE in-kernel projection matmul
    wqkv = jnp.concatenate([wq, wk, wv], axis=0)  # (3D, D)
    bqkv = jnp.concatenate([bq, bk, bv]).reshape(1, 3 * d)

    # pos-proj blocks with the pe-component (input) axis permuted to
    # sin-block|cos-block order, so the kernel's pairwise rotation works on
    # two aligned lane halves instead of interleaved lanes
    perm = jnp.concatenate([jnp.arange(0, d, 2), jnp.arange(1, d, 2)])
    wpos_b = pos_w[:, perm].reshape(heads, hd, d)  # (H, hd, D)
    # Pair-packing only pays while 2·hd fits one 128-lane MXU K/N tile: at
    # hd=64 it reclaims the half-empty tile the single head wastes; at
    # hd=128 (600m presets) the packed K=256 contraction would DOUBLE the
    # effective MXU work instead. Silently degrade to the per-head path so
    # "block4hp" is a safe universal default across model sizes.
    headpair = headpair and heads % 2 == 0 and 2 * hd <= 128 and not blockdiag
    if headpair:
        # block-diagonal pair blocks (H/2, 2hd, 2D) so the in-kernel
        # rotation matmul packs two heads per pass (see _attention_core)
        z = jnp.zeros_like(wpos_b[0::2])
        wpos_b = jnp.concatenate(
            [
                jnp.concatenate([wpos_b[0::2], z], axis=2),
                jnp.concatenate([z, wpos_b[1::2]], axis=2),
            ],
            axis=1,
        )  # (H/2, 2hd, 2D)

    sin_np, cos_np = _trig_tables_np(tp, d)
    sin_t, cos_t = jnp.asarray(sin_np), jnp.asarray(cos_np)

    kernel = functools.partial(
        _attn_block_kernel, scale=scale, t_real=t, heads=heads, nb=nb,
        eps=(eps if norm_w is not None else None),
        blockdiag=(blockdiag and nb > 1),
        headpair=headpair,
        score_bf16=score_bf16,
    )

    u2, v2 = bias_u.reshape(1, d), bias_v.reshape(1, d)
    bo2 = bo.reshape(1, d)
    args = [lengths, x, wqkv, bqkv, u2, v2, wpos_b, sin_t, cos_t, wo, bo2]
    specs = [
        pl.BlockSpec((bp, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((nb, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        whole_block(wqkv), whole_block(bqkv),
        whole_block(u2), whole_block(v2),
        whole_block(wpos_b), whole_block(sin_t), whole_block(cos_t),
        whole_block(wo), whole_block(bo2),
    ]
    if norm_w is not None:
        nw2, nb2 = norm_w.reshape(1, d), norm_b.reshape(1, d)
        args += [nw2, nb2]
        specs += [whole_block(nw2), whole_block(nb2)]
    out = pl.pallas_call(
        kernel,
        grid=(bp // nb,),
        in_specs=specs,
        out_specs=pl.BlockSpec((nb, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, tp, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((nb * tp, d), _F32)],
        interpret=interpret,
    )(*args)
    return out[:b, :t, :]


def fused_ffn_attention(
    x: jnp.ndarray,  # (B, T, D) BLOCK INPUT (pre-ffn1)
    ffn: dict,       # norm_w/b, fc1_w/b, fc2_w/b (torch layouts)
    attn_norm_w, attn_norm_b,
    wq: jnp.ndarray, bq: jnp.ndarray,
    wk: jnp.ndarray, bk: jnp.ndarray,
    wv: jnp.ndarray, bv: jnp.ndarray,
    bias_u: jnp.ndarray, bias_v: jnp.ndarray,
    pos_w: jnp.ndarray,
    wo: jnp.ndarray, bo: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """fused_rel_attention_block extended with the macaron ffn1 prologue:
    out = x2 + attention(LN(x2)) where x2 = x + 0.5·ffn1(x). Same launch
    count as the attention-only kernel, ~4 ms of XLA ffn1 work folded in.
    VMEM adds the ffn weights (~4.2 MB for 110m); callers guard model size
    (encoder._ffn_fusable)."""
    b, t, d = x.shape
    f = ffn["fc1_w"].shape[0]
    heads, hd = bias_u.shape[0], bias_u.shape[1]
    scale = 1.0 / math.sqrt(hd)
    tp = round_up(t, 128)
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    lengths = lengths.astype(jnp.int32).reshape(b, 1)

    x = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))

    wqkv = jnp.concatenate([wq, wk, wv], axis=0)
    bqkv = jnp.concatenate([bq, bk, bv]).reshape(1, 3 * d)
    perm = jnp.concatenate([jnp.arange(0, d, 2), jnp.arange(1, d, 2)])
    wpos_b = pos_w[:, perm].reshape(heads, hd, d)
    sin_np, cos_np = _trig_tables_np(tp, d)
    sin_t, cos_t = jnp.asarray(sin_np), jnp.asarray(cos_np)

    kernel = functools.partial(
        _ffn_attn_kernel, eps=eps, scale=scale, t_real=t, heads=heads
    )

    u2, v2 = bias_u.reshape(1, d), bias_v.reshape(1, d)
    bo2 = bo.reshape(1, d)
    args = (
        lengths, x,
        ffn["norm_w"].reshape(1, d), ffn["norm_b"].reshape(1, d),
        ffn["fc1_w"], ffn["fc1_b"].reshape(1, f),
        ffn["fc2_w"], ffn["fc2_b"].reshape(1, d),
        attn_norm_w.reshape(1, d), attn_norm_b.reshape(1, d),
        wqkv, bqkv, u2, v2,
        wpos_b, sin_t, cos_t, wo, bo2,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[whole_block(a) for a in args[2:]],
        ],
        out_specs=pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((tp, d), _F32)],
        interpret=interpret,
    )(*args)
    return out[:, :t, :]


__all__ = ["fused_rel_attention", "fused_rel_attention_block", "fused_ffn_attention"]
