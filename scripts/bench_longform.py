#!/usr/bin/env python
"""Long-clip throughput: dense decode vs windowed routing (VERDICT r4 #3).

Dense attention cost grows with T² — the encoder matrix shows 110m
collapsing from 34.9k RTFx at the 10 s knee to 16.3k at 60 s. The facade
now auto-routes clips past `long_threshold_s` through
transcribe_long_batch (10 s windows, 2 s overlap, windows batched ACROSS
clips at the B=192 knee). This measures both arms end to end through the
PUBLIC facade on the real TPU — audio in, merged tokens out, every host
round trip and the overlap windows charged against the audio seconds.

Both arms feed the same int16 clips (halves the dev tunnel's upload cost,
which a co-located production host would not pay; it is identical between
arms either way).

Run: python scripts/bench_longform.py [--durations 30 60 300]
     [--total-windows 192] [--passes 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

try:
    import parakeet_tpu  # noqa: F401
except ModuleNotFoundError:  # source checkout: scripts/ is sys.path[0]
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def _window_starts(n_samples: int, win: int, hop: int, sr: int) -> list[int]:
    """Transcriber._long_window_starts, replicated for the device-resident
    arm (same sliver rule)."""
    starts: list[int] = []
    for s0 in range(0, n_samples, hop):
        if (n_samples - s0 < sr // 4 and starts
                and starts[-1] + win >= n_samples):
            break
        starts.append(s0)
        if s0 + win >= n_samples:
            break
    return starts


def bench_device_resident(tr, dur: int, window_s: float, overlap_s: float,
                          total_windows: int, dtype: str, iters: int,
                          passes: int, skip_dense_over: int) -> dict:
    """The co-located-host number (VERDICT r4 #3): clips uploaded ONCE,
    windows gathered ON DEVICE inside the jitted program, frontend +
    encoder + full TDT decode over the cross-clip window batch, one
    scalar fetch per K chained iterations — the same honesty rules as
    bench.py run_e2e (the dev tunnel's ~20 MB/s upload is excluded; the
    facade arm above charges it and is tunnel-dominated: ~4.6 s of upload
    vs ~1 s of compute at 60 s). The host-side overlap-merge is timed
    separately through the REAL facade merge (tr._merge_long_results on
    token streams of measured density) and charged against the audio.

    Dense comparator: the same pipeline with the whole clips as the
    batch — the honest dense e2e at this duration."""
    import jax
    import jax.numpy as jnp

    root = str(Path(__file__).resolve().parent.parent)
    if root not in sys.path:
        sys.path.insert(0, root)  # bench.py lives at the repo root
    import bench as B
    from parakeet_tpu.decode.timestamp import TimestampedToken
    from parakeet_tpu.transcribe import TimestampMode, TranscribeResult

    sr = 16000
    win = int(window_s * sr)
    hop = int((window_s - overlap_s) * sr)
    # clamp the trailing start so every window is FULL length (the facade
    # instead decodes a short last window through its padded batch path;
    # here all windows share one static shape — the extra trailing overlap
    # is handled by the same merge-ownership rule and is charged honestly)
    starts = [min(s0, max(0, dur * sr - win))
              for s0 in _window_starts(dur * sr, win, hop, sr)]
    wins_per_clip = len(starts)
    n_clips = max(1, total_windows // wins_per_clip)
    n_wins = n_clips * wins_per_clip
    audio_s = n_clips * dur

    shim = argparse.Namespace(dtype=dtype, e2e_quantize_decoder=None,
                              e2e_unroll=1)
    # blank bias 2.20: the r5 on-device search result at B=192/10 s
    # (~3.5 tokens/s emission density); reused so every arm decodes the
    # same realistic token load without re-searching
    st = B._e2e_setup(shim, n_wins, int(window_s), blank_bias=2.20)

    rng = np.random.RandomState(dur)
    clips = jnp.asarray((0.1 * rng.randn(n_clips, dur * sr)).astype(np.float32))

    def winpipe(p, cl, acc):
        for _ in range(iters):
            cl2 = cl + (acc * 1e-12).astype(cl.dtype)
            wins = jnp.concatenate(
                [cl2[:, s0 : s0 + win] for s0 in starts], axis=0
            )  # (n_clips·wins_per_clip, win) — clip-major per window index
            outs = st.pipeline(p, wins)
            acc = jnp.sum(outs[4]).astype(jnp.float32) + jnp.sum(outs[3])
        return acc

    winpipe = jax.jit(winpipe)
    zero = jnp.zeros((), jnp.float32)

    t0 = time.perf_counter()
    float(winpipe(st.params, clips, zero))
    print(f"# devres {dur}s windowed compile+warmup: "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    dev = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        float(winpipe(st.params, clips, zero))
        dev = min(dev, (time.perf_counter() - t0) / iters)

    # Host merge cost through the REAL facade merge: token streams at the
    # measured ~3.5 tok/s density, word-grouped and overlap-merged per clip
    tok_per_win = max(1, int(3.5 * window_s))
    results = []
    for wi in range(wins_per_clip):
        toks = [
            TimestampedToken(100 + j, j * 2, j * 2 + 1, 0.9)
            for j in range(tok_per_win)
        ]
        results.append(TranscribeResult(timestamped_tokens=toks))
    t0 = time.perf_counter()
    for _ in range(n_clips):
        tr._merge_long_results(dur * sr, starts, results, win, window_s,
                               overlap_s, TimestampMode.WORDS)
    merge = time.perf_counter() - t0

    row = {
        "seconds": dur, "clips": n_clips, "windows_per_clip": wins_per_clip,
        "devres_windowed_device_s": round(dev, 3),
        "devres_merge_s": round(merge, 4),
        "devres_windowed_rtfx": round(audio_s / (dev + merge), 1),
    }

    if dur <= skip_dense_over:
        std = B._e2e_setup(shim, n_clips, dur, blank_bias=2.20)

        def densepipe(p, cl, acc):
            for _ in range(iters):
                outs = std.pipeline(p, cl + (acc * 1e-12).astype(cl.dtype))
                acc = jnp.sum(outs[4]).astype(jnp.float32) + jnp.sum(outs[3])
            return acc

        densepipe = jax.jit(densepipe)
        t0 = time.perf_counter()
        float(densepipe(std.params, clips, zero))
        print(f"# devres {dur}s dense compile+warmup: "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        dense = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            float(densepipe(std.params, clips, zero))
            dense = min(dense, (time.perf_counter() - t0) / iters)
        row["devres_dense_device_s"] = round(dense, 3)
        row["devres_dense_rtfx"] = round(audio_s / dense, 1)
        row["devres_speedup"] = round(dense / (dev + merge), 2)
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--durations", type=int, nargs="+", default=[30, 60, 300])
    ap.add_argument("--total-windows", type=int, default=192,
                    help="clips per run are sized so the windowed arm fills "
                         "roughly this many 10 s windows (the batch knee)")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--window-s", type=float, default=10.0)
    ap.add_argument("--overlap-s", type=float, default=2.0)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip-dense-over", type=int, default=120,
                    help="skip the dense arm past this duration (the dense "
                         "300 s program is memory/compile-hostile; that IS "
                         "the point of windowing)")
    ap.add_argument("--device-resident", action="store_true",
                    help="add the co-located-host arms: clips uploaded once, "
                         "windows gathered on device, dev-tunnel upload "
                         "excluded (bench.py run_e2e methodology)")
    ap.add_argument("--no-facade", action="store_true",
                    help="skip the facade arms (tunnel-dominated on this "
                         "dev relay; use with --device-resident)")
    ap.add_argument("--iters", type=int, default=3,
                    help="chained on-device iterations (device-resident arms)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from parakeet_tpu import config as C
    from parakeet_tpu.models.encoder import set_fused_attention
    from parakeet_tpu.transcribe import Decoder, Transcriber, TranscribeOptions

    set_fused_attention("block4hp")
    cfg = C.make_110m_config()
    tr = Transcriber(None, None, cfg, seed=0, compute_dtype=args.dtype,
                     long_window_s=args.window_s, long_overlap_s=args.overlap_s)

    hop_s = args.window_s - args.overlap_s
    rows = []
    for dur in args.durations:
        wins_per_clip = max(1, int(np.ceil((dur - args.window_s) / hop_s)) + 1)
        n_clips = max(1, args.total_windows // wins_per_clip)
        rng = np.random.RandomState(dur)
        clips = [
            (rng.randn(dur * 16000) * 3000).clip(-32768, 32767).astype(np.int16)
            for _ in range(n_clips)
        ]
        audio_s = n_clips * dur

        def timed(fn):
            fn()  # compile + warm
            best = float("inf")
            for _ in range(args.passes):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return best

        row = {
            "seconds": dur, "clips": n_clips,
            "windows_per_clip": wins_per_clip,
        }
        if not args.no_facade:
            t_win = timed(lambda: tr.transcribe_long_batch(clips, Decoder.TDT))
            row["windowed_s"] = round(t_win, 3)
            row["windowed_rtfx"] = round(audio_s / t_win, 1)
            if dur <= args.skip_dense_over:
                dense = lambda: tr._transcribe_batch_dense(  # noqa: E731
                    clips, TranscribeOptions(Decoder.TDT, timestamps=True)
                )
                t_dense = timed(dense)
                row["dense_s"] = round(t_dense, 3)
                row["dense_rtfx"] = round(audio_s / t_dense, 1)
                row["speedup"] = round(t_dense / t_win, 2)
        if args.device_resident:
            row.update(bench_device_resident(
                tr, dur, args.window_s, args.overlap_s, args.total_windows,
                args.dtype, args.iters, args.passes, args.skip_dense_over,
            ))
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"rows": rows, "window_s": args.window_s,
                       "overlap_s": args.overlap_s, "dtype": args.dtype}, f,
                      indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
