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

        t_win = timed(lambda: tr.transcribe_long_batch(clips, Decoder.TDT))
        row = {
            "seconds": dur, "clips": n_clips,
            "windows_per_clip": wins_per_clip,
            "windowed_s": round(t_win, 3),
            "windowed_rtfx": round(audio_s / t_win, 1),
        }
        if dur <= args.skip_dense_over:
            dense = lambda: tr._transcribe_batch_dense(  # noqa: E731
                clips, TranscribeOptions(Decoder.TDT, timestamps=True)
            )
            t_dense = timed(dense)
            row["dense_s"] = round(t_dense, 3)
            row["dense_rtfx"] = round(audio_s / t_dense, 1)
            row["speedup"] = round(t_dense / t_win, 2)
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
