#!/usr/bin/env python
"""Live-streaming client for the parakeet-serve /stream endpoint.

Feeds a WAV file to the server in real-time-paced 160 ms chunks of raw
s16le PCM over one chunked-transfer POST — exactly what a microphone
client does — and prints the final transcript with token timestamps.

    parakeet-serve --streaming --random-weights --device cpu &   # or real weights
    python examples/stream_client.py clip.wav --host localhost --port 8077
    python examples/stream_client.py clip.wav --no-pace   # as fast as possible
"""

from __future__ import annotations

import argparse
import http.client
import json
import sys
import time

import numpy as np

try:
    import parakeet_tpu  # noqa: F401
except ModuleNotFoundError:  # source checkout: examples/ is sys.path[0]
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parakeet_tpu.audio.io import read_audio
from parakeet_tpu.decode.timestamp import FRAME_DURATION_S

CHUNK_SAMPLES = 2560  # 160 ms at 16 kHz (reference CLI cadence, main.cpp:400-417)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("audio")
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=8077)
    ap.add_argument("--no-pace", action="store_true",
                    help="send as fast as possible instead of real-time pacing")
    args = ap.parse_args(argv)

    audio = read_audio(args.audio, target_sample_rate=16000)
    pcm = (np.clip(audio.samples, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()

    step = CHUNK_SAMPLES * 2  # bytes per 160 ms chunk
    t0 = time.monotonic()

    def paced_chunks():
        for n, i in enumerate(range(0, len(pcm), step)):
            yield pcm[i : i + step]
            if not args.no_pace:
                # sleep until this chunk's real-time deadline
                target = (n + 1) * CHUNK_SAMPLES / 16000
                delay = t0 + target - time.monotonic()
                if delay > 0:
                    time.sleep(delay)

    conn = http.client.HTTPConnection(args.host, args.port, timeout=600)
    try:
        # stdlib does the chunked-transfer framing for a generator body
        conn.request("POST", "/stream", body=paced_chunks(),
                     headers={"Transfer-Encoding": "chunked"}, encode_chunked=True)
    except (BrokenPipeError, ConnectionError, OSError):
        # the server may reject mid-upload (e.g. 503 all slots busy) and
        # close the socket while we are still sending — fall through and
        # read whatever response it wrote
        pass

    resp = conn.getresponse()
    body = resp.read()
    if resp.status != 200:
        print(f"HTTP {resp.status}: {body[:200]!r}", file=sys.stderr)
        return 1
    payload = json.loads(body)
    print(payload["text"] if payload["text"] else f"(token ids) {payload['token_ids']}")
    for t in payload["tokens"]:
        print(f"  [{t['start_frame'] * FRAME_DURATION_S:6.2f}s - "
              f"{t['end_frame'] * FRAME_DURATION_S:6.2f}s] "
              f"({t['confidence']:.2f}) id={t['id']}")
    print(f"# streamed {audio.duration:.1f}s in {time.monotonic() - t0:.1f}s wall",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
