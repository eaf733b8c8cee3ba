#!/usr/bin/env python
"""Minimal HTTP transcription server over TranscriptionService.

Stdlib-only (zero extra deps): POST audio bytes (wav/flac/mp3/ogg) to
/transcribe and get JSON back. Concurrent requests are dynamically
batched into single device calls by parakeet_tpu.serve.

    python examples/serve_http.py --weights models/model.safetensors \
        --vocab models/vocab.txt --port 8077 [--device cpu --random-weights]

    curl -s --data-binary @clip.wav localhost:8077/transcribe | jq .text
"""

from __future__ import annotations

import argparse
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="models/model.safetensors")
    ap.add_argument("--vocab", default="models/vocab.txt")
    ap.add_argument("--port", type=int, default=8077)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--max-wait-ms", type=float, default=25.0)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--device", default=None, choices=[None, "cpu"])
    ap.add_argument("--random-weights", action="store_true")
    args = ap.parse_args(argv)

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from parakeet_tpu.serve import TranscriptionService
    from parakeet_tpu.transcribe import Transcriber

    weights = None if args.random_weights else args.weights
    vocab = None if args.random_weights else args.vocab
    tr = Transcriber(weights, vocab, compute_dtype=args.dtype)
    service = TranscriptionService(
        tr, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms
    )

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 — BaseHTTPRequestHandler API
            if self.path.rstrip("/") != "/transcribe":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            try:
                res = service.submit(bytes(body)).result(timeout=600)
                payload = {
                    "text": res.text,
                    "token_ids": [int(t) for t in res.token_ids],
                }
                out = json.dumps(payload).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
            except Exception as e:  # noqa: BLE001
                self.send_error(400, explain=str(e))

        def do_GET(self):  # noqa: N802
            if self.path.rstrip("/") == "/stats":
                s = service.stats
                out = json.dumps(
                    {"requests": s.requests, "batches": s.batches,
                     "errors": s.errors, "mean_batch": s.mean_batch}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
            else:
                self.send_error(404)

        def log_message(self, fmt, *a):
            print("[serve]", fmt % a, file=sys.stderr)

    httpd = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"[serve] listening on :{args.port} (POST /transcribe, GET /stats)",
          file=sys.stderr)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
