#!/usr/bin/env python
"""Minimal HTTP transcription server — thin shim over the packaged
server (parakeet_tpu/serve_http.py; also installed as `parakeet-serve`).

    python examples/serve_http.py --weights models/model.safetensors \
        --vocab models/vocab.txt --port 8077 [--device cpu --random-weights]

    curl -s --data-binary @clip.wav localhost:8077/transcribe | jq .text
    # live streaming (raw s16le 16 kHz PCM, fed as it uploads):
    curl -s -H 'Transfer-Encoding: chunked' --data-binary @clip.pcm \
        localhost:8077/stream | jq .text     # needs --streaming
"""

import sys
from pathlib import Path

try:
    import parakeet_tpu  # noqa: F401
except ModuleNotFoundError:  # source checkout: examples/ is sys.path[0]
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parakeet_tpu.serve_http import main

if __name__ == "__main__":
    sys.exit(main())
