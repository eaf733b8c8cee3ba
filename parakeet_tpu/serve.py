"""Dynamic-batching transcription service.

The framework targets production serving; this is the serving seam the
C++ reference never had (its facade is strictly one-clip-at-a-time). A
single worker thread owns the device: concurrent callers `submit()`
audio, the worker coalesces whatever is queued (up to `max_batch`,
waiting at most `max_wait_ms` for stragglers) into ONE batched device
call — `transcribe_batch` with `pad_to_multiple` bucketing so the whole
workload reuses a bounded set of compiled programs.

Batching is semantically free here: batched inference is token-identical
to single-clip inference (masked normalization + length-masked encoder,
pinned by tests/test_parallel.py), so callers can't observe whether they
shared a batch.

    service = TranscriptionService(transcriber, max_batch=16)
    fut = service.submit("clip.wav")          # returns concurrent Future
    print(fut.result().text)
    service.close()
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field


@dataclass
class ServiceStats:
    requests: int = 0
    batches: int = 0
    errors: int = 0
    batch_sizes: list[int] = field(default_factory=list)

    @property
    def mean_batch(self) -> float:
        return sum(self.batch_sizes) / len(self.batch_sizes) if self.batch_sizes else 0.0


class TranscriptionService:
    """Thread-safe dynamic batcher over one Transcriber (one device).

    opts: a TranscribeOptions applied to every request — the decode
    configuration is per-service (uniform shapes/programs), not
    per-request; run one service per configuration.
    """

    def __init__(
        self,
        transcriber,
        *,
        max_batch: int = 16,
        max_wait_ms: float = 20.0,
        pad_to_multiple: int | None = 200,
        opts=None,
    ):
        self.tr = transcriber
        self.opts = opts
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.pad_to_multiple = pad_to_multiple
        self.stats = ServiceStats()
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True, name="parakeet-serve")
        self._worker.start()

    # ── Public API ───────────────────────────────────────────────────────

    def submit(self, source) -> Future:
        """Enqueue one clip (path / bytes / samples); resolves to a
        TranscribeResult."""
        if self._closed:
            raise RuntimeError("service is closed")
        fut: Future = Future()
        self.stats.requests += 1
        self._q.put((source, fut))
        return fut

    def transcribe(self, source):
        """Synchronous convenience wrapper."""
        return self.submit(source).result()

    def close(self, timeout: float | None = 30.0) -> None:
        """Stop accepting work, drain the queue, join the worker."""
        if self._closed:
            return
        self._closed = True
        self._q.put(None)  # sentinel: drain-then-exit
        self._worker.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ── Worker ───────────────────────────────────────────────────────────

    def _collect(self) -> tuple[list, bool]:
        """Block for the first item, then coalesce until max_batch or the
        wait budget runs out. Returns (batch, saw_sentinel)."""
        first = self._q.get()
        if first is None:
            return [], True
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                # grab anything already queued, but don't wait further
                try:
                    item = self._q.get_nowait()
                except queue.Empty:
                    break
            else:
                try:
                    item = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
            if item is None:
                return batch, True
            batch.append(item)
        return batch, False

    def _run(self) -> None:
        while True:
            batch, stop = self._collect()
            if batch:
                sources = [s for s, _ in batch]
                try:
                    results = self.tr.transcribe_batch(
                        sources, self.opts, pad_to_multiple=self.pad_to_multiple
                    )
                    for (_, fut), res in zip(batch, results):
                        fut.set_result(res)
                except Exception as e:  # noqa: BLE001 — fan the error out to callers
                    self.stats.errors += 1
                    for _, fut in batch:
                        if not fut.done():
                            fut.set_exception(e)
                self.stats.batches += 1
                self.stats.batch_sizes.append(len(batch))
            if stop:
                # drain whatever raced in after the sentinel
                try:
                    while True:
                        item = self._q.get_nowait()
                        if item is not None:
                            item[1].set_exception(RuntimeError("service closed"))
                except queue.Empty:
                    pass
                return


__all__ = ["TranscriptionService", "ServiceStats"]
