"""Speaker-attributed transcription: DiarizedTranscriber.

Reference: src/diarize.cpp — run ASR with word timestamps, run Sortformer
on separately-computed features (128 mel, normalize=False —
diarize.cpp:81-89; the audio is intentionally preprocessed twice with
different configs), then assign each word the speaker with maximum total
temporal overlap (:10-48); no overlap → speaker −1.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from parakeet_tpu.audio.frontend import preprocess_audio
from parakeet_tpu.audio.io import read_audio
from parakeet_tpu.config import AudioConfig, SortformerConfig, TDTCTCConfig, make_110m_config, make_sortformer_117m_config
from parakeet_tpu.decode.timestamp import WordTimestamp
from parakeet_tpu.models.sortformer import DiarizationSegment, Sortformer
from parakeet_tpu.transcribe import Decoder, Transcriber


@dataclass
class DiarizedWord:
    word: str
    start: float
    end: float
    confidence: float = 1.0
    speaker_id: int = -1


@dataclass
class DiarizedResult:
    text: str = ""
    words: list[DiarizedWord] = field(default_factory=list)
    segments: list[DiarizationSegment] = field(default_factory=list)
    word_timestamps: list[WordTimestamp] = field(default_factory=list)


def diarize_transcription(
    words: list[WordTimestamp], segments: list[DiarizationSegment]
) -> list[DiarizedWord]:
    """Max-overlap speaker assignment (diarize.cpp:10-48)."""
    out: list[DiarizedWord] = []
    for w in words:
        overlap_by_speaker: dict[int, float] = {}
        for seg in segments:
            overlap = min(w.end, seg.end) - max(w.start, seg.start)
            if overlap > 0.0:
                overlap_by_speaker[seg.speaker_id] = (
                    overlap_by_speaker.get(seg.speaker_id, 0.0) + overlap
                )
        best_speaker, best_overlap = -1, 0.0
        for spk, ovl in overlap_by_speaker.items():
            if ovl > best_overlap:
                best_overlap, best_speaker = ovl, spk
        out.append(DiarizedWord(w.word, w.start, w.end, w.confidence, best_speaker))
    return out


class DiarizedTranscriber:
    """ASR + Sortformer fusion (diarize.hpp:20-74)."""

    def __init__(
        self,
        asr_weights: str | None = None,
        sortformer_weights: str | None = None,
        vocab_path: str | None = None,
        config: TDTCTCConfig | None = None,
        sf_config: SortformerConfig | None = None,
        *,
        asr_params: dict | None = None,
        sortformer_params: dict | None = None,
        compute_dtype: str = "float32",
    ):
        self.transcriber = Transcriber(
            asr_weights, vocab_path, config or make_110m_config(),
            params=asr_params, compute_dtype=compute_dtype,
        )
        self.sf_config = sf_config or make_sortformer_117m_config()
        self.sortformer = Sortformer(sortformer_weights, self.sf_config, params=sortformer_params)

    def to_gpu(self) -> None:
        """API-compatibility no-op (reference: move weights to Metal GPU).
        JAX places arrays on the default device (the TPU) automatically."""

    def _to_samples(self, source) -> np.ndarray:
        if isinstance(source, (str, bytes, bytearray)) or hasattr(source, "__fspath__"):
            return read_audio(source, 16000).samples
        arr = np.asarray(source)
        if arr.dtype == np.int16 or arr.ndim > 1:
            # int16 scaling + channel downmix — same raw-PCM hygiene as
            # transcribe.py's _to_samples (blind reshape would interleave
            # stereo and keep int16 at +/-32768 scale)
            return read_audio(arr, sample_rate=16000).samples
        return arr.astype(np.float32).reshape(-1)

    def transcribe(self, source, decoder: Decoder = Decoder.TDT) -> DiarizedResult:
        samples = self._to_samples(source)

        # 1. ASR with word timestamps
        asr = self.transcriber.transcribe(samples, decoder, timestamps=True)

        # 2. Sortformer on its own features: 128 mel, NO normalization
        sf_audio_cfg = AudioConfig(
            n_mels=self.sf_config.nest_encoder.mel_bins, normalize=False
        )
        sf_features = preprocess_audio(samples, sf_audio_cfg)
        segments = self.sortformer.diarize(sf_features)

        # 3. Fuse
        words = diarize_transcription(asr.word_timestamps, segments)
        return DiarizedResult(
            text=asr.text,
            words=words,
            segments=segments,
            word_timestamps=asr.word_timestamps,
        )

    def align(self, source, text: str, *,
              window_s: float | None = None,
              overlap_s: float = 10.0) -> DiarizedResult:
        """Speaker-attributed FORCED alignment: word timings for a KNOWN
        transcript (Transcriber.align / align_long), fused with Sortformer
        segments — diarized subtitles from a script, no decoding.

        window_s: set to align past the ~4-5 min dense-attention limit
        (align_long windowing); None = single dense pass."""
        samples = self._to_samples(source)
        if window_s is not None:
            asr = self.transcriber.align_long(
                samples, text, window_s=window_s, overlap_s=overlap_s)
        else:
            asr = self.transcriber.align(samples, text)

        sf_audio_cfg = AudioConfig(
            n_mels=self.sf_config.nest_encoder.mel_bins, normalize=False
        )
        segments = self.sortformer.diarize(preprocess_audio(samples, sf_audio_cfg))
        words = diarize_transcription(asr.word_timestamps, segments)
        return DiarizedResult(
            text=asr.text,
            words=words,
            segments=segments,
            word_timestamps=asr.word_timestamps,
        )


__all__ = ["DiarizedWord", "DiarizedResult", "diarize_transcription", "DiarizedTranscriber"]
