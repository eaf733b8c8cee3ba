"""parakeet-tpu: TPU-native speech recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Frikallo/parakeet.cpp (FastConformer encoder, CTC/RNNT/TDT decoders,
streaming, Sortformer diarization). Models are parameter pytrees + pure
apply functions; decode loops are jitted `lax.while_loop` state machines;
streaming state is fixed-shape so every latency mode compiles once.

Public surface mirrors the reference (include/parakeet/parakeet.hpp):
Transcriber, TDTTranscriber, StreamingTranscriber, NemotronTranscriber,
DiarizedTranscriber, Sortformer, Tokenizer, config presets.
"""

from parakeet_tpu.config import (
    AudioConfig,
    EncoderConfig,
    StreamingEncoderConfig,
    CTCConfig,
    PredictionConfig,
    JointConfig,
    RNNTConfig,
    TDTConfig,
    TDTCTCConfig,
    EOUConfig,
    NemotronConfig,
    TransformerConfig,
    SortformerConfig,
    make_110m_config,
    make_tdt_600m_config,
    make_rnnt_600m_config,
    make_eou_120m_config,
    make_nemotron_600m_config,
    make_sortformer_117m_config,
)
from parakeet_tpu.text.tokenizer import Tokenizer
from parakeet_tpu.transcribe import (
    Decoder,
    TranscribeOptions,
    TranscribeResult,
    Transcriber,
    TDTTranscriber,
    RNNTTranscriber,
)
from parakeet_tpu.streaming import (
    NemotronTranscriber,
    StreamingBatchTranscriber,
    StreamingTranscriber,
)
from parakeet_tpu.diarize import (
    DiarizedResult,
    DiarizedTranscriber,
    DiarizedWord,
    diarize_transcription,
)
from parakeet_tpu.models.sortformer import (
    AOSCCache,
    DiarizationSegment,
    Sortformer,
)
from parakeet_tpu.audio.io import (
    AudioData,
    detect_format_by_extension,
    detect_format_by_magic,
    get_audio_duration,
    read_audio,
    resample,
    write_wav,
)
from parakeet_tpu.audio.frontend import StreamingAudioPreprocessor, preprocess_audio
from parakeet_tpu.decode.phrase_boost import ContextTrie
from parakeet_tpu.text.ngram_lm import NgramLM, rescore_nbest
from parakeet_tpu.text.neural_lm import NeuralLM, NeuralLMConfig, train_neural_lm
from parakeet_tpu.audio.vad import VadConfig, vad_segments
from parakeet_tpu.quantize import quantize_params, quantized_fraction
from parakeet_tpu.decode.align import ctc_forced_align
from parakeet_tpu.decode.keyword import HotwordDetector, keyword_log_odds
from parakeet_tpu.serve import StreamingService, TranscriptionService
from parakeet_tpu.models.encoder import (
    set_conv_layout,
    set_fused_attention,
    set_fused_block2,
    set_fused_ffn,
)
from parakeet_tpu.data import ManifestDataset, TrainDataLoader
from parakeet_tpu.metrics import corpus_wer, word_error_rate
from parakeet_tpu.ops.transducer_loss import rnnt_loss, tdt_loss
from parakeet_tpu.decode.timestamp import (
    FRAME_DURATION_S,
    TimestampedToken,
    WordTimestamp,
    TimestampMode,
    frame_to_seconds,
    group_timestamps,
)

__version__ = "0.1.0"

__all__ = [
    "NgramLM",
    "HotwordDetector",
    "TranscriptionService",
    "StreamingService",
    "keyword_log_odds",
    "VadConfig",
    "quantize_params",
    "quantized_fraction",
    "ctc_forced_align",
    "vad_segments",
    "rescore_nbest",
    "NeuralLM",
    "NeuralLMConfig",
    "train_neural_lm",
    "AudioConfig",
    "EncoderConfig",
    "StreamingEncoderConfig",
    "CTCConfig",
    "PredictionConfig",
    "JointConfig",
    "RNNTConfig",
    "TDTConfig",
    "TDTCTCConfig",
    "EOUConfig",
    "NemotronConfig",
    "TransformerConfig",
    "SortformerConfig",
    "make_110m_config",
    "make_tdt_600m_config",
    "make_rnnt_600m_config",
    "make_eou_120m_config",
    "make_nemotron_600m_config",
    "make_sortformer_117m_config",
    "Tokenizer",
    "Decoder",
    "TranscribeOptions",
    "TranscribeResult",
    "Transcriber",
    "TDTTranscriber",
    "RNNTTranscriber",
    "StreamingTranscriber",
    "StreamingBatchTranscriber",
    "NemotronTranscriber",
    "DiarizedTranscriber",
    "DiarizedResult",
    "DiarizedWord",
    "diarize_transcription",
    "Sortformer",
    "AOSCCache",
    "DiarizationSegment",
    "AudioData",
    "read_audio",
    "resample",
    "write_wav",
    "get_audio_duration",
    "detect_format_by_extension",
    "detect_format_by_magic",
    "preprocess_audio",
    "StreamingAudioPreprocessor",
    "ContextTrie",
    "set_fused_attention",
    "set_conv_layout",
    "set_fused_ffn",
    "set_fused_block2",
    "word_error_rate",
    "corpus_wer",
    "ManifestDataset",
    "TrainDataLoader",
    "rnnt_loss",
    "tdt_loss",
    "FRAME_DURATION_S",
    "TimestampedToken",
    "WordTimestamp",
    "TimestampMode",
    "frame_to_seconds",
    "group_timestamps",
]
