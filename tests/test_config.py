"""Config preset field checks (reference test_all.cpp:135-194, 242-271)."""

from parakeet_tpu import config as C


def test_110m_preset():
    cfg = C.make_110m_config()
    assert cfg.encoder.hidden_size == 512
    assert cfg.encoder.num_layers == 17
    assert cfg.encoder.num_heads == 8
    assert cfg.encoder.ffn_intermediate == 2048
    assert cfg.encoder.mel_bins == 80
    assert cfg.prediction.num_lstm_layers == 1
    assert cfg.joint.vocab_size == 1025
    assert cfg.durations == (0, 1, 2, 3, 4)
    assert cfg.ctc_vocab_size == 1025


def test_tdt_600m_preset():
    cfg = C.make_tdt_600m_config()
    assert cfg.encoder.mel_bins == 128
    assert cfg.encoder.hidden_size == 1024
    assert cfg.encoder.num_layers == 24
    assert cfg.prediction.vocab_size == 8193
    assert cfg.prediction.num_lstm_layers == 2
    assert cfg.joint.vocab_size == 8193


def test_rnnt_600m_preset():
    cfg = C.make_rnnt_600m_config()
    assert cfg.encoder.hidden_size == 1024
    assert cfg.prediction.vocab_size == 1025
    assert cfg.prediction.num_lstm_layers == 2


def test_eou_120m_preset():
    cfg = C.make_eou_120m_config()
    assert cfg.encoder.att_context_left == 70
    assert cfg.encoder.att_context_right == 1
    assert cfg.encoder.chunk_size == 20
    assert cfg.eou_token_id == 1024
    assert cfg.encoder.hidden_size == 512


def test_nemotron_latency_modes():
    for latency in (0, 1, 6, 13):
        cfg = C.make_nemotron_600m_config(latency)
        assert cfg.encoder.att_context_right == latency
        assert cfg.latency_frames == latency
        assert cfg.prediction.vocab_size == 8193


def test_sortformer_preset():
    cfg = C.make_sortformer_117m_config()
    assert cfg.nest_encoder.mel_bins == 128
    assert cfg.nest_encoder.xscaling is True
    assert cfg.nest_encoder.subsampling_activation == "relu"
    assert cfg.transformer.num_layers == 18
    assert cfg.transformer.pre_ln is False
    assert cfg.transformer.has_final_norm is False
    assert cfg.max_speakers == 4
    assert cfg.activity_threshold == 0.5


def test_configs_hashable():
    # Frozen dataclasses must be usable as jit static args.
    {C.make_110m_config(): 1, C.make_tdt_600m_config(): 2}


def test_audio_config_defaults():
    a = C.AudioConfig()
    assert (a.sample_rate, a.n_fft, a.win_length, a.hop_length) == (16000, 512, 400, 160)
    assert a.n_mels == 80 and a.normalize
