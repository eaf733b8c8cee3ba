"""Training data pipeline tests: manifest parsing, bucketing, shape
quantization, prefetch, and a train step consuming real loader batches."""

from __future__ import annotations

import json

import numpy as np
import pytest

from parakeet_tpu.audio.io import write_wav
from parakeet_tpu.config import AudioConfig
from parakeet_tpu.data import ManifestDataset, TrainDataLoader
from parakeet_tpu.text.tokenizer import Tokenizer


def make_tokenizer():
    t = Tokenizer()
    # ▁-prefixed word pieces + characters (greedy longest-match covers "a b c")
    t.load_pieces(["<unk>", "▁a", "▁b", "▁c", "▁", "a", "b", "c", "d"])
    return t


def write_corpus(tmp_path, durations_s, texts, rate=16000):
    rng = np.random.RandomState(0)
    lines = []
    for i, (dur, text) in enumerate(zip(durations_s, texts)):
        p = tmp_path / f"clip{i}.wav"
        write_wav(p, 0.1 * rng.randn(int(dur * rate)).astype(np.float32), rate)
        entry = {"audio_filepath": p.name, "text": text}
        if i % 2 == 0:  # half the entries carry a duration, half get probed
            entry["duration"] = dur
        lines.append(json.dumps(entry))
    mpath = tmp_path / "manifest.jsonl"
    mpath.write_text("\n".join(lines) + "\n")
    return mpath


def test_manifest_parsing_and_duration_probe(tmp_path):
    m = write_corpus(tmp_path, [0.5, 1.0, 0.25, 0.75], ["a b", "b c", "c", "a"])
    ds = ManifestDataset(m)
    assert len(ds) == 4
    # relative paths resolved against the manifest directory
    assert ds[0]["audio_filepath"].startswith(str(tmp_path))
    # entry 1 has no "duration" → probed from the WAV header
    assert abs(ds.duration(1) - 1.0) < 1e-3
    assert abs(ds.duration(2) - 0.25) < 1e-3


def test_manifest_rejects_bad_entries(tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"audio_filepath": "x.wav"}\n')
    with pytest.raises(ValueError, match="text"):
        ManifestDataset(p)
    p.write_text("not json\n")
    with pytest.raises(ValueError, match="invalid JSON"):
        ManifestDataset(p)
    p.write_text("\n")
    with pytest.raises(ValueError, match="empty"):
        ManifestDataset(p)


def test_loader_buckets_by_duration_and_quantizes_shapes(tmp_path):
    durs = [1.2, 0.3, 0.9, 0.35, 1.1, 0.4]
    m = write_corpus(tmp_path, durs, ["a b c", "a", "b c", "c", "a b", "b"])
    ds = ManifestDataset(m)
    dl = TrainDataLoader(
        ds, make_tokenizer(), batch_size=2, frame_multiple=32, label_multiple=8,
        shuffle=False, prefetch=1,
    )
    assert len(dl) == 3
    batches = list(dl)
    assert len(batches) == 3
    # duration-sorted bucketing: batch i max mel_length is non-decreasing
    maxes = [int(b["mel_lengths"].max()) for b in batches]
    assert maxes == sorted(maxes)
    for b in batches:
        assert b["features"].shape[0] == 2
        assert b["features"].shape[1] % 32 == 0
        assert b["features"].shape[1] >= int(b["mel_lengths"].max())
        assert b["labels"].shape[1] % 8 == 0
        assert (b["label_lengths"] <= b["labels"].shape[1]).all()
        # short/long pairs stay together: padding waste bounded
        assert b["features"].shape[1] - int(b["mel_lengths"].min()) < 160


def test_loader_tokenizes_transcripts(tmp_path):
    m = write_corpus(tmp_path, [0.3, 0.3], ["a b", "c"])
    ds = ManifestDataset(m)
    tok = make_tokenizer()
    dl = TrainDataLoader(ds, tok, batch_size=2, shuffle=False, label_multiple=4)
    (batch,) = list(dl)
    # rows are duration-sorted and both clips are equal length; check the set
    wants = {tuple(tok.encode("a b")), tuple(tok.encode("c"))}
    gots = {
        tuple(batch["labels"][r][: int(batch["label_lengths"][r])]) for r in range(2)
    }
    assert gots == wants


def test_loader_epoch_shuffle_determinism(tmp_path):
    durs = [0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]
    m = write_corpus(tmp_path, durs, ["a"] * 8)
    ds = ManifestDataset(m)
    dl1 = TrainDataLoader(ds, make_tokenizer(), batch_size=2, seed=7)
    dl2 = TrainDataLoader(ds, make_tokenizer(), batch_size=2, seed=7)
    e1 = [b["mel_lengths"].tolist() for b in dl1]
    e2 = [b["mel_lengths"].tolist() for b in dl2]
    assert e1 == e2  # same seed, same epoch → same order
    e1b = [b["mel_lengths"].tolist() for b in dl1]  # second epoch reshuffles
    assert sorted(map(tuple, e1b)) == sorted(map(tuple, e1))


def test_loader_propagates_producer_errors(tmp_path):
    m = write_corpus(tmp_path, [0.3, 0.3], ["a", "b"])
    ds = ManifestDataset(m)
    ds.entries[0]["audio_filepath"] = str(tmp_path / "missing.wav")
    dl = TrainDataLoader(ds, make_tokenizer(), batch_size=2, shuffle=False)
    with pytest.raises(FileNotFoundError):
        list(dl)


def test_train_step_consumes_loader_batches(tmp_path):
    import optax

    from parakeet_tpu import config as C
    from parakeet_tpu import params as P
    from parakeet_tpu.train import make_train_step

    m = write_corpus(tmp_path, [0.4, 0.5, 0.45, 0.55], ["a b", "b c", "c", "a"])
    ds = ManifestDataset(m)
    tok = make_tokenizer()
    cfg = C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                                num_layers=1, num_heads=2, ffn_intermediate=32),
        prediction=C.PredictionConfig(vocab_size=tok.vocab_size() + 1, pred_hidden=8,
                                      num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8,
                            vocab_size=tok.vocab_size() + 1),
        ctc_vocab_size=tok.vocab_size() + 1,
    )
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=0)
    opt = optax.adam(1e-3)
    step = make_train_step(cfg, opt)
    opt_state = opt.init(params)
    dl = TrainDataLoader(ds, tok, batch_size=2, frame_multiple=64, label_multiple=8,
                         shuffle=False)
    n = 0
    for batch in dl:
        params, opt_state, loss = step(params, opt_state, batch)
        assert np.isfinite(float(loss))
        n += 1
    assert n == 2


def test_spec_augment_masks_inside_valid_frames():
    from parakeet_tpu.augment import SpecAugmentConfig, spec_augment

    rng = np.random.RandomState(0)
    feats = np.ones((2, 50, 16), np.float32)
    lens = np.array([30, 50], np.int32)
    out = spec_augment(rng, feats, lens,
                       SpecAugmentConfig(freq_masks=2, freq_width=4,
                                         time_masks=4, time_width=0.2))
    assert out.shape == feats.shape
    # input untouched (copy semantics)
    assert feats.min() == 1.0
    # something was masked, and only zeros appear
    assert (out == 0.0).any()
    assert set(np.unique(out)) <= {0.0, 1.0}
    # clip 0's padding region (frames >= 30) is untouched
    assert (out[0, 30:] == 1.0).all()


def test_spec_augment_deterministic_and_bounded():
    from parakeet_tpu.augment import SpecAugmentConfig, spec_augment

    cfg = SpecAugmentConfig(freq_masks=2, freq_width=5, time_masks=3, time_width=0.1)
    feats = np.ones((1, 100, 20), np.float32)
    lens = np.array([100], np.int32)
    a = spec_augment(np.random.RandomState(7), feats, lens, cfg)
    b = spec_augment(np.random.RandomState(7), feats, lens, cfg)
    np.testing.assert_array_equal(a, b)
    # bounds: at most freq_masks*freq_width bins fully zeroed across freq,
    # at most time_masks*ceil(0.1*100) frames fully zeroed across time
    zero_bins = int((a[0] == 0).all(axis=0).sum())
    zero_frames = int((a[0] == 0).all(axis=1).sum())
    assert zero_bins <= 2 * 5
    assert zero_frames <= 3 * 10


def test_loader_spec_augment_wiring(tmp_path):
    """spec_augment=True zeroes some cells; default leaves features alone."""
    import json

    from parakeet_tpu.audio.io import write_wav
    from parakeet_tpu.config import AudioConfig
    from parakeet_tpu.data import ManifestDataset, TrainDataLoader
    from parakeet_tpu.text.tokenizer import Tokenizer

    rng = np.random.RandomState(0)
    lines = []
    for i in range(2):
        p = tmp_path / f"c{i}.wav"
        write_wav(p, 0.1 * rng.randn(16000).astype(np.float32))
        lines.append(json.dumps({"audio_filepath": p.name, "text": "a"}))
    m = tmp_path / "m.jsonl"
    m.write_text("\n".join(lines) + "\n")
    v = tmp_path / "v.txt"
    v.write_text("\n".join(["<unk>", "▁a", "a"]) + "\n")

    def batch_with(**kw):
        loader = TrainDataLoader(
            ManifestDataset(m), Tokenizer(v), batch_size=2,
            audio_config=AudioConfig(), frame_multiple=32, label_multiple=8,
            shuffle=False, **kw,
        )
        return next(iter(loader))

    plain = batch_with()
    aug = batch_with(spec_augment=True)
    assert (aug["features"] == 0.0).sum() > (plain["features"] == 0.0).sum()
