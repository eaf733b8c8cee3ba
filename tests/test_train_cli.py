"""parakeet-train CLI: end-to-end smoke (manifest → steps → checkpoint →
export → Transcriber-loadable weights) plus argument validation."""

from __future__ import annotations

import json

import numpy as np
import pytest

from parakeet_tpu.audio.io import write_wav
from parakeet_tpu.train_cli import build_argparser, main


def write_corpus(tmp_path, n=4):
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n):
        p = tmp_path / f"c{i}.wav"
        write_wav(p, 0.1 * rng.randn(int(16000 * (0.3 + 0.1 * i))).astype(np.float32))
        lines.append(json.dumps({"audio_filepath": p.name, "text": "a b"}))
    m = tmp_path / "train.jsonl"
    m.write_text("\n".join(lines) + "\n")
    v = tmp_path / "vocab.txt"
    v.write_text("\n".join(["<unk>", "▁a", "▁b", "a", "b"]) + "\n")
    return m, v


def test_argparser_defaults():
    ap = build_argparser()
    args = ap.parse_args(["--manifest", "m.jsonl", "--vocab", "v.txt"])
    assert args.model == "110m" and args.loss is None
    assert args.batch_size == 8 and args.model_parallel == 1


def test_loss_head_validation(tmp_path):
    m, v = write_corpus(tmp_path)
    with pytest.raises(SystemExit):
        main(["--manifest", str(m), "--vocab", str(v), "--model", "rnnt-600m",
              "--loss", "hybrid", "--steps", "1"])


@pytest.mark.slow
def test_tiny_end_to_end(tmp_path):
    m, v = write_corpus(tmp_path)
    ck = tmp_path / "ck"
    out = tmp_path / "model.safetensors"
    rc = main([
        "--manifest", str(m), "--vocab", str(v), "--model", "tiny",
        "--batch-size", "2", "--data-parallel", "2", "--steps", "3", "--frame-multiple", "32",
        "--label-multiple", "8", "--checkpoint-dir", str(ck),
        "--checkpoint-every", "2", "--export", str(out), "--log-every", "1",
    ])
    assert rc == 0
    assert (ck / "state.safetensors").exists()  # single-file atomic layout (r3)
    assert out.exists()

    # resume continues from the saved step without error
    rc = main([
        "--manifest", str(m), "--vocab", str(v), "--model", "tiny",
        "--batch-size", "2", "--data-parallel", "2", "--steps", "4", "--frame-multiple", "32",
        "--label-multiple", "8", "--checkpoint-dir", str(ck), "--resume",
    ])
    assert rc == 0

    # exported weights load under the schema used for inference
    from parakeet_tpu import params as P
    from parakeet_tpu.train_cli import _fit_vocab, _preset, _spec_for
    from parakeet_tpu.text.tokenizer import Tokenizer

    cfg, kind, _ = _preset("tiny")
    cfg = _fit_vocab(cfg, kind, Tokenizer(v))
    loaded = P.load_params(_spec_for(cfg, kind), str(out), strict=True)
    assert "encoder_.layers_.0.ffn1_.fc1_.weight" in loaded


@pytest.mark.slow
def test_export_without_checkpoint_dir(tmp_path):
    """--export with no --checkpoint-dir must write the trained weights
    (review finding: save_safetensors args were swapped, crashing after
    training and losing the run)."""
    m, v = write_corpus(tmp_path)
    out = tmp_path / "direct.safetensors"
    rc = main([
        "--manifest", str(m), "--vocab", str(v), "--model", "tiny",
        "--batch-size", "2", "--data-parallel", "2", "--steps", "1",
        "--frame-multiple", "32", "--label-multiple", "8",
        "--export", str(out), "--log-every", "1",
    ])
    assert rc == 0 and out.exists()
    from parakeet_tpu.io.safetensors import load_safetensors

    weights = load_safetensors(out)
    assert any(k.startswith("encoder_") for k in weights)


def test_loader_rejects_dataset_smaller_than_batch(tmp_path):
    """A lone partial bucket would hit the sharded step with an indivisible
    batch dim; the loader must fail loudly at construction."""
    m, v = write_corpus(tmp_path, n=2)
    with pytest.raises(ValueError, match="smaller than"):
        main(["--manifest", str(m), "--vocab", str(v), "--model", "tiny",
              "--batch-size", "4", "--data-parallel", "2", "--steps", "1",
              "--frame-multiple", "32", "--label-multiple", "8"])


@pytest.mark.slow
def test_resume_actually_resumes(tmp_path, capsys):
    """--resume must load the single-file checkpoint (r3 review: the gate
    checked the legacy filename and silently restarted from step 0)."""
    m, v = write_corpus(tmp_path)
    ck = tmp_path / "ck2"
    base = ["--manifest", str(m), "--vocab", str(v), "--model", "tiny",
            "--batch-size", "2", "--data-parallel", "2", "--frame-multiple", "32",
            "--label-multiple", "8", "--checkpoint-dir", str(ck)]
    assert main(base + ["--steps", "2", "--checkpoint-every", "1"]) == 0
    capsys.readouterr()
    assert main(base + ["--steps", "3", "--resume"]) == 0
    err = capsys.readouterr().err
    assert "# resumed at step 2" in err, err


@pytest.mark.slow
def test_model_parallel_export_unpads_vocab(tmp_path):
    """mp=2 training pads an odd fitted vocab; --export must slice back to
    the reference schema so strict inference loading works."""
    m, v = write_corpus(tmp_path)
    # 6 pieces → fitted vocab 6+1=7 (odd) → padded to 8 under mp=2
    v.write_text("\n".join(["<unk>", "▁a", "▁b", "a", "b", "c"]) + "\n")
    out = tmp_path / "mp.safetensors"
    rc = main([
        "--manifest", str(m), "--vocab", str(v), "--model", "tiny",
        "--batch-size", "2", "--data-parallel", "2", "--model-parallel", "2",
        "--steps", "1", "--frame-multiple", "32", "--label-multiple", "8",
        "--export", str(out),
    ])
    assert rc == 0
    from parakeet_tpu.io.safetensors import load_safetensors

    weights = load_safetensors(out)
    assert weights["tdt_joint_.label_proj_.weight"].shape[0] == 7
    assert weights["prediction_.embed_.weight"].shape[0] == 7

    from parakeet_tpu import params as P
    from parakeet_tpu.train_cli import _fit_vocab, _preset, _spec_for
    from parakeet_tpu.text.tokenizer import Tokenizer

    cfg, kind, _ = _preset("tiny")
    cfg = _fit_vocab(cfg, kind, Tokenizer(v))
    P.load_params(_spec_for(cfg, kind), str(out), strict=True)


@pytest.mark.slow
def test_pipeline_parallel_end_to_end(tmp_path, capsys):
    """--pipeline-parallel 2: GPipe trainer runs, checkpoints stay
    reference-schema-flat (pp {layers, rest} state merged on save), resume
    re-splits, and --export is Transcriber-schema weights."""
    m, v = write_corpus(tmp_path)
    ck = tmp_path / "ck_pp"
    out = tmp_path / "pp.safetensors"
    base = ["--manifest", str(m), "--vocab", str(v), "--model", "tiny",
            "--batch-size", "4", "--data-parallel", "2", "--pipeline-parallel", "2",
            "--micro-batches", "2", "--frame-multiple", "32", "--label-multiple", "8",
            "--checkpoint-dir", str(ck)]
    assert main(base + ["--steps", "2", "--checkpoint-every", "1",
                        "--export", str(out)]) == 0
    assert out.exists()

    from parakeet_tpu.io.safetensors import load_safetensors

    blob = load_safetensors(ck / "state.safetensors")
    assert any(k.startswith("encoder_.layers_.0.") for k in blob)  # schema-flat
    assert not any(k.startswith("layers") or k.startswith("rest") for k in blob)

    capsys.readouterr()
    assert main(base + ["--steps", "3", "--resume"]) == 0
    assert "# resumed at step 2" in capsys.readouterr().err

    # exported weights are reference-schema (per-layer keys restored)
    weights = load_safetensors(out)
    assert any(k.startswith("encoder_.layers_.1.") for k in weights)


def test_pipeline_parallel_arg_guards(tmp_path):
    m, v = write_corpus(tmp_path)
    with pytest.raises(SystemExit, match="data parallelism only"):
        main(["--manifest", str(m), "--vocab", str(v), "--model", "tiny",
              "--batch-size", "2", "--pipeline-parallel", "2",
              "--model-parallel", "2", "--steps", "1"])
    with pytest.raises(SystemExit, match="micro-batches"):
        main(["--manifest", str(m), "--vocab", str(v), "--model", "tiny",
              "--batch-size", "2", "--data-parallel", "2",
              "--pipeline-parallel", "2", "--micro-batches", "3", "--steps", "1",
              "--frame-multiple", "32", "--label-multiple", "8"])


def test_pipeline_parallel_rejects_memory_flags(tmp_path):
    """--remat/--accum-steps must not be silently dropped with
    --pipeline-parallel (the GPipe trainer has its own levers)."""
    m, v = write_corpus(tmp_path)
    base = ["--manifest", str(m), "--vocab", str(v), "--model", "tiny",
            "--batch-size", "4", "--data-parallel", "2", "--pipeline-parallel", "2",
            "--micro-batches", "2", "--steps", "1",
            "--frame-multiple", "32", "--label-multiple", "8"]
    with pytest.raises(SystemExit, match="don't apply"):
        main(base + ["--remat"])
    with pytest.raises(SystemExit, match="don't apply"):
        main(base + ["--accum-steps", "2"])
