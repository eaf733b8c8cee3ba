#!/usr/bin/env python
"""One-command rehearsal of the real-weight acceptance gate.

The reference's acceptance bar is (a) asset-gated golden transcripts
(tests/test_all.cpp:878-937 "portrait"/"phoebe" substrings), (b) WER within
0.1 abs of NeMo on a manifest, and (c) stage-by-stage dump parity
(scripts/compare_encoder.py:23-354). No real weights exist in this
environment, so this script rehearses the ENTIRE path on a pseudo-real
checkpoint so that the day real artifacts land, the same command runs
unchanged against them:

    # hermetic rehearsal (fabricates checkpoint + vocab + clip, runs on CPU)
    python scripts/acceptance.py

    # the real thing, when assets exist
    python scripts/acceptance.py --weights models/model.safetensors \
        --vocab models/vocab.txt --clip models/2086-149220-0033.wav \
        [--ref-dumps models/] [--expect-substring portrait] [--device tpu]

Pipeline (every step is the real production code path, not a test shim):
  1. fabricate a NeMo-named torch checkpoint (fan-in-scaled init so the
     full-size 110m forward is numerically sane) + tokenizer.vocab, pack
     them into a .nemo tar                                 [hermetic only]
  2. tools.convert.extract_vocab + convert  → model.safetensors, vocab.txt
  3. Transcriber loads the CONVERTED weights; transcribes the clip with
     both heads (CTC + TDT)
  4. independent torch oracle (torch.stft mel → tools.torch_ref encoder →
     torch argmax-CTC / scalar transducer decode → Tokenizer) → reference
     transcripts
  5. gate: WER(ours vs oracle) ≤ --wer-gate per head (BASELINE.md's
     0.1-abs bar; observed 0.0 — the decoders agree token-exactly)
  6. fabricate reference-LAYOUT debug dumps (debug_*.bin, NCHW f32) from
     the torch side and run scripts/dump_stages.py --compare-ref against
     them, gating per-stage max-abs-diff
  7. scripts/eval_wer.py over a manifest of oracle transcripts (subprocess
     — the exact command the real WER gate will use), gate the printed WER
"""

from __future__ import annotations

import argparse
import json
import math
import re
import subprocess
import sys
import tarfile
import tempfile
import wave
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# per-stage max-abs-diff gates for step 6. Features use the measured
# torch.stft-vs-XLA bound (tests/test_frontend.py:138-140, ~6e-3); later
# stages compound BOTH implementation noise and the feature delta through
# 17 f32 layers — the gate is meant to catch layout/semantic errors (O(1)
# diffs), not to re-prove bit parity (the per-op oracle tests do that).
STAGE_TOL = {
    "features": 2e-2,
    "after_conv1": 2e-2,
    "after_block1": 2e-2,
    "after_block2": 2e-2,
    "subsampling_out": 2e-2,
    "layer0": 5e-2,
}


def write_clip(path: Path, seconds: float = 5.0, sr: int = 16000, seed: int = 3) -> None:
    """Deterministic synthetic speech-band clip (AM tone mixture + noise)."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = (
        0.30 * np.sin(2 * np.pi * 220 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
        + 0.20 * np.sin(2 * np.pi * 700 * t + 1.0) * (t % 1.0 < 0.6)
        + 0.10 * np.sin(2 * np.pi * 1800 * t)
        + 0.03 * rng.randn(t.size)
    ).astype(np.float32)
    pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def pseudo_real_state_dict(cfg, seed: int = 0) -> dict[str, np.ndarray]:
    """NeMo-named full-size state dict with trained-network-like scaling.

    tests/test_convert.synthetic_nemo_110m provides the key/shape census;
    raw randn weights through 17 layers overflow, so rescale: matrices get
    fan-in scaling, norms sit near identity, biases/statistics stay small.
    """
    from tests.test_convert import synthetic_nemo_110m

    sd = synthetic_nemo_110m(cfg, seed=seed)
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("preprocessor.") or "running_var" in k:
            out[k] = v if k.startswith("preprocessor.") else 1.0 + 0.1 * np.abs(v)
        elif "running_mean" in k:
            out[k] = 0.05 * v
        elif ("norm" in k or "batch_norm" in k) and v.ndim == 1:
            out[k] = 1.0 + 0.02 * v if k.endswith("weight") else 0.02 * v
        elif k.endswith(".bias"):
            out[k] = 0.02 * v
        elif "pos_bias" in k:
            out[k] = 0.05 * v
        elif k.endswith("embed.weight"):
            out[k] = 0.1 * v
        elif v.ndim >= 2:
            out[k] = v / math.sqrt(float(np.prod(v.shape[1:])))
        else:
            out[k] = v
    return {k: np.ascontiguousarray(v, np.float32) for k, v in out.items()}


def fabricate_assets(workdir: Path, seed: int = 0) -> tuple[Path, Path, Path]:
    """Steps 1-2: pseudo-real .nemo → converted model.safetensors + vocab."""
    import torch

    from parakeet_tpu import config as C
    from parakeet_tpu.tools.convert import convert, extract_vocab

    cfg = C.make_110m_config()
    sd = pseudo_real_state_dict(cfg, seed=seed)
    ckpt = workdir / "model_weights.ckpt"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)

    # 1024 text pieces (ids 0..1023); id 1024 is blank and never decodes
    pieces = []
    for i in range(1024):
        stem = f"{'aeiou'[i % 5]}{'bcdfghjklmnpqrstvwz'[i % 19]}{i % 97:02d}"
        pieces.append(("▁" if i % 3 != 2 else "") + stem)
    vocab_src = workdir / "tokenizer.vocab"
    vocab_src.write_text("\n".join(f"{p}\t{-float(i)}" for i, p in enumerate(pieces)) + "\n")

    nemo = workdir / "pseudo_110m.nemo"
    with tarfile.open(nemo, "w") as tar:
        tar.add(ckpt, arcname="model_weights.ckpt")
        tar.add(vocab_src, arcname="tokenizer.vocab")

    weights = workdir / "model.safetensors"
    vocab = workdir / "vocab.txt"
    n = extract_vocab(nemo, vocab)
    print(f"[acceptance] extract_vocab: {n} pieces")
    convert(nemo, weights, "110m-tdt-ctc", verbose=True)

    clip = workdir / "clip.wav"
    write_clip(clip)
    return weights, vocab, clip


# ─── Independent torch oracle (step 4) ──────────────────────────────────────


def oracle_mel(samples: np.ndarray) -> np.ndarray:
    """torch.stft mel frontend (the tests/test_frontend.py:112 recipe) —
    independent of audio/frontend.py's windowed-DFT conv. (1, T, 80) f32."""
    import torch

    from parakeet_tpu.audio.frontend import LOG_GUARD, mel_filterbank
    from parakeet_tpu.config import AudioConfig

    cfg = AudioConfig()
    pre = samples.copy()
    pre[1:] = samples[1:] - 0.97 * samples[:-1]  # frontend._preemphasis coeff
    win = torch.hann_window(cfg.win_length, periodic=False)
    spec = torch.stft(
        torch.from_numpy(pre), cfg.n_fft, cfg.hop_length, cfg.win_length,
        window=win, center=True, pad_mode="reflect", return_complex=True,
    )
    power = (spec.real ** 2 + spec.imag ** 2).numpy()  # (freq, T)
    fb = mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, float(cfg.sample_rate), 0.0,
                        cfg.sample_rate / 2.0)
    log_mel = np.log(fb.T @ power + LOG_GUARD)  # (80, T)
    mean = log_mel.mean(axis=1, keepdims=True)
    centered = log_mel - mean
    var = (centered ** 2).sum(axis=1, keepdims=True) / (log_mel.shape[1] - 1)
    return ((centered / (np.sqrt(var) + 1e-5)).T[None]).astype(np.float32)


def run_torch_oracle(weights: Path, vocab: Path, clip: Path, dump_dir: Path):
    """Full independent pipeline to transcripts + reference-format dumps."""
    import torch
    import torch.nn.functional as TF

    from parakeet_tpu import config as C
    from parakeet_tpu.audio.io import read_audio
    from parakeet_tpu.io.safetensors import load_safetensors
    from parakeet_tpu.models import encoder as E
    from parakeet_tpu.text.tokenizer import Tokenizer
    from parakeet_tpu.tools.torch_ref import (
        t,
        to_torch_params,
        torch_attention,
        torch_conv_module,
        torch_ffn,
        torch_subsampling,
        torch_transducer_greedy_decode,
    )

    cfg = C.make_110m_config()
    tp = to_torch_params(load_safetensors(weights))
    tok = Tokenizer(vocab)

    samples = np.asarray(read_audio(str(clip)).samples, np.float32)
    feats = oracle_mel(samples)  # (1, T, 80)
    dump_dir.mkdir(parents=True, exist_ok=True)
    feats.astype("<f4").ravel().tofile(dump_dir / "debug_features_cpp.bin")

    with torch.no_grad():
        h, conv_stages = torch_subsampling(
            tp, torch.from_numpy(feats), return_stages=True
        )
        for ours_name, ref_name in (
            ("after_conv1", "debug_after_conv1.bin"),
            ("after_block1", "debug_after_block1.bin"),
            ("after_block2", "debug_after_block2.bin"),
        ):
            conv_stages[ours_name].numpy().astype("<f4").ravel().tofile(dump_dir / ref_name)
        h.numpy().astype("<f4").ravel().tofile(dump_dir / "debug_subsampling_out.bin")

        e = cfg.encoder
        pos = torch.from_numpy(
            np.asarray(E.sinusoidal_position_embedding(h.shape[1], e.hidden_size))
        )
        for i in range(e.num_layers):
            a = f"encoder_.layers_.{i}"
            h = torch_ffn(tp, h, f"{a}.ffn1_")
            attn_in = TF.layer_norm(
                h, (e.hidden_size,),
                t(tp, f"{a}.attn_.norm_.weight"), t(tp, f"{a}.attn_.norm_.bias"),
            )
            h = h + torch_attention(tp, attn_in, pos, e.num_heads, f"{a}.attn_")
            h = torch_conv_module(tp, h, e.conv_kernel_size, f"{a}.conv_")
            h = torch_ffn(tp, h, f"{a}.ffn2_")
            h = TF.layer_norm(
                h, (e.hidden_size,),
                t(tp, f"{a}.final_norm_.weight"), t(tp, f"{a}.final_norm_.bias"),
            )
            if i == 0:
                h.numpy().astype("<f4").ravel().tofile(dump_dir / "debug_after_layer0.bin")
        enc = h

        # CTC head: conv1d projection (kernel 1) → per-frame argmax → collapse
        logits = TF.conv1d(
            enc.transpose(1, 2),
            t(tp, "ctc_decoder_.proj_.weight"), t(tp, "ctc_decoder_.proj_.bias"),
        ).transpose(1, 2)[0]
        best = logits.argmax(dim=-1).numpy()
        blank = cfg.ctc_vocab_size - 1
        ctc_tokens, prev = [], blank
        for b in best.tolist():
            if b != blank and b != prev:
                ctc_tokens.append(int(b))
            prev = b

        tdt_tokens, _ = torch_transducer_greedy_decode(
            tp, enc[0], durations=cfg.durations,
            blank_id=cfg.prediction.vocab_size - 1, joint_prefix="tdt_joint_",
        )

    return {
        "ctc_tokens": ctc_tokens,
        "ctc_text": tok.decode(ctc_tokens),
        "tdt_tokens": [int(x) for x in tdt_tokens],
        "tdt_text": tok.decode(tdt_tokens),
    }


# ─── Gates (steps 3, 5, 6, 7) ────────────────────────────────────────────────


def gate_transcripts(weights, vocab, clip, oracle, wer_gate, expect_substring):
    from parakeet_tpu.metrics import word_error_rate
    from parakeet_tpu.transcribe import Decoder, Transcriber

    tr = Transcriber(str(weights), str(vocab))
    failures = []
    for head, dec in (("ctc", Decoder.CTC), ("tdt", Decoder.TDT)):
        res = tr.transcribe(str(clip), dec)
        wer = word_error_rate(oracle[f"{head}_text"], res.text).wer
        exact = res.token_ids == oracle[f"{head}_tokens"]
        print(f"[acceptance] {head}: ours {len(res.token_ids)} tokens, "
              f"oracle {len(oracle[f'{head}_tokens'])}, token-exact={exact}, "
              f"WER vs oracle {wer * 100:.2f}%")
        if wer > wer_gate:
            failures.append(f"{head} WER {wer:.4f} > gate {wer_gate}")
        if expect_substring and expect_substring.lower() not in res.text.lower():
            failures.append(f"{head} transcript lacks substring {expect_substring!r}")
    return failures


def gate_stage_dumps(weights, clip, ref_dir: Path, device: str):
    """Run dump_stages --compare-ref as a subprocess and gate max-abs diffs."""
    cmd = [sys.executable, str(REPO / "scripts" / "dump_stages.py"), str(clip),
           "--weights", str(weights), "--compare-ref", str(ref_dir),
           "--device", device]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    print(proc.stdout, end="")
    if proc.returncode != 0:
        return [f"dump_stages --compare-ref exited {proc.returncode}: {proc.stderr[-500:]}"]
    failures = []
    seen = set()
    for m in re.finditer(r"^(\w+): max abs diff ([\d.e+-]+)", proc.stdout, re.M):
        stage, diff = m.group(1), float(m.group(2))
        seen.add(stage)
        tol = STAGE_TOL.get(stage)
        if tol is not None and diff > tol:
            failures.append(f"stage {stage}: max abs diff {diff:.3e} > tol {tol:.0e}")
    for stage in STAGE_TOL:
        if stage not in seen:
            failures.append(f"stage {stage}: never compared (dump missing?)")
    return failures


def gate_eval_wer(weights, vocab, clip, oracle, workdir: Path, wer_gate, device):
    manifest = workdir / "manifest.jsonl"
    manifest.write_text(
        json.dumps({"audio_filepath": str(clip), "text": oracle["tdt_text"]}) + "\n"
    )
    cmd = [sys.executable, str(REPO / "scripts" / "eval_wer.py"), str(manifest),
           "--weights", str(weights), "--vocab", str(vocab),
           "--decoder", "tdt", "--device", device]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    print(proc.stdout, end="")
    if proc.returncode != 0:
        return [f"eval_wer.py exited {proc.returncode}: {proc.stderr[-500:]}"]
    m = re.search(r"WER ([\d.]+)%", proc.stdout)
    if not m:
        return [f"eval_wer.py printed no WER line: {proc.stdout[-200:]}"]
    wer = float(m.group(1)) / 100.0
    if wer > wer_gate:
        return [f"manifest WER {wer:.4f} > gate {wer_gate}"]
    return []


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--weights", default=None, help="real model.safetensors (else fabricate)")
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--clip", default=None)
    ap.add_argument("--ref-dumps", default=None,
                    help="directory with REAL reference debug_*.bin dumps "
                         "(else fabricated from the torch oracle)")
    ap.add_argument("--expect-substring", default=None,
                    help="golden substring the transcript must contain "
                         "(use 'portrait' with the real LibriSpeech clip)")
    ap.add_argument("--wer-gate", type=float, default=0.1,
                    help="max abs WER vs oracle/ground truth (BASELINE.md bar)")
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--workdir", default=None, help="keep artifacts here (else temp)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    real = bool(args.weights)
    if real and not (args.vocab and args.clip):
        ap.error("--weights needs --vocab and --clip")

    tmp = None
    if args.workdir:
        workdir = Path(args.workdir)
        workdir.mkdir(parents=True, exist_ok=True)
    else:
        tmp = tempfile.TemporaryDirectory(prefix="acceptance_")
        workdir = Path(tmp.name)

    try:
        if real:
            weights, vocab, clip = Path(args.weights), Path(args.vocab), Path(args.clip)
            print(f"[acceptance] REAL assets: {weights}")
        else:
            print("[acceptance] fabricating pseudo-real checkpoint (full-size 110m)")
            weights, vocab, clip = fabricate_assets(workdir, seed=args.seed)

        print("[acceptance] running independent torch oracle pipeline")
        dump_dir = Path(args.ref_dumps) if args.ref_dumps else workdir / "ref_dumps"
        oracle = run_torch_oracle(weights, vocab, clip,
                                  dump_dir if not args.ref_dumps else workdir / "unused")

        failures = []
        failures += gate_transcripts(weights, vocab, clip, oracle,
                                     args.wer_gate, args.expect_substring)
        failures += gate_stage_dumps(weights, clip, dump_dir, args.device)
        failures += gate_eval_wer(weights, vocab, clip, oracle, workdir,
                                  args.wer_gate, args.device)

        if failures:
            print("\n[acceptance] FAILED:")
            for f in failures:
                print(f"  - {f}")
            return 1
        print("\n[acceptance] PASS — converter, both decode heads, stage dumps, "
              "and the manifest WER gate all agree with the independent oracle")
        return 0
    finally:
        if tmp is not None:
            tmp.cleanup()


if __name__ == "__main__":
    sys.exit(main())
