"""Weight-only INT8/INT4 quantization tests (reference Tier-3 roadmap item:
"Model quantization — INT8/INT4 weight quantization")."""

import numpy as np
import jax.numpy as jnp
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.ops.layers import linear
from parakeet_tpu.params import Params
from parakeet_tpu.quantize import (
    SCALE4_SUFFIX,
    SCALE_SUFFIX,
    dequantize_int4_jnp,
    dequantize_tensor,
    dequantize_tensor_int4,
    quantize_params,
    quantize_tensor,
    quantize_tensor_int4,
    quantized_fraction,
    unpack_int4,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 128).astype(np.float32) * 0.1
    q, s = quantize_tensor(w)
    assert q.dtype == np.int8 and s.shape == (64,)
    err = np.abs(dequantize_tensor(q, s) - w)
    # symmetric rounding: per-element error ≤ half a quant step of its row
    assert np.all(err <= s[:, None] * 0.5 + 1e-7)
    # max-abs calibration: the largest magnitude per row is exactly representable
    rows = np.argmax(np.abs(w), axis=1)
    np.testing.assert_allclose(
        dequantize_tensor(q, s)[np.arange(64), rows], w[np.arange(64), rows], rtol=1e-2
    )


def test_linear_int8_equals_manual_dequant():
    rng = np.random.RandomState(1)
    w = rng.randn(32, 48).astype(np.float32) * 0.2
    b = rng.randn(32).astype(np.float32)
    x = rng.randn(5, 48).astype(np.float32)
    q, s = quantize_tensor(w)

    params = {"m.weight": jnp.asarray(q), "m.weight" + SCALE_SUFFIX: jnp.asarray(s),
              "m.bias": jnp.asarray(b)}
    got = np.asarray(linear(Params(params).sub("m"), jnp.asarray(x)))
    want = x @ dequantize_tensor(q, s).T + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _tiny_cfg():
    return C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=16, hidden_size=32,
                                num_layers=2, num_heads=4, ffn_intermediate=64),
        prediction=C.PredictionConfig(vocab_size=21, pred_hidden=16, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=32, pred_hidden=16, joint_hidden=16,
                            vocab_size=21),
        ctc_vocab_size=21,
    )


def test_quantize_params_selection():
    cfg = _tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=3)
    qp = quantize_params(params, min_elems=256)
    # linear weights quantized, embeddings/norms/biases/convs untouched
    assert qp["encoder_.layers_.0.ffn1_.fc1_.weight"].dtype == jnp.int8
    assert ("encoder_.layers_.0.ffn1_.fc1_.weight" + SCALE_SUFFIX) in qp
    assert qp["prediction_.embed_.weight"].dtype != jnp.int8
    assert qp["encoder_.layers_.0.conv_.depthwise_conv_.weight"].dtype != jnp.int8
    assert qp["encoder_.layers_.0.ffn1_.norm_.weight"].dtype != jnp.int8
    assert 0.1 < quantized_fraction(qp) <= 1.0
    # original dict untouched
    assert params["encoder_.layers_.0.ffn1_.fc1_.weight"].dtype == jnp.float32


def test_quantized_encoder_close_to_f32():
    from parakeet_tpu.models.encoder import fastconformer_encode

    cfg = _tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=5)
    qp = quantize_params(params, min_elems=256)
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(2, 64, 80).astype(np.float32))
    ref = np.asarray(fastconformer_encode(Params(params).sub("encoder_"), cfg.encoder, feats))
    got = np.asarray(fastconformer_encode(Params(qp).sub("encoder_"), cfg.encoder, feats))
    # int8 noise is small but compounds across layers: demand tight relative
    # Frobenius error and near-perfect correlation
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995, corr


def test_facade_quantized_transcribe():
    from parakeet_tpu.transcribe import Decoder, Transcriber

    cfg = _tiny_cfg()
    t = np.arange(12000) / 16000.0
    audio = (0.4 * np.sin(2 * np.pi * 523.25 * t) * np.exp(-t)).astype(np.float32)

    tr_q = Transcriber(None, None, cfg, seed=42, quantize="int8")
    assert quantized_fraction(tr_q.params) > 0.1
    res = tr_q.transcribe(audio, Decoder.CTC)
    assert isinstance(res.token_ids, list)
    res_t = tr_q.transcribe(audio, Decoder.TDT)
    assert isinstance(res_t.token_ids, list)

    tr_q4 = Transcriber(None, None, cfg, seed=42, quantize="int4")
    assert quantized_fraction(tr_q4.params) > 0.1
    res4 = tr_q4.transcribe(audio, Decoder.CTC)
    assert isinstance(res4.token_ids, list)
    res4_t = tr_q4.transcribe(audio, Decoder.TDT)
    assert isinstance(res4_t.token_ids, list)

    with pytest.raises(ValueError, match="int8"):
        Transcriber(None, None, cfg, seed=42, quantize="int2")


def test_quantized_safetensors_roundtrip(tmp_path):
    from parakeet_tpu.io.safetensors import load_safetensors, save_safetensors

    cfg = _tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=9)
    qp = quantize_params(params, min_elems=256)
    path = tmp_path / "q.safetensors"
    save_safetensors({k: np.asarray(v) for k, v in qp.items()}, path)
    back = load_safetensors(path)
    key = "encoder_.layers_.0.ffn1_.fc1_.weight"
    assert back[key].dtype == np.int8
    np.testing.assert_array_equal(back[key], np.asarray(qp[key]))
    np.testing.assert_array_equal(back[key + SCALE_SUFFIX], np.asarray(qp[key + SCALE_SUFFIX]))


def test_load_params_dequantizes_int8_checkpoint(tmp_path):
    """load_params must dequantize int8 checkpoints (scale sidecars), so a
    quantized file loads with correct numerics everywhere."""
    from parakeet_tpu.io.safetensors import save_safetensors

    cfg = _tiny_cfg()
    spec = P.tdt_ctc_spec(cfg)
    params = P.init_params(spec, seed=11)
    qp = quantize_params(params, min_elems=256)
    path = tmp_path / "q.safetensors"
    save_safetensors({k: np.asarray(v) for k, v in qp.items()}, path)

    loaded = P.load_params(spec, str(path))
    key = "encoder_.layers_.0.ffn1_.fc1_.weight"
    assert loaded[key].dtype == jnp.float32
    want = dequantize_tensor(np.asarray(qp[key]), np.asarray(qp[key + SCALE_SUFFIX]))
    np.testing.assert_allclose(np.asarray(loaded[key]), want, rtol=1e-6)
    # dequantized ≈ original within the quant error bound
    err = np.abs(np.asarray(loaded[key]) - np.asarray(params[key]))
    s = np.asarray(qp[key + SCALE_SUFFIX])
    assert np.all(err <= s[:, None] * 0.5 + 1e-7)


def test_partially_quantized_fusable_guards():
    """Partial quantization (include= regex) can int8 any subset of a fused
    kernel's weights; the fusable guards must check EVERY tensor the kernel
    consumes and reject (review finding: guards checked only fc1/q_proj, so
    include='fc2' fed raw int8 into Pallas)."""
    from parakeet_tpu.models.encoder import _attn_block_fusable, _ffn_fusable

    cfg = _tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=5)
    x = jnp.zeros((2, 64, cfg.encoder.hidden_size))
    ffn = Params(params).sub("encoder_").sub("layers_").sub("0").sub("ffn1_")
    attn = Params(params).sub("encoder_").sub("layers_").sub("0").sub("attn_")
    assert _ffn_fusable(ffn, x) and _attn_block_fusable(attn, x)

    for pattern, guard, sub in (
        (r"fc1", _ffn_fusable, "ffn1_"),
        (r"fc2", _ffn_fusable, "ffn1_"),
        (r"q_proj", _attn_block_fusable, "attn_"),
        (r"k_proj", _attn_block_fusable, "attn_"),
        (r"v_proj", _attn_block_fusable, "attn_"),
        (r"out_proj", _attn_block_fusable, "attn_"),
        (r"pos_proj", _attn_block_fusable, "attn_"),
    ):
        qp = quantize_params(params, min_elems=256, include=pattern)
        q = Params(qp).sub("encoder_").sub("layers_").sub("0").sub(sub)
        assert not guard(q, x), f"guard must reject int8 {pattern}"


# ---------------------------------------------------------------- int4


def test_int4_pack_unpack_exact():
    rng = np.random.RandomState(2)
    codes = rng.randint(-7, 8, size=(16, 96)).astype(np.int8)
    nib = (codes & 0xF).astype(np.uint8)
    packed = nib[:, 0::2] | (nib[:, 1::2] << 4)
    np.testing.assert_array_equal(unpack_int4(packed), codes)


def test_int4_roundtrip_error_bound():
    rng = np.random.RandomState(3)
    w = rng.randn(48, 128).astype(np.float32) * 0.1
    q, s = quantize_tensor_int4(w, group_size=64)
    assert q.dtype == np.uint8 and q.shape == (48, 64)
    assert s.shape == (48, 2)  # 128 inputs / group 64
    deq = dequantize_tensor_int4(q, s)
    # per-element error ≤ half a quant step of its (row, group)
    step = np.repeat(s, 64, axis=1)
    assert np.all(np.abs(deq - w) <= step * 0.5 + 1e-7)
    # the max-magnitude element of each group is exactly representable
    grouped = w.reshape(48, 2, 64)
    idx = np.argmax(np.abs(grouped), axis=2)
    rows = np.arange(48)[:, None]
    cols = np.arange(2)[None, :]
    np.testing.assert_allclose(
        deq.reshape(48, 2, 64)[rows, cols, idx], grouped[rows, cols, idx], rtol=1e-2
    )


def test_int4_group_size_clamps_to_divisor():
    rng = np.random.RandomState(4)
    w = rng.randn(8, 96).astype(np.float32)  # 96 % 64 != 0 → group 48
    q, s = quantize_tensor_int4(w, group_size=64)
    assert s.shape == (8, 2)
    np.testing.assert_allclose(
        dequantize_tensor_int4(q, s), w, atol=np.abs(w).max() / 7 + 1e-6
    )
    with pytest.raises(ValueError, match="even"):
        quantize_tensor_int4(rng.randn(4, 7).astype(np.float32))


def test_int4_jnp_dequant_matches_numpy():
    rng = np.random.RandomState(5)
    w = rng.randn(32, 64).astype(np.float32) * 0.3
    q, s = quantize_tensor_int4(w, group_size=16)
    want = dequantize_tensor_int4(q, s)
    got = np.asarray(dequantize_int4_jnp(jnp.asarray(q), jnp.asarray(s), jnp.float32))
    np.testing.assert_array_equal(got, want)


def test_linear_int4_equals_manual_dequant():
    rng = np.random.RandomState(6)
    w = rng.randn(32, 48).astype(np.float32) * 0.2
    b = rng.randn(32).astype(np.float32)
    x = rng.randn(5, 48).astype(np.float32)
    q, s = quantize_tensor_int4(w, group_size=16)

    params = {"m.weight": jnp.asarray(q), "m.weight" + SCALE4_SUFFIX: jnp.asarray(s),
              "m.bias": jnp.asarray(b)}
    got = np.asarray(linear(Params(params).sub("m"), jnp.asarray(x)))
    want = x @ dequantize_tensor_int4(q, s).T + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_quantize_params_int4_selection_and_fraction():
    cfg = _tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=3)
    qp = quantize_params(params, mode="int4", min_elems=256)
    key = "encoder_.layers_.0.ffn1_.fc1_.weight"
    assert qp[key].dtype == jnp.uint8
    assert qp[key].shape[1] * 2 == params[key].shape[1]
    assert (key + SCALE4_SUFFIX) in qp
    assert qp["prediction_.embed_.weight"].dtype not in (jnp.int8, jnp.uint8)
    assert 0.1 < quantized_fraction(qp) <= 1.0
    # idempotent: re-quantizing (either mode) leaves packed tensors alone
    for mode in ("int4", "int8"):
        q2 = quantize_params(qp, mode=mode, min_elems=256)
        np.testing.assert_array_equal(np.asarray(q2[key]), np.asarray(qp[key]))
        np.testing.assert_array_equal(
            np.asarray(q2[key + SCALE4_SUFFIX]), np.asarray(qp[key + SCALE4_SUFFIX])
        )


def test_int4_encoder_close_to_f32():
    from parakeet_tpu.models.encoder import fastconformer_encode

    cfg = _tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=5)
    # tiny random-weight config is the worst case for 4-bit (no outlier
    # structure, errors compound over layers) — use fine groups here;
    # real checkpoints tolerate the default 64
    qp = quantize_params(params, mode="int4", min_elems=256, group_size=8)
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(2, 64, 80).astype(np.float32))
    ref = np.asarray(fastconformer_encode(Params(params).sub("encoder_"), cfg.encoder, feats))
    got = np.asarray(fastconformer_encode(Params(qp).sub("encoder_"), cfg.encoder, feats))
    # 4-bit group quant: looser than int8 but still strongly correlated
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.25, rel
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.95, corr


def test_int4_fusable_guards_reject():
    from parakeet_tpu.models.encoder import _attn_block_fusable, _ffn_fusable

    cfg = _tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=5)
    x = jnp.zeros((2, 64, cfg.encoder.hidden_size))
    qp = quantize_params(params, mode="int4", min_elems=256)
    ffn = Params(qp).sub("encoder_").sub("layers_").sub("0").sub("ffn1_")
    attn = Params(qp).sub("encoder_").sub("layers_").sub("0").sub("attn_")
    assert not _ffn_fusable(ffn, x)
    assert not _attn_block_fusable(attn, x)


def test_int4_beam_decode_matches_dequantized():
    """Beam search must work with int4-PACKED lstm/joint weights (review
    finding: pred_hidden was derived from the packed in-dim, building a
    half-sized LSTM state) and match the manually-dequantized params
    bit-for-bit."""
    from parakeet_tpu.decode.beam_transducer import transducer_beam_decode
    from parakeet_tpu.quantize import SCALE4_SUFFIX, dequantize_tensor_int4

    cfg = _tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=13)
    qp = quantize_params(params, mode="int4", min_elems=64, group_size=8)
    assert qp["prediction_.lstm_.cells_.0.hidden_proj_.weight"].dtype == jnp.uint8
    deq = {
        k: (jnp.asarray(dequantize_tensor_int4(
                np.asarray(v), np.asarray(qp[k + SCALE4_SUFFIX])))
            if v.dtype == jnp.uint8 else v)
        for k, v in qp.items() if not k.endswith(SCALE4_SUFFIX)
    }
    rng = np.random.RandomState(3)
    enc = jnp.asarray(rng.randn(2, 6, cfg.encoder.hidden_size).astype(np.float32))
    kw = dict(num_lstm_layers=1, durations=(0, 1, 2, 3, 4), blank_id=20,
              is_tdt=True, joint_prefix="tdt_joint_", beam_size=2, n_best=1)
    got = transducer_beam_decode(qp, enc, **kw)
    want = transducer_beam_decode(deq, enc, **kw)
    assert [h[0].tokens for h in got] == [h[0].tokens for h in want]


def test_int4_safetensors_roundtrip_and_load(tmp_path):
    """Quarter-size checkpoints: save packed, load_params dequantizes."""
    from parakeet_tpu.io.safetensors import load_safetensors, save_safetensors

    cfg = _tiny_cfg()
    spec = P.tdt_ctc_spec(cfg)
    params = P.init_params(spec, seed=9)
    qp = quantize_params(params, mode="int4", min_elems=256)
    path = tmp_path / "q4.safetensors"
    save_safetensors({k: np.asarray(v) for k, v in qp.items()}, path)
    back = load_safetensors(path)
    key = "encoder_.layers_.0.ffn1_.fc1_.weight"
    assert back[key].dtype == np.uint8
    np.testing.assert_array_equal(back[key], np.asarray(qp[key]))

    loaded = P.load_params(spec, str(path))
    assert loaded[key].dtype == jnp.float32
    assert loaded[key].shape == params[key].shape
    want = dequantize_tensor_int4(np.asarray(qp[key]), np.asarray(qp[key + SCALE4_SUFFIX]))
    np.testing.assert_allclose(np.asarray(loaded[key]), want, rtol=1e-6)


def test_quantize_ckpt_cli(tmp_path):
    """parakeet-quantize: f32 checkpoint → int4 artifact that the facade
    loads transparently; re-quantizing the output is rejected."""
    from parakeet_tpu.io.safetensors import load_safetensors, save_safetensors
    from parakeet_tpu.tools.quantize_ckpt import main as qmain

    cfg = _tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=17)
    src = tmp_path / "f32.safetensors"
    dst = tmp_path / "q4.safetensors"
    save_safetensors({k: np.asarray(v) for k, v in params.items()}, src)

    assert qmain([str(src), str(dst), "--mode", "int4",
                  "--min-elems", "256", "--group-size", "8"]) == 0
    assert dst.stat().st_size < src.stat().st_size
    back = load_safetensors(dst)
    key = "encoder_.layers_.0.ffn1_.fc1_.weight"
    assert back[key].dtype == np.uint8

    loaded = P.load_params(P.tdt_ctc_spec(cfg), str(dst))
    assert loaded[key].shape == params[key].shape

    assert qmain([str(dst), str(tmp_path / "qq.safetensors")]) == 1


def test_quantize_params_idempotent_on_int8():
    """Re-quantizing an already-quantized dict must be a no-op, not a
    silent corruption of the scales (review finding)."""
    cfg = _tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=5)
    q1 = quantize_params(params, min_elems=256)
    q2 = quantize_params(q1, min_elems=256)
    key = "encoder_.layers_.0.ffn1_.fc1_.weight"
    assert q2[key].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q1[key]), np.asarray(q2[key]))
    np.testing.assert_array_equal(
        np.asarray(q1[key + SCALE_SUFFIX]), np.asarray(q2[key + SCALE_SUFFIX])
    )


@pytest.mark.parametrize("mode", ["int8", "int4"])
@pytest.mark.parametrize("impl", ["step", "lookahead"])
def test_greedy_decode_quantized_matches_dequantized(mode, impl):
    """The jitted greedy decode with int-quantized decoder weights must match
    the manually-dequantized params bit-for-bit. Exercises
    ops.layers.anchor_quantized_weights (the loop-body optimization_barrier
    is an aliasing no-op — same arithmetic, different HLO schedule)."""
    from parakeet_tpu.decode.transducer import transducer_greedy_decode

    cfg = _tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=7)
    qp = quantize_params(params, mode=mode, min_elems=64, group_size=8,
                         include=r"^(prediction_|tdt_joint_)")
    assert quantized_fraction(qp) > 0
    deq = {}
    for k, v in qp.items():
        if k.endswith(SCALE_SUFFIX) or k.endswith(SCALE4_SUFFIX):
            continue
        if v.dtype == jnp.uint8:
            deq[k] = jnp.asarray(dequantize_tensor_int4(
                np.asarray(v), np.asarray(qp[k + SCALE4_SUFFIX])))
        elif v.dtype == jnp.int8:
            deq[k] = jnp.asarray(dequantize_tensor(
                np.asarray(v), np.asarray(qp[k + SCALE_SUFFIX])))
        else:
            deq[k] = v
    rng = np.random.RandomState(11)
    enc = jnp.asarray(rng.randn(3, 12, cfg.encoder.hidden_size).astype(np.float32))
    kw = dict(pred_hidden=cfg.prediction.pred_hidden, num_lstm_layers=1,
              durations=(0, 1, 2, 3, 4), blank_id=20, is_tdt=True,
              joint_prefix="tdt_joint_", impl=impl, window=4)
    got = transducer_greedy_decode(qp, enc, **kw)
    want = transducer_greedy_decode(deq, enc, **kw)
    assert got.tokens == want.tokens
    for gseq, wseq in zip(got.timestamped, want.timestamped):
        assert [(g.token_id, g.start_frame, g.end_frame) for g in gseq] == [
            (w.token_id, w.start_frame, w.end_frame) for w in wseq]


def test_int8_compute_w8a8_close_and_restores():
    """set_int8_compute: W8A8 dot streams s8 weights (decode-loop bandwidth
    path, TUNING.md r4); ~1% logit error vs float, toggle is process-global
    and must restore."""
    from parakeet_tpu.ops.layers import set_int8_compute

    rng = np.random.RandomState(2)
    w = rng.randn(48, 64).astype(np.float32) * 0.4
    b = rng.randn(48).astype(np.float32) * 0.1
    x = rng.randn(6, 64).astype(np.float32)
    q, s = quantize_tensor(w)
    pp = Params({"m.weight": jnp.asarray(q), "m.weight" + SCALE_SUFFIX: jnp.asarray(s),
                 "m.bias": jnp.asarray(b)})
    ref = x @ w.T + b
    set_int8_compute(True)
    try:
        got = np.asarray(linear(pp.sub("m"), jnp.asarray(x)))
    finally:
        set_int8_compute(False)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 0.03
    # restored: weight-only path again (different rounding, tighter error)
    wo = np.asarray(linear(pp.sub("m"), jnp.asarray(x)))
    assert np.abs(wo - ref).max() / scale < 0.02
