"""Fused Pallas attention vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.models import encoder as E
from parakeet_tpu.ops.pallas_attention import fused_rel_attention
from parakeet_tpu.params import Params


def test_fused_attention_matches_xla():
    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=32,
                          num_layers=1, num_heads=4, ffn_intermediate=64)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=3)
    a = Params(params).sub("encoder_").sub("layers_").sub("0").sub("attn_")
    rng = np.random.RandomState(0)
    b, t, d, h = 2, 9, 32, 4
    hd = d // h
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32) * 0.5)
    pos_emb = E.sinusoidal_position_embedding(t, d)

    ref = np.asarray(E.rel_position_attention(a, x, pos_emb, h))

    # Build the fused-kernel inputs exactly as the integration does
    from parakeet_tpu.ops.layers import linear

    def split(v):
        return jnp.transpose(v.reshape(b, t, h, hd), (0, 2, 1, 3))

    q = split(linear(a.sub("mha_").sub("q_proj"), x))
    k = split(linear(a.sub("mha_").sub("k_proj"), x))
    v = split(linear(a.sub("mha_").sub("v_proj"), x))
    bias_u = a["pos_bias_u_"][None, :, None, :]
    bias_v = a["pos_bias_v_"][None, :, None, :]
    pos = linear(a.sub("pos_proj_"), pos_emb)
    pos = jnp.transpose(pos.reshape(-1, h, hd), (1, 0, 2))

    fused = fused_rel_attention(q + bias_u, q + bias_v, k, v, pos, interpret=True)
    fused = np.asarray(jnp.transpose(fused, (0, 2, 1, 3)).reshape(b, t, d))
    ref_ctx = ref  # includes out_proj; apply out_proj to fused for comparison
    fused_out = np.asarray(linear(a.sub("mha_").sub("out_proj"), jnp.asarray(fused)))

    np.testing.assert_allclose(fused_out, ref_ctx, rtol=2e-4, atol=2e-5)


def test_fused_flag_end_to_end_interpret(monkeypatch):
    """Encoder forward with the fused flag on (interpret via monkeypatch)
    equals the XLA path."""
    import parakeet_tpu.ops.pallas_attention as PA

    orig = PA.fused_rel_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(PA, "fused_rel_attention", interp)

    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                          num_layers=2, num_heads=2, ffn_intermediate=32)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=4)
    root = Params(params).sub("encoder_")
    x = jnp.asarray(np.random.RandomState(1).randn(1, 48, 80).astype(np.float32))

    ref = np.asarray(E.fastconformer_encode(root, cfg, x))
    E.set_fused_attention(True)
    try:
        fused = np.asarray(E.fastconformer_encode(root, cfg, x))
    finally:
        E.set_fused_attention(False)
    np.testing.assert_allclose(fused, ref, rtol=1e-3, atol=1e-5)


def test_fused_masked_matches_xla_lengths(monkeypatch):
    """Padded batch + per-item lengths: fused path == XLA masked path for
    the valid region."""
    import parakeet_tpu.ops.pallas_attention as PA

    orig = PA.fused_rel_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(PA, "fused_rel_attention", interp)

    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                          num_layers=2, num_heads=2, ffn_intermediate=32)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=9)
    root = Params(params).sub("encoder_")
    mel = np.zeros((2, 80, 80), np.float32)
    mel[0, :64] = np.random.RandomState(2).randn(64, 80)
    mel[1, :80] = np.random.RandomState(3).randn(80, 80)
    lengths = jnp.asarray([64, 80])

    ref = np.asarray(E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths))
    E.set_fused_attention(True)
    try:
        fused = np.asarray(E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths))
    finally:
        E.set_fused_attention(False)
    t_valid = E.subsample_length(64)
    np.testing.assert_allclose(fused[0, :t_valid], ref[0, :t_valid], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(fused[1], ref[1], rtol=1e-3, atol=1e-5)


def _interp_block(monkeypatch):
    import parakeet_tpu.ops.pallas_attention as PA

    orig = PA.fused_rel_attention_block

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(PA, "fused_rel_attention_block", interp)


def test_block_kernel_end_to_end_interpret(monkeypatch):
    """Whole-block fused attention (QKV/out projections inside the kernel)
    == XLA path through the full encoder."""
    _interp_block(monkeypatch)
    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                          num_layers=2, num_heads=2, ffn_intermediate=32)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=6)
    root = Params(params).sub("encoder_")
    x = jnp.asarray(np.random.RandomState(8).randn(2, 48, 80).astype(np.float32))

    ref = np.asarray(E.fastconformer_encode(root, cfg, x))
    E.set_fused_attention("block")
    try:
        fused = np.asarray(E.fastconformer_encode(root, cfg, x))
    finally:
        E.set_fused_attention(False)
    np.testing.assert_allclose(fused, ref, rtol=1e-3, atol=1e-5)


def test_block_kernel_masked_lengths(monkeypatch):
    _interp_block(monkeypatch)
    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                          num_layers=1, num_heads=2, ffn_intermediate=32)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=10)
    root = Params(params).sub("encoder_")
    mel = np.zeros((2, 80, 80), np.float32)
    mel[0, :64] = np.random.RandomState(4).randn(64, 80)
    mel[1, :80] = np.random.RandomState(5).randn(80, 80)
    lengths = jnp.asarray([64, 80])

    ref = np.asarray(E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths))
    E.set_fused_attention("block")
    try:
        fused = np.asarray(E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths))
    finally:
        E.set_fused_attention(False)
    t_valid = E.subsample_length(64)
    np.testing.assert_allclose(fused[0, :t_valid], ref[0, :t_valid], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(fused[1], ref[1], rtol=1e-3, atol=1e-5)


def test_mega_kernel_end_to_end_interpret(monkeypatch):
    """ffn1+attention mega kernel == XLA path through the full encoder."""
    import parakeet_tpu.ops.pallas_attention as PA

    orig = PA.fused_ffn_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(PA, "fused_ffn_attention", interp)

    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                          num_layers=2, num_heads=2, ffn_intermediate=32)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=17)
    root = Params(params).sub("encoder_")
    x = jnp.asarray(np.random.RandomState(15).randn(2, 520, 80).astype(np.float32))

    ref = np.asarray(E.fastconformer_encode(root, cfg, x))
    E.set_fused_attention("mega")
    try:
        fused = np.asarray(E.fastconformer_encode(root, cfg, x))
    finally:
        E.set_fused_attention(False)
    np.testing.assert_allclose(fused, ref, rtol=1e-3, atol=1e-5)


def test_mega_kernel_masked_lengths(monkeypatch):
    import parakeet_tpu.ops.pallas_attention as PA

    orig = PA.fused_ffn_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(PA, "fused_ffn_attention", interp)

    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                          num_layers=1, num_heads=2, ffn_intermediate=32)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=19)
    root = Params(params).sub("encoder_")
    mel = np.zeros((2, 560, 80), np.float32)
    mel[0, :520] = np.random.RandomState(6).randn(520, 80)
    mel[1, :560] = np.random.RandomState(7).randn(560, 80)
    lengths = jnp.asarray([520, 560])

    ref = np.asarray(E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths))
    E.set_fused_attention("mega")
    try:
        fused = np.asarray(E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths))
    finally:
        E.set_fused_attention(False)
    t_valid = E.subsample_length(520)
    np.testing.assert_allclose(fused[0, :t_valid], ref[0, :t_valid], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(fused[1], ref[1], rtol=1e-3, atol=1e-5)


def test_transcriber_kernels_param(monkeypatch):
    """Transcriber(kernels='block') routes through the fused kernel and
    (in interpret mode) produces the same tokens as the XLA path."""
    import parakeet_tpu.ops.pallas_attention as PA
    from parakeet_tpu import config as CC
    from parakeet_tpu.models import encoder as EE
    from parakeet_tpu.transcribe import Decoder, Transcriber

    orig = PA.fused_rel_attention_block
    calls = []

    def interp(*args, **kw):
        calls.append(1)
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(PA, "fused_rel_attention_block", interp)

    cfg = CC.TDTCTCConfig(
        encoder=CC.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                                 num_layers=1, num_heads=2, ffn_intermediate=32),
        prediction=CC.PredictionConfig(vocab_size=9, pred_hidden=8, num_lstm_layers=1),
        joint=CC.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=9),
        ctc_vocab_size=9,
    )
    audio = np.random.RandomState(3).randn(16000).astype(np.float32) * 0.1
    ref = Transcriber(None, None, cfg, seed=5).transcribe(audio, Decoder.CTC)
    try:
        tr = Transcriber(None, None, cfg, seed=5, kernels="block")
        got = tr.transcribe(audio, Decoder.CTC)
    finally:
        EE.set_fused_attention(False)
    assert calls, "fused kernel was not invoked"
    assert got.token_ids == ref.token_ids


@pytest.mark.parametrize("mode", ["block2", "bd2", "block2hp"])
def test_block_kernel_batch_blocked(monkeypatch, mode):
    """blockN batch-blocking (NB items per program, projections merged into
    (NB*TP, D) matmuls) == XLA path, including per-item length masking and a
    batch that does NOT divide NB (pad items). bdN additionally merges the
    per-item content/AV matmuls into block-diagonal ones — must be exact up
    to the same tolerance (off-diagonal probabilities are exactly zero)."""
    _interp_block(monkeypatch)
    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                          num_layers=2, num_heads=2, ffn_intermediate=32)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=21)
    root = Params(params).sub("encoder_")
    mel = np.zeros((3, 80, 80), np.float32)
    mel[0, :64] = np.random.RandomState(4).randn(64, 80)
    mel[1, :80] = np.random.RandomState(5).randn(80, 80)
    mel[2, :48] = np.random.RandomState(6).randn(48, 80)
    lengths = jnp.asarray([64, 80, 48])

    ref = np.asarray(E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths))
    E.set_fused_attention(mode)
    try:
        assert E._attn_batch_block() == 2
        fused = np.asarray(E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths))
    finally:
        E.set_fused_attention(False)
    for i, n in enumerate([64, 80, 48]):
        tv = E.subsample_length(n)
        np.testing.assert_allclose(fused[i, :tv], ref[i, :tv], rtol=1e-3, atol=1e-5)


def test_headpair_multi_pair_and_nb1(monkeypatch):
    """hp mode with 4 heads (two pairs) and nb=1 (blockhp): the packed
    content/AV/rotation matmuls' zero blocks are exact, so results match
    the XLA path to the same tolerance as the other kernel variants."""
    _interp_block(monkeypatch)
    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=32,
                          num_layers=2, num_heads=4, ffn_intermediate=64)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=23)
    root = Params(params).sub("encoder_")
    mel = np.zeros((3, 80, 80), np.float32)
    mel[0, :64] = np.random.RandomState(7).randn(64, 80)
    mel[1, :80] = np.random.RandomState(8).randn(80, 80)
    mel[2, :48] = np.random.RandomState(9).randn(48, 80)
    lengths = jnp.asarray([64, 80, 48])

    ref = np.asarray(E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths))
    for mode in ("blockhp", "block4hp"):
        E.set_fused_attention(mode)
        try:
            assert E._attn_headpair()
            fused = np.asarray(
                E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths)
            )
        finally:
            E.set_fused_attention(False)
        for i, n in enumerate([64, 80, 48]):
            tv = E.subsample_length(n)
            np.testing.assert_allclose(
                fused[i, :tv], ref[i, :tv], rtol=1e-3, atol=1e-5,
                err_msg=f"mode={mode} item={i}",
            )


def test_headpair_odd_heads_falls_back(monkeypatch):
    """An odd head count silently disables the pair packing (the kernel
    builder clears headpair) — results still match the XLA path."""
    _interp_block(monkeypatch)
    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=48,
                          num_layers=1, num_heads=3, ffn_intermediate=64)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=29)
    root = Params(params).sub("encoder_")
    x = jnp.asarray(np.random.RandomState(11).randn(2, 64, 80).astype(np.float32))

    ref = np.asarray(E.fastconformer_encode(root, cfg, x))
    E.set_fused_attention("block2hp")
    try:
        fused = np.asarray(E.fastconformer_encode(root, cfg, x))
    finally:
        E.set_fused_attention(False)
    np.testing.assert_allclose(fused, ref, rtol=1e-3, atol=1e-5)


def test_block_nb_downgrade_on_vmem_guard():
    """block4 on a 600m-sized layer must downgrade to the largest fitting
    batch block (nb=1), never to the v1 kernel (r3: block4 default)."""
    import jax.numpy as jnp

    d, t = 1024, 125
    spec = {}
    from parakeet_tpu import params as PP
    cfg = C.EncoderConfig(mel_bins=128, subsampling_channels=8, hidden_size=d,
                          num_layers=1, num_heads=8, ffn_intermediate=64)
    spec = PP.encoder_spec(cfg, "encoder_")
    params = PP.init_params(spec, seed=1, dtype=jnp.bfloat16)
    a = Params(params).sub("encoder_").sub("layers_").sub("0").sub("attn_")
    x = jnp.zeros((2, t, d), jnp.bfloat16)
    E.set_fused_attention("block4")
    try:
        assert not E._attn_block_fusable(a, x, 4)
        assert E._attn_block_fusable(a, x, 1)
        # 110m-sized layer fits nb=4
        x5 = jnp.zeros((2, t, 512), jnp.bfloat16)
        cfg5 = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=512,
                               num_layers=1, num_heads=8, ffn_intermediate=64)
        p5 = PP.init_params(PP.encoder_spec(cfg5, "encoder_"), seed=1, dtype=jnp.bfloat16)
        a5 = Params(p5).sub("encoder_").sub("layers_").sub("0").sub("attn_")
        assert E._attn_block_fusable(a5, x5, 4)
    finally:
        E.set_fused_attention(False)


def test_transcriber_kernels_true_resolves_by_scale():
    """kernels=True picks the measured-best mode for the model's width:
    block4hp at d_model<1024, plain block at d_model>=1024 (TUNING.md r4 —
    batch packing loses to VMEM pressure at 1024)."""
    from parakeet_tpu import config as CC
    from parakeet_tpu.models import encoder as EE
    from parakeet_tpu.transcribe import Transcriber

    def cfg(width):
        return CC.TDTCTCConfig(
            encoder=CC.EncoderConfig(mel_bins=80, subsampling_channels=8,
                                     hidden_size=width, num_layers=1,
                                     num_heads=2, ffn_intermediate=32),
            prediction=CC.PredictionConfig(vocab_size=9, pred_hidden=8,
                                           num_lstm_layers=1),
            joint=CC.JointConfig(encoder_hidden=width, pred_hidden=8,
                                 joint_hidden=8, vocab_size=9),
            ctc_vocab_size=9,
        )

    try:
        Transcriber(None, None, cfg(16), seed=0, kernels=True)
        assert EE.get_fused_attention() == "block4hp"
        Transcriber(None, None, cfg(1024), seed=0, kernels=True)
        assert EE.get_fused_attention() == "block"
        Transcriber(None, None, cfg(1024), seed=0, kernels="block4")
        assert EE.get_fused_attention() == "block4"  # explicit overrides
    finally:
        EE.set_fused_attention(False)


def test_score_bf16_storage_close_and_f32_default_unchanged(monkeypatch):
    """set_score_storage('bf16') (the VERDICT r4 #2 operating point) keeps
    results within bf16 score noise of the XLA path across the hp and
    plain-block variants, and 'f32' (the default) stays bit-identical to
    the pre-flag kernel output."""
    _interp_block(monkeypatch)
    cfg = C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=32,
                          num_layers=2, num_heads=4, ffn_intermediate=64)
    params = P.init_params(P.encoder_spec(cfg, "encoder_"), seed=23)
    root = Params(params).sub("encoder_")
    mel = np.zeros((2, 80, 80), np.float32)
    mel[0, :64] = np.random.RandomState(7).randn(64, 80)
    mel[1, :80] = np.random.RandomState(8).randn(80, 80)
    lengths = jnp.asarray([64, 80])

    ref = np.asarray(E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths))
    for mode in ("block2hp", "block2", "block"):
        E.set_fused_attention(mode)
        try:
            f32_out = np.asarray(
                E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths)
            )
            E.set_score_storage("bf16")
            assert E.get_score_storage() == "bf16"
            bf16_out = np.asarray(
                E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths)
            )
            E.set_score_storage("f32")
            again = np.asarray(
                E.fastconformer_encode(root, cfg, jnp.asarray(mel), lengths)
            )
        finally:
            E.set_fused_attention(False)
            E.set_score_storage("f32")
        np.testing.assert_array_equal(again, f32_out)  # f32 mode untouched
        for i, n in enumerate([64, 80]):
            tv = E.subsample_length(n)
            # bf16 scores: ~4e-3 relative softmax noise propagated through
            # two conformer layers — loose but must stay clearly bounded
            np.testing.assert_allclose(
                bf16_out[i, :tv], f32_out[i, :tv], rtol=5e-2, atol=5e-2,
                err_msg=f"mode={mode} item={i}",
            )
        assert not np.array_equal(bf16_out, f32_out), (
            "bf16 score storage produced bit-identical output — the flag "
            "is not reaching the kernel"
        )
    with pytest.raises(ValueError, match="score storage"):
        E.set_score_storage("int8")
