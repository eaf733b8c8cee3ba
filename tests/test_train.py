"""Training step + sharding + checkpoint tests (capability beyond the
inference-only reference; exercised by dryrun_multichip too)."""

import numpy as np
import optax
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.checkpoint import export_weights, load_train_state, save_train_state
from parakeet_tpu.parallel.mesh import make_mesh, shard_params
from parakeet_tpu.train import make_sharded_trainer, make_train_step, synthetic_batch


def tiny_cfg():
    return C.TDTCTCConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                                num_layers=1, num_heads=2, ffn_intermediate=32),
        prediction=C.PredictionConfig(vocab_size=17, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=17),
        ctc_vocab_size=17,
    )


def test_train_step_reduces_loss():
    cfg = tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=0)
    opt = optax.adam(3e-3)
    step = make_train_step(cfg, opt)
    opt_state = opt.init(params)
    batch = synthetic_batch(cfg, batch=4, mel_frames=64, max_labels=6)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


@pytest.mark.slow
def test_sharded_trainer_8_devices():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=1)
    mesh = make_mesh(8, model_parallel=2)
    mesh, state, step, place_batch = make_sharded_trainer(cfg, params, mesh)
    batch = place_batch(synthetic_batch(cfg, batch=8, mel_frames=64, max_labels=6))
    with mesh:
        new_params, new_opt, loss = step(state.params, state.opt_state, batch)
    assert np.isfinite(float(loss))
    # TP rule applied: ffn fc1 rows sharded over 'model'
    sh = new_params["encoder_.layers_.0.ffn1_.fc1_.weight"].sharding
    assert "model" in str(sh.spec)


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=2)
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    step_fn = make_train_step(cfg, opt)
    batch = synthetic_batch(cfg, batch=2, mel_frames=64, max_labels=4)
    params, opt_state, _ = step_fn(params, opt_state, batch)

    save_train_state(tmp_path / "ck", params, opt_state, step=3)
    p2, o2, s2 = load_train_state(tmp_path / "ck", opt.init(params))
    assert s2 == 3
    np.testing.assert_allclose(
        np.asarray(params["prediction_.embed_.weight"]),
        np.asarray(p2["prediction_.embed_.weight"]),
    )
    # resumed state continues training identically
    a1, ao1, l1 = step_fn({k: np.asarray(v) for k, v in params.items()}, opt_state, batch)
    a2, ao2, l2 = step_fn(p2, o2, batch)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

    # inference export loads under the reference schema
    export_weights(tmp_path / "ck", tmp_path / "model.safetensors")
    loaded = P.load_params(P.tdt_ctc_spec(cfg), str(tmp_path / "model.safetensors"), strict=True)
    assert set(loaded) == set(P.tdt_ctc_spec(cfg))


@pytest.mark.slow
def test_tdt_train_step_reduces_loss():
    """Fine-tune the flagship TDT stack end-to-end: lattice loss through
    encoder + prediction LSTM + dual-head joint."""
    import optax as _optax

    from parakeet_tpu.train import make_transducer_train_step

    cfg = tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=3)
    opt = _optax.adam(3e-3)
    step = make_transducer_train_step(cfg, opt, loss="tdt", sigma=0.05)
    opt_state = opt.init(params)
    batch = synthetic_batch(cfg, batch=4, mel_frames=64, max_labels=6)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"TDT loss did not decrease: {losses}"


def test_rnnt_train_step_reduces_loss():
    import optax as _optax

    from parakeet_tpu.train import make_transducer_train_step

    cfg = C.RNNTConfig(
        encoder=C.EncoderConfig(mel_bins=80, subsampling_channels=8, hidden_size=16,
                                num_layers=1, num_heads=2, ffn_intermediate=32),
        prediction=C.PredictionConfig(vocab_size=17, pred_hidden=8, num_lstm_layers=1),
        joint=C.JointConfig(encoder_hidden=16, pred_hidden=8, joint_hidden=8, vocab_size=17),
    )
    params = P.init_params(P.rnnt_spec(cfg), seed=4)
    opt = _optax.adam(3e-3)
    step = make_transducer_train_step(cfg, opt, loss="rnnt")
    opt_state = opt.init(params)
    batch = synthetic_batch(cfg, batch=4, mel_frames=64, max_labels=6)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"RNNT loss did not decrease: {losses}"


@pytest.mark.slow
def test_sharded_tdt_trainer_8_devices():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=5)
    mesh = make_mesh(8, model_parallel=2)
    mesh, state, step, place_batch = make_sharded_trainer(cfg, params, mesh, loss="tdt")
    batch = place_batch(synthetic_batch(cfg, batch=8, mel_frames=64, max_labels=6))
    with mesh:
        _, _, loss = step(state.params, state.opt_state, batch)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_hybrid_train_step_reduces_loss():
    import optax as _optax

    from parakeet_tpu.train import make_hybrid_train_step

    cfg = tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=6)
    opt = _optax.adam(3e-3)
    step = make_hybrid_train_step(cfg, opt, ctc_weight=0.3, sigma=0.05)
    opt_state = opt.init(params)
    batch = synthetic_batch(cfg, batch=4, mel_frames=64, max_labels=6)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"hybrid loss did not decrease: {losses}"


@pytest.mark.slow
def test_tdt600m_schema_trains():
    """The 600m presets key their joint 'joint_' (params.tdt_spec), not
    'tdt_joint_'; the trainer must resolve the prefix from the weight
    schema (review finding: loss='tdt' hard-defaulted to 'tdt_joint_',
    making the tdt-600m preset untrainable)."""
    import optax as _optax

    from parakeet_tpu.train import make_transducer_train_step

    base = tiny_cfg()
    cfg = C.TDTConfig(encoder=base.encoder, prediction=base.prediction,
                      joint=base.joint)
    params = P.init_params(P.tdt_spec(cfg), seed=3)
    assert any(k.startswith("joint_.") for k in params)
    assert not any(k.startswith("tdt_joint_") for k in params)
    opt = _optax.adam(3e-3)
    step = make_transducer_train_step(cfg, opt, loss="tdt", sigma=0.05)
    opt_state = opt.init(params)
    batch = synthetic_batch(cfg, batch=2, mel_frames=64, max_labels=6)
    params, opt_state, loss = step(params, opt_state, batch)
    assert np.isfinite(float(loss))


def test_rnnt600m_schema_trains():
    import optax as _optax

    from parakeet_tpu.train import make_transducer_train_step

    base = tiny_cfg()
    cfg = C.RNNTConfig(encoder=base.encoder, prediction=base.prediction,
                       joint=base.joint)
    params = P.init_params(P.rnnt_spec(cfg), seed=4)
    assert any(k.startswith("joint_.") for k in params)
    opt = _optax.adam(3e-3)
    step = make_transducer_train_step(cfg, opt, loss="rnnt")
    opt_state = opt.init(params)
    batch = synthetic_batch(cfg, batch=2, mel_frames=64, max_labels=6)
    params, opt_state, loss = step(params, opt_state, batch)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_remat_and_accum_match_plain_grads():
    """remat (per-block jax.checkpoint) and accum_steps (chunked lax.scan
    grad accumulation) are pure memory levers — loss and gradients must
    equal the plain hybrid value_and_grad."""
    import jax
    import jax.numpy as jnp

    from parakeet_tpu.train import hybrid_loss_fn, value_and_grad_accum

    cfg = tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=7)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, batch=4, mel_frames=64, max_labels=6).items()}

    ref_l, ref_g = jax.value_and_grad(hybrid_loss_fn)(params, cfg, batch, sigma=0.05)

    remat_l, remat_g = jax.value_and_grad(hybrid_loss_fn)(
        params, cfg, batch, sigma=0.05, remat=True
    )
    assert abs(float(remat_l) - float(ref_l)) < 1e-5 * max(1.0, abs(float(ref_l)))
    for k in ref_g:
        np.testing.assert_allclose(
            np.asarray(remat_g[k]), np.asarray(ref_g[k]),
            rtol=1e-4, atol=1e-6, err_msg=f"remat {k}",
        )

    vag = value_and_grad_accum(
        lambda p, b: hybrid_loss_fn(p, cfg, b, sigma=0.05), accum_steps=2
    )
    acc_l, acc_g = jax.jit(vag)(params, batch)
    assert abs(float(acc_l) - float(ref_l)) < 1e-4 * max(1.0, abs(float(ref_l)))
    for k in ref_g:
        np.testing.assert_allclose(
            np.asarray(acc_g[k]), np.asarray(ref_g[k]),
            rtol=2e-3, atol=2e-5, err_msg=f"accum {k}",
        )


@pytest.mark.slow
def test_accum_steps_trainer_runs_and_matches():
    """make_sharded_trainer(accum_steps=2, remat=True) on the 8-device mesh:
    step runs, loss equals the plain trainer's first-step loss."""
    cfg = tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=8)
    batch = synthetic_batch(cfg, batch=8, mel_frames=64, max_labels=6)

    mesh, state, step, place = make_sharded_trainer(
        cfg, params, make_mesh(4), loss="hybrid", sigma=0.05
    )
    with mesh:
        _, _, ref_loss = step(state.params, state.opt_state, place(batch))

    mesh2, state2, step2, place2 = make_sharded_trainer(
        cfg, params, make_mesh(4), loss="hybrid", sigma=0.05,
        remat=True, accum_steps=2,
    )
    with mesh2:
        _, _, loss2 = step2(state2.params, state2.opt_state, place2(batch))
    assert abs(float(loss2) - float(ref_loss)) < 1e-3 * max(1.0, abs(float(ref_loss)))


def test_accum_steps_rejects_indivisible_batch():
    import jax

    from parakeet_tpu.train import ctc_loss_fn, value_and_grad_accum

    cfg = tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=9)
    batch = synthetic_batch(cfg, batch=3, mel_frames=64, max_labels=6)
    vag = value_and_grad_accum(
        lambda p, b: ctc_loss_fn(p, cfg, b, cfg.ctc_vocab_size - 1), accum_steps=2
    )
    with pytest.raises(ValueError, match="not divisible by accum_steps"):
        jax.jit(vag)(params, {k: np.asarray(v) for k, v in batch.items()})


def test_accum_rejects_fused_kernels():
    """Gradient accumulation scans the loss; fused Pallas kernels in the
    scan body crash this jax version's lowering — must fail loudly."""
    import jax

    from parakeet_tpu.models import encoder as E
    from parakeet_tpu.train import ctc_loss_fn, value_and_grad_accum

    cfg = tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=1)
    batch = synthetic_batch(cfg, batch=2, mel_frames=64, max_labels=6)
    vag = value_and_grad_accum(
        lambda p, b: ctc_loss_fn(p, cfg, b, cfg.ctc_vocab_size - 1), accum_steps=2
    )
    E.set_fused_attention("block")
    try:
        with pytest.raises(ValueError, match="fused"):
            jax.jit(vag)(params, {k: np.asarray(v) for k, v in batch.items()})
    finally:
        E.set_fused_attention(False)


def test_lr_schedules():
    import jax.numpy as jnp

    from parakeet_tpu.train import make_lr_schedule

    assert make_lr_schedule(1e-3) == 1e-3  # plain constant
    warm = make_lr_schedule(1e-3, warmup_steps=10)
    assert float(warm(0)) == 0.0 and float(warm(10)) == pytest.approx(1e-3)

    cos = make_lr_schedule(1e-3, schedule="cosine", warmup_steps=10, decay_steps=100)
    assert float(cos(10)) == pytest.approx(1e-3)
    assert float(cos(100)) == pytest.approx(0.0, abs=1e-9)
    with pytest.raises(ValueError, match="decay_steps"):
        make_lr_schedule(1e-3, schedule="cosine")
    # warmup >= total steps: clamped to total-1 (short smoke runs),
    # not optax's opaque "positive decay_steps" error
    tiny = make_lr_schedule(1e-3, schedule="cosine", warmup_steps=2, decay_steps=2)
    assert float(tiny(1)) == pytest.approx(1e-3)
    assert float(tiny(2)) == pytest.approx(0.0, abs=1e-9)
    with pytest.raises(ValueError, match="decay_steps"):
        make_lr_schedule(1e-3, schedule="cosine", warmup_steps=2, decay_steps=1)

    noam = make_lr_schedule(1e-3, schedule="noam", warmup_steps=100)
    # peak at warmup, rises before, decays as 1/sqrt after
    assert float(noam(jnp.asarray(100))) == pytest.approx(1e-3)
    assert float(noam(jnp.asarray(50))) == pytest.approx(5e-4)
    assert float(noam(jnp.asarray(400))) == pytest.approx(5e-4)
    with pytest.raises(ValueError, match="unknown schedule"):
        make_lr_schedule(1e-3, schedule="linear")


@pytest.mark.slow
def test_bf16_training_step():
    """compute_dtype='bfloat16': model runs bf16, master params stay f32,
    loss tracks the f32 loss and decreases."""
    import jax.numpy as jnp

    from parakeet_tpu.train import hybrid_loss_fn, with_compute_dtype

    cfg = tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=11)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, batch=2, mel_frames=64, max_labels=6).items()}

    f32_loss = float(hybrid_loss_fn(params, cfg, batch, sigma=0.05))
    bf16_loss = float(with_compute_dtype(
        lambda p, b: hybrid_loss_fn(p, cfg, b, sigma=0.05), "bfloat16"
    )(params, batch))
    assert abs(bf16_loss - f32_loss) < 0.05 * max(1.0, abs(f32_loss))

    mesh, state, step, place = make_sharded_trainer(
        cfg, params, make_mesh(2), loss="hybrid", sigma=0.05,
        compute_dtype="bfloat16", schedule="cosine", warmup_steps=2,
        decay_steps=10, learning_rate=3e-3,
    )
    # master params stay f32 even though the model computes in bf16
    assert all(
        v.dtype == np.float32
        for v in state.params.values()
        if np.issubdtype(v.dtype, np.floating)
    )
    pb = place(synthetic_batch(cfg, batch=2, mel_frames=64, max_labels=6))
    with mesh:
        p, o, l1 = step(state.params, state.opt_state, pb)
        for _ in range(4):
            p, o, l2 = step(p, o, pb)
    assert np.isfinite(float(l1)) and float(l2) < float(l1)


@pytest.mark.slow
def test_clip_norm_trainer():
    """clip_norm bounds the update magnitude and the step still runs."""
    import jax.numpy as jnp

    cfg = tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=13)
    batch = synthetic_batch(cfg, batch=2, mel_frames=64, max_labels=6)

    mesh, state, step, place = make_sharded_trainer(
        cfg, params, make_mesh(2), loss="ctc", learning_rate=1e-3, clip_norm=1e-6
    )
    with mesh:
        p1, _, l1 = step(state.params, state.opt_state, place(batch))
    assert np.isfinite(float(l1))
    # with a near-zero clip the global update norm is ~lr·clip-scaled tiny;
    # params barely move compared to the unclipped step
    moved = max(
        float(np.abs(np.asarray(p1[k]) - np.asarray(params[k])).max()) for k in params
    )
    mesh2, state2, step2, place2 = make_sharded_trainer(
        cfg, params, make_mesh(2), loss="ctc", learning_rate=1e-3
    )
    with mesh2:
        p2, _, _ = step2(state2.params, state2.opt_state, place2(batch))
    moved_unclipped = max(
        float(np.abs(np.asarray(p2[k]) - np.asarray(params[k])).max()) for k in params
    )
    assert moved < moved_unclipped


def test_conv_accum_flag_is_context_local():
    """set_conv_accum_f32 must not leak across threads: a trainer toggling
    it mid-trace (train.with_compute_dtype) runs concurrently with inference
    traces on other threads (e.g. periodic eval)."""
    import threading

    from parakeet_tpu.ops import layers

    assert layers.get_conv_accum_f32() is True
    seen = {}

    def worker():
        # fresh thread starts from the ContextVar default, regardless of
        # what the main thread sets
        seen["initial"] = layers.get_conv_accum_f32()
        layers.set_conv_accum_f32(False)
        seen["after_set"] = layers.get_conv_accum_f32()

    layers.set_conv_accum_f32(False)
    try:
        t = threading.Thread(target=worker)
        t.start()
        t.join(timeout=30)
        assert seen == {"initial": True, "after_set": False}
        # and the worker's set didn't clobber this thread either way
        assert layers.get_conv_accum_f32() is False
    finally:
        layers.set_conv_accum_f32(True)
    assert layers.get_conv_accum_f32() is True
