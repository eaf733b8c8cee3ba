"""Pipeline parallelism (parallel/pipeline.py): GPipe over the conformer
stack on a ('data', 'pipe') mesh.

Acceptance bar: the pipelined encoder and trainer are *numerically
equivalent* to the plain ones — same blocks in the same order, microbatching
is per-example exact — so every test pins equality against the non-pp path
on the 8-device virtual CPU mesh (conftest.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.models.encoder import fastconformer_encode
from parakeet_tpu.params import Params
from parakeet_tpu.parallel.mesh import make_mesh
from parakeet_tpu.parallel.pipeline import (
    make_pp_trainer,
    merge_layer_params,
    pipeline_encode,
    split_layer_params,
)
from parakeet_tpu.train import hybrid_loss_fn, synthetic_batch


def tiny_cfg(num_layers=4):
    return C.TDTCTCConfig(
        encoder=C.EncoderConfig(
            mel_bins=80,
            subsampling_channels=32,
            hidden_size=64,
            num_layers=num_layers,
            num_heads=4,
            ffn_intermediate=128,
            conv_kernel_size=9,
        ),
        prediction=C.PredictionConfig(vocab_size=65, pred_hidden=32, num_lstm_layers=1),
        joint=C.JointConfig(
            encoder_hidden=64, pred_hidden=32, joint_hidden=32, vocab_size=65
        ),
        ctc_vocab_size=65,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = P.init_params(P.tdt_ctc_spec(cfg), seed=0)
    batch = synthetic_batch(cfg, batch=8, mel_frames=64, max_labels=6)
    return cfg, params, batch


def test_split_merge_round_trip(setup):
    cfg, params, _ = setup
    stacked, rest = split_layer_params(params, cfg.encoder.num_layers)
    # every per-layer key is stacked, everything else untouched
    assert all(v.shape[0] == cfg.encoder.num_layers for v in stacked.values())
    assert not any(k.startswith("encoder_.layers_.") for k in rest)
    merged = merge_layer_params(stacked, rest)
    assert set(merged) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(merged[k]), np.asarray(params[k]))


@pytest.mark.parametrize("pp,n_micro", [(4, 2), (2, 2), (2, 1)])
def test_pipeline_encode_matches_dense(setup, pp, n_micro):
    cfg, params, batch = setup
    feats = jnp.asarray(batch["features"])
    lens = jnp.asarray(batch["mel_lengths"])
    ref = fastconformer_encode(Params(params).sub("encoder_"), cfg.encoder, feats, lens)

    mesh = make_mesh(8, pipeline_parallel=pp)
    stacked, rest = split_layer_params(params, cfg.encoder.num_layers)

    def run(stacked, rest, feats, lens):
        return pipeline_encode(
            stacked, rest, cfg.encoder, feats, lens, mesh=mesh, n_micro=n_micro
        )

    with mesh:
        got = jax.jit(run)(stacked, rest, feats, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_pipeline_encode_ragged_lengths(setup):
    """Padded clips of different lengths — masks ride the microbatches."""
    cfg, params, batch = setup
    feats = jnp.asarray(batch["features"])
    lens = jnp.asarray([64, 37, 50, 64, 22, 64, 41, 9], dtype=jnp.int32)
    ref = fastconformer_encode(Params(params).sub("encoder_"), cfg.encoder, feats, lens)
    mesh = make_mesh(8, pipeline_parallel=2)
    stacked, rest = split_layer_params(params, cfg.encoder.num_layers)
    with mesh:
        got = jax.jit(
            lambda s, r, f, l: pipeline_encode(
                s, r, cfg.encoder, f, l, mesh=mesh, n_micro=2
            )
        )(stacked, rest, feats, lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_pp_loss_and_grads_match_dense(setup):
    """Loss AND gradients of the pipelined hybrid objective equal the dense
    ones. (Post-optimizer params are deliberately not compared: params with
    structurally zero gradients — e.g. k_proj.bias, to which softmax is
    invariant — get pure-noise Adam step-1 updates in ANY implementation.)"""
    cfg, params, batch = setup
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    ref_loss, ref_grads = jax.value_and_grad(hybrid_loss_fn)(
        params, cfg, jbatch, sigma=0.05
    )

    mesh = make_mesh(8, pipeline_parallel=2)
    stacked, rest = split_layer_params(params, cfg.encoder.num_layers)

    from parakeet_tpu.models.encoder import encoded_lengths
    from parakeet_tpu.train import encoded_loss_fn

    def pp_loss(tp, b):
        enc = pipeline_encode(
            tp["layers"], tp["rest"], cfg.encoder,
            b["features"], b["mel_lengths"], mesh=mesh, n_micro=2,
        )
        enc_lens = jnp.minimum(encoded_lengths(b["mel_lengths"]), enc.shape[1])
        return encoded_loss_fn(
            tp["rest"], cfg, enc, enc_lens, b, loss="hybrid", sigma=0.05
        )

    with mesh:
        loss, grads = jax.jit(jax.value_and_grad(pp_loss))(
            {"layers": stacked, "rest": rest}, jbatch
        )
    assert abs(float(loss) - float(ref_loss)) < 1e-3 * max(1.0, abs(float(ref_loss)))

    got = merge_layer_params(grads["layers"], grads["rest"])
    assert set(got) == set(ref_grads)
    for k in sorted(got):
        if k.endswith(".mha_.k_proj.bias"):
            # structurally zero gradient: a constant added to every key
            # shifts all of a query's scores equally and softmax is
            # invariant — what remains is pure accumulation noise, not
            # comparable across evaluation orders. Pin that it IS noise.
            assert float(np.abs(np.asarray(ref_grads[k])).max()) < 1e-4, k
            continue
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref_grads[k]),
            rtol=2e-3, atol=1e-5, err_msg=k,
        )


@pytest.mark.slow
def test_pp_trainer_step(setup):
    cfg, params, batch = setup
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    ref_loss = float(hybrid_loss_fn(params, cfg, jbatch, sigma=0.05))

    mesh = make_mesh(8, pipeline_parallel=2)
    state, step, place_batch, export = make_pp_trainer(
        cfg, params, mesh, n_micro=2, loss="hybrid", sigma=0.05, learning_rate=1e-3
    )
    with mesh:
        tp, opt_state, loss = step(state.params, state.opt_state, place_batch(batch))
    assert abs(float(loss) - ref_loss) < 1e-3 * max(1.0, abs(ref_loss))

    exported = export(tp)
    assert set(exported) == set(params)
    # updates applied: at lr=1e-3 the big-gradient params must move
    moved = sum(
        float(np.max(np.abs(np.asarray(exported[k]) - np.asarray(params[k]))))
        for k in exported
    )
    assert moved > 0.0


@pytest.mark.slow
def test_pp_second_step_runs(setup):
    """The jitted step is reusable (donated buffers threaded correctly)."""
    cfg, params, batch = setup
    mesh = make_mesh(8, pipeline_parallel=4)
    state, step, place_batch, _ = make_pp_trainer(
        cfg, params, mesh, n_micro=2, loss="ctc"
    )
    pb = place_batch(batch)
    with mesh:
        tp, opt_state, l1 = step(state.params, state.opt_state, pb)
        tp, opt_state, l2 = step(tp, opt_state, place_batch(batch))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1)  # same batch twice → loss decreases


def test_pp_guards(setup):
    cfg, params, batch = setup
    with pytest.raises(ValueError, match="pipeline_parallel composes"):
        make_mesh(8, model_parallel=2, pipeline_parallel=2)
    with pytest.raises(ValueError, match="no 'pipe' axis"):
        pipeline_encode(
            {}, params, cfg.encoder,
            jnp.asarray(batch["features"]), jnp.asarray(batch["mel_lengths"]),
            mesh=make_mesh(8), n_micro=2,
        )
    # 4 layers don't divide pipe=8... use 3-layer config against pipe=2
    cfg3 = tiny_cfg(num_layers=3)
    params3 = P.init_params(P.tdt_ctc_spec(cfg3), seed=0)
    mesh = make_mesh(8, pipeline_parallel=2)
    with pytest.raises(ValueError, match="not divisible by pipe"):
        with mesh:
            jax.jit(
                lambda s, r, f, l: pipeline_encode(
                    s, r, cfg3.encoder, f, l, mesh=mesh, n_micro=2
                )
            )(
                *split_layer_params(params3, 3),
                jnp.asarray(batch["features"]),
                jnp.asarray(batch["mel_lengths"]),
            )
    # tp/sp mesh rejected by the trainer
    with pytest.raises(ValueError, match="data parallelism only"):
        make_pp_trainer(cfg, params, make_mesh(8, model_parallel=2))


def test_pipeline_ignores_fused_kernel_globals(setup):
    """set_fused_ffn/set_conv_layout/set_fused_attention must not leak
    Pallas dispatches into the shard_map body (xla_only= threads through
    every block sub-module). On CPU any leaked pallas_call raises
    ('interpret mode only'); on TPU it would crash the lowering cache
    (pallas inside scan). T'=64 so _ffn_fusable would fire without the
    guard."""
    from parakeet_tpu.models import encoder as E

    cfg, params, _ = setup
    feats = jnp.asarray(np.random.RandomState(1).randn(4, 512, 80) * 0.1,
                        jnp.float32)
    lens = jnp.full((4,), 512, jnp.int32)
    ref = fastconformer_encode(Params(params).sub("encoder_"), cfg.encoder, feats, lens)

    mesh = make_mesh(8, pipeline_parallel=2)
    stacked, rest = split_layer_params(params, cfg.encoder.num_layers)
    E.set_fused_ffn(True)
    E.set_conv_layout("pallas")
    E.set_fused_attention("block4")
    try:
        with mesh:
            got = jax.jit(
                lambda s, r, f, l: pipeline_encode(
                    s, r, cfg.encoder, f, l, mesh=mesh, n_micro=1
                )
            )(stacked, rest, feats, lens)
    finally:
        E.set_fused_ffn(False)
        E.set_conv_layout("nch")
        E.set_fused_attention(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_parallel_package_does_not_eagerly_import_optax():
    """parallel/__init__ lazily resolves the pipeline trainer so
    inference-only installs (deps: jax + numpy) keep mesh/sharding."""
    import subprocess
    import sys

    code = (
        "import parakeet_tpu.parallel, sys;"
        "assert 'optax' not in sys.modules, 'optax imported eagerly';"
        "import parakeet_tpu.parallel.mesh;"
        "assert 'optax' not in sys.modules;"
        "parakeet_tpu.parallel.make_pp_trainer"  # lazy attr resolves
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=240)


@pytest.mark.slow
def test_pp_trainer_clip_norm(setup):
    """clip_norm reaches the GPipe optimizer (was silently dropped once):
    a near-zero clip moves params strictly less than the unclipped step."""
    cfg, params, batch = setup
    mesh = make_mesh(8, pipeline_parallel=2)
    state, step, place_batch, export = make_pp_trainer(
        cfg, params, mesh, n_micro=2, loss="ctc", learning_rate=1e-3,
        clip_norm=1e-6,
    )
    with mesh:
        tp, _, l1 = step(state.params, state.opt_state, place_batch(batch))
    assert np.isfinite(float(l1))
    moved = max(
        float(np.abs(np.asarray(v) - np.asarray(params[k])).max())
        for k, v in export(tp).items()
    )
    mesh2 = make_mesh(8, pipeline_parallel=2)
    state2, step2, place2, export2 = make_pp_trainer(
        cfg, params, mesh2, n_micro=2, loss="ctc", learning_rate=1e-3
    )
    with mesh2:
        tp2, _, _ = step2(state2.params, state2.opt_state, place2(batch))
    moved_unclipped = max(
        float(np.abs(np.asarray(v) - np.asarray(params[k])).max())
        for k, v in export2(tp2).items()
    )
    assert moved < moved_unclipped
