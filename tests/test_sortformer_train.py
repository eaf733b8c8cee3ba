"""Sortformer diarization training (train.py sortformer section): Sort Loss
(arrival-ordered BCE) + PIL (permutation-invariant BCE), the arXiv:2409.06656
recipe. The reference serves Sortformer inference-only — this is the
training capability for the stack."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from parakeet_tpu import config as C
from parakeet_tpu import params as P
from parakeet_tpu.train import (
    make_sortformer_train_step,
    sort_speakers_by_arrival,
    sortformer_bce,
    sortformer_loss_fn,
    synthetic_sortformer_batch,
)


def tiny_sf_config():
    return C.SortformerConfig(
        nest_encoder=C.StreamingEncoderConfig(
            mel_bins=128, subsampling_channels=8, hidden_size=24, num_layers=2,
            num_heads=2, ffn_intermediate=32, conv_kernel_size=5,
            att_context_left=6, att_context_right=0, subsampling_activation="relu",
            xscaling=True,
        ),
        encoder_hidden=24,
        transformer_hidden=12,
        transformer=C.TransformerConfig(
            hidden_size=12, num_layers=2, num_heads=2, ffn_intermediate=24,
            pre_ln=False, has_final_norm=False,
        ),
        max_speakers=4,
    )


def test_sort_by_arrival_orders_channels():
    # speaker 2 arrives first (t=0), speaker 0 second (t=2), speaker 3 never
    t, s = 6, 4
    tgt = np.zeros((1, t, s), np.float32)
    tgt[0, 0:3, 2] = 1.0
    tgt[0, 2:5, 0] = 1.0
    tgt[0, 4:6, 1] = 1.0
    out = np.asarray(sort_speakers_by_arrival(jnp.asarray(tgt)))
    np.testing.assert_array_equal(out[0, :, 0], tgt[0, :, 2])
    np.testing.assert_array_equal(out[0, :, 1], tgt[0, :, 0])
    np.testing.assert_array_equal(out[0, :, 2], tgt[0, :, 1])
    np.testing.assert_array_equal(out[0, :, 3], 0.0)  # silent speaker last


def test_sort_by_arrival_is_idempotent():
    rng = np.random.RandomState(0)
    tgt = (rng.rand(3, 10, 4) > 0.6).astype(np.float32)
    once = sort_speakers_by_arrival(jnp.asarray(tgt))
    twice = sort_speakers_by_arrival(once)
    np.testing.assert_array_equal(np.asarray(once), np.asarray(twice))


@pytest.fixture(scope="module")
def sf_setup():
    cfg = tiny_sf_config()
    params = P.init_params(P.sortformer_spec(cfg), seed=3)
    batch = synthetic_sortformer_batch(cfg, batch=2, mel_frames=64, seed=1)
    return cfg, params, batch


def test_pil_is_permutation_invariant(sf_setup):
    """Shuffling the target speaker channels must not change the PIL part
    (sort_weight=0)."""
    cfg, params, batch = sf_setup
    base = float(sortformer_loss_fn(params, cfg, batch, sort_weight=0.0))
    perm = [2, 0, 3, 1]
    shuffled = dict(batch, targets=batch["targets"][:, :, perm])
    got = float(sortformer_loss_fn(params, cfg, shuffled, sort_weight=0.0))
    assert abs(base - got) < 1e-6

    # ...while the Sort Loss part is also invariant (arrival sort normalizes
    # the channel order before BCE)
    s_base = float(sortformer_loss_fn(params, cfg, batch, sort_weight=1.0))
    s_got = float(sortformer_loss_fn(params, cfg, shuffled, sort_weight=1.0))
    assert abs(s_base - s_got) < 1e-6


def test_pil_lower_or_equal_than_any_assignment(sf_setup):
    """PIL takes the min over permutations, so it can't exceed the identity
    assignment's BCE."""
    cfg, params, batch = sf_setup
    from parakeet_tpu.models.encoder import encoded_lengths
    from parakeet_tpu.models.sortformer import sortformer_logits

    logits = sortformer_logits(
        params, jnp.asarray(batch["features"]), cfg=cfg,
        mel_lengths=jnp.asarray(batch["mel_lengths"]),
    )
    t = logits.shape[1]
    mask = (jnp.arange(t)[None, :]
            < encoded_lengths(jnp.asarray(batch["mel_lengths"]))[:, None]).astype(jnp.float32)
    identity = float(jnp.mean(sortformer_bce(
        logits, jnp.asarray(batch["targets"][:, :t]), mask)))
    pil = float(sortformer_loss_fn(params, cfg, batch, sort_weight=0.0))
    assert pil <= identity + 1e-6


def test_padded_frames_do_not_affect_loss(sf_setup):
    cfg, params, batch = sf_setup
    short = dict(batch, mel_lengths=np.array([40, 64], np.int32))
    base = float(sortformer_loss_fn(params, cfg, short))
    # poison targets beyond the valid frames of clip 0 — must be masked out
    t_valid = (40 - 1) // 2 + 1
    t_valid = (t_valid - 1) // 2 + 1
    t_valid = (t_valid - 1) // 2 + 1
    poisoned = np.array(short["targets"])
    poisoned[0, t_valid:, :] = 1.0
    got = float(sortformer_loss_fn(params, cfg, dict(short, targets=poisoned)))
    assert abs(base - got) < 1e-6


@pytest.mark.slow
def test_sortformer_train_step_reduces_loss(sf_setup):
    cfg, params, batch = sf_setup
    opt = optax.adam(3e-3)
    step = make_sortformer_train_step(cfg, opt, sort_weight=0.5)
    # copy: the step donates its params and jnp.asarray aliases the module
    # fixture's buffers
    p, o = {k: jnp.array(v, copy=True) for k, v in params.items()}, opt.init(params)
    losses = []
    for _ in range(5):
        p, o, loss = step(p, o, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_sortformer_remat_and_accum_match(sf_setup):
    cfg, params, batch = sf_setup
    ref_l, ref_g = jax.value_and_grad(sortformer_loss_fn)(params, cfg, batch)
    rem_l, rem_g = jax.value_and_grad(sortformer_loss_fn)(params, cfg, batch, remat=True)
    assert abs(float(ref_l) - float(rem_l)) < 1e-5 * max(1.0, abs(float(ref_l)))
    for k in ref_g:
        np.testing.assert_allclose(
            np.asarray(rem_g[k]), np.asarray(ref_g[k]), rtol=1e-4, atol=1e-6, err_msg=k
        )

    from parakeet_tpu.train import value_and_grad_accum

    vag = value_and_grad_accum(lambda p, b: sortformer_loss_fn(p, cfg, b), 2)
    acc_l, acc_g = jax.jit(vag)(params, {k: jnp.asarray(v) for k, v in batch.items()})
    assert abs(float(ref_l) - float(acc_l)) < 1e-4 * max(1.0, abs(float(ref_l)))
    for k in ref_g:
        np.testing.assert_allclose(
            np.asarray(acc_g[k]), np.asarray(ref_g[k]), rtol=2e-3, atol=2e-5, err_msg=k
        )
