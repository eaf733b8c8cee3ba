"""RNNT / TDT lattice loss tests.

Oracles are brute-force path enumerations (exponential DFS over alignment
paths, summing raw probabilities) — fully independent of the DP/scan
formulation in ops/transducer_loss.py. Gradients are checked against
central finite differences.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parakeet_tpu.ops.transducer_loss import rnnt_loss, tdt_loss


def brute_rnnt(lp: np.ndarray, labels: list[int], t_len: int, blank: int) -> float:
    """Sum path probabilities by explicit DFS. lp: (T, U+1, V) log-probs."""
    u_len = len(labels)

    def walk(t, u, score):
        if t == t_len - 1 and u == u_len:
            total[0] += math.exp(score + lp[t, u, blank])
        if t + 1 <= t_len - 1:
            walk(t + 1, u, score + lp[t, u, blank])
        if u < u_len:
            walk(t, u + 1, score + lp[t, u, labels[u]])

    total = [0.0]
    walk(0, 0, 0.0)
    return -math.log(total[0])


def brute_tdt(
    lab: np.ndarray,
    dur: np.ndarray,
    labels: list[int],
    t_len: int,
    blank: int,
    durations: tuple[int, ...],
    sigma: float = 0.0,
) -> float:
    """DFS over TDT paths. lab: (T, U+1, V), dur: (T, U+1, D)."""
    u_len = len(labels)
    lab = lab - sigma

    def walk(t, u, score):
        if u == u_len:
            for j, d in enumerate(durations):
                if d >= 1 and t + d == t_len:
                    total[0] += math.exp(score + lab[t, u, blank] + dur[t, u, j])
        for j, d in enumerate(durations):
            if d >= 1 and t + d <= t_len - 1:
                walk(t + d, u, score + lab[t, u, blank] + dur[t, u, j])
            if u < u_len and t + d <= t_len - 1:
                walk(t + d, u + 1, score + lab[t, u, labels[u]] + dur[t, u, j])

    total = [0.0]
    walk(0, 0, 0.0)
    return -math.log(total[0])


def random_log_probs(rng, shape):
    x = rng.randn(*shape).astype(np.float32)
    return np.log(np.exp(x) / np.exp(x).sum(-1, keepdims=True))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rnnt_loss_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    b, t, u, v, blank = 3, 4, 3, 5, 4
    lp = random_log_probs(rng, (b, t, u + 1, v))
    labels = rng.randint(0, v - 1, size=(b, u)).astype(np.int32)
    # ragged valid lengths inside the padded batch
    t_lens = np.array([t, t - 1, 2], np.int32)
    u_lens = np.array([u, 1, 0], np.int32)

    got = rnnt_loss(jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(t_lens),
                    jnp.asarray(u_lens), blank)
    for i in range(b):
        want = brute_rnnt(lp[i], list(labels[i][: u_lens[i]]), int(t_lens[i]), blank)
        assert abs(float(got[i]) - want) < 1e-4, (i, float(got[i]), want)


@pytest.mark.parametrize(
    "durations,seed",
    [((0, 1, 2), 0), ((0, 1, 2, 3, 4), 1), ((1, 2), 2), ((0, 1), 3)],
)
def test_tdt_loss_matches_brute_force(durations, seed):
    rng = np.random.RandomState(seed)
    b, t, u, v, blank = 2, 5, 3, 4, 3
    d = len(durations)
    lab = random_log_probs(rng, (b, t, u + 1, v))
    dur = random_log_probs(rng, (b, t, u + 1, d))
    labels = rng.randint(0, v - 1, size=(b, u)).astype(np.int32)
    t_lens = np.array([t, t - 1], np.int32)
    u_lens = np.array([u, 2], np.int32)

    got = tdt_loss(jnp.asarray(lab), jnp.asarray(dur), jnp.asarray(labels),
                   jnp.asarray(t_lens), jnp.asarray(u_lens), blank, durations)
    for i in range(b):
        want = brute_tdt(lab[i], dur[i], list(labels[i][: u_lens[i]]),
                         int(t_lens[i]), blank, durations)
        assert abs(float(got[i]) - want) < 1e-4, (i, float(got[i]), want)


def test_tdt_sigma_matches_brute_force():
    rng = np.random.RandomState(7)
    t, u, v, durations, blank = 4, 2, 4, (0, 1, 2), 3
    lab = random_log_probs(rng, (1, t, u + 1, v))
    dur = random_log_probs(rng, (1, t, u + 1, len(durations)))
    labels = rng.randint(0, v - 1, size=(1, u)).astype(np.int32)
    got = tdt_loss(jnp.asarray(lab), jnp.asarray(dur), jnp.asarray(labels),
                   jnp.asarray([t]), jnp.asarray([u]), blank, durations, sigma=0.05)
    want = brute_tdt(lab[0], dur[0], list(labels[0]), t, blank, durations, sigma=0.05)
    assert abs(float(got[0]) - want) < 1e-4


def test_rnnt_loss_padding_invariance():
    """Extra padded frames/labels beyond the valid lengths must not change
    the loss (the lattice answer only reads the valid region)."""
    rng = np.random.RandomState(3)
    t, u, v, blank = 5, 3, 6, 5
    lp = random_log_probs(rng, (1, t, u + 1, v))
    labels = rng.randint(0, v - 1, size=(1, u)).astype(np.int32)
    base = rnnt_loss(jnp.asarray(lp), jnp.asarray(labels),
                     jnp.asarray([t]), jnp.asarray([u]), blank)

    lp_pad = np.concatenate([lp, rng.randn(1, 2, u + 1, v).astype(np.float32)], axis=1)
    lp_pad = np.concatenate(
        [lp_pad, rng.randn(1, t + 2, 2, v).astype(np.float32)], axis=2
    )
    labels_pad = np.concatenate([labels, [[0, 1]]], axis=1).astype(np.int32)
    padded = rnnt_loss(jnp.asarray(lp_pad), jnp.asarray(labels_pad),
                       jnp.asarray([t]), jnp.asarray([u]), blank)
    np.testing.assert_allclose(np.asarray(base), np.asarray(padded), rtol=1e-6)


def test_tdt_loss_padding_invariance():
    rng = np.random.RandomState(4)
    t, u, v, durations, blank = 4, 2, 4, (0, 1, 2), 3
    d = len(durations)
    lab = random_log_probs(rng, (1, t, u + 1, v))
    dur = random_log_probs(rng, (1, t, u + 1, d))
    labels = rng.randint(0, v - 1, size=(1, u)).astype(np.int32)
    base = tdt_loss(jnp.asarray(lab), jnp.asarray(dur), jnp.asarray(labels),
                    jnp.asarray([t]), jnp.asarray([u]), blank, durations)

    lab_p = np.concatenate([lab, rng.randn(1, 3, u + 1, v).astype(np.float32)], 1)
    dur_p = np.concatenate([dur, rng.randn(1, 3, u + 1, d).astype(np.float32)], 1)
    lab_p = np.concatenate([lab_p, rng.randn(1, t + 3, 1, v).astype(np.float32)], 2)
    dur_p = np.concatenate([dur_p, rng.randn(1, t + 3, 1, d).astype(np.float32)], 2)
    labels_p = np.concatenate([labels, [[1]]], 1).astype(np.int32)
    padded = tdt_loss(jnp.asarray(lab_p), jnp.asarray(dur_p), jnp.asarray(labels_p),
                      jnp.asarray([t]), jnp.asarray([u]), blank, durations)
    np.testing.assert_allclose(np.asarray(base), np.asarray(padded), rtol=1e-6)


def _finite_diff_check(loss_of, x0: np.ndarray, n_coords: int, seed: int, tol=2e-2):
    g = np.asarray(jax.grad(lambda x: jnp.sum(loss_of(x)))(jnp.asarray(x0)))
    rng = np.random.RandomState(seed)
    flat = x0.reshape(-1)
    eps = 1e-3
    for idx in rng.choice(flat.size, size=n_coords, replace=False):
        bump = np.zeros_like(flat)
        bump[idx] = eps
        hi = float(jnp.sum(loss_of(jnp.asarray((flat + bump).reshape(x0.shape)))))
        lo = float(jnp.sum(loss_of(jnp.asarray((flat - bump).reshape(x0.shape)))))
        num = (hi - lo) / (2 * eps)
        ana = g.reshape(-1)[idx]
        assert abs(num - ana) < tol * max(1.0, abs(num)), (idx, num, ana)


@pytest.mark.slow
def test_rnnt_loss_gradients():
    rng = np.random.RandomState(11)
    b, t, u, v, blank = 2, 4, 2, 4, 3
    lp = random_log_probs(rng, (b, t, u + 1, v)).astype(np.float64).astype(np.float32)
    labels = jnp.asarray(rng.randint(0, v - 1, size=(b, u)).astype(np.int32))
    t_lens, u_lens = jnp.asarray([t, 3]), jnp.asarray([u, 1])
    _finite_diff_check(
        lambda x: rnnt_loss(x, labels, t_lens, u_lens, blank), lp, 12, 0
    )


@pytest.mark.slow
def test_tdt_loss_gradients():
    rng = np.random.RandomState(12)
    b, t, u, v, durations, blank = 1, 4, 2, 4, (0, 1, 2), 3
    lab = random_log_probs(rng, (b, t, u + 1, v))
    dur = random_log_probs(rng, (b, t, u + 1, len(durations)))
    labels = jnp.asarray(rng.randint(0, v - 1, size=(b, u)).astype(np.int32))
    t_lens, u_lens = jnp.asarray([t]), jnp.asarray([u])
    _finite_diff_check(
        lambda x: tdt_loss(x, jnp.asarray(dur), labels, t_lens, u_lens, blank, durations),
        lab, 10, 1,
    )
    _finite_diff_check(
        lambda x: tdt_loss(jnp.asarray(lab), x, labels, t_lens, u_lens, blank, durations),
        dur, 10, 2,
    )


def test_losses_jit_and_finite():
    rng = np.random.RandomState(5)
    b, t, u, v, blank = 4, 12, 6, 8, 7
    durations = (0, 1, 2, 3, 4)
    lab = jnp.asarray(random_log_probs(rng, (b, t, u + 1, v)))
    dur = jnp.asarray(random_log_probs(rng, (b, t, u + 1, len(durations))))
    labels = jnp.asarray(rng.randint(0, v - 1, size=(b, u)).astype(np.int32))
    t_lens = jnp.asarray(rng.randint(durations[-1] + 1, t + 1, size=(b,)).astype(np.int32))
    u_lens = jnp.asarray(rng.randint(0, u + 1, size=(b,)).astype(np.int32))

    r = jax.jit(lambda *a: rnnt_loss(*a, blank_id=blank))(lab, labels, t_lens, u_lens)
    td = jax.jit(
        lambda *a: tdt_loss(*a, blank_id=blank, durations=durations)
    )(lab, dur, labels, t_lens, u_lens)
    assert np.isfinite(np.asarray(r)).all() and (np.asarray(r) > 0).all()
    assert np.isfinite(np.asarray(td)).all() and (np.asarray(td) > 0).all()
