"""Device-side LAP solver vs scipy's linear_sum_assignment."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from petr_tpu.ops import hungarian_match, lap_solve


def scipy_cost(cost):
    r, c = linear_sum_assignment(cost)
    return cost[r, c].sum()


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("shape", [(4, 9), (12, 30), (32, 100), (64, 64)])
def test_lap_matches_scipy_cost(seed, shape):
    rng = np.random.RandomState(seed)
    cost = rng.randn(*shape).astype(np.float32) * 10
    valid = np.ones(shape[0], np.bool_)
    col = np.asarray(lap_solve(jnp.asarray(cost), jnp.asarray(valid)))
    # assignment must be a permutation (distinct columns)
    assert len(set(col.tolist())) == shape[0]
    got = cost[np.arange(shape[0]), col].sum()
    want = scipy_cost(cost.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lap_with_padded_rows():
    rng = np.random.RandomState(7)
    R, C, n_real = 16, 40, 5
    cost = rng.randn(R, C).astype(np.float32) * 5
    valid = np.zeros(R, np.bool_)
    valid[:n_real] = True
    col = np.asarray(lap_solve(jnp.asarray(cost), jnp.asarray(valid)))
    got = cost[np.arange(n_real), col[:n_real]].sum()
    want = scipy_cost(cost[:n_real].astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    assert len(set(col[:n_real].tolist())) == n_real


def test_lap_duplicate_costs_tie():
    # degenerate ties should still produce a valid optimal perm
    cost = np.ones((6, 10), np.float32)
    col = np.asarray(lap_solve(jnp.asarray(cost), jnp.ones(6, bool)))
    assert len(set(col.tolist())) == 6


def test_lap_nan_clamped():
    cost = np.full((3, 5), np.nan, np.float32)
    cost[0, 1] = -50.0
    col = np.asarray(lap_solve(jnp.asarray(cost), jnp.ones(3, bool)))
    assert col[0] == 1  # the only finite (and cheapest) entry


def test_hungarian_match_vmap():
    rng = np.random.RandomState(0)
    B, Q, G = 3, 50, 12
    cost = rng.randn(B, Q, G).astype(np.float32)
    valid = np.ones((B, G), np.bool_)
    valid[1, 8:] = False
    q_of_g, mvalid = jax.vmap(hungarian_match)(jnp.asarray(cost), jnp.asarray(valid))
    q_of_g = np.asarray(q_of_g)
    for b in range(B):
        nv = valid[b].sum()
        got = cost[b][q_of_g[b, :nv], np.arange(nv)].sum()
        want = scipy_cost(cost[b, :, :nv].astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lap_jits():
    cost = jnp.asarray(np.random.RandomState(0).randn(8, 20), jnp.float32)
    f = jax.jit(lap_solve)
    col = np.asarray(f(cost, jnp.ones(8, bool)))
    assert len(set(col.tolist())) == 8


def test_padded_rows_never_clobber_real_matches():
    """Invalid rows return arbitrary columns; the loss-side scatter must not
    let them overwrite a real assignment (dump-slot contract)."""
    import jax.numpy as jnp
    from petr_tpu.train.losses import _match_single

    Q, G, C = 8, 4, 3
    rng = np.random.RandomState(0)
    cls_logits = jnp.asarray(rng.randn(Q, C), jnp.float32)
    # make query 0 strongly preferred by GT row 0 via the bbox cost
    codes = jnp.asarray(rng.randn(Q, 10), jnp.float32)
    gt_codes = jnp.tile(codes[0:1], (G, 1))
    gt_labels = jnp.asarray([1, 2, 0, 0], jnp.int32)
    gt_valid = jnp.asarray([True, False, False, False])
    labels_q, targets_q, weights_q, npos = _match_single(
        cls_logits, codes, gt_codes, gt_labels, gt_valid,
        num_classes=C, cls_weight=2.0, bbox_weight=0.25,
    )
    assert float(npos) == 1.0
    # exactly one positive query, labeled with gt row 0's class
    matched = np.where(np.asarray(weights_q) > 0)[0]
    assert len(matched) == 1
    assert np.asarray(labels_q)[matched[0]] == 1
    # every other query is background
    others = np.setdiff1d(np.arange(Q), matched)
    assert (np.asarray(labels_q)[others] == C).all()


@pytest.mark.parametrize("seed", range(3))
def test_lap_matches_scipy_flagship_shape(seed):
    """Round-5 warm-start regression at the flagship matching shape
    (max_gt=128 GT rows x 900 queries): the row-reduction initialization
    must leave the assignment exactly optimal."""
    rng = np.random.RandomState(100 + seed)
    # matching-shaped cost: focal-like class cost + L1 distance structure
    # (correlated columns — harder tie/collision structure than iid randn)
    q = rng.randn(900, 2) * 20
    g = rng.randn(128, 2) * 20
    cost = np.abs(q[:, None, :] - g[None, :, :]).sum(-1).T.astype(np.float32)
    cost += rng.randn(128, 900).astype(np.float32)
    valid = np.ones(128, np.bool_)
    col = np.asarray(lap_solve(jnp.asarray(cost), jnp.asarray(valid)))
    assert len(set(col.tolist())) == 128
    got = cost[np.arange(128), col].sum()
    want = scipy_cost(cost.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-5)
