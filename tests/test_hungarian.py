"""Exactness of the in-jit Hungarian vs scipy (SURVEY §4(c))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sod_tpu.ops.hungarian import assignment_cost, hungarian


@pytest.mark.parametrize("shape", [(1, 1), (2, 20), (3, 5), (8, 20), (20, 20)])
def test_hungarian_matches_scipy(rng, shape):
    solve = jax.jit(hungarian)
    for trial in range(20):
        cost = rng.randn(*shape).astype(np.float32)
        ours = np.asarray(solve(jnp.asarray(cost)))
        rows, cols = linear_sum_assignment(cost)
        ours_cost = cost[np.arange(shape[0]), ours].sum()
        scipy_cost = cost[rows, cols].sum()
        assert len(set(ours.tolist())) == shape[0], "columns must be distinct"
        np.testing.assert_allclose(ours_cost, scipy_cost, rtol=1e-5)


def test_hungarian_with_duplicate_costs():
    # degenerate ties must still yield a valid assignment
    cost = jnp.zeros((4, 6))
    ours = np.asarray(hungarian(cost))
    assert len(set(ours.tolist())) == 4


def test_hungarian_padded_rows_do_not_disturb():
    rng = np.random.RandomState(1)
    cost = rng.rand(2, 8).astype(np.float32)
    padded = np.concatenate([cost, np.full((3, 8), 0.5, np.float32)], axis=0)
    ours = np.asarray(hungarian(jnp.asarray(padded)))[:2]
    rows, cols = linear_sum_assignment(cost)
    ours_cost = cost[np.arange(2), ours].sum()
    np.testing.assert_allclose(ours_cost, cost[rows, cols].sum(), rtol=1e-5)


def test_hungarian_vmap():
    rng = np.random.RandomState(2)
    costs = rng.randn(10, 3, 7).astype(np.float32)
    batched = jax.jit(jax.vmap(hungarian))(jnp.asarray(costs))
    for b in range(10):
        rows, cols = linear_sum_assignment(costs[b])
        ours_cost = costs[b][np.arange(3), np.asarray(batched[b])].sum()
        np.testing.assert_allclose(ours_cost, costs[b][rows, cols].sum(),
                                   rtol=1e-5)
