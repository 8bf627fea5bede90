"""Exactness of the sort-free stage-1 top-k selection kernel.

The kernel must return the same index SET as ``jax.lax.top_k`` (including
its lowest-index-first tie selection), in ascending index order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viddet_tpu.ops.topk_pallas import topk_indices_pallas


def _oracle_set(scores, k):
    _, idx = jax.lax.top_k(scores, k)
    return np.sort(np.asarray(idx), axis=1)


@pytest.mark.parametrize("n,k", [(10647, 400), (252, 40), (130, 130), (7, 3)])
def test_matches_topk_random(n, k):
    rng = np.random.default_rng(0)
    scores = jnp.asarray(
        rng.uniform(0.0, 1.0, size=(3, n)).astype(np.float32)
    )
    got = np.asarray(topk_indices_pallas(scores, k, interpret=True))
    # ascending-index order by construction
    assert np.all(np.diff(got, axis=1) > 0)
    np.testing.assert_array_equal(got, _oracle_set(scores, k))


def test_ties_lowest_index_first():
    # Many exact ties straddling the k-th slot: lax.top_k keeps the
    # lowest-index ties, and so must we.
    scores = np.zeros((2, 500), np.float32)
    scores[:, ::3] = 0.5  # 167 tied candidates at 0.5
    scores[0, 10] = 0.9
    scores[1, 499] = 0.7
    scores = jnp.asarray(scores)
    k = 40
    got = np.asarray(topk_indices_pallas(scores, k, interpret=True))
    np.testing.assert_array_equal(got, _oracle_set(scores, k))


def test_all_equal_scores():
    scores = jnp.full((1, 300), 0.25, jnp.float32)
    got = np.asarray(topk_indices_pallas(scores, 50, interpret=True))
    np.testing.assert_array_equal(got, np.arange(50)[None])


def test_zeros_and_subnormals():
    # sigmoid underflow produces exact 0.0 scores; padding (-1.0) must
    # still sort strictly below them.
    rng = np.random.default_rng(1)
    scores = np.zeros((2, 200), np.float32)
    scores[:, :20] = rng.uniform(1e-40, 1e-38, size=(2, 20))  # subnormals
    scores = jnp.asarray(scores)
    k = 150  # forces selection deep into the zero ties
    got = np.asarray(topk_indices_pallas(scores, k, interpret=True))
    np.testing.assert_array_equal(got, _oracle_set(scores, k))


def test_k_equals_n():
    scores = jnp.asarray(
        np.random.default_rng(2).uniform(size=(2, 131)).astype(np.float32)
    )
    got = np.asarray(topk_indices_pallas(scores, 131, interpret=True))
    np.testing.assert_array_equal(got, np.arange(131)[None].repeat(2, 0))


def test_rejects_bad_k():
    scores = jnp.zeros((1, 10), jnp.float32)
    with pytest.raises(ValueError):
        topk_indices_pallas(scores, 11, interpret=True)
    with pytest.raises(ValueError):
        topk_indices_pallas(scores, 0, interpret=True)
