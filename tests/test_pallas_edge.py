"""Fused edge-attention kernel vs dense XLA path: semantic parity
(interpret mode on CPU; same code compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decompdiff_tpu.models.uni_transformer_bond import (
    NodeEdgeAttention, PosEdgeAttention, gather_nodes)
from decompdiff_tpu.models.common import safe_norm
from decompdiff_tpu.ops.knn import knn_neighbors


def _setup(B=2, N=16, K=4, H=32, F=4, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, N, 3)) * 3, jnp.float32)
    mask = np.ones((B, N), bool)
    mask[0, 12:] = False
    nbr_idx, nbr_mask = knn_neighbors(x, jnp.asarray(mask), K)
    xj = gather_nodes(x, nbr_idx)
    rel_x = x[:, :, None, :] - xj
    dist = safe_norm(rel_x, axis=-1)
    etype = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, F, size=(B, N, K))), F)
    e_w = jnp.asarray(rng.random((B, N, K, 1)), jnp.float32)
    return h, rel_x, dist, etype, nbr_idx, nbr_mask, e_w


@pytest.mark.parametrize('out_fc', [False, True])
def test_node_edge_pallas_matches_dense(out_fc):
    args = _setup()
    dense = NodeEdgeAttention(32, 4, out_fc=out_fc, use_pallas=False)
    fused = NodeEdgeAttention(32, 4, out_fc=out_fc, use_pallas=True)
    params = dense.init(jax.random.PRNGKey(0), *args)
    o1 = dense.apply(params, *args)
    o2 = fused.apply(params, *args)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=2e-4, atol=2e-5)


def test_pos_edge_pallas_matches_dense():
    args = _setup(seed=3)
    dense = PosEdgeAttention(32, 4, use_pallas=False)
    fused = PosEdgeAttention(32, 4, use_pallas=True)
    params = dense.init(jax.random.PRNGKey(0), *args)
    o1 = dense.apply(params, *args)
    o2 = fused.apply(params, *args)
    assert o2.shape == o1.shape == (2, 16, 3)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=2e-4, atol=2e-5)


def test_edge_pallas_six_dim_edge_type():
    """The same-decomp-group variant (F=6) must also match."""
    args = _setup(F=6, seed=5)
    dense = NodeEdgeAttention(32, 4, out_fc=False, use_pallas=False)
    fused = NodeEdgeAttention(32, 4, out_fc=False, use_pallas=True)
    params = dense.init(jax.random.PRNGKey(0), *args)
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, *args)),
        np.asarray(dense.apply(params, *args)), rtol=2e-4, atol=2e-5)


def test_edge_pallas_no_ew():
    h, rel_x, dist, etype, nbr_idx, nbr_mask, _ = _setup(seed=7)
    dense = NodeEdgeAttention(32, 4, out_fc=False, use_pallas=False)
    fused = NodeEdgeAttention(32, 4, out_fc=False, use_pallas=True)
    params = dense.init(jax.random.PRNGKey(0), h, rel_x, dist, etype,
                        nbr_idx, nbr_mask, None)
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, h, rel_x, dist, etype, nbr_idx,
                               nbr_mask, None)),
        np.asarray(dense.apply(params, h, rel_x, dist, etype, nbr_idx,
                               nbr_mask, None)), rtol=2e-4, atol=2e-5)
