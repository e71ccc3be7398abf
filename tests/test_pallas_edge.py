"""Fused edge-attention kernel vs dense XLA path: semantic parity
(interpret mode on CPU; same code compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decompdiff_tpu.models.uni_transformer_bond import (
    EdgeData, NodeEdgeAttention, PosEdgeAttention, UniTransformerBond,
    _pad4, gather_nodes)
from decompdiff_tpu.models.common import safe_norm
from decompdiff_tpu.ops.knn import knn_neighbors


def _edge_data(x, nbr_idx, nbr_mask, mask_ligand, group_idx, use_pallas):
    """Mirror of the dense/pallas EdgeData construction in
    UniTransformerBond.__call__ + AttentionLayerBond geometry."""
    B, N, K = nbr_idx.shape
    if use_pallas:
        ml = mask_ligand.astype(jnp.float32)
        if group_idx is not None:
            g = group_idx.astype(jnp.float32)
            gsrc_flat = gather_nodes(g[..., None], nbr_idx).reshape(B, N * K, 1)
        else:
            g = jnp.zeros_like(ml)
            gsrc_flat = jnp.zeros((B, N * K, 1), jnp.float32)
        return EdgeData(nbr_idx, nbr_mask,
                        x4=_pad4(x.astype(jnp.float32)),
                        idx_flat=nbr_idx.reshape(B, N * K, 1),
                        mld=jnp.stack([ml, g], axis=-1),
                        gsrc_flat=gsrc_flat)
    xj = gather_nodes(x, nbr_idx)
    rel_x = x[:, :, None, :] - xj
    dist = safe_norm(rel_x, axis=-1)
    lig_src = gather_nodes(
        mask_ligand[..., None].astype(jnp.float32), nbr_idx)[..., 0] > 0.5
    lig_dst = mask_ligand[:, :, None]
    type_id = jnp.where(lig_src & lig_dst, 0,
                        jnp.where(lig_src & ~lig_dst, 1,
                                  jnp.where(~lig_src & lig_dst, 2, 3)))
    edge_type = jax.nn.one_hot(type_id, 4, dtype=jnp.float32)
    if group_idx is not None:
        g_src = gather_nodes(
            group_idx[..., None].astype(jnp.float32), nbr_idx)[..., 0]
        same = (g_src == group_idx[:, :, None].astype(jnp.float32))
        edge_type = jnp.concatenate(
            [edge_type, jax.nn.one_hot(same.astype(jnp.int32), 2,
                                       dtype=jnp.float32)], axis=-1)
    return EdgeData(nbr_idx, nbr_mask, rel_x=rel_x, dist=dist,
                    edge_type=edge_type)


def _setup(B=2, N=16, Np=10, K=4, H=32, group=False, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, N, 3)) * 3, jnp.float32)
    mask = np.ones((B, N), bool)
    mask[0, 12:] = False                       # padded ligand slots
    mask = jnp.asarray(mask)
    nbr_idx, nbr_mask = knn_neighbors(x, mask, K)
    mask_ligand = (jnp.arange(N)[None, :] >= Np) & mask
    group_idx = (jnp.asarray(rng.integers(0, 3, size=(B, N)), jnp.int32)
                 if group else None)
    e_w = jnp.asarray(rng.random((B, N, K, 1)), jnp.float32)
    ed_d = _edge_data(x, nbr_idx, nbr_mask, mask_ligand, group_idx, False)
    ed_p = _edge_data(x, nbr_idx, nbr_mask, mask_ligand, group_idx, True)
    return h, ed_d, ed_p, e_w, Np


@pytest.mark.parametrize('out_fc', [False, True])
def test_node_edge_pallas_matches_dense(out_fc):
    h, ed_d, ed_p, e_w, Np = _setup()
    dense = NodeEdgeAttention(32, 4, out_fc=out_fc, use_pallas=False,
                              num_protein=Np)
    fused = NodeEdgeAttention(32, 4, out_fc=out_fc, use_pallas=True,
                              num_protein=Np)
    params = dense.init(jax.random.PRNGKey(0), h, ed_d, e_w)
    o1 = dense.apply(params, h, ed_d, e_w)
    o2 = fused.apply(params, h, ed_p, e_w)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=2e-4, atol=2e-5)


def test_pos_edge_pallas_matches_dense():
    h, ed_d, ed_p, e_w, Np = _setup(seed=3)
    dense = PosEdgeAttention(32, 4, use_pallas=False, num_protein=Np)
    fused = PosEdgeAttention(32, 4, use_pallas=True, num_protein=Np)
    params = dense.init(jax.random.PRNGKey(0), h, ed_d, e_w)
    o1 = dense.apply(params, h, ed_d, e_w)
    o2 = fused.apply(params, h, ed_p, e_w)
    assert o2.shape == o1.shape == (2, 16, 3)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=2e-4, atol=2e-5)


def test_edge_pallas_six_dim_edge_type():
    """The same-decomp-group variant (n_etypes=6) must also match."""
    h, ed_d, ed_p, e_w, Np = _setup(group=True, seed=5)
    dense = NodeEdgeAttention(32, 4, out_fc=False, use_pallas=False,
                              num_protein=Np, n_etypes=6)
    fused = NodeEdgeAttention(32, 4, out_fc=False, use_pallas=True,
                              num_protein=Np, n_etypes=6)
    params = dense.init(jax.random.PRNGKey(0), h, ed_d, e_w)
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, h, ed_p, e_w)),
        np.asarray(dense.apply(params, h, ed_d, e_w)), rtol=2e-4, atol=2e-5)


def test_edge_pallas_no_ew():
    h, ed_d, ed_p, _, Np = _setup(seed=7)
    dense = NodeEdgeAttention(32, 4, out_fc=False, use_pallas=False,
                              num_protein=Np)
    fused = NodeEdgeAttention(32, 4, out_fc=False, use_pallas=True,
                              num_protein=Np)
    params = dense.init(jax.random.PRNGKey(0), h, ed_d, None)
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, h, ed_p, None)),
        np.asarray(dense.apply(params, h, ed_d, None)),
        rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize('group', [False, True])
def test_full_net_pallas_matches_dense(group):
    """End-to-end UniTransformerBond: identical params, dense vs fused —
    covers e_w-from-top_k, in-kernel typing/geometry, and the bond streams
    composing across layers."""
    rng = np.random.default_rng(11)
    B, Np, Nl, H, K = 2, 12, 6, 32, 4
    N = Np + Nl
    h = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, N, 3)) * 3, jnp.float32)
    h_bond = jnp.asarray(rng.normal(size=(B, Nl, Nl, H)), jnp.float32)
    mask = np.ones((B, N), bool)
    mask[0, Np + 4:] = False
    mask = jnp.asarray(mask)
    mask_ligand = (jnp.arange(N)[None, :] >= Np) & mask
    movable = mask_ligand
    bond_mask = jnp.asarray(rng.random((B, Nl, Nl)) < 0.5) & (
        ~jnp.eye(Nl, dtype=bool)[None])
    group_idx = (jnp.asarray(rng.integers(0, 3, size=(B, N)), jnp.int32)
                 if group else None)

    def net(use_pallas):
        return UniTransformerBond(
            num_blocks=1, num_layers=2, hidden_dim=H, n_heads=4, k=K,
            use_pallas=use_pallas)

    args = (h, x, h_bond, mask, mask_ligand, movable, bond_mask)
    params = net(False).init(jax.random.PRNGKey(0), *args, num_protein=Np,
                             group_idx=group_idx)
    o1 = net(False).apply(params, *args, num_protein=Np, group_idx=group_idx)
    o2 = net(True).apply(params, *args, num_protein=Np, group_idx=group_idx)
    for key in ('x', 'h', 'h_bond'):
        np.testing.assert_allclose(
            np.asarray(o2[key]), np.asarray(o1[key]), rtol=2e-3, atol=2e-4,
            err_msg=key)


def test_full_net_pallas_pad_to_64_matches_dense():
    """N >= 64 triggers the Pallas path's context padding to a 64-multiple
    (larger edge-kernel tiles); outputs must still match the dense path at
    the original N exactly."""
    rng = np.random.default_rng(13)
    B, Np, Nl, H, K = 2, 70, 6, 32, 4
    N = Np + Nl                                # 76 -> padded to 128
    h = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, N, 3)) * 3, jnp.float32)
    h_bond = jnp.asarray(rng.normal(size=(B, Nl, Nl, H)), jnp.float32)
    mask = np.ones((B, N), bool)
    mask[0, Np + 4:] = False
    mask = jnp.asarray(mask)
    mask_ligand = (jnp.arange(N)[None, :] >= Np) & mask
    movable = mask_ligand
    bond_mask = jnp.asarray(rng.random((B, Nl, Nl)) < 0.5) & (
        ~jnp.eye(Nl, dtype=bool)[None])

    def net(use_pallas):
        return UniTransformerBond(
            num_blocks=1, num_layers=1, hidden_dim=H, n_heads=4, k=K,
            use_pallas=use_pallas)

    args = (h, x, h_bond, mask, mask_ligand, movable, bond_mask)
    params = net(False).init(jax.random.PRNGKey(0), *args, num_protein=Np)
    o1 = net(False).apply(params, *args, num_protein=Np)
    o2 = net(True).apply(params, *args, num_protein=Np)
    assert o2['x'].shape == o1['x'].shape
    for key in ('x', 'h', 'h_bond'):
        np.testing.assert_allclose(
            np.asarray(o2[key]), np.asarray(o1[key]), rtol=2e-3, atol=2e-4,
            err_msg=key)
