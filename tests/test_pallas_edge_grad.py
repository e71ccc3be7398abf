"""Gradient parity: edge kernel custom VJP vs dense-path autodiff
(interpret on CPU; same backward kernel compiles on TPU).

Differentiates through the EdgeData construction from raw coordinates, so
the cotangents cover: h (through the in-kernel j-projection AND the hjx
gather's scatter-add VJP), x (through rel/dist/RBF and, in pos mode, the
equivariant rel output), e_w, and all flax params. Neighbor indices are
held fixed (top_k selection is non-differentiable in both paths).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decompdiff_tpu.models.uni_transformer_bond import (
    NodeEdgeAttention, PosEdgeAttention)
from decompdiff_tpu.ops.knn import knn_neighbors
from test_pallas_edge import _edge_data


def _setup(B=2, N=16, Np=10, K=4, H=32, group=False, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, N, 3)) * 3, jnp.float32)
    mask = np.ones((B, N), bool)
    mask[0, 12:] = False
    mask = jnp.asarray(mask)
    nbr_idx, nbr_mask = knn_neighbors(x, mask, K)
    mask_ligand = (jnp.arange(N)[None, :] >= Np) & mask
    group_idx = (jnp.asarray(rng.integers(0, 3, size=(B, N)), jnp.int32)
                 if group else None)
    e_w = jnp.asarray(rng.random((B, N, K, 1)), jnp.float32)
    return h, x, nbr_idx, nbr_mask, mask_ligand, group_idx, e_w, Np


def _assert_tree_close(got, want, label):
    for xa, xb in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        scale = max(1.0, float(jnp.max(jnp.abs(xa))))
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   rtol=1e-3, atol=1e-4 * scale,
                                   err_msg=f'cotangent mismatch: {label}')


def _grad_fn(mod, use_pallas, nbr_idx, nbr_mask, mask_ligand, group_idx,
             e_w, cot):
    def f(params, h, x):
        ed = _edge_data(x, nbr_idx, nbr_mask, mask_ligand, group_idx,
                        use_pallas)
        out = mod.apply(params, h, ed, e_w)
        return jnp.sum(out * cot)
    return jax.grad(f, argnums=(0, 1, 2))


@pytest.mark.parametrize('group', [False, True])
def test_node_edge_grads_match_dense(group):
    h, x, nbr_idx, nbr_mask, mask_ligand, group_idx, e_w, Np = _setup(
        group=group)
    n_et = 6 if group else 4
    rng = np.random.default_rng(9)
    cot = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    dense = NodeEdgeAttention(32, 4, use_pallas=False, num_protein=Np,
                              n_etypes=n_et)
    fused = NodeEdgeAttention(32, 4, use_pallas=True, num_protein=Np,
                              n_etypes=n_et)
    ed_d = _edge_data(x, nbr_idx, nbr_mask, mask_ligand, group_idx, False)
    params = dense.init(jax.random.PRNGKey(0), h, ed_d, e_w)
    gd = _grad_fn(dense, False, nbr_idx, nbr_mask, mask_ligand, group_idx,
                  e_w, cot)(params, h, x)
    gf = _grad_fn(fused, True, nbr_idx, nbr_mask, mask_ligand, group_idx,
                  e_w, cot)(params, h, x)
    for label, a, b in zip(('params', 'h', 'x'), gd, gf):
        _assert_tree_close(b, a, label)


def test_pos_edge_grads_match_dense():
    h, x, nbr_idx, nbr_mask, mask_ligand, group_idx, e_w, Np = _setup(seed=3)
    rng = np.random.default_rng(9)
    cot = jnp.asarray(rng.normal(size=(2, 16, 3)), jnp.float32)
    dense = PosEdgeAttention(32, 4, use_pallas=False, num_protein=Np)
    fused = PosEdgeAttention(32, 4, use_pallas=True, num_protein=Np)
    ed_d = _edge_data(x, nbr_idx, nbr_mask, mask_ligand, group_idx, False)
    params = dense.init(jax.random.PRNGKey(0), h, ed_d, e_w)
    gd = _grad_fn(dense, False, nbr_idx, nbr_mask, mask_ligand, group_idx,
                  e_w, cot)(params, h, x)
    gf = _grad_fn(fused, True, nbr_idx, nbr_mask, mask_ligand, group_idx,
                  e_w, cot)(params, h, x)
    for label, a, b in zip(('params', 'h', 'x'), gd, gf):
        _assert_tree_close(b, a, label)


def test_node_edge_grads_gather_bf16():
    """Regression (ADVICE r2): with gather_bf16 the node table is packed
    [h | x_hi | x_lo] in bf16 but re-expanded to f32 before the in-kernel
    gather, so d_hjx's out ref is f32 — the backward kernel used to cast
    the store to bf16 unconditionally, crashing with a swap-dtype error."""
    h, x, nbr_idx, nbr_mask, mask_ligand, group_idx, e_w, Np = _setup()
    rng = np.random.default_rng(9)
    cot = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    dense = NodeEdgeAttention(32, 4, use_pallas=False, num_protein=Np)
    fused = NodeEdgeAttention(32, 4, use_pallas=True, num_protein=Np,
                              gather_bf16=True)
    ed_d = _edge_data(x, nbr_idx, nbr_mask, mask_ligand, group_idx, False)
    params = dense.init(jax.random.PRNGKey(0), h, ed_d, e_w)
    gd = _grad_fn(dense, False, nbr_idx, nbr_mask, mask_ligand, group_idx,
                  e_w, cot)(params, h, x)
    gf = _grad_fn(fused, True, nbr_idx, nbr_mask, mask_ligand, group_idx,
                  e_w, cot)(params, h, x)
    # the table's h block is bf16-rounded (dense path stays f32): isolated
    # relu-gate flips make elementwise comparison flaky, so guard structure
    # with a per-leaf relative-L2 criterion instead
    for label, a, b in zip(('params', 'h', 'x'), gd, gf):
        for xa, xb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            xa = np.asarray(xa, np.float64)
            xb = np.asarray(xb, np.float64)
            # floor the denominator: near-zero true grads (e.g. the k-branch
            # out bias, which cancels in the softmax) carry no signal
            denom = max(np.linalg.norm(xa), 1e-3)
            rel = np.linalg.norm(xb - xa) / denom
            assert np.isfinite(xb).all(), f'non-finite grads: {label}'
            assert rel < 5e-2, \
                f'bf16-gather cotangent rel-L2 {rel:.3g}: {label}'


def test_grads_flow_through_ew():
    h, x, nbr_idx, nbr_mask, mask_ligand, group_idx, e_w, Np = _setup()
    dense = NodeEdgeAttention(32, 4, use_pallas=False, num_protein=Np)
    fused = NodeEdgeAttention(32, 4, use_pallas=True, num_protein=Np)
    ed_d = _edge_data(x, nbr_idx, nbr_mask, mask_ligand, group_idx, False)
    ed_p = _edge_data(x, nbr_idx, nbr_mask, mask_ligand, group_idx, True)
    params = dense.init(jax.random.PRNGKey(0), h, ed_d, e_w)

    def f(mod, ed):
        return lambda w: jnp.sum(mod.apply(params, h, ed, w) ** 2)

    ga = jax.grad(f(dense, ed_d))(e_w)
    gb = jax.grad(f(fused, ed_p))(e_w)
    assert float(jnp.abs(ga).max()) > 0
    _assert_tree_close(gb, ga, 'e_w')
