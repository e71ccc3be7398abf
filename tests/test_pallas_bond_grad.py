"""Gradient parity: bond-dense kernel custom VJP vs dense-path autodiff
(interpret on CPU; the same backward kernels compile on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decompdiff_tpu.data.batch import make_bond_mask
from decompdiff_tpu.models.uni_transformer_bond import (
    NodeBondAttention, PosBondAttention)


def _setup(B=2, Nl=8, H=32, seed=0):
    rng = np.random.default_rng(seed)
    h_lig = jnp.asarray(rng.normal(size=(B, Nl, H)), jnp.float32)
    h_bond = jnp.asarray(rng.normal(size=(B, Nl, Nl, H)), jnp.float32)
    mask = np.ones((B, Nl), bool)
    mask[0, 6:] = False
    bond_mask = jnp.asarray(make_bond_mask(mask))
    rel = jnp.asarray(rng.normal(size=(B, Nl, Nl, 3)), jnp.float32)
    return h_lig, h_bond, bond_mask, rel


def _assert_tree_close(got, want, label):
    for xa, xb in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        scale = max(1.0, float(jnp.max(jnp.abs(xa))))
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   rtol=5e-4, atol=5e-5 * scale,
                                   err_msg=f'cotangent mismatch: {label}')


@pytest.mark.parametrize('out_fc', [False, True])
def test_node_bond_grads_match_dense(out_fc):
    h_lig, h_bond, bond_mask, _ = _setup()
    rng = np.random.default_rng(9)
    cot = jnp.asarray(rng.normal(size=(2, 8, 32)), jnp.float32)
    dense = NodeBondAttention(32, 4, out_fc=out_fc, use_pallas=False)
    fused = NodeBondAttention(32, 4, out_fc=out_fc, use_pallas=True)
    params = dense.init(jax.random.PRNGKey(0), h_lig, h_bond, bond_mask)

    def grads(mod):
        def f(params, h_lig, h_bond):
            return jnp.sum(mod.apply(params, h_lig, h_bond,
                                     bond_mask) * cot)
        return jax.grad(f, argnums=(0, 1, 2))(params, h_lig, h_bond)

    gd = grads(dense)
    gf = grads(fused)
    for label, a, b in zip(('params', 'h_lig', 'h_bond'), gd, gf):
        _assert_tree_close(b, a, label)


def test_pos_bond_grads_match_dense():
    h_lig, h_bond, bond_mask, rel = _setup(seed=3)
    rng = np.random.default_rng(9)
    cot = jnp.asarray(rng.normal(size=(2, 8, 3)), jnp.float32)
    dense = PosBondAttention(32, 4, use_pallas=False)
    fused = PosBondAttention(32, 4, use_pallas=True)
    params = dense.init(jax.random.PRNGKey(0), h_lig, rel, h_bond, bond_mask)

    def grads(mod):
        def f(params, h_lig, rel, h_bond):
            return jnp.sum(mod.apply(params, h_lig, rel, h_bond,
                                     bond_mask) * cot)
        return jax.grad(f, argnums=(0, 1, 2, 3))(params, h_lig, rel, h_bond)

    gd = grads(dense)
    gf = grads(fused)
    for label, a, b in zip(('params', 'h_lig', 'rel', 'h_bond'), gd, gf):
        _assert_tree_close(b, a, label)
