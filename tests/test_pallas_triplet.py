"""Pallas triplet kernel vs dense XLA path: exact semantic parity.

Runs in interpret mode on CPU; the same code compiles on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decompdiff_tpu.data.batch import make_bond_mask
from decompdiff_tpu.models.uni_transformer_bond import BondTripletAttention


@pytest.mark.parametrize('include_h_node', [True, False])
def test_pallas_matches_dense(include_h_node):
    B, Nl, H, heads = 2, 8, 32, 4
    rng = np.random.default_rng(0)
    h_lig = jnp.asarray(rng.normal(size=(B, Nl, H)), jnp.float32)
    h_bond = jnp.asarray(rng.normal(size=(B, Nl, Nl, H)), jnp.float32)
    x_lig = jnp.asarray(rng.normal(size=(B, Nl, 3)) * 2, jnp.float32)
    lig_mask = np.ones((B, Nl), bool)
    lig_mask[0, 6:] = False  # ragged
    bond_mask = jnp.asarray(make_bond_mask(lig_mask))

    dense = BondTripletAttention(H, heads, include_h_node=include_h_node,
                                 use_pallas=False)
    fused = BondTripletAttention(H, heads, include_h_node=include_h_node,
                                 use_pallas=True)
    params = dense.init(jax.random.PRNGKey(0), h_lig, h_bond, x_lig,
                        bond_mask)
    out_dense = dense.apply(params, h_lig, h_bond, x_lig, bond_mask)
    out_fused = fused.apply(params, h_lig, h_bond, x_lig, bond_mask)
    assert out_fused.shape == out_dense.shape
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_dense),
                               rtol=2e-4, atol=2e-5)


def test_pallas_param_tree_is_shared():
    """Both paths must build the identical parameter tree."""
    B, Nl, H, heads = 1, 6, 32, 4
    rng = np.random.default_rng(1)
    h_lig = jnp.asarray(rng.normal(size=(B, Nl, H)), jnp.float32)
    h_bond = jnp.asarray(rng.normal(size=(B, Nl, Nl, H)), jnp.float32)
    x_lig = jnp.asarray(rng.normal(size=(B, Nl, 3)), jnp.float32)
    bond_mask = jnp.asarray(make_bond_mask(np.ones((B, Nl), bool)))

    p1 = BondTripletAttention(H, heads, use_pallas=False).init(
        jax.random.PRNGKey(0), h_lig, h_bond, x_lig, bond_mask)
    p2 = BondTripletAttention(H, heads, use_pallas=True).init(
        jax.random.PRNGKey(0), h_lig, h_bond, x_lig, bond_mask)
    t1 = jax.tree.structure(p1)
    t2 = jax.tree.structure(p2)
    assert t1 == t2
