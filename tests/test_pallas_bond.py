"""Fused bond-dense attention kernel vs dense XLA path (interpret on CPU)."""

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


@pytest.mark.parametrize('out_fc', [False, True])
def test_node_bond_pallas_matches_dense(out_fc):
    h_lig, h_bond, bond_mask, _ = _setup()
    dense = NodeBondAttention(32, 4, out_fc=out_fc, use_pallas=False)
    fused = NodeBondAttention(32, 4, out_fc=out_fc, use_pallas=True)
    params = dense.init(jax.random.PRNGKey(0), h_lig, h_bond, bond_mask)
    o1 = dense.apply(params, h_lig, h_bond, bond_mask)
    o2 = fused.apply(params, h_lig, h_bond, bond_mask)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=2e-4, atol=2e-5)


def test_pos_bond_pallas_matches_dense():
    h_lig, h_bond, bond_mask, rel = _setup(seed=3)
    dense = PosBondAttention(32, 4, use_pallas=False)
    fused = PosBondAttention(32, 4, use_pallas=True)
    params = dense.init(jax.random.PRNGKey(0), h_lig, rel, h_bond, bond_mask)
    o1 = dense.apply(params, h_lig, rel, h_bond, bond_mask)
    o2 = fused.apply(params, h_lig, rel, h_bond, bond_mask)
    assert o1.shape == o2.shape == (2, 8, 3)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=2e-4, atol=2e-5)
