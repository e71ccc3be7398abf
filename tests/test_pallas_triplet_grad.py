"""Gradient parity: the triplet kernel's custom VJP vs dense-path autodiff.

Runs in interpret mode on CPU; the same backward kernel compiles on TPU.
Covers every cotangent the fused path emits — module inputs (h_lig, h_bond,
x_lig through the angle computation) AND all flax params — by differentiating
a scalar loss through BondTripletAttention on a ragged batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decompdiff_tpu.data.batch import make_bond_mask
from decompdiff_tpu.models.uni_transformer_bond import BondTripletAttention


def _setup(include_h_node=True, B=2, Nl=8, H=32, heads=4):
    rng = np.random.default_rng(0)
    h_lig = jnp.asarray(rng.normal(size=(B, Nl, H)), jnp.float32)
    h_bond = jnp.asarray(rng.normal(size=(B, Nl, Nl, H)), jnp.float32)
    x_lig = jnp.asarray(rng.normal(size=(B, Nl, 3)) * 2, jnp.float32)
    lig_mask = np.ones((B, Nl), bool)
    lig_mask[0, 6:] = False  # ragged
    bond_mask = jnp.asarray(make_bond_mask(lig_mask))
    cot = jnp.asarray(rng.normal(size=(B, Nl, Nl, H)), jnp.float32)
    dense = BondTripletAttention(H, heads, include_h_node=include_h_node,
                                 use_pallas=False)
    fused = BondTripletAttention(H, heads, include_h_node=include_h_node,
                                 use_pallas=True)
    params = dense.init(jax.random.PRNGKey(0), h_lig, h_bond, x_lig,
                        bond_mask)
    return dense, fused, params, (h_lig, h_bond, x_lig, bond_mask), cot


@pytest.mark.parametrize('include_h_node', [True, False])
def test_grads_match_dense(include_h_node):
    dense, fused, params, inputs, cot = _setup(include_h_node)
    h_lig, h_bond, x_lig, bond_mask = inputs

    def loss(mod):
        def f(params, h_lig, h_bond, x_lig):
            out = mod.apply(params, h_lig, h_bond, x_lig, bond_mask)
            return jnp.sum(out * cot)
        return jax.grad(f, argnums=(0, 1, 2, 3))(params, h_lig, h_bond,
                                                 x_lig)

    gd = loss(dense)
    gf = loss(fused)
    labels = ('params', 'h_lig', 'h_bond', 'x_lig')
    for name, a, b in zip(labels, gd, gf):
        flat_a, _ = jax.tree.flatten(a)
        flat_b, _ = jax.tree.flatten(b)
        for xa, xb in zip(flat_a, flat_b):
            scale = max(1.0, float(jnp.max(jnp.abs(xa))))
            np.testing.assert_allclose(
                np.asarray(xb), np.asarray(xa), rtol=5e-4,
                atol=5e-5 * scale,
                err_msg=f'cotangent mismatch for {name}')


def test_grads_match_dense_i_block_1():
    """Accumulation across programs must be exact for any i_block."""
    _, _, params, inputs, cot = _setup()
    h_lig, h_bond, x_lig, bond_mask = inputs
    dense = BondTripletAttention(32, 4, use_pallas=False)
    fused = BondTripletAttention(32, 4, use_pallas=True, i_block=1)

    def g(mod, p):
        def f(p):
            return jnp.sum(mod.apply(p, h_lig, h_bond, x_lig,
                                     bond_mask) * cot)
        return jax.grad(f)(p)

    gd = jax.tree.leaves(g(dense, params))
    gf = jax.tree.leaves(g(fused, params))
    for xa, xb in zip(gd, gf):
        scale = max(1.0, float(jnp.max(jnp.abs(xa))))
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   rtol=5e-4, atol=5e-5 * scale)


def test_value_and_grad_jits_under_scan():
    """The VJP must be usable inside a jitted training-style closure."""
    _, fused, params, inputs, cot = _setup()
    h_lig, h_bond, x_lig, bond_mask = inputs

    @jax.jit
    def step(p):
        def f(p):
            return jnp.sum(fused.apply(p, h_lig, h_bond, x_lig,
                                       bond_mask) ** 2)
        return jax.value_and_grad(f)(p)

    val, grads = step(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
