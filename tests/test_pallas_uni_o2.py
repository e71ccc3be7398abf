"""uni_o2 Pallas path vs dense XLA path: forward + gradient parity
(interpret on CPU; the same kernels compile on TPU).

The uni_o2 refine net routes its x2h/h2x kNN attention through the same
edge_attention_pallas kernels as uni_o2_bond (identical per-edge math, see
models/uni_transformer.py docstring), so this covers the parameter
factorization/prep, the gather-free ew_net_type='r' gate, and the
custom-VJP backward for the non-bond model family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decompdiff_tpu.models.uni_transformer import UniTransformerO2


def _setup(B=2, Np=10, Nl=6, H=32, K=4, seed=0):
    rng = np.random.default_rng(seed)
    N = Np + Nl
    h = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, N, 3)) * 3, jnp.float32)
    mask = np.ones((B, N), bool)
    mask[0, Np + 4:] = False
    mask = jnp.asarray(mask)
    mask_ligand = (jnp.arange(N)[None, :] >= Np) & mask
    movable = mask_ligand
    return h, x, mask, mask_ligand, movable, Np


def _net(use_pallas, ew='global', **kw):
    return UniTransformerO2(num_blocks=1, num_layers=2, hidden_dim=32,
                            n_heads=4, k=4, ew_net_type=ew,
                            use_pallas=use_pallas, **kw)


@pytest.mark.parametrize('ew', ['global', 'r', 'none', 'm'])
def test_uni_o2_pallas_matches_dense(ew):
    h, x, mask, mask_ligand, movable, Np = _setup()
    dense = _net(False, ew)
    fused = _net(True, ew)
    args = (h, x, mask, mask_ligand, movable)
    params = dense.init(jax.random.PRNGKey(0), *args, num_protein=Np)
    o1 = dense.apply(params, *args, num_protein=Np)
    o2 = fused.apply(params, *args, num_protein=Np)
    for key in ('x', 'h'):
        np.testing.assert_allclose(
            np.asarray(o2[key]), np.asarray(o1[key]), rtol=2e-3, atol=2e-4,
            err_msg=key)


def test_uni_o2_pallas_param_tree_is_shared():
    h, x, mask, mask_ligand, movable, Np = _setup()
    args = (h, x, mask, mask_ligand, movable)
    p1 = _net(False).init(jax.random.PRNGKey(0), *args, num_protein=Np)
    p2 = _net(True).init(jax.random.PRNGKey(0), *args, num_protein=Np)
    assert jax.tree.structure(p1) == jax.tree.structure(p2)


def test_uni_o2_pallas_multi_iteration():
    """num_x2h/num_h2x > 1 recompute geometry from the updated x each
    iteration on both paths."""
    h, x, mask, mask_ligand, movable, Np = _setup(seed=3)
    dense = _net(False, num_x2h=2, num_h2x=2)
    fused = _net(True, num_x2h=2, num_h2x=2)
    args = (h, x, mask, mask_ligand, movable)
    params = dense.init(jax.random.PRNGKey(0), *args, num_protein=Np)
    o1 = dense.apply(params, *args, num_protein=Np)
    o2 = fused.apply(params, *args, num_protein=Np)
    for key in ('x', 'h'):
        np.testing.assert_allclose(
            np.asarray(o2[key]), np.asarray(o1[key]), rtol=5e-3, atol=5e-4,
            err_msg=key)


def test_uni_o2_pallas_pads_odd_context():
    """Real pocket sizes are rarely 8-divisible: N=70 must route through the
    pad-to-64 scheme (-> 128 padded nodes) instead of degrading the kernel
    tile fallback to 1-2 sublanes (ADVICE r2)."""
    h, x, mask, mask_ligand, movable, Np = _setup(B=1, Np=60, Nl=10, seed=5)
    dense = _net(False)
    fused = _net(True)
    args = (h, x, mask, mask_ligand, movable)
    params = dense.init(jax.random.PRNGKey(0), *args, num_protein=Np)
    o1 = dense.apply(params, *args, num_protein=Np)
    o2 = fused.apply(params, *args, num_protein=Np)
    assert o2['h'].shape == h.shape and o2['x'].shape == x.shape
    for key in ('x', 'h'):
        np.testing.assert_allclose(
            np.asarray(o2[key]), np.asarray(o1[key]), rtol=2e-3, atol=2e-4,
            err_msg=key)


@pytest.mark.parametrize('ew', ['r', 'm'])
def test_uni_o2_pallas_grads_match_dense(ew):
    h, x, mask, mask_ligand, movable, Np = _setup(seed=7)
    rng = np.random.default_rng(9)
    cot_h = jnp.asarray(rng.normal(size=h.shape), jnp.float32)
    cot_x = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    dense = _net(False, ew)
    fused = _net(True, ew)
    args = (h, x, mask, mask_ligand, movable)
    params = dense.init(jax.random.PRNGKey(0), *args, num_protein=Np)

    def grads(net):
        def f(params, h, x):
            out = net.apply(params, h, x, mask, mask_ligand, movable,
                            num_protein=Np)
            return jnp.sum(out['h'] * cot_h) + jnp.sum(out['x'] * cot_x)
        return jax.grad(f, argnums=(0, 1, 2))(params, h, x)

    gd = grads(dense)
    gf = grads(fused)
    for label, a, b in zip(('params', 'h', 'x'), gd, gf):
        for xa, xb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            scale = max(1.0, float(jnp.max(jnp.abs(xa))))
            np.testing.assert_allclose(
                np.asarray(xb), np.asarray(xa), rtol=2e-3,
                atol=2e-4 * scale, err_msg=f'cotangent mismatch: {label}')
