"""Reference-checkpoint converter: tree structure match + split correctness.

Builds a synthetic torch-layout state dict with the reference's key names and
shapes, converts it, and checks (a) the resulting tree matches model.init
exactly and (b) the factorized blocks reproduce the joint first-linear on the
concatenated input.
"""

import jax
import numpy as np
import pytest

from decompdiff_tpu.models.diffusion_model import DecompDiffModel
from decompdiff_tpu.utils.convert_checkpoint import (
    convert_reference_state_dict)
from decompdiff_tpu.utils.testing import random_complex_batch, tiny_model_config

H, HEADS, LAYERS, FE = 32, 4, 2, 84  # edge_feat_dim 4 -> 84 features


def _mlp_sd(sd, prefix, in_dim, out_dim, rng):
    sd[f'{prefix}.net.0.weight'] = rng.normal(size=(H, in_dim)) * 0.1
    sd[f'{prefix}.net.0.bias'] = rng.normal(size=(H,)) * 0.1
    sd[f'{prefix}.net.1.weight'] = rng.normal(size=(H,)) * 0.1 + 1
    sd[f'{prefix}.net.1.bias'] = rng.normal(size=(H,)) * 0.1
    sd[f'{prefix}.net.3.weight'] = rng.normal(size=(out_dim, H)) * 0.1
    sd[f'{prefix}.net.3.bias'] = rng.normal(size=(out_dim,)) * 0.1


def _lin_sd(sd, prefix, in_dim, out_dim, rng):
    sd[f'{prefix}.weight'] = rng.normal(size=(out_dim, in_dim)) * 0.1
    sd[f'{prefix}.bias'] = rng.normal(size=(out_dim,)) * 0.1


def make_reference_state_dict(rng, num_classes=8, num_bond=5,
                               protein_feat=29, ligand_feat=10):
    sd = {}
    _lin_sd(sd, 'protein_atom_emb', protein_feat, H - 1, rng)
    _lin_sd(sd, 'ligand_atom_emb', ligand_feat, H - 1, rng)
    _lin_sd(sd, 'ligand_bond_emb', num_bond, H, rng)
    _lin_sd(sd, 'v_inference.0', H, H, rng)
    _lin_sd(sd, 'v_inference.2', H, num_classes, rng)
    _lin_sd(sd, 'bond_inference.0', H, H, rng)
    _lin_sd(sd, 'bond_inference.2', H, num_bond, rng)
    _mlp_sd(sd, 'refine_net.edge_pred_layer', 20, 1, rng)
    for l in range(LAYERS):
        base = f'refine_net.base_block.{l}'
        _lin_sd(sd, f'{base}.lin_node', H, H, rng)
        for m in ('hk', 'hv'):
            _mlp_sd(sd, f'{base}.node_layer_with_edge.{m}_func',
                    FE + 2 * H, H, rng)
            _mlp_sd(sd, f'{base}.node_layer_with_bond.{m}_func', 3 * H, H, rng)
            _mlp_sd(sd, f'{base}.bond_layer.{m}_func', 3 * H + 53, H, rng)
        _mlp_sd(sd, f'{base}.node_layer_with_edge.hq_func', H, H, rng)
        _mlp_sd(sd, f'{base}.node_layer_with_bond.hq_func', H, H, rng)
        _mlp_sd(sd, f'{base}.bond_layer.hq_func', 2 * H, H, rng)
        _mlp_sd(sd, f'{base}.pos_layer_with_edge.xk_func', FE + 2 * H, H, rng)
        _mlp_sd(sd, f'{base}.pos_layer_with_edge.xv_func', FE + 2 * H, HEADS,
                rng)
        _mlp_sd(sd, f'{base}.pos_layer_with_edge.xq_func', H, H, rng)
        _mlp_sd(sd, f'{base}.pos_layer_with_bond.xk_func', 3 * H, H, rng)
        _mlp_sd(sd, f'{base}.pos_layer_with_bond.xv_func', 3 * H, HEADS, rng)
        _mlp_sd(sd, f'{base}.pos_layer_with_bond.xq_func', H, H, rng)
    return sd


@pytest.fixture(scope='module')
def converted():
    cfg = tiny_model_config(num_layers=LAYERS, hidden_dim=H, n_heads=HEADS)
    model = DecompDiffModel.create(cfg, num_classes=8)
    rng_np = np.random.default_rng(0)
    batch = random_complex_batch(rng_np, batch_size=1, num_protein=12,
                                 num_ligand=5)
    init_params = model.init_params(jax.random.PRNGKey(0), batch)
    sd = make_reference_state_dict(np.random.default_rng(1))
    params = convert_reference_state_dict(sd, cfg)
    return model, batch, init_params, params, sd


def test_tree_structure_and_shapes_match(converted):
    _, _, init_params, params, _ = converted
    s1 = jax.tree.structure(init_params)
    s2 = jax.tree.structure(params)
    assert s1 == s2, f'{s1}\n!=\n{s2}'
    for a, b in zip(jax.tree.leaves(init_params), jax.tree.leaves(params)):
        assert a.shape == np.asarray(b).shape


def test_converted_params_run(converted):
    model, batch, _, params, _ = converted
    import jax.numpy as jnp
    preds = model.apply(jax.tree.map(jnp.asarray, params), batch,
                        batch.ligand_pos, batch.ligand_v, batch.bond_type,
                        jnp.asarray([3]))
    assert np.isfinite(np.asarray(preds['pred_ligand_pos'])).all()


def test_edge_split_reproduces_joint_linear(converted):
    _, _, _, params, sd = converted
    p = params['params']['refine_net']['layer_0']['node_layer_with_edge']
    w0 = sd['refine_net.base_block.0.node_layer_with_edge.hk_func.net.0.weight']
    rng = np.random.default_rng(2)
    ef = rng.normal(size=(FE,))
    hi = rng.normal(size=(H,))
    hj = rng.normal(size=(H,))
    joint = w0 @ np.concatenate([ef, hi, hj])
    split = (ef @ p['hk_e_kernel'] + hi @ p['hk_i_kernel']
             + hj @ p['hk_j_kernel'])
    np.testing.assert_allclose(split, joint, rtol=1e-5)


def test_bond_split_reproduces_joint_linear(converted):
    _, _, _, params, sd = converted
    p = params['params']['refine_net']['layer_0']['bond_layer']
    w0 = sd['refine_net.base_block.0.bond_layer.hv_func.net.0.weight']
    rng = np.random.default_rng(3)
    h_bond, r_kj, r_ji = (rng.normal(size=(H,)), rng.normal(size=(20,)),
                          rng.normal(size=(20,)))
    a, hk, hj = (rng.normal(size=(13,)), rng.normal(size=(H,)),
                 rng.normal(size=(H,)))
    joint = w0 @ np.concatenate([h_bond, r_kj, r_ji, a, hk, hj])
    split = (np.concatenate([h_bond, r_kj, hk]) @ p['hv_kj']['kernel']
             + r_ji @ p['hv_ij']['kernel']
             + a @ p['hv_a_kernel']
             + hj @ p['hv_j']['kernel'])
    np.testing.assert_allclose(split, joint, rtol=1e-5)
