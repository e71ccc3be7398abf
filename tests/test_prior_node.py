"""add_prior_node composition mode + importance time sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from decompdiff_tpu.models.diffusion_model import (
    DecompDiffModel, sample_time)
from decompdiff_tpu.utils.testing import random_complex_batch, tiny_model_config


def test_prior_node_forward_and_equivariance():
    cfg = tiny_model_config(add_prior_node=True, edge_feat_dim=6,
                            num_diffusion_timesteps=10)
    model = DecompDiffModel.create(cfg, num_classes=8)
    rng = np.random.default_rng(0)
    batch = random_complex_batch(rng, batch_size=2, num_protein=16,
                                 num_ligand=6, num_groups=4)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    t = jnp.asarray([2, 5])
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v,
                        batch.bond_type, t)
    assert preds['pred_ligand_pos'].shape == (2, 6, 3)

    Q, _ = np.linalg.qr(np.random.default_rng(1).normal(size=(3, 3)))
    Q = jnp.asarray(Q, jnp.float32)
    rot = batch.replace(protein_pos=batch.protein_pos @ Q,
                        prior_centers=batch.prior_centers @ Q)
    preds_rot = model.apply(params, rot, batch.ligand_pos @ Q,
                            batch.ligand_v, batch.bond_type, t)
    real = np.asarray(batch.ligand_mask)
    np.testing.assert_allclose(
        np.asarray(preds_rot['pred_ligand_pos'])[real],
        np.asarray(preds['pred_ligand_pos'] @ Q)[real], rtol=2e-3, atol=3e-4)


def test_prior_node_group_bit_matters():
    """The same-decomp-group edge bit must change outputs when group ids
    change (it is part of the edge features)."""
    cfg = tiny_model_config(add_prior_node=True, edge_feat_dim=6,
                            num_diffusion_timesteps=10)
    model = DecompDiffModel.create(cfg, num_classes=8)
    rng = np.random.default_rng(2)
    batch = random_complex_batch(rng, batch_size=1, num_protein=12,
                                 num_ligand=6, num_groups=4)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    t = jnp.asarray([3])
    p1 = model.apply(params, batch, batch.ligand_pos, batch.ligand_v,
                     batch.bond_type, t)
    flipped = np.asarray(batch.ligand_decomp_idx).copy()
    flipped[0] = (flipped[0] + 1) % int(batch.num_arms[0] + 1)
    b2 = batch.replace(ligand_decomp_idx=jnp.asarray(flipped))
    p2 = model.apply(params, b2, batch.ligand_pos, batch.ligand_v,
                     batch.bond_type, t)
    assert not np.allclose(np.asarray(p1['pred_ligand_v']),
                           np.asarray(p2['pred_ligand_v']))


def test_importance_sampling_fallback_and_active():
    rng = jax.random.PRNGKey(0)
    # no history -> symmetric fallback
    t, pt = sample_time(rng, 6, 10, 'importance')
    assert t.shape == (6,)
    np.testing.assert_allclose(np.asarray(pt), 0.1)
    # with history, concentrated losses skew the draw
    hist = np.zeros(10)
    hist[7] = 100.0
    count = np.full(10, 50)
    t, pt = sample_time(rng, 2000, 10, 'importance', hist, count)
    frac7 = (np.asarray(t) == 7).mean()
    assert frac7 > 0.5
