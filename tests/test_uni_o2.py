"""uni_o2 (no-bond) refine-net variant tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decompdiff_tpu.models.diffusion_model import DecompDiffModel
from decompdiff_tpu.utils.testing import random_complex_batch, tiny_model_config


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_model_config(
        model_type='uni_o2', bond_diffusion=True, bond_net_type='pre_att',
        ew_net_type='global', num_diffusion_timesteps=20)
    model = DecompDiffModel.create(cfg, num_classes=8)
    rng = np.random.default_rng(0)
    batch = random_complex_batch(rng, batch_size=2, num_protein=20,
                                 num_ligand=6)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    return model, batch, params


def test_uni_o2_forward_and_equivariance(setup):
    model, batch, params = setup
    t = jnp.asarray([3, 10])
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v,
                        batch.bond_type, t)
    assert preds['pred_ligand_pos'].shape == (2, 6, 3)
    assert preds['pred_bond'].shape == (2, 6, 6, 5)  # pre_att head

    Q, _ = np.linalg.qr(np.random.default_rng(1).normal(size=(3, 3)))
    Q = jnp.asarray(Q, jnp.float32)
    rot = batch.replace(protein_pos=batch.protein_pos @ Q,
                        prior_centers=batch.prior_centers @ Q)
    preds_rot = model.apply(params, rot, batch.ligand_pos @ Q,
                            batch.ligand_v, batch.bond_type, t)
    real = np.asarray(batch.ligand_mask)
    np.testing.assert_allclose(
        np.asarray(preds_rot['pred_ligand_pos'])[real],
        np.asarray(preds['pred_ligand_pos'] @ Q)[real], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(preds_rot['pred_ligand_v'])[real],
        np.asarray(preds['pred_ligand_v'])[real], rtol=2e-3, atol=2e-4)


def test_uni_o2_loss_and_grad(setup):
    model, batch, params = setup

    def loss_fn(p):
        out = model.get_diffusion_loss(p, jax.random.PRNGKey(0), batch)
        return sum(out['losses'].values())

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    from jax.flatten_util import ravel_pytree
    flat, _ = ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()


def test_uni_o2_ew_net_variants():
    rng = np.random.default_rng(0)
    batch = random_complex_batch(rng, batch_size=1, num_protein=16,
                                 num_ligand=5)
    for ew in ['r', 'm', 'none']:
        cfg = tiny_model_config(
            model_type='uni_o2', bond_diffusion=False, ew_net_type=ew,
            num_diffusion_timesteps=10, num_layers=1)
        model = DecompDiffModel.create(cfg, num_classes=8)
        params = model.init_params(jax.random.PRNGKey(0), batch)
        preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v,
                            batch.bond_type, jnp.asarray([2]))
        assert np.isfinite(np.asarray(preds['pred_ligand_pos'])).all(), ew
