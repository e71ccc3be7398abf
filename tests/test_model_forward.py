"""Denoiser forward-pass property tests (SURVEY.md §4 test plan items 2-3):
  * shapes and finiteness
  * SE(3) equivariance: rotating all inputs rotates pred positions, leaves
    type logits invariant
  * padding invariance: growing the padded sizes must not change real-atom
    outputs
"""

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
import numpy as np
import pytest

from decompdiff_tpu.data.batch import make_bond_mask
from decompdiff_tpu.models.diffusion_model import DecompDiffModel
from decompdiff_tpu.utils.testing import random_complex_batch, tiny_model_config


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_model_config()
    model = DecompDiffModel.create(cfg, num_classes=8)
    rng = np.random.default_rng(0)
    batch = random_complex_batch(rng, batch_size=2, num_protein=24,
                                 num_ligand=8, real_protein=20, real_ligand=6)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    return model, batch, params


def test_forward_shapes_and_finiteness(setup):
    model, batch, params = setup
    t = jnp.asarray([3, 40])
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v,
                        batch.bond_type, t)
    assert preds['pred_ligand_pos'].shape == (2, 8, 3)
    assert preds['pred_ligand_v'].shape == (2, 8, 8)
    assert preds['pred_bond'].shape == (2, 8, 8, 5)
    for v in preds.values():
        assert np.isfinite(np.asarray(v)).all()


def test_rotation_equivariance(setup):
    model, batch, params = setup
    t = jnp.asarray([3, 40])
    rng = np.random.default_rng(7)
    M = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(M)
    Q = jnp.asarray(Q, jnp.float32)
    shift = jnp.asarray([1.5, -2.0, 0.5])

    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v,
                        batch.bond_type, t)
    rot_batch = batch.replace(
        protein_pos=batch.protein_pos @ Q + shift,
        prior_centers=batch.prior_centers @ Q + shift)
    preds_rot = model.apply(params, rot_batch,
                            batch.ligand_pos @ Q + shift, batch.ligand_v,
                            batch.bond_type, t)

    real = np.asarray(batch.ligand_mask)
    got = np.asarray(preds_rot['pred_ligand_pos'])
    expected = np.asarray(preds['pred_ligand_pos'] @ Q + shift)
    np.testing.assert_allclose(got[real], expected[real], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(preds_rot['pred_ligand_v'])[real],
        np.asarray(preds['pred_ligand_v'])[real], rtol=2e-3, atol=2e-4)
    bond_real = np.asarray(batch.bond_mask)
    np.testing.assert_allclose(
        np.asarray(preds_rot['pred_bond'])[bond_real],
        np.asarray(preds['pred_bond'])[bond_real], rtol=2e-3, atol=2e-4)


def test_padding_invariance(setup):
    """Outputs on real atoms must not change when padding grows."""
    model, batch, params = setup
    t = jnp.asarray([3, 40])
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v,
                        batch.bond_type, t)

    def pad(x, axes, amounts, fill=0):
        pad_width = [(0, 0)] * x.ndim
        for ax, am in zip(axes, amounts):
            pad_width[ax] = (0, am)
        return jnp.asarray(np.pad(np.asarray(x), pad_width,
                                  constant_values=fill))

    dp, dl = 6, 3
    lig_mask_p = pad(batch.ligand_mask, [1], [dl], False)
    big = batch.replace(
        protein_pos=pad(batch.protein_pos, [1], [dp]),
        protein_feat=pad(batch.protein_feat, [1], [dp]),
        protein_mask=pad(batch.protein_mask, [1], [dp], False),
        ligand_pos=pad(batch.ligand_pos, [1], [dl]),
        ligand_v=pad(batch.ligand_v, [1], [dl]),
        ligand_aux=pad(batch.ligand_aux, [1], [dl]),
        ligand_mask=lig_mask_p,
        ligand_decomp_idx=pad(batch.ligand_decomp_idx, [1], [dl]),
        bond_type=pad(batch.bond_type, [1, 2], [dl, dl]),
        bond_mask=jnp.asarray(make_bond_mask(np.asarray(lig_mask_p))),
    )
    preds_big = model.apply(params, big, big.ligand_pos, big.ligand_v,
                            big.bond_type, t)

    Nl = batch.num_ligand_atoms
    real = np.asarray(batch.ligand_mask)
    np.testing.assert_allclose(
        np.asarray(preds_big['pred_ligand_pos'][:, :Nl])[real],
        np.asarray(preds['pred_ligand_pos'])[real], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(preds_big['pred_ligand_v'][:, :Nl])[real],
        np.asarray(preds['pred_ligand_v'])[real], rtol=1e-4, atol=1e-5)
    bond_real = np.asarray(batch.bond_mask)
    np.testing.assert_allclose(
        np.asarray(preds_big['pred_bond'][:, :Nl, :Nl])[bond_real],
        np.asarray(preds['pred_bond'])[bond_real], rtol=1e-4, atol=1e-5)


def test_frozen_atoms_do_not_move(setup):
    """ligand_update_mask=0 atoms keep their input coordinates
    (ref models/decompdiff.py:597 'dummy node is marked as 0')."""
    model, batch, params = setup
    upd = np.asarray(batch.ligand_mask).copy()
    upd[:, :2] = False
    batch2 = batch.replace(ligand_update_mask=jnp.asarray(upd))
    t = jnp.asarray([3, 40])
    preds = model.apply(params, batch2, batch2.ligand_pos, batch2.ligand_v,
                        batch2.bond_type, t)
    np.testing.assert_allclose(
        np.asarray(preds['pred_ligand_pos'])[:, :2],
        np.asarray(batch2.ligand_pos)[:, :2], rtol=1e-6)


def test_diffusion_loss_and_grads_finite(setup):
    model, batch, params = setup

    def loss_fn(p):
        out = model.get_diffusion_loss(p, jax.random.PRNGKey(42), batch)
        l = out['losses']
        return l['pos'] + 100.0 * l['v'] + 100.0 * l['bond']

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat, _ = ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).max()) > 0


def test_loss_decreases_with_identity_supervision(setup):
    """At t=0 with x0 prediction, loss_pos should be smaller when the model is
    fed a batch whose ligand positions it can shortcut — sanity that the loss
    wiring responds to predictions (not a training test)."""
    model, batch, params = setup
    out = model.get_diffusion_loss(
        params, jax.random.PRNGKey(1), batch,
        time_step=jnp.asarray([0, 0]))
    assert np.isfinite(float(out['losses']['pos']))
    assert np.isfinite(float(out['losses']['v']))
    assert np.isfinite(float(out['losses']['bond']))


def test_prior_types_non_basic_mode_uses_uniform_prior():
    """prior_types=True with a non-8-class vocabulary must fall back to a
    uniform terminal prior, like the reference (utils/transforms.py:141-145
    only has marginals for mode=='basic'); round-3 review: the 8-class
    marginals were selected unconditionally and broke 13/23-class configs
    at trace time."""
    import numpy as np

    from decompdiff_tpu.models.diffusion_model import DecompDiffModel
    from decompdiff_tpu.utils.testing import (random_complex_batch,
                                              tiny_model_config)

    cfg = tiny_model_config(prior_types=True)
    model13 = DecompDiffModel.create(cfg, num_classes=13)
    lp = np.asarray(model13.atom_diff.prior_logprobs)
    assert lp.shape == (13,)
    np.testing.assert_allclose(lp, -np.log(13), rtol=1e-6)

    # 8-class keeps the marginals (class 0 prob 0 -> large negative logprob)
    model8 = DecompDiffModel.create(cfg, num_classes=8)
    lp8 = np.asarray(model8.atom_diff.prior_logprobs)
    assert lp8.shape == (8,)
    assert lp8[0] < -10
    assert abs(float(np.exp(lp8).sum()) - 1.0) < 1e-3

    # and the 13-class model actually traces through a loss
    import jax
    batch = random_complex_batch(np.random.default_rng(0), batch_size=1,
                                 num_protein=16, num_ligand=6)
    batch = batch.replace(ligand_v=(batch.ligand_v % 13))
    params = model13.init_params(jax.random.PRNGKey(0), batch)
    out = model13.get_diffusion_loss(params, jax.random.PRNGKey(1), batch)
    assert np.isfinite(float(out['losses']['v']))
