"""Host-callback guidance path tests (VERDICT.md round-1 item 5):
* pure_callback drift in the scanned sampler — window gating + shape/dtype
  contract, with a dummy callback (no RDKit needed);
* ring-repulsion drift = exact gradient of the reference hinge loss
  (ref utils/guidance_funcs.py:161-230), checked by finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np

from decompdiff_tpu.guidance.ring import (
    make_ring_repulsion_callback, ring_repulsion_energy_single,
    ring_repulsion_single)
from decompdiff_tpu.models.diffusion_model import DecompDiffModel
from decompdiff_tpu.sampling.sampler import SampleConfig, sample_diffusion
from decompdiff_tpu.utils.testing import random_complex_batch, tiny_model_config


# ---------------------------------------------------------------------------
# pure_callback window gating in the scan
# ---------------------------------------------------------------------------

class RecordingCallback:
    """Constant drift; records every invocation's shapes/dtypes."""

    def __init__(self, value=5.0):
        self.value = value
        self.calls = []

    def __call__(self, pos, v, mask):
        pos = np.asarray(pos)
        self.calls.append((pos.shape, np.asarray(v).shape, pos.dtype))
        return np.full(pos.shape, self.value, np.float32)


def _setup():
    cfg = tiny_model_config(num_diffusion_timesteps=10)
    model = DecompDiffModel.create(cfg, num_classes=8)
    batch = random_complex_batch(np.random.default_rng(0), batch_size=2)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    return model, batch, params


def _run(model, batch, params, sample_cfg):
    return sample_diffusion(
        model, sample_cfg, params, jax.random.PRNGKey(7), batch,
        batch.ligand_pos, batch.ligand_v, batch.bond_type)


def test_mmff_callback_window_gating():
    model, batch, params = _setup()

    base = _run(model, batch, params,
                SampleConfig(num_steps=10, save_traj=False))

    # empty window [0, 0): lax.cond gates the HOST call itself — the
    # callback must never fire (ref models/decompdiff.py:669-672 only
    # computes the drift inside the window)
    cb_empty = RecordingCallback()
    out_empty = _run(model, batch, params,
                     SampleConfig(num_steps=10, save_traj=False,
                                  mmff_callback=cb_empty,
                                  mmff_start_time=0, mmff_end_time=0))
    assert len(cb_empty.calls) == 0
    np.testing.assert_array_equal(np.asarray(out_empty['pos']),
                                  np.asarray(base['pos']))

    # active window [2, 5): fires exactly at t in {4, 3, 2} and the constant
    # drift must change the result
    cb_act = RecordingCallback()
    out_act = _run(model, batch, params,
                   SampleConfig(num_steps=10, save_traj=False,
                                mmff_callback=cb_act,
                                mmff_start_time=5, mmff_end_time=2))
    assert len(cb_act.calls) == 3
    diff = np.abs(np.asarray(out_act['pos']) - np.asarray(base['pos']))
    assert diff.max() > 1.0

    # shape/dtype contract survives pure_callback
    shp_pos, shp_v, dtype = cb_act.calls[0]
    B, Nl = batch.batch_size, batch.num_ligand_atoms
    assert shp_pos == (B, Nl, 3)
    assert shp_v == (B, Nl)
    assert dtype == np.float32


def test_ring_callback_pluggable_into_sampler():
    model, batch, params = _setup()
    cb = make_ring_repulsion_callback()
    out = _run(model, batch, params,
               SampleConfig(num_steps=5, save_traj=False, mmff_callback=cb,
                            mmff_start_time=5, mmff_end_time=0))
    assert np.isfinite(np.asarray(out['pos'])).all()


def test_ff_relax_callback_through_sampler():
    """The REAL first-party mmff_min replacement (guidance/ffmin.py) driven
    through the scanned sampler — the RDKit-free execution of the drift the
    reference computes at decompdiff.py:669-672."""
    from decompdiff_tpu.guidance.ffmin import make_ff_callback

    model, batch, params = _setup()
    cb = make_ff_callback('basic', max_iter=30)
    out = _run(model, batch, params,
               SampleConfig(num_steps=5, save_traj=False, mmff_callback=cb,
                            mmff_start_time=3, mmff_end_time=0))
    assert np.isfinite(np.asarray(out['pos'])).all()


# ---------------------------------------------------------------------------
# ring repulsion = exact gradient of the reference hinge
# ---------------------------------------------------------------------------

def polyacene(n_rings, bond=1.4):
    """Fused hexagon row (anthracene-like for n_rings=3)."""
    pts = set()
    for k in range(n_rings):
        cx = k * np.sqrt(3) * bond
        for i in range(6):
            ang = np.pi / 6 + i * np.pi / 3
            p = (round(cx + bond * np.cos(ang), 6),
                 round(bond * np.sin(ang), 6))
            pts.add(p)
    pts = sorted(pts)
    return np.array([[x, y, 0.0] for x, y in pts])


def test_single_ring_no_repulsion():
    pos = polyacene(1)
    e, valid = ring_repulsion_energy_single(pos)
    assert (e, valid) == (0.0, 0)
    # two fused rings still allowed (max_allow_rings=2)
    e2, valid2 = ring_repulsion_energy_single(polyacene(2))
    assert (e2, valid2) == (0.0, 0)


def test_three_fused_rings_penalized():
    pos = polyacene(3)
    e, grad, valid = ring_repulsion_single(pos)
    assert valid == 1
    assert e > 0.0
    assert np.abs(grad).max() > 0.0


def test_ring_gradient_matches_finite_differences():
    rng = np.random.default_rng(3)
    pos = polyacene(3)
    pos = pos + rng.normal(size=pos.shape) * 0.01  # break topk ties
    e0, grad, valid = ring_repulsion_single(pos)
    assert valid == 1
    eps = 1e-6
    num = np.zeros_like(grad)
    for i in range(len(pos)):
        for c in range(3):
            pp = pos.copy()
            pp[i, c] += eps
            ep, _, _ = ring_repulsion_single(pp)
            pm = pos.copy()
            pm[i, c] -= eps
            em, _, _ = ring_repulsion_single(pm)
            num[i, c] = (ep - em) / (2 * eps)
    np.testing.assert_allclose(grad, num, rtol=1e-4, atol=1e-6)


def test_ring_callback_batch_mean_scaling():
    # the reference divides the summed per-graph losses by num_graphs
    # (ref :230); the callback gradient carries the same 1/B factor
    pos1 = polyacene(3)
    _e, g_single, _v = ring_repulsion_single(pos1)
    B, Nl = 2, len(pos1)
    pos = np.stack([pos1, pos1])
    mask = np.ones((B, Nl), bool)
    cb = make_ring_repulsion_callback()
    out = cb(pos, np.zeros((B, Nl), np.int64), mask)
    np.testing.assert_allclose(out[0], g_single / B, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(out[1], g_single / B, rtol=1e-6, atol=1e-7)
