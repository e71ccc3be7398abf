"""First-party force-field relaxation (guidance/ffmin.py) — the RDKit-free
implementation of the mmff_min conformer drift
(ref utils/guidance_funcs.py:121-158)."""

import numpy as np

from decompdiff_tpu.constants import COVALENT_RADII
from decompdiff_tpu.guidance import ffmin


def _angle_deg(pos, i, j, k):
    u = pos[i] - pos[j]
    v = pos[k] - pos[j]
    cos = u @ v / (np.linalg.norm(u) * np.linalg.norm(v))
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


def test_bond_relaxes_to_covalent_equilibrium():
    pos = np.array([[0.0, 0, 0], [2.2, 0, 0]])
    element = np.array([6, 6])
    relaxed = ffmin.relax_positions(pos, element, {(0, 1): 1})
    d = np.linalg.norm(relaxed[0] - relaxed[1])
    assert np.isclose(d, 2 * COVALENT_RADII[6], atol=1e-3)


def test_double_bond_shorter_than_single():
    pos = np.array([[0.0, 0, 0], [1.8, 0, 0]])
    element = np.array([6, 6])
    d1 = np.linalg.norm(np.diff(
        ffmin.relax_positions(pos, element, {(0, 1): 1}), axis=0))
    d2 = np.linalg.norm(np.diff(
        ffmin.relax_positions(pos, element, {(0, 1): 2}), axis=0))
    assert d2 < d1


def test_angle_relaxes_toward_tetrahedral():
    # C-C-C bent to 90 degrees opens toward 109.47
    pos = np.array([[1.5, 0, 0], [0.0, 0, 0], [0.0, 1.5, 0]])
    element = np.array([6, 6, 6])
    relaxed = ffmin.relax_positions(pos, element, {(0, 1): 1, (1, 2): 1})
    assert abs(_angle_deg(relaxed, 0, 1, 2) - 109.47) < 1.0


def test_nonbonded_clash_pushed_apart():
    # atom 2 is 1.0 A from atom 1 but not bonded to anything
    pos = np.array([[0.0, 0, 0], [1.54, 0, 0], [1.54, 1.0, 0]])
    element = np.array([6, 6, 6])
    relaxed = ffmin.relax_positions(pos, element, {(0, 1): 1})
    cut = ffmin.CLASH_SCALE * 2 * ffmin.VDW_RADII[6]
    assert np.linalg.norm(relaxed[2] - relaxed[1]) >= cut - 1e-3
    assert np.linalg.norm(relaxed[2] - relaxed[0]) >= cut - 1e-3


def test_energy_gradient_matches_finite_differences():
    rng = np.random.default_rng(0)
    pos = np.array([[0.0, 0, 0], [1.4, 0, 0], [2.1, 1.2, 0],
                    [2.1, 2.6, 0.4], [0.5, 0.9, 2.0]])
    pos = pos + rng.normal(size=pos.shape) * 0.05
    element = np.array([6, 6, 7, 8, 6])
    bonds = {(0, 1): 1, (1, 2): 2, (2, 3): 1}
    terms = ffmin.build_ff_terms(pos, element, bonds)
    x = pos.reshape(-1)
    e0, grad = ffmin.ff_energy_grad(x, terms)
    assert e0 > 0
    eps = 1e-6
    num = np.zeros_like(x)
    for i in range(len(x)):
        xp, xm = x.copy(), x.copy()
        xp[i] += eps
        xm[i] -= eps
        num[i] = (ffmin.ff_energy_grad(xp, terms)[0]
                  - ffmin.ff_energy_grad(xm, terms)[0]) / (2 * eps)
    np.testing.assert_allclose(grad, num, rtol=1e-5, atol=1e-5)


def test_sp_center_equilibrium_is_linear():
    # triple-bonded center with 2 neighbors -> 180 degrees
    assert ffmin._equilibrium_angle(6, 2, 3) == np.cos(np.pi)
    # divalent oxygen bends
    assert np.isclose(ffmin._equilibrium_angle(8, 2, 1),
                      np.cos(np.deg2rad(104.5)))
    # 2-neighbor AROMATIC ring carbon is trigonal, not linear (bond-type
    # code 4 must not hit the sp branch)
    assert np.isclose(ffmin._equilibrium_angle(6, 2, 4),
                      np.cos(np.deg2rad(120.0)))


def test_aromatic_ring_angles_are_trigonal():
    # benzene-like ring perceived with type-4 bonds: every in-ring angle
    # equilibrium must be 120 degrees
    ang = np.pi / 3 * np.arange(6)
    pos = 1.39 / (2 * np.sin(np.pi / 6)) * np.stack(
        [np.cos(ang), np.sin(ang), np.zeros(6)], axis=1)
    element = np.full(6, 6)
    bonds = {(i, (i + 1) % 6) if i < 5 else (0, 5): 4 for i in range(6)}
    bonds = {(min(a, b), max(a, b)): 4 for (a, b) in bonds}
    terms = ffmin.build_ff_terms(pos, element, bonds)
    assert len(terms['angle_idx']) == 6
    np.testing.assert_allclose(terms['angle_cos0'],
                               np.cos(np.deg2rad(120.0)), atol=1e-12)
    relaxed = ffmin.relax_positions(pos, element, bonds)
    d = np.linalg.norm(relaxed[list(range(6))]
                       - relaxed[[1, 2, 3, 4, 5, 0]], axis=1)
    # relaxes to the aromatic equilibrium length without ring strain
    # (para pairs at ~2x the side sit OUTSIDE the clash cutoff, so the
    # repulsion term must not inflate the ring)
    assert np.allclose(d, 2 * COVALENT_RADII[6] * ffmin.ORDER_SCALE[4],
                       atol=5e-3)


def test_callback_masks_and_disconnected_rejection():
    cb = ffmin.make_ff_callback('basic')
    B, Nl = 2, 6
    pos = np.zeros((B, Nl, 3), np.float32)
    # graph 0: perturbed 4-carbon chain (connected after perception)
    chain = np.array([[0.0, 0, 0], [1.5, 0.1, 0], [2.9, -0.2, 0.2],
                      [4.4, 0.15, -0.1]])
    pos[0, :4] = chain
    # graph 1: two atoms 10 A apart -> disconnected -> zero drift
    pos[1, 0] = [0, 0, 0]
    pos[1, 1] = [10, 0, 0]
    v = np.ones((B, Nl), np.int64)  # index 1 -> carbon in 'basic' mode
    mask = np.zeros((B, Nl), bool)
    mask[0, :4] = True
    mask[1, :2] = True
    out = cb(pos, v, mask)
    assert out.shape == (B, Nl, 3)
    assert np.abs(out[0, :4]).max() > 0  # perturbed chain gets a drift
    assert np.all(out[0, 4:] == 0)       # padding rows untouched
    assert np.all(out[1] == 0)           # disconnected -> rejected
    # drift points from prediction toward the relaxed geometry:
    # pred + (-drift) steps closer to equilibrium bond lengths
    relaxed_like = chain - out[0, :4]
    d_orig = np.linalg.norm(np.diff(chain, axis=0), axis=1)
    d_rel = np.linalg.norm(np.diff(relaxed_like, axis=0), axis=1)
    assert np.abs(d_rel - 2 * COVALENT_RADII[6]).max() \
        < np.abs(d_orig - 2 * COVALENT_RADII[6]).max() + 1e-6


def test_reversed_bond_keys_normalized():
    # the public contract is an arbitrary {(a, b): order} dict: reversed
    # keys must still be excluded from the repulsion pairs (a (1, 0) key
    # used to leave a 2.72 A clash spring fighting the 1.52 A bond)
    fwd = ffmin.build_ff_terms(np.zeros((2, 3)), np.array([6, 6]), {(0, 1): 1})
    rev = ffmin.build_ff_terms(np.zeros((2, 3)), np.array([6, 6]), {(1, 0): 1})
    assert rev['rep_idx'].shape == fwd['rep_idx'].shape == (0, 2)
    np.testing.assert_array_equal(rev['bond_d0'], fwd['bond_d0'])


def test_sp2_two_neighbor_center_is_trigonal():
    # heavy-atom-only records: an aldehyde/vinyl carbon has 2 neighbors and
    # a double bond -> 120 degrees, not the tetrahedral default
    assert np.isclose(ffmin._equilibrium_angle(6, 2, 2),
                      np.cos(np.deg2rad(120.0)))
    # divalent single-bonded O still bends at 104.5
    assert np.isclose(ffmin._equilibrium_angle(8, 2, 1),
                      np.cos(np.deg2rad(104.5)))
