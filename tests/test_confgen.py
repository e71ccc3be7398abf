"""First-party distance-geometry conformer embedding (utils/confgen.py) and
the conformer-RMSD quality metric (role parity: ref utils/chem.py:32-60 and
ref utils/evaluation/scoring_func.py:49-69)."""

import numpy as np

from decompdiff_tpu.utils.confgen import (
    distance_bounds, embed_conformer, generate_conformers)
from tests.test_chem_helpers import _record


def _benzene_record():
    ang = np.pi / 3 * np.arange(6)
    pos = 1.41 / (2 * np.sin(np.pi / 6)) * np.stack(
        [np.cos(ang), np.sin(ang), np.zeros(6)], axis=1)
    bonds = {(min(i, (i + 1) % 6), max(i, (i + 1) % 6)): 4 for i in range(6)}
    return _record([6] * 6, pos, bonds)


def test_distance_bounds_chain():
    # propane-like C3: bonded pairs tight at 1.52, the 1-3 pair at the
    # tetrahedral law-of-cosines distance, windows never inverted
    bonds = {(0, 1): 1, (1, 2): 1}
    lower, upper = distance_bounds(np.array([6, 6, 6]), bonds)
    d0 = 2 * 0.76
    assert abs(lower[0, 1] - d0 * 0.98) < 1e-9
    assert abs(upper[0, 1] - d0 * 1.02) < 1e-9
    d13 = np.sqrt(2 * d0 ** 2 - 2 * d0 ** 2 * np.cos(np.deg2rad(109.47)))
    assert lower[0, 2] < d13 < upper[0, 2]
    assert (lower <= upper + 1e-12).all()
    # triangle smoothing: no upper bound may exceed the bond-path sum
    assert upper[0, 2] <= upper[0, 1] + upper[1, 2] + 1e-12


def test_embed_chain_geometry():
    bonds = {(0, 1): 1, (1, 2): 1}
    pos, energy = embed_conformer(np.array([6, 6, 6]), bonds,
                                  np.random.default_rng(0))
    d01 = np.linalg.norm(pos[1] - pos[0])
    d12 = np.linalg.norm(pos[2] - pos[1])
    assert abs(d01 - 1.52) < 2e-2 and abs(d12 - 1.52) < 2e-2
    u = (pos[0] - pos[1]) / d01
    v = (pos[2] - pos[1]) / d12
    assert abs(float(u @ v) - np.cos(np.deg2rad(109.47))) < 5e-2
    assert energy < 1.0  # relaxed near the minimum


def test_embed_benzene_closes_planar_ring():
    rec = _benzene_record()
    from decompdiff_tpu.utils.confgen import record_bonds
    pos, _ = embed_conformer(rec.element, record_bonds(rec),
                             np.random.default_rng(3))
    # every ring bond near the aromatic equilibrium (2 * 0.76 * 0.93)
    nxt = [1, 2, 3, 4, 5, 0]
    d = np.linalg.norm(pos - pos[nxt], axis=1)
    np.testing.assert_allclose(d, 2 * 0.76 * 0.93, atol=5e-2)
    # 120-degree equilibrium angles force the hexagon flat: the smallest
    # principal extent is tiny relative to the ring radius
    c = pos - pos.mean(0)
    sv = np.linalg.svd(c, compute_uv=False)
    assert sv[2] < 0.15 * sv[0]


def test_generate_conformers_sorted_and_deterministic():
    bonds = {(0, 1): 1, (1, 2): 1, (2, 3): 1}
    el = np.array([6, 6, 6, 8])
    confs = generate_conformers(el, bonds, n_confs=4, seed=5)
    energies = [e for _, e in confs]
    assert energies == sorted(energies)
    confs2 = generate_conformers(el, bonds, n_confs=4, seed=5)
    for (p1, e1), (p2, e2) in zip(confs, confs2):
        np.testing.assert_array_equal(p1, p2)
        assert e1 == e2


def test_chem_fronts_on_records():
    from decompdiff_tpu.utils.chem import (
        compute_3d_coors, compute_3d_coors_multiple, get_rmsd)
    rec = _benzene_record()
    pos, flag = compute_3d_coors(rec, random_seed=0)
    assert flag == 1 and pos.shape == (6, 3)
    confs, result, flag = compute_3d_coors_multiple(rec, numConfs=3)
    assert flag == 1 and len(confs) == 3 and len(result) == 3
    assert [r[1] for r in result] == sorted(r[1] for r in result)
    assert all(r[0] == 0 for r in result)  # converged code, ref :55-57
    # a re-embedded benzene matches the ideal one closely after alignment
    assert get_rmsd(rec, _record(rec.element, confs[0], {})) < 0.1
    # bond-less record: reference's (0, 0) / (None, [], 0) failure shapes
    empty = _record([6, 6], np.zeros((2, 3)), {})
    assert compute_3d_coors(empty) == (0, 0)
    assert compute_3d_coors_multiple(empty) == (None, [], 0)


def test_conformer_rmsd_metric():
    from decompdiff_tpu.evaluation.scoring import get_rdkit_rmsd
    rec = _benzene_record()
    mx, mn, med = get_rdkit_rmsd(rec, n_conf=3, random_seed=1)
    assert np.isfinite([mx, mn, med]).all()
    assert 0 <= mn <= med <= mx
    assert mn < 0.1  # rigid ring re-embeds onto itself
    # failure path: no bonds -> [nan, nan, nan] (ref scoring_func.py:68-69)
    empty = _record([6], np.zeros((1, 3)), {})
    assert np.isnan(get_rdkit_rmsd(empty)).all()


def test_embed_disconnected_record():
    # two separate bonded fragments: inter-component upper bounds have no
    # bond path — they must be capped, not left at inf (uniform(low, inf)
    # raised OverflowError before the cap). Generated molecules are
    # routinely multi-fragment.
    bonds = {(0, 1): 1, (2, 3): 1}
    element = np.array([6, 6, 6, 6])
    lower, upper = distance_bounds(element, bonds)
    assert np.isfinite(upper).all()
    assert (lower <= upper + 1e-12).all()
    pos, energy = embed_conformer(element, bonds, np.random.default_rng(0))
    assert np.isfinite(pos).all() and np.isfinite(energy)
    # both bonds near equilibrium, fragments not collapsed into a clash
    assert abs(np.linalg.norm(pos[1] - pos[0]) - 1.52) < 5e-2
    assert abs(np.linalg.norm(pos[3] - pos[2]) - 1.52) < 5e-2
    rec = _record(element, pos, bonds)
    from decompdiff_tpu.utils.chem import compute_3d_coors
    out, flag = compute_3d_coors(rec, random_seed=0)
    assert flag == 1 and np.isfinite(out).all()
