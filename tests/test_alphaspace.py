"""First-party alpha-sphere pocket detection (preprocess/alphaspace.py).

Synthetic receptor: a cubic lattice of pseudo-atoms with a spherical cavity
carved out of the middle. The cavity's surrounding lattice corners admit
Delaunay tetrahedra whose circumsphere sits at the cavity center with
radius inside the AlphaSpace window, so the finder must report a
binder-contacting pocket there (parity role: ref
scripts/data_preparation/preprocess_subcomplex.py:86-107).
"""

import itertools

import numpy as np
import pytest

from decompdiff_tpu.preprocess import alphaspace as als


def _lattice(spacing=3.0, half=4, cavity_r=4.5):
    pts = []
    for i, j, k in itertools.product(range(-half, half + 1), repeat=3):
        p = np.array([i, j, k], float) * spacing
        if np.linalg.norm(p) >= cavity_r:
            pts.append(p)
    return np.stack(pts)


def _lattice_pdb_block(pos, elements):
    lines = ['HEADER    SYNTH CAVITY']
    for n, (p, elem) in enumerate(zip(pos, elements), start=1):
        name = 'CA' if elem == 'C' else 'O'
        lines.append(
            f'ATOM  {n:5d}  {name:<3s} GLY A{n:4d}    '
            f'{p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}  1.00  0.00'
            f'          {elem:>2s}')
    lines.append('END')
    return '\n'.join(lines) + '\n'


LIGAND_SDF = """cavity-probe
  synthetic

  2  1  0  0  0  0  0  0  0  0999 V2000
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    0.0000    0.0000    1.4000 C   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
M  END
$$$$
"""


def test_circumsphere_regular_tetrahedron():
    # unit-edge regular tetrahedron: circumradius = sqrt(3/8)
    pts = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                   float) / np.sqrt(8)  # edge length 1
    centers, radii = als.circumspheres(pts, np.array([[0, 1, 2, 3]]))
    assert np.allclose(centers[0], 0.0, atol=1e-12)
    assert np.isclose(radii[0], np.sqrt(3.0 / 8.0))
    vol = als.tetra_volumes(pts, np.array([[0, 1, 2, 3]]))[0]
    assert np.isclose(vol, 1.0 / (6 * np.sqrt(2)))  # unit-edge tetra volume


def test_degenerate_tetrahedron_filtered():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float)
    _, radii = als.circumspheres(pts, np.array([[0, 1, 2, 3]]))
    assert np.isinf(radii[0])


def test_cavity_pocket_found_and_contacting():
    pos = _lattice()
    binder = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.4]])
    pockets = als.find_pockets(pos, binder_pos=binder)
    assert len(pockets) >= 1
    top = pockets[0]
    assert top.isContact
    # the contacting alphas sit at the cavity center
    contact_centers = top.alpha_centers[top.contact_mask]
    assert np.linalg.norm(contact_centers, axis=1).min() < 1.6
    assert top.space > 0 and top.nonpolar_space > 0
    assert 0.0 < top.occupancy_nonpolar <= 1.0
    # all-carbon receptor: nonpolar space == space
    assert np.isclose(top.nonpolar_space, top.space)
    # pockets are sorted by nonpolar space descending
    np_spaces = [p.nonpolar_space for p in pockets]
    assert np_spaces == sorted(np_spaces, reverse=True)


def test_polar_vertices_reduce_nonpolar_space():
    pos = _lattice()
    elem_all_c = np.full(len(pos), 6)
    elem_half_o = np.where(np.arange(len(pos)) % 2 == 0, 8, 6)
    binder = np.zeros((1, 3))
    top_c = als.find_pockets(pos, receptor_element=elem_all_c,
                             binder_pos=binder)[0]
    top_o = als.find_pockets(pos, receptor_element=elem_half_o,
                             binder_pos=binder)[0]
    assert top_o.nonpolar_space < top_c.nonpolar_space
    assert np.isclose(top_o.space, top_c.space)


def test_no_binder_keeps_all_pockets():
    pos = _lattice()
    pockets = als.find_pockets(pos)
    assert len(pockets) >= 1
    assert all(p.contact_mask is None for p in pockets)
    assert all(not p.isContact for p in pockets)
    assert all(p.occupancy_nonpolar == 0.0 for p in pockets)


def test_kdtree_single_linkage_matches_on_separated_blobs(monkeypatch):
    rng = np.random.default_rng(0)
    blob_a = rng.normal(0, 1.0, (40, 3))
    blob_b = rng.normal(0, 1.0, (40, 3)) + np.array([30.0, 0, 0])
    centers = np.concatenate([blob_a, blob_b])
    lab_avg = als._cluster_alpha_centers(centers, 4.7)
    monkeypatch.setattr(als, '_LINKAGE_MAX', 1)
    lab_kd = als._cluster_alpha_centers(centers, 4.7)
    # same partition (labels may be permuted)
    for lab in (lab_avg, lab_kd):
        assert len(np.unique(lab[:40])) == 1
        assert len(np.unique(lab[40:])) == 1
        assert lab[0] != lab[-1]


def test_alpha_object_interface_matches_reference_consumers():
    """The pocket object must satisfy the alphaspace2 surface the reference
    driver and eval_arms consume (centroid/nonpolar_space per alpha)."""
    from decompdiff_tpu.evaluation.eval_arms import compute_occupancy

    pos = _lattice()
    binder = np.zeros((1, 3))
    top = als.find_pockets(pos, binder_pos=binder)[0]
    centers = np.stack([a.centroid for a in top.alphas])
    assert centers.shape == top.alpha_centers.shape
    occ = compute_occupancy(top, binder)
    assert np.isclose(occ, top.occupancy_nonpolar)
    assert top.lining_atom_idx.ndim == 1
    assert np.all(top.lining_atom_idx < len(pos))


def test_first_party_driver_end_to_end(tmp_path):
    from decompdiff_tpu.preprocess.subcomplex import run_alphaspace_first_party

    pos = _lattice()
    elements = np.where(np.arange(len(pos)) % 7 == 0, 'O', 'C')
    pdb = tmp_path / 'receptor.pdb'
    sdf = tmp_path / 'ligand.sdf'
    pdb.write_text(_lattice_pdb_block(pos, elements))
    sdf.write_text(LIGAND_SDF)
    pockets, protein = run_alphaspace_first_party(str(pdb), str(sdf))
    assert len(pockets) >= 1
    assert all(p.isContact for p in pockets)
    top = pockets[0]
    assert np.linalg.norm(
        top.alpha_centers[top.contact_mask], axis=1).min() < 1.6
    # protein parsed with the synthetic elements
    assert (np.asarray(protein.element) == 8).sum() > 0


def test_too_few_atoms_raises():
    with pytest.raises(ValueError):
        als.find_alpha_spheres(np.zeros((3, 3)))


# ---------------------------------------------------------------------------
# full L0 pipeline, RDKit/alphaspace2-free (dumbbell two-cavity receptor)
# ---------------------------------------------------------------------------

def _dumbbell_lattice(spacing=3.0, half=5, cavity_r=4.0):
    pts = []
    for i, j, k in itertools.product(range(-half, half + 1), repeat=3):
        p = np.array([i, j, k], float) * spacing
        if min(np.linalg.norm(p - [6, 0, 0]),
               np.linalg.norm(p + [6, 0, 0])) >= cavity_r:
            pts.append(p)
    return np.stack(pts)


DUMBBELL_LIGAND_SDF = """dumbbell
  synthetic: ring arms in both cavities + 3-atom linker

  9 10  0  0  0  0  0  0  0  0999 V2000
   -6.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
   -6.0000    1.4000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
   -7.2000    0.7000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
   -3.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    0.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    3.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    6.0000    0.0000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    6.0000    1.4000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
    7.2000    0.7000    0.0000 C   0  0  0  0  0  0  0  0  0  0  0  0
  1  2  1  0
  2  3  1  0
  3  1  1  0
  1  4  1  0
  4  5  1  0
  5  6  1  0
  6  7  1  0
  7  8  1  0
  8  9  1  0
  9  7  1  0
M  END
$$$$
"""


def test_bond_cut_fragments_dumbbell():
    from decompdiff_tpu.data.mol import parse_mol_block
    from decompdiff_tpu.preprocess.decompose import (
        bond_cut_fragments, ring_bond_flags, undirected_bond_pairs)

    mol = parse_mol_block(DUMBBELL_LIGAND_SDF)
    pairs, types = undirected_bond_pairs(mol.bond_index, mol.bond_type)
    flags = ring_bond_flags(mol.num_atoms, pairs)
    assert flags.sum() == 6  # the two 3-rings
    frags = bond_cut_fragments(mol.num_atoms, pairs, types)
    # two rings + three linker atoms
    assert sorted(map(len, frags)) == [1, 1, 1, 3, 3]
    assert sorted(sum(frags, [])) == list(range(9))


def test_extract_subcomplex_rdkit_free_end_to_end(tmp_path):
    """Full L0 on the first-party stack: PDB parse -> alpha-sphere pockets
    -> bond-cut decomposition -> arm/scaffold split -> meta + pocket PDBs
    (parity role: ref preprocess_subcomplex.py:71-213)."""
    from decompdiff_tpu.data.mol import parse_sdf_file
    from decompdiff_tpu.preprocess.subcomplex import extract_subcomplex

    pos = _dumbbell_lattice()
    pdb = tmp_path / 'receptor.pdb'
    sdf = tmp_path / 'ligand.sdf'
    pdb.write_text(_lattice_pdb_block(pos, ['C'] * len(pos)))
    sdf.write_text(DUMBBELL_LIGAND_SDF)

    mol = parse_sdf_file(str(sdf))  # force the MolRecord (no-RDKit) path
    meta = extract_subcomplex(str(pdb), str(sdf), mol=mol,
                              out_dir=str(tmp_path), name='dumbbell')
    assert meta['num_arms'] == 2
    # both ring arms land in distinct pockets; linker atoms go to
    # scaffold or join an arm while keeping the <=1-crossing-bond invariant
    arm_sets = meta['all_submol_atom_idx'][:-1]
    assert {0, 1, 2}.issubset(set(arm_sets[0]) | set(arm_sets[1]))
    assert {6, 7, 8}.issubset(set(arm_sets[0]) | set(arm_sets[1]))
    covered = sum(meta['all_submol_atom_idx'], [])
    assert sorted(covered) == list(range(9))
    # pocket PDBs written and parseable
    import os
    assert os.path.exists(meta['pocket_file'])
    from decompdiff_tpu.data.protein import PDBProtein
    pocket = PDBProtein(meta['pocket_file'])
    assert len(pocket.element) > 0


def test_preprocess_cli_first_party(tmp_path):
    """The offline decomposition CLI runs end-to-end on the first-party
    stack (role parity: ref scripts/data_preparation/
    preprocess_subcomplex.py main loop + fail taxonomy)."""
    import os
    import pickle
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    raw = tmp_path / 'raw'
    raw.mkdir()
    pos = _dumbbell_lattice()
    (raw / 'receptor.pdb').write_text(
        _lattice_pdb_block(pos, ['C'] * len(pos)))
    (raw / 'ligand.sdf').write_text(DUMBBELL_LIGAND_SDF)
    index = [{'protein': 'receptor.pdb', 'ligand': 'ligand.sdf'},
             {'protein': 'missing.pdb', 'ligand': 'ligand.sdf'}]
    idx_pkl = tmp_path / 'index.pkl'
    idx_pkl.write_bytes(pickle.dumps(index))

    out = subprocess.run(
        [sys.executable, 'scripts/preprocess_subcomplex.py', str(idx_pkl),
         '--raw_root', str(raw), '--dest', str(tmp_path / 'dest'),
         '--num_workers', '1', '--timeout', '120'],
        capture_output=True, text=True, timeout=300, cwd=repo)
    assert out.returncode == 0, out.stderr
    results = pickle.loads((tmp_path / 'dest' / 'index.pkl').read_bytes())
    fails = pickle.loads(
        (tmp_path / 'dest' / 'fail_index.pkl').read_bytes())
    assert len(results) == 1
    assert results[0]['data']['num_arms'] == 2
    assert len(fails) == 1 and fails[0]['status'] == 'missing_file'

    # the CLI output satisfies the dataset-builder contract
    # (data.meta_file -> meta with POCKET protein_file,
    # ref pl_pair_dataset.py:128-132): raw files -> trainable store
    from decompdiff_tpu.data.dataset import build_store_from_index
    from decompdiff_tpu.data.store import DDStore

    store_path = str(tmp_path / 'built.ddstore')
    build_store_from_index(str(tmp_path / 'dest'), store_path)
    store = DDStore(store_path)
    assert len(store) == 1
    rec = store[0]
    assert rec['num_arms'] == 2
    assert rec['ligand_pos'].shape == (9, 3)
    assert rec['pocket_atom_masks'].shape[0] == 2
    assert rec['arms_prior'] is not None
    # the record's protein is the trimmed pocket, not the full receptor
    assert len(rec['protein_element']) < len(_dumbbell_lattice())
