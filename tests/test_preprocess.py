"""Decomposition algorithm tests (exact cover, terminal test, assignment) —
the RDKit-free core of the L0 pipeline."""

import numpy as np

from decompdiff_tpu.preprocess.decompose import (
    assign_fragments, crossing_bonds, find_exact_cover, is_terminal_fragment,
    split_by_assignment)


def test_exact_cover_every_type_must_contribute():
    # 6 atoms; type A matches {0,1,2} and {3,4,5}; type B matches {1,2,3}.
    # Type A alone covers everything, but the reference requires EVERY
    # BRICS fragment type to take at least one match (ref
    # utils/preprocess.py:81 `reversed(range(1, ...))`) — type B can only
    # overlap, so there is no cover and the molecule is rejected
    # (round-3 review fix; the old code returned a greedy one-type cover).
    groups = [
        [(0, 1, 2), (3, 4, 5)],
        [(1, 2, 3)],
    ]
    assert find_exact_cover(groups, 6) is None


def test_exact_cover_splits_shared_matches():
    # both types match the same two segments: each takes one
    groups = [
        [(0, 1), (2, 3)],
        [(0, 1), (2, 3)],
    ]
    cover = find_exact_cover(groups, 4)
    assert cover is not None
    assert sorted(map(sorted, cover)) == [[0, 1], [2, 3]]


def test_exact_cover_requires_both_types():
    groups = [
        [(0, 1), (4, 5)],
        [(2, 3)],
    ]
    cover = find_exact_cover(groups, 6)
    assert cover is not None
    assert sorted(cover[0]) == [0, 1, 4, 5]
    assert sorted(cover[1]) == [2, 3]


def test_exact_cover_infeasible():
    groups = [[(0, 1)], [(1, 2)]]
    assert find_exact_cover(groups, 3) is None


def test_terminal_fragment():
    # chain 0-1-2-3-4
    bonds = [(0, 1), (1, 2), (2, 3), (3, 4)]
    assert is_terminal_fragment(bonds, [0, 1])        # one crossing bond
    assert is_terminal_fragment(bonds, [4])
    assert not is_terminal_fragment(bonds, [2])       # two crossing bonds
    assert is_terminal_fragment(bonds, [0, 1, 2, 3, 4])  # whole molecule
    assert crossing_bonds(bonds, [2]) == [1, 2]


def test_assignment_two_arms_one_scaffold():
    # linear molecule: arm0 (frags 0) - scaffold (frag 1) - arm1 (frag 2)
    frag_atoms = [[0, 1], [2, 3], [4, 5]]
    bonds = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    centroids = np.array([[0, 0, 0], [5, 0, 0], [10, 0, 0]], float)
    pockets = [np.array([[0, 1, 0]]), np.array([[10, 1, 0]])]
    assignment, _ = assign_fragments(centroids, frag_atoms, bonds, pockets)
    assert assignment[0] == 0
    assert assignment[2] == 1
    assert assignment[1] == 2  # scaffold label = num_pockets

    parts, valid = split_by_assignment(assignment, frag_atoms, bonds, 2)
    assert parts == [[0, 1], [4, 5], [2, 3]]
    assert valid == [0, 1]


def test_assignment_nonterminal_goes_to_scaffold():
    # middle fragment is nearest to pocket 0 but not terminal -> scaffold
    frag_atoms = [[0], [1], [2]]
    bonds = [(0, 1), (1, 2)]
    centroids = np.array([[0, 0, 0], [1, 0, 0], [8, 0, 0]], float)
    pockets = [np.array([[0.5, 0, 0]]), np.array([[8, 0.5, 0]])]
    assignment, _ = assign_fragments(centroids, frag_atoms, bonds, pockets)
    # frag 1 is closest to pocket 0's cluster center but adding it to arm 0
    # keeps the arm terminal only if the union has <= 1 crossing bond:
    # atoms {0,1} crossing = 1 -> allowed
    assert assignment[0] == 0 and assignment[2] == 1
    parts, _ = split_by_assignment(assignment, frag_atoms, bonds, 2)
    flat = sorted(a for p in parts for a in p)
    assert flat == [0, 1, 2]


def test_fewer_arms_than_pockets():
    frag_atoms = [[0, 1, 2]]
    bonds = [(0, 1), (1, 2)]
    centroids = np.array([[0, 0, 0]], float)
    pockets = [np.array([[0, 1, 0]]), np.array([[20, 0, 0]])]
    assignment, cluster_pocket_idx = assign_fragments(
        centroids, frag_atoms, bonds, pockets)
    assert assignment[0] == 0
    assert set(cluster_pocket_idx) == {0, 1}


def test_ligand_to_pdb_block():
    """mdtraj cannot parse SDF: run_alphaspace converts via this block (ref
    preprocess_subcomplex.py:81 uses openbabel for the same step)."""
    import numpy as np

    from decompdiff_tpu.data.mol import MolRecord
    from decompdiff_tpu.preprocess.subcomplex import ligand_to_pdb_block

    m = MolRecord(element=np.array([6, 7, 8]),
                  pos=np.array([[0., 0., 0.], [1.4, 0., 0.], [2.1, 1.1, 0.]],
                               np.float32),
                  bond_index=np.array([[0, 1, 1, 2], [1, 0, 2, 1]]),
                  bond_type=np.array([1, 1, 2, 2]),
                  aromatic=np.zeros(3, bool))
    blk = ligand_to_pdb_block(m)
    lines = blk.splitlines()
    het = [l for l in lines if l.startswith('HETATM')]
    assert len(het) == 3
    # PDB fixed columns: x at 31-38, element at 77-78
    assert float(het[1][30:38]) == 1.4
    assert het[1][76:78].strip() == 'N'
    assert sum(1 for l in lines if l.startswith('CONECT')) == 2  # deduped
    assert lines[-1] == 'END'


def test_parse_pdbbind_index_file(tmp_path):
    from decompdiff_tpu.preprocess.subcomplex import parse_pdbbind_index_file
    root = tmp_path / 'pdbbind_2020'
    data = root / 'refined-set'
    (data / 'index').mkdir(parents=True)
    for pdb in ('1abc', '2xyz'):
        (data / pdb).mkdir()
    (data / 'index' / 'INDEX_refined_data.2020').write_text(
        '# header comment\n'
        '1abc  1.80  2012  5.32  Kd=4.8uM     // 1abc.pdf (ligand)\n'
        '2xyz  2.10  2015  7.10  Ki=80nM      // 2xyz.pdf (ligand)\n'
        '9zzz  1.50  2018  6.00  IC50=1uM     // not on disk\n')
    idx = parse_pdbbind_index_file(str(root))
    assert [e['pdb_index'] for e in idx] == ['1abc', '2xyz']
    assert idx[0]['src_protein_filename'] == '1abc/1abc_protein.pdb'
    assert idx[0]['src_ligand_filename'] == '1abc/1abc_ligand.sdf'
    assert idx[0]['pkd_type'] == 2 and idx[1]['pkd_type'] == 1
    assert idx[0]['pka'] == '5.32'


def test_parse_crossdocked_index_file(tmp_path):
    import pickle
    from decompdiff_tpu.preprocess.subcomplex import (
        parse_crossdocked_index_file)
    split = {'train': [('POCKET/recA_rec_0_pocket10.pdb',
                        'POCKET/recA_lig.sdf')],
             'test': [('P2/recB_rec_1_pocket10.pdb', 'P2/recB_lig.sdf')]}
    fn = tmp_path / 'split_by_name.pt'
    import torch
    torch.save(split, str(fn))
    idx = parse_crossdocked_index_file(str(fn))
    assert len(idx) == 2
    # protein stem truncated to 10 chars + .pdb (ref :60-62)
    assert idx[0]['src_protein_filename'] == 'POCKET/recA_rec_0.pdb'
    assert idx[0]['src_ligand_filename'] == 'POCKET/recA_lig.sdf'
    # pickled fallback parses the same structure without torch
    fn2 = tmp_path / 'split.pkl'
    with open(fn2, 'wb') as f:
        pickle.dump(split, f)
    assert parse_crossdocked_index_file(str(fn2)) == idx
