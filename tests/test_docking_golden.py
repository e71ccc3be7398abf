"""Golden-fixture pinning of the docking stack's TEXT layers (VERDICT r3
item 6): the box math, the qvina command construction, and the
obabel-converted qvina output parsing are pinned to committed fixtures so
format drift becomes a test failure instead of a silent mock agreement
(the mocked-subprocess tests in test_docking_protocol.py only prove the
repo agrees with itself).

Fixtures:
  * fixtures/qvina_commands_golden.sh — the exact bash pipeline the
    reference emits (ref utils/evaluation/docking.py:114-143) minus its
    conda-env activation, rendered for a fixed task id / tmp dir / box.
  * fixtures/qvina_out_golden.sdf — an obabel-layout qvina2 output SDF
    (3 poses, each with the '>  <REMARK>' data field whose first line is
    'VINA RESULT: <affinity> <rmsd_lb> <rmsd_ub>' — the exact property the
    reference parser reads, ref docking.py:24-39:
    mol.GetProp('REMARK').splitlines()[0].split()[2:]).
"""

import os

import numpy as np
import pytest

from decompdiff_tpu.data.mol import MolRecord
from decompdiff_tpu.evaluation import docking

FIXTURES = os.path.join(os.path.dirname(__file__), 'fixtures')

# bbox: max [3,2,4.5], min [-1,-2,0.5] -> center [1.0, 0.0, 2.5],
# extent [4,4,4] -> size = extent*1.0 + 5.0 = [9,9,9] (ref docking.py:95-105)
GOLDEN_POS = np.array([[1.0, -2.0, 0.5],
                       [3.0, 2.0, 4.5],
                       [-1.0, 0.0, 2.5]])


def _golden_mol():
    return MolRecord(element=np.array([6, 6, 8]),
                     pos=GOLDEN_POS.astype(np.float32),
                     bond_index=np.array([[0, 1, 0, 2], [1, 0, 2, 0]]),
                     bond_type=np.array([1, 1, 1, 1]),
                     aromatic=np.zeros(3, bool))


def test_compute_box_golden_values():
    center, size = docking.compute_box(GOLDEN_POS)
    assert center == [1.0, 0.0, 2.5]
    assert size == [9.0, 9.0, 9.0]
    # fixed-cube mode (size_factor=None, ref docking.py:102-103)
    center, size = docking.compute_box(GOLDEN_POS, size_factor=None)
    assert size == [20.0, 20.0, 20.0]
    # explicit center overrides the bbox center (ref :97-100)
    center, size = docking.compute_box(GOLDEN_POS, center=[7.0, 8.0, 9.0])
    assert center == [7.0, 8.0, 9.0]
    assert size == [9.0, 9.0, 9.0]


def test_vinadock_get_box_golden():
    d = docking.VinaDock('lig.pdbqt', 'prot.pdbqt')
    d.get_box(GOLDEN_POS)
    assert d.pocket_center == [1.0, 0.0, 2.5]
    assert d.box_size == [9.0, 9.0, 9.0]


def test_qvina_command_construction_golden(monkeypatch):
    monkeypatch.setattr(docking, 'get_random_id', lambda *a, **k: 'goldenid')
    task = docking.QVinaDockingTask(_golden_mol(),
                                    protein_path='/nonexistent/recv.pdb',
                                    tmp_dir='/tmp/golden')
    assert task.task_id == 'goldenid'
    assert task.receptor_id == 'goldenid_receptor'
    assert task.ligand_id == 'goldenid_ligand'
    assert task.docked_sdf_path == '/tmp/golden/goldenid_ligand_out.sdf'
    with open(os.path.join(FIXTURES, 'qvina_commands_golden.sh')) as f:
        golden = f.read()
    assert task.commands(exhaustiveness=16) == golden


def test_parse_qvina_outputs_golden():
    results = docking.parse_qvina_outputs(
        os.path.join(FIXTURES, 'qvina_out_golden.sdf'))
    assert [r['mode_id'] for r in results] == [0, 1, 2]
    assert [r['affinity'] for r in results] == [-8.4, -7.9, -7.1]
    assert results[0]['rmsd_lb'] == 0.0 and results[0]['rmsd_ub'] == 0.0
    assert results[1]['rmsd_lb'] == pytest.approx(1.352)
    assert results[1]['rmsd_ub'] == pytest.approx(2.147)
    assert results[2]['rmsd_lb'] == pytest.approx(2.981)
    assert results[2]['rmsd_ub'] == pytest.approx(4.006)


def test_parse_qvina_skips_remarkless_pose(tmp_path):
    """A pose block without the REMARK data field is skipped, matching the
    reference's suppl 'if mol is None: continue' robustness (ref :27-28)."""
    with open(os.path.join(FIXTURES, 'qvina_out_golden.sdf')) as f:
        blocks = [b for b in f.read().split('$$$$') if b.strip()]
    stripped = '\n'.join(l for l in blocks[1].splitlines()
                         if 'REMARK' not in l and 'VINA RESULT' not in l)
    mixed = blocks[0] + '$$$$' + stripped + '\n$$$$' + blocks[2] + '$$$$\n'
    p = tmp_path / 'mixed.sdf'
    p.write_text(mixed)
    results = docking.parse_qvina_outputs(str(p))
    assert [r['affinity'] for r in results] == [-8.4, -7.1]
