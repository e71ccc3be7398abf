"""Notebook visualization helpers (py3Dmol / RDKit — both gated).

Role parity with ref utils/visualize.py (complex/fragment/trajectory viewers,
RDKit grid images). All functions raise informative ImportErrors when the
optional viewers are absent; `mol_record_to_xyz` works everywhere.
"""

from __future__ import annotations

import numpy as np

from decompdiff_tpu.constants import ATOMIC_NUM_TO_SYMBOL
from decompdiff_tpu.data.mol import MolRecord, mol_to_sdf_block


def mol_record_to_xyz(mol: MolRecord, comment: str = '') -> str:
    """XYZ-format dump of a MolRecord (viewer-agnostic)."""
    lines = [str(mol.num_atoms), comment]
    for i in range(mol.num_atoms):
        sym = ATOMIC_NUM_TO_SYMBOL.get(int(mol.element[i]), 'C')
        x, y, z = mol.pos[i]
        lines.append(f'{sym} {x:.4f} {y:.4f} {z:.4f}')
    return '\n'.join(lines) + '\n'


def _require_py3dmol():
    try:
        import py3Dmol  # noqa: F401
        return py3Dmol
    except Exception as e:
        raise ImportError('py3Dmol is required for 3D viewers') from e


def visualize_complex(protein_pdb_block: str, ligand, size=(600, 600)):
    """Protein cartoon + ligand sticks (ref utils/visualize.py viewers)."""
    py3Dmol = _require_py3dmol()
    view = py3Dmol.view(width=size[0], height=size[1])
    view.addModel(protein_pdb_block, 'pdb')
    view.setStyle({'model': 0}, {'cartoon': {'color': 'spectrum'}})
    if isinstance(ligand, MolRecord):
        view.addModel(mol_to_sdf_block(ligand), 'sdf')
    else:
        from rdkit import Chem
        view.addModel(Chem.MolToMolBlock(ligand), 'sdf')
    view.setStyle({'model': 1}, {'stick': {}})
    view.zoomTo()
    return view


def visualize_generated_trajectory(traj_pos, elements, size=(600, 600),
                                   interval=50):
    """Animated point-cloud trajectory (stacked sampler outputs)."""
    py3Dmol = _require_py3dmol()
    view = py3Dmol.view(width=size[0], height=size[1])
    frames = []
    for t in range(len(traj_pos)):
        rec = MolRecord(
            element=np.asarray(elements), pos=np.asarray(traj_pos[t]),
            bond_index=np.zeros((2, 0), np.int64),
            bond_type=np.zeros(0, np.int64),
            aromatic=np.zeros(len(elements), bool))
        frames.append(mol_record_to_xyz(rec))
    view.addModelsAsFrames(''.join(frames), 'xyz')
    view.setStyle({'sphere': {'radius': 0.4}})
    view.animate({'loop': 'forward', 'interval': interval})
    view.zoomTo()
    return view


def draw_mol_grid(mols, mols_per_row=4, size=(200, 200)):
    """RDKit grid image (ref utils/visualize.py grid images)."""
    from rdkit.Chem import Draw
    return Draw.MolsToGridImage(mols, molsPerRow=mols_per_row,
                                subImgSize=size)
