"""AutoDock Vina / QVina docking wrappers (host, gated on external tools).

Role parity with ref utils/evaluation/docking_vina.py (PrepLig/PrepProt/
VinaDock/VinaDockingTask) and docking.py (QVinaDockingTask subprocess
pipeline). The vina/meeko/AutoDockTools/pdb2pqr binaries and packages are not
present in this image; every entry point degrades to an informative
ImportError/FileNotFoundError so the evaluation driver can skip docking
(--docking_mode none) without breaking.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from typing import List, Optional

import numpy as np


def _have(cmd: str) -> bool:
    from shutil import which
    return which(cmd) is not None


class PrepLig:
    """Ligand -> PDBQT via meeko (ref docking_vina.py:30-58)."""

    def __init__(self, input_mol: str, mol_format: str):
        from rdkit import Chem
        from rdkit.Chem import AllChem
        if mol_format == 'smi':
            self.ob_mol = Chem.MolFromSmiles(input_mol)
            AllChem.EmbedMolecule(Chem.AddHs(self.ob_mol))
        elif mol_format == 'sdf':
            self.ob_mol = Chem.MolFromMolFile(input_mol)
        else:
            raise ValueError(mol_format)

    def get_pdbqt(self, lig_pdbqt: str):
        from meeko import MoleculePreparation
        preparator = MoleculePreparation()
        preparator.prepare(self.ob_mol)
        preparator.write_pdbqt_file(lig_pdbqt)


class PrepProt:
    """Protein -> PDBQT via pdb2pqr + ADT prepare_receptor4
    (ref docking_vina.py:61-82)."""

    def __init__(self, pdb_file: str):
        self.prot = pdb_file

    def del_water(self, dry_pdb_file: str):
        with open(self.prot) as f:
            lines = [l for l in f if l.startswith(('ATOM', 'HETATM'))
                     and 'HOH' not in l]
        with open(dry_pdb_file, 'w') as f:
            f.writelines(lines)
        self.prot = dry_pdb_file

    def addH(self, prot_pqr: str):
        if not _have('pdb2pqr30'):
            raise FileNotFoundError('pdb2pqr30 not found on PATH')
        subprocess.run(['pdb2pqr30', '--ff=AMBER', self.prot, prot_pqr],
                       check=True, capture_output=True)
        self.prot_pqr = prot_pqr

    def get_pdbqt(self, prot_pdbqt: str):
        if not _have('prepare_receptor4.py'):
            raise FileNotFoundError('AutoDockTools prepare_receptor4.py '
                                    'not found on PATH')
        subprocess.run(['prepare_receptor4.py', '-r', self.prot_pqr,
                        '-o', prot_pdbqt], check=True, capture_output=True)


class VinaDock:
    """Thin wrapper over the python vina API (ref docking_vina.py:85-149)."""

    def __init__(self, lig_pdbqt: str, prot_pdbqt: str):
        self.lig_pdbqt = lig_pdbqt
        self.prot_pdbqt = prot_pdbqt
        self.pocket_center: Optional[List[float]] = None
        self.box_size: Optional[List[float]] = None

    def get_box(self, ref_ligand_pos: np.ndarray, buffer: float = 5.0):
        """Box = ligand extent + buffer (ref docking_vina.py:100-112)."""
        pos = np.asarray(ref_ligand_pos)
        lo, hi = pos.min(0), pos.max(0)
        self.pocket_center = ((lo + hi) / 2).tolist()
        self.box_size = (hi - lo + 2 * buffer).tolist()

    def run(self, mode: str = 'dock', exhaustiveness: int = 8,
            save_pose: bool = False, **kwargs):
        from vina import Vina
        v = Vina(sf_name='vina', seed=0, verbosity=0)
        v.set_receptor(self.prot_pdbqt)
        v.set_ligand_from_file(self.lig_pdbqt)
        v.compute_vina_maps(center=self.pocket_center, box_size=self.box_size)
        if mode == 'score_only':
            score = v.score()[0]
            pose = None
        elif mode == 'minimize':
            score = v.optimize()[0]
            pose = None
            if save_pose:
                with tempfile.NamedTemporaryFile('r', suffix='.pdbqt') as tmp:
                    v.write_pose(tmp.name, overwrite=True)
                    pose = open(tmp.name).read()
        elif mode == 'dock':
            v.dock(exhaustiveness=exhaustiveness, n_poses=1)
            score = v.energies(n_poses=1)[0][0]
            pose = v.poses(n_poses=1) if save_pose else None
        else:
            raise ValueError(mode)
        return (score, pose) if save_pose else score


class VinaDockingTask:
    """End-to-end docking of one generated molecule against its pocket
    (ref docking_vina.py:152-227)."""

    def __init__(self, mol, protein_path: str, tmp_dir: str = '/tmp',
                 center=None, size_factor: float = 1.0, buffer: float = 5.0):
        self.mol = mol
        self.protein_path = protein_path
        self.tmp_dir = tmp_dir
        self.buffer = buffer

    @classmethod
    def from_generated_mol(cls, mol, ligand_filename: str, protein_root: str,
                           **kwargs):
        """Protein path derived from the ligand filename
        (ref docking_vina.py:160-175)."""
        protein_fn = os.path.join(
            os.path.dirname(ligand_filename),
            os.path.basename(ligand_filename)[:10] + '.pdb')
        return cls(mol, os.path.join(protein_root, protein_fn), **kwargs)

    def run(self, mode: str = 'dock', exhaustiveness: int = 8):
        from rdkit import Chem
        with tempfile.TemporaryDirectory(dir=self.tmp_dir) as td:
            lig_sdf = os.path.join(td, 'lig.sdf')
            Chem.MolToMolFile(self.mol, lig_sdf)
            lig_pdbqt = os.path.join(td, 'lig.pdbqt')
            PrepLig(lig_sdf, 'sdf').get_pdbqt(lig_pdbqt)

            prot = PrepProt(self.protein_path)
            prot.del_water(os.path.join(td, 'dry.pdb'))
            prot.addH(os.path.join(td, 'prot.pqr'))
            prot_pdbqt = os.path.join(td, 'prot.pdbqt')
            prot.get_pdbqt(prot_pdbqt)

            dock = VinaDock(lig_pdbqt, prot_pdbqt)
            conf = self.mol.GetConformer(0).GetPositions()
            dock.get_box(conf, self.buffer)
            return dock.run(mode=mode, exhaustiveness=exhaustiveness)


class QVinaDockingTask:
    """qvina2 subprocess pipeline (ref utils/evaluation/docking.py:56-183)."""

    def __init__(self, mol, protein_path: str, tmp_dir: str = '/tmp',
                 use_uff: bool = True):
        if not _have('qvina2'):
            raise FileNotFoundError('qvina2 binary not found on PATH')
        self.mol = mol
        self.protein_path = protein_path
        self.tmp_dir = tmp_dir
        self.use_uff = use_uff

    def run_sync(self, exhaustiveness: int = 16):
        raise NotImplementedError(
            'qvina pipeline requires obabel + AutoDockTools; run the '
            'VinaDockingTask path instead')


def docking_available() -> dict:
    """What docking backends the current host can actually run."""
    out = {'vina': False, 'meeko': False, 'pdb2pqr': _have('pdb2pqr30'),
           'prepare_receptor4': _have('prepare_receptor4.py'),
           'qvina2': _have('qvina2')}
    try:
        import vina  # noqa: F401
        out['vina'] = True
    except Exception:
        pass
    try:
        import meeko  # noqa: F401
        out['meeko'] = True
    except Exception:
        pass
    return out
