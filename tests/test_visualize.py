"""Visualization-surface tests with a mocked py3Dmol module.

Covers the full viewer surface of decompdiff_tpu.utils.visualize (role parity
with ref utils/visualize.py:18-412) without the optional py3Dmol/RDKit deps:
a fake py3Dmol records every addModel/addSurface/addSphere/setStyle call so
the tests assert the composition of each view.
"""

import sys
import types

import numpy as np
import pytest

from decompdiff_tpu.data.mol import MolRecord


PDB_BLOCK = (
    'ATOM      1  N   ALA A   1      11.104   6.134  -6.504  1.00  0.00'
    '           N\nEND\n')


def _mol_record(n=4):
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    src = list(range(n - 1)) + list(range(1, n))
    dst = list(range(1, n)) + list(range(n - 1))
    return MolRecord(element=np.full(n, 6), pos=pos,
                     bond_index=np.array([src, dst]),
                     bond_type=np.ones(len(src), np.int64),
                     aromatic=np.zeros(n, bool))


class MockView:
    def __init__(self, *a, **k):
        self.models = []       # (block, fmt)
        self.surfaces = []     # (kind, style, sel)
        self.spheres = []
        self.styles = []
        self.animated = None
        self.frames = None

    def addModel(self, block, fmt):
        self.models.append((block, fmt))

    def addModelsAsFrames(self, block, fmt):
        self.frames = (block, fmt)

    def addSurface(self, kind, style, sel=None):
        self.surfaces.append((kind, style, sel))

    def addSphere(self, spec):
        self.spheres.append(spec)

    def setStyle(self, *a):
        self.styles.append(a)

    def zoomTo(self):
        pass

    def animate(self, spec):
        self.animated = spec


@pytest.fixture()
def viz(monkeypatch):
    fake = types.ModuleType('py3Dmol')
    fake.view = MockView
    fake.VDW = 'VDW'
    fake.SAS = 'SAS'
    monkeypatch.setitem(sys.modules, 'py3Dmol', fake)
    from decompdiff_tpu.utils import visualize
    return visualize


def test_atoms_to_xyz_block():
    from decompdiff_tpu.utils.visualize import atoms_to_xyz_block
    block = atoms_to_xyz_block([6, 7, 8], np.zeros((3, 3)))
    lines = block.strip().split('\n')
    assert lines[0] == '3'
    assert lines[2].startswith('C ')
    assert lines[3].startswith('N ')
    assert lines[4].startswith('O ')


def test_visualize_complex_surface_and_ligand(viz):
    view = viz.visualize_complex(PDB_BLOCK, _mol_record())
    fmts = [f for _, f in view.models]
    assert fmts == ['pdb', 'sdf']
    # protein VDW surface + ligand VDW surface
    assert [s[0] for s in view.surfaces] == ['VDW', 'VDW']
    # cartoon hidden under the surface (ref visualize.py:27)
    assert any('cartoon' in str(s) for s in view.styles)


def test_visualize_complex_cartoon_mode(viz):
    view = viz.visualize_complex(PDB_BLOCK, _mol_record(),
                                 show_protein_surface=False,
                                 show_ligand_surface=False)
    assert view.surfaces == []
    assert any('spectrum' in str(s) for s in view.styles)


def test_visualize_complex_with_frags(viz):
    frags = [_mol_record(3), _mol_record(5)]
    view = viz.visualize_complex_with_frags(PDB_BLOCK, frags)
    assert [f for _, f in view.models] == ['pdb', 'sdf', 'sdf']


def test_highlight_pocket_selections(viz):
    view = viz.visualize_complex_highlight_pocket(
        PDB_BLOCK, _mol_record(), pocket_atom_idx=[1, 2],
        pocket_res_idx=[5, 5, 7], pocket_chain='A')
    sels = [sel for _, style, sel in view.surfaces
            if style.get('color') == 'red']
    assert {'model': -1, 'serial': [1, 2]} in sels
    assert {'model': -1, 'resi': [5, 7], 'chain': 'A'} in sels


def test_generated_xyz_v2_centers_and_subpockets(viz, tmp_path):
    pdb = tmp_path / 'p.pdb'
    pdb.write_text(PDB_BLOCK)
    view = viz.visualize_generated_xyz_v2(
        np.zeros((4, 3)), [6, 6, 7, 8], str(pdb),
        pocket_atom_idx_list=[[1], [2]],
        pocket_centers=np.array([[0., 0, 0], [1, 1, 1]]))
    assert view.models[0][1] == 'xyz'
    assert len(view.spheres) == 2
    colored = [s for _, s, _ in view.surfaces if s.get('color') == 'red']
    assert colored  # first sub-pocket colored red


def test_generated_xyz_from_result_dict(viz, tmp_path):
    """Consumes the ACTUAL scripts/sample.py entry contract (round-3 review:
    the helper used to read keys sample.py never writes): pred_pos + pred_v
    atom-class indices mapped via atom_mode, protein_path possibly None with
    src_protein_filename fallback."""
    pdb = tmp_path / 'p.pdb'
    pdb.write_text(PDB_BLOCK)
    result = {'pred_pos': np.zeros((3, 3)),
              'pred_v': np.array([1, 2, 3]),   # basic classes C/N/O
              'protein_path': str(pdb)}
    view = viz.visualize_generated_xyz(result)
    assert view.models[0][1] == 'xyz'
    assert view.models[1][1] == 'pdb'
    # fallback: protein_path None -> src_protein_filename under root
    result2 = {'pred_pos': np.zeros((3, 3)), 'pred_v': np.array([1, 2, 3]),
               'protein_path': None, 'src_protein_filename': 'p.pdb'}
    view2 = viz.visualize_generated_xyz(result2, root=str(tmp_path))
    assert view2.models[1][1] == 'pdb'
    import pytest
    with pytest.raises(ValueError, match='protein path'):
        viz.visualize_generated_xyz({'pred_pos': np.zeros((1, 3)),
                                     'pred_v': np.array([1]),
                                     'protein_path': None})


def test_generated_sdf_and_arms(viz, tmp_path):
    pdb = tmp_path / 'p.pdb'
    pdb.write_text(PDB_BLOCK)
    v1 = viz.visualize_generated_sdf(_mol_record(), str(pdb))
    assert [f for _, f in v1.models] == ['sdf', 'pdb']
    v2 = viz.visualize_generated_arms([_mol_record(), _mol_record()],
                                      str(pdb))
    assert [f for _, f in v2.models] == ['sdf', 'sdf', 'pdb']


def test_xyz_animation_broadcasts_static_types(viz, tmp_path):
    pdb = tmp_path / 'p.pdb'
    pdb.write_text(PDB_BLOCK)
    traj = [np.zeros((3, 3)), np.ones((3, 3))]
    view = viz.visualize_xyz_animation(traj, np.array([6, 7, 8]), str(pdb))
    block, fmt = view.frames
    assert fmt == 'xyz'
    assert block.count('\nC ') + block.count('C ') >= 2  # per-frame atoms
    assert view.animated['loop'] == 'forward'
    assert view.models[-1][1] == 'pdb'


def test_visualize_ligand_styles(viz):
    view = viz.visualize_ligand(_mol_record(), style='sphere')
    assert view.models[0][1] == 'mol'
    with pytest.raises(AssertionError):
        viz.visualize_ligand(_mol_record(), style='nope')
    multi = viz.visualize_ligand([_mol_record(), _mol_record(3)])
    assert len(multi.models) == 2


def test_decomp_center_spheres(viz, tmp_path):
    pdb = tmp_path / 'p.pdb'
    pdb.write_text(PDB_BLOCK)
    view = viz.vis_complex_with_decomp_centers(
        str(pdb), _mol_record(),
        arm_centers=np.array([[0., 0, 0], [1, 1, 1]]),
        scaffold_center=np.array([[2., 2, 2]]))
    colors = [s['color'] for s in view.spheres]
    assert colors == ['red', 'green', 'yellow']


def test_viewers_fall_back_without_py3dmol(monkeypatch, tmp_path):
    """Without py3Dmol the viewers run on the first-party standalone-HTML
    recorder (utils/viewer3d.py) instead of raising."""
    monkeypatch.setitem(sys.modules, 'py3Dmol', None)
    import builtins
    real_import = builtins.__import__

    def block_py3dmol(name, *a, **k):
        if name == 'py3Dmol':
            raise ImportError('absent')
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, '__import__', block_py3dmol)
    monkeypatch.delitem(sys.modules, 'py3Dmol')
    from decompdiff_tpu.utils import viewer3d, visualize
    view = visualize.visualize_complex(PDB_BLOCK, _mol_record())
    assert isinstance(view, viewer3d.View)
    html = view._repr_html_()
    assert '3Dmol' in html and 'ATOM      1  N   ALA' in html
    assert '$3Dmol.SurfaceType.VDW' in html
    out = view.write_html(str(tmp_path / 'complex.html'))
    assert (tmp_path / 'complex.html').read_text() == html
    assert out.endswith('complex.html')
