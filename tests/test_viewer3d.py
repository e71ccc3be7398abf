"""First-party 3Dmol.js HTML recorder (utils/viewer3d.py) — the py3Dmol
replacement backend behind utils/visualize when py3Dmol is absent."""

import numpy as np
import pytest

from decompdiff_tpu.utils import viewer3d


def test_view_records_and_renders():
    v = viewer3d.view(width=320, height=240)
    v.addModel('3\nxyz\nC 0 0 0\nC 1 0 0\nC 2 0 0\n', 'xyz')
    v.setStyle({'model': -1}, {'stick': {}})
    v.addSurface(viewer3d.VDW, {'opacity': 0.7}, {'model': -1})
    v.addSphere({'center': {'x': 0.0, 'y': 0.0, 'z': 0.0}, 'radius': 1.0,
                 'color': 'red'})
    v.zoomTo()
    html = v._make_html()
    assert 'width: 320px' in html and 'height: 240px' in html
    assert 'C 2 0 0' in html
    assert '$3Dmol.SurfaceType.VDW' in html
    assert '"radius": 1.0' in html
    assert html.index('addModel') < html.index('addSurface')
    assert 'viewer.render();' in html


def test_template_literal_escaping():
    v = viewer3d.view()
    v.addModel('tick ` dollar ${x} back \\ slash', 'pdb')
    html = v._make_html()
    assert '\\`' in html and '\\${x}' in html and '\\\\' in html
    # raw active characters must not survive unescaped inside the literal
    payload = html.split('addModel(`')[1].split('`,')[0]
    assert '`' not in payload.replace('\\`', '')


def test_mol_format_normalized_to_sdf():
    v = viewer3d.view()
    v.addModel('molblock', 'mol0')
    v.addModelsAsFrames('frames', 'mol')
    html = v._make_html()
    assert html.count('"sdf"') == 2


def test_frames_and_animate():
    v = viewer3d.view(size=(100, 100))
    v.addModelsAsFrames('1\n\nC 0 0 0\n1\n\nC 1 0 0\n', 'xyz')
    v.animate({'loop': 'forward', 'interval': 50, 'reps': 2})
    html = v._make_html()
    assert 'addModelsAsFrames' in html
    assert 'animate({"loop": "forward", "interval": 50, "reps": 2})' in html


def test_visualize_stack_on_fallback(monkeypatch, tmp_path):
    """Drive the high-level viewers end-to-end on the recorder: generated
    xyz + animation produce HTML with the model data embedded."""
    import sys
    monkeypatch.setitem(sys.modules, 'py3Dmol', None)
    import builtins
    real_import = builtins.__import__

    def block(name, *a, **k):
        if name == 'py3Dmol':
            raise ImportError('absent')
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, '__import__', block)
    monkeypatch.delitem(sys.modules, 'py3Dmol')
    from decompdiff_tpu.utils import visualize

    pdb = tmp_path / 'p.pdb'
    pdb.write_text('ATOM      1  N   ALA A   1      0.0 0.0 0.0  1.00 0.00'
                   '           N\nEND\n')
    pos = np.zeros((3, 3)) + np.arange(3)[:, None]
    view = visualize.visualize_generated_xyz_v2(
        pos, np.array([6, 7, 8]), str(pdb),
        pocket_centers=[np.zeros(3)])
    html = view._repr_html_()
    assert 'addSphere' in html and 'N 1.0' in html

    traj = np.stack([pos, pos + 1.0])
    anim = visualize.visualize_xyz_animation(traj, np.array([6, 7, 8]))
    html = anim._repr_html_()
    assert 'addModelsAsFrames' in html and 'animate' in html


def test_vis_complex_from_data(monkeypatch, tmp_path):
    import sys
    monkeypatch.setitem(sys.modules, 'py3Dmol', None)
    import builtins
    real_import = builtins.__import__

    def block(name, *a, **k):
        if name == 'py3Dmol':
            raise ImportError('absent')
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, '__import__', block)
    monkeypatch.delitem(sys.modules, 'py3Dmol')
    from decompdiff_tpu.utils import visualize

    pdb = tmp_path / 'p.pdb'
    pdb.write_text('ATOM      1  N   ALA A   1      0.0 0.0 0.0  1.00 0.00'
                   '           N\nEND\n')
    sdf = tmp_path / 'l.sdf'
    sdf.write_text('lig\n\n\n  1  0  0  0  0  0  0  0  0  0999 V2000\n'
                   '    0.0000    0.0000    0.0000 C   0  0\nM  END\n$$$$\n')
    view = visualize.vis_complex_from_data(
        {'protein_file': str(pdb), 'ligand_file': str(sdf)})
    html = view._repr_html_()
    assert 'ALA' in html and 'V2000' in html
