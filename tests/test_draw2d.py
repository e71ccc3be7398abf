"""First-party 2D depiction (utils/draw2d.py) — the RDKit-free grid raster
behind visualize.draw_mol_grid / visualize_mol_highlight_fragments /
vis_decomp_from_meta (ref utils/visualize.py:102-112, :348-358)."""

import numpy as np

from decompdiff_tpu.data.mol import MolRecord
from decompdiff_tpu.utils.draw2d import (SVGImage, layout_2d,
                                         mols_to_grid_svg)


def rec(element, bonds, pos, aromatic=None):
    element = np.asarray(element, np.int64)
    src, dst, typ = [], [], []
    for (a, b), o in bonds.items():
        src += [a, b]
        dst += [b, a]
        typ += [o, o]
    if aromatic is None:
        aromatic = np.zeros(len(element), bool)
    return MolRecord(
        element=element,
        pos=np.asarray(pos, np.float32),
        bond_index=np.asarray([src, dst], np.int64).reshape(2, -1),
        bond_type=np.asarray(typ, np.int64),
        aromatic=np.asarray(aromatic, bool))


def hexagon(r=1.4):
    ang = np.linspace(0, 2 * np.pi, 7)[:6]
    return np.stack([r * np.cos(ang), r * np.sin(ang), 0 * ang], 1)


def benzene():
    return rec([6] * 6, {(i, (i + 1) % 6): 4 for i in range(6)}, hexagon(),
               aromatic=[True] * 6)


def test_layout_unit_bonds():
    m = benzene()
    xy = layout_2d(m)
    assert xy.shape == (6, 2)
    d = [np.linalg.norm(xy[i] - xy[(i + 1) % 6]) for i in range(6)]
    assert np.allclose(d, 1.0, atol=0.15)
    # non-bonded atoms stay separated
    cross = np.linalg.norm(xy[0] - xy[3])
    assert cross > 1.5


def test_layout_handles_degenerate_projection():
    # a straight line along one axis must still produce finite 2D coords
    pos = np.stack([np.arange(5.0), np.zeros(5), np.zeros(5)], 1)
    m = rec([6] * 5, {(i, i + 1): 1 for i in range(4)}, pos)
    xy = layout_2d(m)
    assert np.isfinite(xy).all()


def test_grid_svg_structure():
    m = benzene()
    # ethanol with a heteroatom label
    eth = rec([6, 6, 8], {(0, 1): 1, (1, 2): 1},
              [[0, 0, 0], [1.5, 0, 0], [2.2, 1.2, 0]])
    img = mols_to_grid_svg([m, eth], legends=['benzene', 'ethanol'],
                           mols_per_row=2, sub_img_size=(200, 160))
    svg = img._repr_svg_()
    assert svg.startswith('<svg') and svg.endswith('</svg>')
    assert 'width="400"' in svg and 'height="160"' in svg
    assert svg.count('benzene') == 1 and svg.count('ethanol') == 1
    # benzene: 6 solid + 6 dashed aromatic chords; O labeled, C not
    assert svg.count('stroke-dasharray') == 6
    assert '>O</text>' in svg and '>C</text>' not in svg


def test_grid_highlights_and_save(tmp_path):
    m = benzene()
    img = mols_to_grid_svg([m], highlight_atom_lists=[[0, 1, 2]])
    assert img.svg.count('#ffd54d') == 3
    p = img.save(str(tmp_path / 'grid.svg'))
    assert open(p).read() == img.svg


def test_visualize_routing_without_rdkit():
    from decompdiff_tpu.utils import visualize
    m = benzene()
    out = visualize.draw_mol_grid([m, m], mols_per_row=2)
    assert isinstance(out, SVGImage)
    out2 = visualize.visualize_mol_highlight_fragments(m, [[0, 1], [2, 3]])
    assert isinstance(out2, SVGImage)
    assert out2.svg.count('#ffd54d') == 4


def test_vis_decomp_from_meta_records(tmp_path):
    import pickle
    from decompdiff_tpu.utils import visualize
    meta = {'data': {'all_submols': [benzene(), None, benzene()]}}
    p = tmp_path / 'meta.pkl'
    with open(p, 'wb') as f:
        pickle.dump(meta, f)
    out = visualize.vis_decomp_from_meta(str(p))
    assert isinstance(out, SVGImage)
    assert out.svg.count('</g>') == 2
