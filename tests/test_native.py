"""Native host runtime (libddnative.so): build, parity with python fallbacks."""

import numpy as np
import pytest

from decompdiff_tpu import native


def test_native_builds():
    assert native.available(), 'g++ build of libddnative.so failed'


def test_pad_f32_matches_python():
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=(n, 3)).astype(np.float32) for n in (3, 5, 2)]
    out = native.pad_stack_f32(arrays, 6)
    assert out.shape == (3, 6, 3)
    for b, a in enumerate(arrays):
        np.testing.assert_array_equal(out[b, :len(a)], a)
        np.testing.assert_array_equal(out[b, len(a):], 0)


def test_masks():
    m = native.length_masks([2, 4], 5)
    np.testing.assert_array_equal(
        m, [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]])
    bm = native.fc_bond_masks([3], 4)
    assert bm.shape == (1, 4, 4)
    assert bm[0, :3, :3].sum() == 6  # 3*3 - diag
    assert not bm[0, 3].any() and not bm[0, :, 3].any()
    assert not bm[0].diagonal().any()


def test_pad_square():
    mats = [np.arange(9).reshape(3, 3), np.arange(4).reshape(2, 2)]
    out = native.pad_square_stack_i32(mats, 4)
    np.testing.assert_array_equal(out[0, :3, :3], mats[0])
    np.testing.assert_array_equal(out[1, :2, :2], mats[1])
    assert out[0, 3].sum() == 0 and out[1, 2:].sum() == 0


def test_native_pdb_parse_matches_python():
    from decompdiff_tpu.data.protein import PDBProtein
    from tests.test_data_layer import PDB_BLOCK
    parsed = native.parse_pdb_atoms_native(PDB_BLOCK)
    if parsed is None:
        pytest.skip('native lib unavailable')
    ref = PDBProtein(PDB_BLOCK, mode='block')
    assert len(parsed['serial']) == len(ref.atoms)
    np.testing.assert_allclose(parsed['pos'],
                               np.asarray(ref.pos).reshape(-1, 3), atol=1e-4)
    assert parsed['atom_name'] == ref.atom_name
    assert parsed['res_name'] == [a['res_name'] for a in ref.atoms]


def test_native_bond_perception_matches_python():
    from decompdiff_tpu.constants import COVALENT_RADII
    from decompdiff_tpu.reconstruct.builder import perceive_bonds
    rng = np.random.default_rng(1)
    pos = (rng.normal(size=(12, 3)) * 1.2).astype(np.float32)
    z = rng.choice([6, 7, 8], size=12)
    radii = np.array([COVALENT_RADII[int(x)] for x in z], np.float32)
    out = native.perceive_bonds_native(pos, radii)
    if out is None:
        pytest.skip('native lib unavailable')
    src, dst = out
    got = {(int(a), int(b)) for a, b in zip(src, dst)}
    # python reference candidate set (pre-repair)
    n = len(pos)
    d = np.linalg.norm(pos[:, None] - pos[None], axis=-1)
    cutoff = (radii[:, None] + radii[None]) * 1.3
    expected = {(a, b) for a in range(n) for b in range(a + 1, n)
                if 0.4 < d[a, b] < cutoff[a, b]}
    assert got == expected
