"""Converter dress rehearsal at the RELEASED geometry (VERDICT r3 item 5).

Every other oracle-parity test runs at toy width (hidden 32 / 2 layers); the
checkpoint converter's factorized-kv column splitting
(utils/convert_checkpoint.py) is shape-generic but exists for ONE artifact:
the released `uni_o2_bond.pt` at hidden 128 / 6 layers / 16 heads / knn 32 /
add_aromatic (13 atom classes) (ref configs/training.yml, ref
models/decompdiff.py:75-211 key names). This test synthesizes a full-size
reference-layout state dict at exactly that geometry (both `lin` and
`pre_att` bond-inference heads, ref decompdiff.py:200-211), converts it, and
checks one forward against the f64 numpy oracle — retiring the last
in-image-testable failure mode of the released-checkpoint path (a split
landing on the wrong column block only at full width).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decompdiff_tpu.models.diffusion_model import DecompDiffModel
from decompdiff_tpu.utils.convert_checkpoint import convert_reference_state_dict
from decompdiff_tpu.utils.testing import DEFAULT_MODEL_CONFIG

from tests import reference_oracle as oracle
from tests.test_oracle_parity import (_compare_preds, _padded_batch,
                                      _ragged_arrays, _ragged_fixture)

# released featurization: add_aromatic -> 13 ligand classes
# (ref utils/transforms.py:31-44), protein 27 + 2 decomp indicator
NUM_CLASSES = 13
NUM_BOND = 5
PROTEIN_FEAT = 29


def _released_config(bond_net_type):
    cfg = dict(DEFAULT_MODEL_CONFIG)   # hidden 128 / 6 layers / 16 heads / knn 32
    cfg['bond_net_type'] = bond_net_type
    cfg['num_diffusion_timesteps'] = 50   # schedules don't touch the converter
    return cfg


@pytest.mark.slow
@pytest.mark.parametrize('bond_net_type', ['lin', 'pre_att'])
def test_full_geometry_forward_parity(bond_net_type, monkeypatch):
    import tests.test_oracle_parity as tp
    monkeypatch.setattr(tp, 'NUM_CLASSES', NUM_CLASSES)

    cfg = _released_config(bond_net_type)
    rng = np.random.default_rng(7)
    # contexts (48, 42) exceed knn=32 so the graph is genuinely kNN-sparse
    graphs = _ragged_fixture(rng, sizes=((40, 8, 2), (36, 6, 1)))
    ragged = _ragged_arrays(graphs)
    batch = _padded_batch(graphs, n_p_pad=40, n_l_pad=8, a_pad=4)

    sd = oracle.make_reference_state_dict(
        np.random.default_rng(11), cfg, NUM_CLASSES, NUM_BOND,
        PROTEIN_FEAT, NUM_CLASSES + 2)
    # spot-check the synthesized dict really is at released width: the
    # NodeUpdateLayer kv first linear is [H, Fe + 2H] = [128, 84+256]
    w0 = sd['refine_net.base_block.0.node_layer_with_edge.hk_func'
            '.net.0.weight']
    assert w0.shape == (128, 4 * 21 + 2 * 128), w0.shape
    assert 'refine_net.base_block.5.bond_layer.hq_func.net.0.weight' in sd

    params = jax.tree.map(jnp.asarray,
                          convert_reference_state_dict(sd, cfg))
    model = DecompDiffModel.create(cfg, num_classes=NUM_CLASSES)

    t = jnp.asarray([3, 7])
    preds = model.apply(params, batch, batch.ligand_pos, batch.ligand_v,
                        batch.bond_type, t)
    opreds = oracle.decomp_forward(
        sd, cfg, NUM_CLASSES, NUM_BOND,
        ragged['protein_pos'], ragged['protein_feat'],
        ragged['batch_protein'], ragged['ligand_pos'], ragged['ligand_v'],
        ragged['aux'], ragged['batch_ligand'], ragged['bond_index'],
        ragged['bond_type'])
    # 6 layers of 128-wide accumulation: widen the toy-width tolerance a bit
    _compare_preds(preds, opreds, ragged, graphs, rtol=1e-3, atol=1e-3)
