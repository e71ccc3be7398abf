"""Exact QED (evaluation/descriptors.py) — published ADS curves + weights.

The reference scores drug-likeness with RDKit's ``QED.qed``
(ref utils/evaluation/scoring_func.py:79). Certification here is three-way:
  * self-consistency: each property's normalized asymmetric double sigmoid
    must peak at exactly 1.0 — the published DMAX is defined as the curve's
    maximum, so all seven shape constants are validated jointly;
  * property parity: the eight QED properties on anchor molecules match
    hand-derived values (MW/ALOGP/HBA/HBD/PSA/ROTB/AROM per the QED.py
    definitions — note HBA is QED's own SMARTS set, not Lipinski's N+O);
  * value anchors: QED of alert-free molecules matches the commonly
    reported RDKit values (paracetamol ~0.636, benzene ~0.443).
"""

import numpy as np
import pytest

from decompdiff_tpu.data.mol import MolRecord
from decompdiff_tpu.evaluation.descriptors import (
    QED_ADS_PARAMS, ads, qed_properties, qed_score)


def rec(element, bonds, aromatic=None, charges=None):
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
        pos=np.zeros((len(element), 3), np.float32),
        bond_index=np.asarray([src, dst], np.int64).reshape(2, -1),
        bond_type=np.asarray(typ, np.int64),
        aromatic=np.asarray(aromatic, bool),
        charges=None if charges is None else np.asarray(charges, np.int64))


RING6 = {(i, (i + 1) % 6): 4 for i in range(6)}

_GRID = {'MW': (0, 700), 'ALOGP': (-6, 10), 'HBA': (0, 20), 'HBD': (-2, 15),
         'PSA': (0, 300), 'ROTB': (-2, 20), 'AROM': (-2, 10),
         'ALERTS': (-2, 10)}


@pytest.mark.parametrize('prop', sorted(QED_ADS_PARAMS))
def test_ads_normalized_peak_is_one(prop):
    """DMAX is the unnormalized curve's maximum: if any of the seven
    remembered constants were wrong, the normalized peak would not be 1."""
    lo, hi = _GRID[prop]
    xs = np.linspace(lo, hi, 50001)
    peak = max(ads(x, QED_ADS_PARAMS[prop]) for x in xs)
    assert peak == pytest.approx(1.0, abs=1e-6)


def paracetamol():
    bonds = dict(RING6)
    bonds.update({(0, 6): 1, (3, 7): 1, (7, 8): 1, (8, 9): 2, (8, 10): 1})
    return rec([6] * 6 + [8, 7, 6, 8, 6], bonds,
               [True] * 6 + [False] * 5)


def test_qed_properties_paracetamol():
    props = qed_properties(paracetamol())
    assert props['MW'] == pytest.approx(151.165, abs=1e-3)
    assert props['ALOGP'] == pytest.approx(1.3506, abs=2e-4)
    # QED acceptors: phenol OH + amide O (amide N excluded by !$(N[C,S]=O))
    assert props['HBA'] == 2
    assert props['HBD'] == 2                  # OH + NH
    assert props['PSA'] == pytest.approx(49.33, abs=1e-2)
    # strict ROTB: ring-N counts, the amide N-C(=O) bond does not
    assert props['ROTB'] == 1
    assert props['AROM'] == 1
    assert props['ALERTS'] == 0


def test_qed_value_anchors():
    # commonly reported RDKit QED values for alert-free molecules
    assert qed_score(paracetamol()) == pytest.approx(0.6361, abs=5e-3)
    benzene = rec([6] * 6, RING6, [True] * 6)
    assert qed_score(benzene) == pytest.approx(0.4426, abs=5e-3)


def test_qed_strict_rotb_exclusions():
    from decompdiff_tpu.evaluation.descriptors import (
        implicit_h_counts, num_rotatable_bonds_strict, _undirected)
    # CF3-CH2-CH3: the C(F)(F)F end kills the C-C rotor next to it
    cf3 = rec([6, 9, 9, 9, 6, 6],
              {(0, 1): 1, (0, 2): 1, (0, 3): 1, (0, 4): 1, (4, 5): 1})
    h = implicit_h_counts(cf3.element, _undirected(cf3), None)
    assert num_rotatable_bonds_strict(cf3, h) == 0
    # butane has one rotatable bond either way
    butane = rec([6] * 4, {(i, i + 1): 1 for i in range(3)})
    h = implicit_h_counts(butane.element, _undirected(butane), None)
    assert num_rotatable_bonds_strict(butane, h) == 1
    # N-methylacetamide: the amide C-N is excluded
    nma = rec([6, 6, 8, 7, 6], {(0, 1): 1, (1, 2): 2, (1, 3): 1, (3, 4): 1})
    h = implicit_h_counts(nma.element, _undirected(nma), None)
    assert num_rotatable_bonds_strict(nma, h) == 0


def test_qed_monotone_in_alerts():
    """More alerts can only lower QED (the ALERTS curve decreases past 0)."""
    from decompdiff_tpu.evaluation.descriptors import (
        QED_WEIGHTS_MEAN, _QED_PROPS)
    import math
    props = qed_properties(paracetamol())
    vals = []
    for alerts in (0, 1, 2, 5):
        props['ALERTS'] = alerts
        t = sum(w * math.log(ads(props[k], QED_ADS_PARAMS[k]))
                for w, k in zip(QED_WEIGHTS_MEAN, _QED_PROPS))
        vals.append(math.exp(t / sum(QED_WEIGHTS_MEAN)))
    assert all(a > b for a, b in zip(vals, vals[1:]))
