"""First-party Morgan (ECFP) fingerprint with RDKit-exact bit ids.

The Ertl-Schuffenhauer SA score's fragment term (ref
utils/evaluation/sascorer.py:29-56) looks up radius-2 Morgan environment
ids in fpscores.pkl.gz — a corpus keyed by the uint32 hashes RDKit's
``GetMorganFingerprint(mol, 2)`` emits. Those hashes are reproducible
without RDKit: RDKit vendors a 32-bit copy of boost's hash
(RDGeneral/hash) and the Morgan implementation (Chem/Fingerprints/
MorganFingerprints.cpp) is a published, deterministic pipeline:

  1. initial atom invariants: 32-bit boost ``hash_range`` over
     [atomicNum, totalDegree (heavy + H), totalNumHs, formalCharge,
     deltaMass (0 for default isotopes), 1-if-in-ring];
  2. per layer: sort (bondType, neighborInvariant) pairs; seed = layer;
     hash_combine(seed, ownInvariant); then combine each pair;
  3. environment deduplication by bond set: an environment whose bond set
     stopped growing kills its atom; within a round, identical bond sets
     emit only the lexicographically first (bitset, invariant, atom) tuple;
     bond sets seen in earlier rounds emit nothing.

Exactness is certified by corpus membership (tests/test_morgan.py): the
radius-0/1/2 ids of common fragments (benzene carbons, alcohols, amides)
must be keys of the committed fpscores corpus — a random uint32 hits that
corpus with p ~ 1e-4 per draw, so a handful of hits is conclusive.

Chemistry preconditions (aromaticity flags, implicit-H counts, charges)
come from the MolRecord; they match RDKit's perception for the bond graphs
our reconstruction emits (order-4 aromatic bonds, valence-model H counts).
"""

from __future__ import annotations

import gzip
import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np

Bond = Tuple[int, int]

_MASK = 0xFFFFFFFF
# our bond orders 1/2/3/4(aromatic) -> RDKit BondType enum values
_RDKIT_BOND_TYPE = {1: 1, 2: 2, 3: 3, 4: 12}

_FPSCORES = os.path.join(os.path.dirname(__file__), 'assets',
                         'fpscores.pkl.gz')
_fpscores_cache: Optional[Dict[int, float]] = None


def _hash_combine(seed: int, v: int) -> int:
    """32-bit boost::hash_combine (RDKit's vendored RDGeneral/hash)."""
    return (seed ^ ((v + 0x9e3779b9 + ((seed << 6) & _MASK)
                     + (seed >> 2)) & _MASK)) & _MASK


def _hash_range(vals) -> int:
    seed = 0
    for v in vals:
        seed = _hash_combine(seed, v & _MASK)
    return seed


def connectivity_invariants(element, bonds: Dict[Bond, int], h_counts,
                            charges=None,
                            ring_atoms=None) -> List[int]:
    """RDKit getConnectivityInvariants parity (MorganFingerprints.cpp)."""
    element = np.asarray(element)
    n = len(element)
    deg = np.zeros(n, np.int64)
    for (a, b) in bonds:
        deg[a] += 1
        deg[b] += 1
    if ring_atoms is None:
        ring_atoms = _ring_atoms(n, bonds)
    out = []
    for i in range(n):
        q = int(charges[i]) if charges is not None else 0
        comps = [int(element[i]),
                 int(deg[i]) + int(h_counts[i]),   # totalDegree incl. Hs
                 int(h_counts[i]),
                 q & _MASK,                        # two's-complement uint32
                 0]                                # deltaMass
        if i in ring_atoms:
            comps.append(1)
        out.append(_hash_range(comps))
    return out


def _ring_atoms(n, bonds) -> set:
    from decompdiff_tpu.reconstruct.ligan import find_rings
    rings = find_rings(n, {tuple(b): 1 for b in bonds}, max_size=24)
    return {a for r in rings for a in r}


def morgan_fingerprint(element, bonds: Dict[Bond, int], h_counts,
                       charges=None, radius: int = 2) -> Dict[int, int]:
    """Sparse count fingerprint {uint32 env id: count} — RDKit
    ``GetMorganFingerprint(mol, radius)`` parity (useBondTypes=True,
    no chirality)."""
    element = np.asarray(element)
    n = len(element)
    bond_list = sorted((min(a, b), max(a, b)) for a, b in bonds)
    bond_idx = {b: i for i, b in enumerate(bond_list)}
    adj: List[List[Tuple[int, int, int]]] = [[] for _ in range(n)]
    for (a, b), o in bonds.items():
        key = (min(a, b), max(a, b))
        bt = _RDKIT_BOND_TYPE.get(int(o), int(o))
        adj[a].append((b, bt, bond_idx[key]))
        adj[b].append((a, bt, bond_idx[key]))

    invariants = connectivity_invariants(element, bonds, h_counts, charges)
    fp: Dict[int, int] = {}
    for inv in invariants:
        fp[inv] = fp.get(inv, 0) + 1

    current = list(invariants)
    atom_nbrhood = [0] * n                   # bond set as int bitmask
    neighborhoods: set = set()
    dead = [len(adj[i]) == 0 for i in range(n)]

    for layer in range(radius):          # 0-based layer seed (RDKit loop)
        round_inv = list(current)
        round_nbr = list(atom_nbrhood)
        this_round = []
        for i in range(n):
            if dead[i]:
                continue
            nbrs = sorted((bt, current[j]) for j, bt, _ in adj[i])
            seed = _hash_combine(layer, current[i])
            for bt, inv in nbrs:
                # boost hash_value(std::pair): combine into a fresh seed,
                # then combine that pair hash into the invariant
                seed = _hash_combine(
                    seed, _hash_combine(_hash_combine(0, bt), inv))
            round_inv[i] = seed
            nb = atom_nbrhood[i]
            for j, _, bidx in adj[i]:
                nb |= (1 << bidx) | atom_nbrhood[j]
            round_nbr[i] = nb
            if nb == atom_nbrhood[i]:
                dead[i] = True               # environment stopped growing
                continue
            this_round.append((nb, seed, i))
        this_round.sort()
        for nb, inv, i in this_round:
            if nb not in neighborhoods:
                neighborhoods.add(nb)
                fp[inv] = fp.get(inv, 0) + 1
            else:
                dead[i] = True               # duplicate environment
        current = round_inv
        atom_nbrhood = round_nbr
    return fp


def load_fpscores() -> Dict[int, float]:
    """fpscores.pkl.gz -> {env id: log-frequency score} (ref
    sascorer.py readFragmentScores: row = [score, id, id, ...])."""
    global _fpscores_cache
    if _fpscores_cache is None:
        with gzip.open(_FPSCORES) as f:
            data = pickle.load(f)
        _fpscores_cache = {}
        for row in data:
            for bit in row[1:]:
                _fpscores_cache[int(bit)] = float(row[0])
    return _fpscores_cache


def fragment_score(element, bonds: Dict[Bond, int], h_counts,
                   charges=None) -> Tuple[float, int]:
    """(score1, numBits) of the Ertl SA score (ref sascorer.py:44-56):
    corpus log-frequency of each radius-2 environment, count-weighted;
    unknown environments score -4."""
    fp = morgan_fingerprint(element, bonds, h_counts, charges, radius=2)
    scores = load_fpscores()
    total = sum(fp.values())
    s = sum(scores.get(bit, -4.0) * count for bit, count in fp.items())
    return (s / max(total, 1), len(fp))
