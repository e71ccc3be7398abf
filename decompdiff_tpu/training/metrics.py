"""Validation metrics (host, sklearn).

Parity with ref scripts/train_diffusion_decomp.py:28-59: per-class one-vs-rest
ROC-AUC, frequency-weighted for atom types; per-bond-class AUROC printed for
classes 1..4.
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import roc_auc_score


def get_auroc(y_true, y_pred_prob, feat_mode: str = 'basic',
              logger=None) -> float:
    """y_true [N] int, y_pred_prob [N, K]. Frequency-weighted OVR AUROC
    (ref :28-42)."""
    y_true = np.asarray(y_true)
    y_pred_prob = np.asarray(y_pred_prob)
    avg_auroc = 0.0
    possible = np.unique(y_true)
    for c in possible:
        mask = (y_true == c)
        if mask.all():       # single-class input: AUROC undefined
            continue
        try:
            auroc = roc_auc_score(mask.astype(int), y_pred_prob[:, c])
        except ValueError:
            continue
        avg_auroc += auroc * mask.sum()
        if logger:
            logger.info(f'atom: class {c} auroc: {auroc:.4f}')
    return float(avg_auroc / len(y_true))


def get_bond_auroc(y_true, y_pred_prob, logger=None) -> float:
    """Frequency-weighted OVR AUROC over ALL bond classes present,
    INCLUDING class 0 / no-bond, exactly like the reference (ref :45-59
    weights each class AUROC by its count and divides by len(y_true)).
    Class 0 dominates fully-connected bond labels (~90%+), so this number
    is NOT comparable to an unweighted mean over classes 1..4 — parity
    with reference training logs requires the reference weighting."""
    y_true = np.asarray(y_true)
    y_pred_prob = np.asarray(y_pred_prob)
    avg = 0.0
    for c in np.unique(y_true):
        mask = (y_true == c)
        if mask.all():
            continue
        try:
            auroc = roc_auc_score(mask.astype(int), y_pred_prob[:, c])
        except ValueError:
            continue
        avg += auroc * mask.sum()
        if logger:
            logger.info(f'bond: class {c} auroc: {auroc:.4f}')
    return float(avg / len(y_true))
