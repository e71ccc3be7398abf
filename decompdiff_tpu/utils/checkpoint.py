"""Checkpointing with real resume.

The reference saves {config, model, optimizer, scheduler, iteration} and has
no mid-run resume path (ref scripts/train_diffusion_decomp.py:293-300;
SURVEY.md §5). Here checkpoints carry the same contract plus everything needed
to resume: train state (params + optimizer), plateau-scheduler state, and the
embedded config (sampling re-reads model hyperparameters from the checkpoint,
ref scripts/sample_diffusion_decomp.py:499-545).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, config: dict, state, scheduler_state: dict,
                    iteration: int, extra: Optional[dict] = None) -> None:
    payload = {
        'config': dict(config),
        'params': _to_numpy_tree(state.params),
        'opt_state': _to_numpy_tree(state.opt_state),
        'step': int(state.step),
        'lt_history': (np.asarray(state.lt_history)
                       if getattr(state, 'lt_history', None) is not None
                       else None),
        'lt_count': (np.asarray(state.lt_count)
                     if getattr(state, 'lt_count', None) is not None
                     else None),
        'scheduler': scheduler_state,
        'iteration': int(iteration),
        'extra': extra or {},
    }
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, 'rb') as f:
        return pickle.load(f)


def restore_train_state(ckpt: dict, template_state):
    """Rebuild a TrainState from a checkpoint, preserving pytree structure."""
    import jax.numpy as jnp

    def _restore(template, saved):
        return jax.tree.map(lambda t, s: jnp.asarray(s), template, saved)

    state = template_state.replace(
        step=jnp.asarray(ckpt['step']),
        params=_restore(template_state.params, ckpt['params']),
        opt_state=_restore(template_state.opt_state, ckpt['opt_state']),
    )
    if ckpt.get('lt_history') is not None and \
            getattr(state, 'lt_history', None) is not None:
        state = state.replace(lt_history=jnp.asarray(ckpt['lt_history']),
                              lt_count=jnp.asarray(ckpt['lt_count']))
    return state
