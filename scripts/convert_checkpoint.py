"""Convert a reference (PyTorch) checkpoint into this framework's format.

Usage:
    python scripts/convert_checkpoint.py REF.pt --out CONVERTED.ckpt

The output is loadable by scripts/sample.py --ckpt; the embedded config is
carried over so sampling reconstructs the same model hyperparameters
(ref scripts/sample_diffusion_decomp.py:499-545 contract).
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _install_easydict_stub():
    try:
        import easydict  # noqa: F401
    except ImportError:
        import types

        class _EasyDictStub(dict):
            def __getattr__(self, name):
                try:
                    return self[name]
                except KeyError as e:
                    raise AttributeError(name) from e

            def __setattr__(self, name, value):
                self[name] = value

        stub = types.ModuleType('easydict')
        stub.EasyDict = _EasyDictStub
        sys.modules['easydict'] = stub


def _plain_dict(cfg):
    """Recursively convert the reference config to builtin dicts/lists.

    Reference checkpoints store the config as easydict.EasyDict (ref
    utils/misc.py load_config) — a dict SUBCLASS, so an isinstance(dict)
    check keeps EasyDict instances, and pickling them makes the converted
    checkpoint unloadable anywhere easydict is not installed."""
    if isinstance(cfg, dict):
        return {k: _plain_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [_plain_dict(v) for v in cfg]
    return cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('ref_ckpt')
    parser.add_argument('--out', required=True)
    args = parser.parse_args()

    from decompdiff_tpu.utils.convert_checkpoint import (
        convert_reference_state_dict, load_reference_checkpoint)

    # unpickling the reference checkpoint requires the easydict class to
    # exist (its config is an easydict.EasyDict); install a minimal
    # stand-in BEFORE the first torch.load — load_reference_checkpoint
    # unpickles the same file
    _install_easydict_stub()

    sd, model_cfg = load_reference_checkpoint(args.ref_ckpt)
    params = convert_reference_state_dict(sd, model_cfg)

    import torch
    ref = torch.load(args.ref_ckpt, map_location='cpu', weights_only=False)
    full_cfg = _plain_dict(ref['config'])

    payload = {
        'config': full_cfg,
        'params': params,
        'opt_state': None,
        'step': int(ref.get('iteration', 0)),
        'scheduler': {},
        'iteration': int(ref.get('iteration', 0)),
        'extra': {'converted_from': args.ref_ckpt},
    }
    with open(args.out, 'wb') as f:
        pickle.dump(payload, f, protocol=4)
    n = sum(np.asarray(x).size for x in
            __import__('jax').tree.leaves(params))
    print(f'converted {n / 1e6:.2f}M params -> {args.out}')


if __name__ == '__main__':
    main()
