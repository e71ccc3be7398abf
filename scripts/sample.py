"""Sampling driver (L7).

Usage:
    python scripts/sample.py configs/sampling.yml --ckpt CKPT -i DATA_ID
        --outdir OUT [--prior_mode {subpocket,ref_prior,beta_prior}]
        [--num_samples N] [--batch_size B]

Protocol parity with ref scripts/sample_diffusion_decomp.py: model config is
re-read from the checkpoint; per-batch initialization per prior mode (atom
counts, N(mu_k, sigma_k) init positions, marginal/uniform init types); the
scanned on-device reverse diffusion with guidance; host reconstruction; one
results pickle per pocket with mols + predictions + trajectories.
"""

import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/decompdiff_tpu_jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('config')
    parser.add_argument('--ckpt', required=True)
    parser.add_argument('-i', '--data_id', type=int, nargs='+', default=[0],
                        help='one or more pocket ids. Passing several ids '
                             'amortizes process startup, checkpoint load and '
                             'the compiled 1000-step scan executable across '
                             'pockets (the jit cache persists in-process); '
                             'results are bit-identical to running each id '
                             'in its own process (per-pocket re-seed below)')
    parser.add_argument('--outdir', default='./outputs')
    parser.add_argument('--prior_mode', default=None,
                        choices=['subpocket', 'ref_prior', 'beta_prior'])
    parser.add_argument('--num_samples', type=int, default=None)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--save_traj', action='store_true')
    parser.add_argument('--sample_num_atoms', default=None,
                        choices=['prior', 'ref', 'ref_large', 'old', 'v2',
                                 'stat'],
                        help='override the config atom-count mode (covers '
                             'both ref --num_atoms_mode and '
                             '--bp_num_atoms_mode, '
                             'sample_diffusion_decomp.py:473-474)')
    parser.add_argument('--beta_prior_path', default=None,
                        help='dir/template of per-pocket beta-prior pickles, '
                             '{id:08d}.pkl appended when a directory is '
                             'given (ref sample_diffusion_decomp.py:465)')
    parser.add_argument('--natoms_config', default=None,
                        help="pickle for the 'stat' atom-count sampler (ref "
                             '--natom_models_path, '
                             'sample_diffusion_decomp.py:466)')
    parser.add_argument('--suffix', default=None,
                        help='appended to result filenames: '
                             'result_<id><suffix>.pkl (ref '
                             'sample_diffusion_decomp.py:475)')
    parser.add_argument('--recon_with_bond', default='auto',
                        choices=['auto', 'true', 'false'],
                        help='use the diffused bond channel for '
                             'reconstruction; auto follows the checkpoint '
                             'bond_diffusion flag (ref '
                             'sample_diffusion_decomp.py:476)')
    parser.add_argument('--use_pallas', action='store_true',
                        help='enable the fused TPU kernels for sampling')
    parser.add_argument('--no_pallas', action='store_true',
                        help='force the dense XLA path even when the '
                             'checkpoint-embedded model config enables the '
                             'fused kernels (use on CPU: interpret-mode '
                             'Pallas is slow)')
    parser.add_argument('--protein_path', default=None,
                        help='path to the ORIGINAL full-protein PDB used for '
                             'clash guidance (the pocket store is a crop; '
                             'ref sample_diffusion_decomp.py:564-565 loads '
                             'the full protein). Also recorded into results '
                             'for docking evaluation.')
    args = parser.parse_args()

    from decompdiff_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from decompdiff_tpu.config import Config, load_config
    from decompdiff_tpu.constants import atom_class_count
    from decompdiff_tpu.data.dataset import DecompDataset
    from decompdiff_tpu.data.store import DDStore
    from decompdiff_tpu.models.diffusion_model import DecompDiffModel
    from decompdiff_tpu.priors.atom_num import NumAtomsSampler, load_num_config
    from decompdiff_tpu.sampling.sampler import SampleConfig
    from decompdiff_tpu.utils.checkpoint import load_checkpoint
    from decompdiff_tpu.utils.misc import get_logger, seed_all

    sample_cfg_file = load_config(args.config)
    scfg = sample_cfg_file.sample
    seed_all(scfg.get('seed', 2021))
    os.makedirs(args.outdir, exist_ok=True)
    logger = get_logger('sample', args.outdir)

    # model from checkpoint config (ref :499-545)
    ckpt = load_checkpoint(args.ckpt)
    train_config = Config(ckpt['config'])
    atom_mode = train_config.data.transform.get('ligand_atom_mode', 'basic')
    num_classes = atom_class_count(atom_mode)
    model_cfg = train_config.model.to_dict()
    if args.use_pallas:
        model_cfg['use_pallas'] = True
    if args.no_pallas:
        model_cfg['use_pallas'] = False
    model = DecompDiffModel.create(model_cfg, num_classes)
    params = jax.tree.map(jnp.asarray, ckpt['params'])

    # data
    store = DDStore(sample_cfg_file.data.path)
    dataset = DecompDataset(store, ligand_atom_mode=atom_mode)
    prior_mode = args.prior_mode or scfg.get('prior_mode', 'ref_prior')

    num_atoms_mode = (args.sample_num_atoms
                      or scfg.get('sample_num_atoms', 'ref'))
    if num_atoms_mode == 'prior':
        arms_cfg = load_num_config(
            scfg.get('arms_num_atoms_config', 'arm_num_config'))
        sca_cfg = load_num_config(
            scfg.get('scaffold_num_atoms_config', 'scaffold_num_config'))
    else:
        arms_cfg = sca_cfg = None
    natoms_sampler = (NumAtomsSampler.from_pickle(
                          args.natoms_config or scfg.natoms_config)
                      if num_atoms_mode == 'stat' else None)

    energy_drift = tuple(dict(d) for d in scfg.get('energy_drift', []))
    # mmff_min is the one host-coupled drift: wire its pure_callback + the
    # active window (ref models/decompdiff.py:669-672 gates on
    # [end_time, start_time)); without RDKit it falls back to the
    # first-party force field (guidance/ffmin.py)
    mmff_kwargs = {}
    for d in energy_drift:
        if d['type'] == 'mmff_min':
            try:
                from decompdiff_tpu.guidance.mmff import make_mmff_callback
                callback = make_mmff_callback(atom_mode)
            except ImportError:
                # RDKit absent: first-party geometric perception + light
                # force field (guidance/ffmin.py) instead of MMFF94s
                from decompdiff_tpu.guidance.ffmin import make_ff_callback
                callback = make_ff_callback(atom_mode)
                logger.info('mmff_min: RDKit unavailable, using the '
                            'first-party force-field relaxation '
                            '(guidance/ffmin.py)')
            mmff_kwargs = dict(
                mmff_callback=callback,
                mmff_start_time=int(d.get('start_time', 0)),
                mmff_end_time=int(d.get('end_time', 0)))
            if jax.default_backend() != 'cpu':
                # the device stream over the axon tunnel is SERIALIZED
                # (CLAUDE.md): every in-window step's pure_callback forces a
                # device->host sync + an RDKit reconstruction+MMFF round trip
                # INSIDE the scan, and any other in-flight dispatch queues
                # behind it — the async multi-batch dispatch below degrades
                # to lockstep. This matches reference behavior (its mmff
                # drift is a per-step host round trip too,
                # ref utils/guidance_funcs.py:121-158) but costs far more
                # here relative to the ~11 ms fused step.
                n_win = max(0, int(d.get('start_time', 0))
                            - int(d.get('end_time', 0)))
                logger.warning(
                    'mmff_min drift is enabled on backend %r: %d of the '
                    'sampling steps will each pay a host round trip '
                    '(reconstruction + MMFF94s) that serializes the device '
                    'stream; expect a large wall-clock hit. Drop mmff_min '
                    'from sample.energy_drift for device-speed sampling.',
                    jax.default_backend(), n_win)
    num_steps = scfg.get('num_steps', model.num_timesteps)
    if num_steps > model.num_timesteps:
        logger.warning(f'num_steps {num_steps} > model timesteps '
                       f'{model.num_timesteps}; clamping')
        num_steps = model.num_timesteps
    skip_mode = scfg.get('skip_mode', 'truncate')
    if skip_mode == 'strided' and num_steps < model.num_timesteps:
        logger.info(f'strided fast sampling: {num_steps} denoiser calls '
                    f'spread over the {model.num_timesteps}-step chain '
                    f'(exact skip posteriors; '
                    f'{model.num_timesteps / num_steps:.0f}x fewer calls)')
    sample_config = SampleConfig(
        num_steps=num_steps,
        save_traj=args.save_traj,
        center_pos_mode=scfg.get('center_pos_mode',
                                 model_cfg.get('center_pos_mode', 'protein')),
        skip_mode=skip_mode,
        energy_drift=energy_drift, **mmff_kwargs)

    num_samples = args.num_samples or scfg.get('num_samples', 10)
    seed = scfg.get('seed', 2021)
    if args.protein_path and len(args.data_id) > 1:
        logger.warning('--protein_path names ONE receptor but %d pocket ids '
                       'were given; clash guidance and docking provenance '
                       'will use it for every pocket', len(args.data_id))

    for data_id in args.data_id:
        run_pocket(args, data_id, seed, num_samples, dataset, prior_mode,
                   scfg, sample_cfg_file, energy_drift, model, params,
                   sample_config, num_classes, atom_mode, num_atoms_mode,
                   arms_cfg, sca_cfg, natoms_sampler, logger)


def run_pocket(args, data_id, seed, num_samples, dataset, prior_mode, scfg,
               sample_cfg_file, energy_drift, model, params, sample_config,
               num_classes, atom_mode, num_atoms_mode, arms_cfg, sca_cfg,
               natoms_sampler, logger):
    """Sample num_samples molecules for one pocket id. Called in a loop when
    several ids are passed — model/checkpoint/compiled-scan state is shared
    in-process, and the per-pocket re-seed keeps every pocket's results
    bit-identical to a fresh `sample.py -i ID` process (the reference drives
    one process per id, ref sample_diffusion_decomp.py argparse `-i`)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from decompdiff_tpu.data.batch import FullProtein
    from decompdiff_tpu.data.collate import collate
    from decompdiff_tpu.data.mol import mol_to_sdf_block
    from decompdiff_tpu.parallel.mesh import make_mesh, shard_batch
    from decompdiff_tpu.priors.beta import substitute_with_beta_prior
    from decompdiff_tpu.reconstruct.builder import (
        MolReconsError, is_connected, mol_record_from_prediction)
    from decompdiff_tpu.sampling.init import (
        build_generation_records, init_types_host)
    from decompdiff_tpu.sampling.sampler import sample_diffusion
    from decompdiff_tpu.utils.misc import seed_all

    seed_all(seed)
    # ref sample_diffusion_decomp.py:476 recon_with_bond; 'auto' follows the
    # checkpoint's bond_diffusion flag (a bond-free model's bond channel is
    # untrained noise, ref :424-431)
    recon_with_bond = (model.bond_diffusion
                       if args.recon_with_bond == 'auto'
                       else args.recon_with_bond == 'true')
    raw = dataset.get_raw(data_id)
    bp_path = args.beta_prior_path or scfg.get('beta_prior_path')
    if prior_mode == 'beta_prior' and bp_path:
        if os.path.isdir(bp_path):
            bp_path = os.path.join(bp_path, '{id:08d}.pkl')
        raw = substitute_with_beta_prior(raw, bp_path.format(id=data_id))

    full_protein = None
    if any(d['type'] == 'clash' for d in energy_drift):
        if args.protein_path:
            # the reference computes clash against the ORIGINAL full protein
            # (ref sample_diffusion_decomp.py:564-565); the pocket store is a
            # crop and under-penalizes
            from decompdiff_tpu.data.protein import PDBProtein
            fp = np.asarray(
                PDBProtein(args.protein_path).to_dict_atom()['pos'],
                np.float32)
        else:
            fp = np.asarray(raw['protein_pos'], np.float32)
            logger.info('clash guidance uses the pocket store protein; pass '
                        '--protein_path for the original full protein')
        full_protein_pos = fp

    rng_np = np.random.default_rng(seed)
    results = []
    n_batches = int(np.ceil(num_samples / args.batch_size))
    t_start = time.time()
    # loop-invariant device pulls/pushes happen ONCE, while the device is
    # idle: a per-batch np.asarray(prior_logprobs) would queue behind the
    # in-flight scans on the serialized tunnel stream and stall dispatch
    atom_prior_probs = np.exp(np.asarray(
        model.atom_diff.prior_logprobs, np.float64))
    bond_prior_probs = np.exp(np.asarray(
        model.bond_diff.prior_logprobs, np.float64))
    if full_protein is None and any(
            d['type'] == 'clash' for d in energy_drift):
        B = args.batch_size
        full_protein = FullProtein(
            pos=jnp.broadcast_to(jnp.asarray(full_protein_pos),
                                 (B,) + full_protein_pos.shape),
            mask=jnp.ones((B, len(full_protein_pos)), bool))

    # two-phase loop: dispatch every batch's scan first (jax dispatch is
    # async — the device queues the 1000-step scans back to back), then pull
    # + reconstruct. Host-side record building and molecule reconstruction
    # overlap device compute instead of serializing with it; batch order and
    # the rng stream are unchanged, so results stay bit-identical to the
    # sequential loop.
    pending = []
    t0 = time.time()
    for bi in range(n_batches):
        n = min(args.batch_size, num_samples - bi * args.batch_size)
        records = build_generation_records(
            raw, n, prior_mode, num_atoms_mode, rng_np,
            arms_natoms_config=arms_cfg, scaffold_natoms_config=sca_cfg,
            natoms_sampler=natoms_sampler)
        # init from the model's exact terminal distributions: uniform, or
        # the dataset marginals when the checkpoint was trained with
        # prior_types (the reference driver passes the featurizer's
        # atom/bond_types_prob here, ref sample_diffusion_decomp.py:306-316,
        # 606-607 — uniform init would mismatch q(v_T))
        records = init_types_host(
            rng_np, records, num_classes, model.bond_diff.num_classes,
            atom_prior_probs=atom_prior_probs,
            bond_prior_probs=bond_prior_probs)
        if len(records) < args.batch_size:
            # pad the tail batch with copies of the last record: a smaller
            # batch dim would re-trace and recompile the whole 1000-step
            # scan (minutes on TPU) for the leftover samples, and break the
            # sharding gate below; outputs are sliced back to n afterwards
            records = records + [dict(records[-1])] * (
                args.batch_size - len(records))
        # host-resident batch: jit transfers it at dispatch; masks/indices
        # stay readable below without a device round trip
        batch = collate(records, to_device=False)
        # sampling is embarrassingly parallel across pockets/samples: shard
        # the batch over all devices (SURVEY.md §5 distributed plan)
        host_batch = batch
        if (jax.device_count() > 1
                and batch.batch_size % jax.device_count() == 0):
            batch = shard_batch(batch, make_mesh())
        out = sample_diffusion(
            model, sample_config, params,
            jax.random.PRNGKey(scfg.get('seed', 2021) + bi), batch,
            batch.ligand_pos, batch.ligand_v, batch.bond_type, full_protein)
        pending.append((n, host_batch, out))
    logger.info(f'dispatched {n_batches} batches '
                f'(init+dispatch {time.time() - t0:.2f}s)')

    for bi, (n, batch, out) in enumerate(pending):
        t_pb = time.time()
        pos = np.asarray(out['pos'])
        v = np.asarray(out['v'])
        bond = np.asarray(out['bond'])
        mask = np.asarray(batch.ligand_mask)
        traj = out.get('traj')
        t_scan = time.time()
        for s in range(n):
            m = mask[s]
            pred_pos, pred_v = pos[s][m], v[s][m]
            pred_bond = bond[s][np.ix_(m, m)]
            entry = {
                'pred_pos': pred_pos, 'pred_v': pred_v,
                'pred_bond': pred_bond,
                'decomp_mask': np.asarray(batch.ligand_decomp_idx[s])[m],
                'mol': None, 'smiles': None, 'complete': False,
                # provenance for the docking protocol (the reference derives
                # the receptor from the ligand filename + protein root;
                # ref docking_vina.py:154-162)
                'ligand_filename': raw.get('src_ligand_filename', ''),
                'src_protein_filename': raw.get('src_protein_filename', ''),
                'protein_path': args.protein_path,
            }
            if traj is not None:
                # stacked scan outputs [T, B, ...] -> per-sample trajectories
                # (ref sample_diffusion_decomp.py:366-414 unbatching)
                entry['pos_traj'] = np.asarray(traj['pos'])[:, s][:, m]
                entry['v_traj'] = np.asarray(traj['v'])[:, s][:, m]
                if 'bond' in traj:
                    entry['bond_traj'] = np.asarray(
                        traj['bond'])[:, s][:, m][:, :, m]
            try:
                # without bond diffusion the bond channel is untrained noise:
                # reconstruct geometry-only (ref sample_diffusion_decomp.py
                # :424-431 recon_with_bond)
                mol = mol_record_from_prediction(
                    pred_pos, pred_v,
                    pred_bond if recon_with_bond else None,
                    atom_mode=atom_mode)
                entry['mol'] = mol
                entry['complete'] = is_connected(mol)
                if not hasattr(mol, 'bond_index'):  # rdkit mol
                    from rdkit import Chem
                    entry['smiles'] = Chem.MolToSmiles(mol)
                else:
                    entry['sdf'] = mol_to_sdf_block(mol)
                    # result rows always carry a SMILES (ref
                    # sample_diffusion_decomp.py:432); first-party writer —
                    # canonical per-implementation, not RDKit-byte-equal
                    from decompdiff_tpu.evaluation.smiles import (
                        mol_to_smiles)
                    try:
                        entry['smiles'] = mol_to_smiles(mol)
                    except Exception:
                        entry['smiles'] = None
            except MolReconsError as e:
                entry['recon_error'] = str(e)
            results.append(entry)
        logger.info(f'batch {bi + 1}/{n_batches} done '
                    f'({time.time() - t_start:.1f}s: '
                    f'scan+pull {t_scan - t_pb:.2f} '
                    f'recon {time.time() - t_scan:.2f})')

    n_recon = sum(1 for r in results if r['mol'] is not None)
    n_complete = sum(1 for r in results if r['complete'])
    logger.info(f'reconstructed {n_recon}/{len(results)}, '
                f'complete {n_complete}/{len(results)}')
    suffix = args.suffix or ''
    out_path = os.path.join(args.outdir, f'result_{data_id}{suffix}.pkl')
    with open(out_path, 'wb') as f:
        pickle.dump({'data_id': data_id, 'results': results,
                     'atom_mode': atom_mode,
                     'config': sample_cfg_file.to_dict()}, f)
    logger.info(f'saved {out_path}')


if __name__ == '__main__':
    main()
