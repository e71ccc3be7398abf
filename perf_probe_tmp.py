import time, numpy as np, jax, jax.numpy as jnp
from decompdiff_tpu.models.diffusion_model import DecompDiffModel
from decompdiff_tpu.utils.testing import DEFAULT_MODEL_CONFIG, random_complex_batch

def scan_time(cfg_over, B=8, Np=320, Nl=32, label='', length=30):
    cfg = dict(DEFAULT_MODEL_CONFIG); cfg.update(cfg_over)
    model = DecompDiffModel.create(cfg, num_classes=8)
    rng = np.random.default_rng(0)
    batch = random_complex_batch(rng, batch_size=B, num_protein=Np, num_ligand=Nl, num_groups=6)
    params = model.init_params(jax.random.PRNGKey(0), batch)
    t = jnp.zeros((B,), jnp.int32)
    def step(x, _):
        o = model.apply(params, batch, x, batch.ligand_v, batch.bond_type, t)
        return o['pred_ligand_pos'], None
    f = jax.jit(lambda x0: jax.lax.scan(step, x0, None, length=length)[0])
    x = batch.ligand_pos
    r = f(x); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = f(x); jax.block_until_ready(r)
    dt = (time.perf_counter()-t0)/length*1000
    print(f'{label:45s} {dt:8.2f} ms/step', flush=True)

P = {'use_pallas': True}
scan_time({**P, 'num_layers': 3}, label='pallas 3 layers (fixed-cost probe)')
scan_time({**P, 'knn': 16}, label='pallas k=16')
