import time, numpy as np, jax, jax.numpy as jnp
from decompdiff_tpu.models.diffusion_model import DecompDiffModel
from decompdiff_tpu.utils.testing import DEFAULT_MODEL_CONFIG, random_complex_batch
cfg = dict(DEFAULT_MODEL_CONFIG); cfg['use_pallas'] = True
model = DecompDiffModel.create(cfg, num_classes=8)
rng = np.random.default_rng(0)
B, Np, Nl = 8, 320, 32
batch = random_complex_batch(rng, batch_size=B, num_protein=Np, num_ligand=Nl, num_groups=6)
params = model.init_params(jax.random.PRNGKey(0), batch)
t = jnp.zeros((B,), jnp.int32)
def step(x, _):
    o = model.apply(params, batch, x, batch.ligand_v, batch.bond_type, t)
    return o['pred_ligand_pos'], None
f = jax.jit(lambda x0: jax.lax.scan(step, x0, None, length=30)[0])
x = batch.ligand_pos
t0=time.perf_counter(); r = f(x); jax.block_until_ready(r)
print(f'compile {time.perf_counter()-t0:.0f}s', flush=True)
t0 = time.perf_counter(); r = f(x); jax.block_until_ready(r)
print(f'all-pallas B8: {(time.perf_counter()-t0)/30*1000:.2f} ms/step')
