"""Whole-step roofline accounting for the fused sampling/training kernels.

Measures the chip's ceilings directly (serial-scan microbenchmarks, tunnel-
safe per CLAUDE.md):
  * MXU matmul rate, f32-in/DEFAULT precision and bf16, big square matmuls;
  * HBM stream bandwidth (read+write of a large f32 array).

Then prints the analytic per-step accounting of the bench-protocol guided
sampling step (B=8, Np=320/Nl=32, H=128, 6 layers, k=32): MXU FLOPs of every
matmul the three Pallas kernels issue (both the raw 2*M*K*N count and the
TILE-EQUIVALENT count, where a contraction narrower than 128 lanes costs the
same MXU cycles as a full 128 one — CLAUDE.md's measured cost model), the
kernels' minimum HBM operand traffic, and the achieved fractions of the
measured ceilings using the committed trace splits
(benchmarks/profile_sample_step.py).

Usage: python benchmarks/roofline.py [--skip-microbench]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      '/tmp/decompdiff_tpu_jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

# bench protocol shapes
B, NP, NL, H, K, LAYERS = 8, 320, 32, 128, 32, 6
N_CTX = -(-(NP + NL) // 64) * 64      # unconditional pad-to-64 in the nets
TK = N_CTX * K                        # knn edges per batch element
NN3 = NL * NL * NL                    # cubic triplet rows per batch element
NE2 = NL * NL                         # dense bond edges per batch element


def _scan_time(fn, x, iters=30):
    import jax

    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    jax.block_until_ready(run(x))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x))
    return (time.perf_counter() - t0) / iters


def measure_ceilings():
    import jax
    import jax.numpy as jnp

    out = {}
    # MXU rate on big HBM-streamed matmuls: data-dependent serial-scan
    # chain (the only timing pattern that reports truthfully over the axon
    # tunnel — CLAUDE.md; single-call block_until_ready and even
    # scan-over-pallas chains under-report by orders of magnitude here).
    # Measured 2026-08-19: 77 TF/s f32 / 83 TF/s bf16 — which retires the
    # older "~13 TF/s" CLAUDE.md calibration. Note the fused kernels can
    # EXCEED this number (triplet: 124 TF/s): their operands are
    # VMEM-resident, while this measurement streams 192 MB/iter from HBM;
    # the M/8-cycles-per-128-wide-tile Mosaic cost model (round-3
    # microbench) puts the in-VMEM peak near ~250 TF/s.
    n = 4096
    a = jnp.ones((n, n), jnp.float32) * 1e-3
    t = _scan_time(lambda c: (c @ a) * (1.0 / n), a)
    out['mxu_f32_tflops'] = 2 * n**3 / t / 1e12
    ab = a.astype(jnp.bfloat16)
    t = _scan_time(
        lambda c: ((c @ ab).astype(jnp.float32) * (1.0 / n)).astype(
            jnp.bfloat16), ab)
    out['mxu_bf16_tflops'] = 2 * n**3 / t / 1e12
    # HBM stream: y = x * c + y reads 2 arrays and writes 1 (3x bytes)
    m = 64 * 1024 * 1024  # 256 MB per array
    x = jnp.ones((m,), jnp.float32)
    t = _scan_time(lambda c: c * 1.000001 + x, x)
    out['hbm_gbps'] = 3 * 4 * m / t / 1e9
    return out


def matmul_flops(rows, k, n, tile_equiv=False):
    """2*M*K*N, or the MXU tile-equivalent cost (K and N pad to 128 lanes)."""
    if tile_equiv:
        k = -(-k // 128) * 128
        n = -(-n // 128) * 128
    return 2 * rows * k * n


def step_accounting():
    """Per-sampling-step MXU FLOPs + minimum HBM bytes, per kernel family."""
    acc = {}

    # ---- edge kernel (ops/pallas/edge_kernel.py), 2 streams x 6 layers ----
    # per call: z@We, hj@Wj, 2x lane-mean LN matmuls and Wo per branch (k,v),
    # plus the HH head matmul — 11 [TK,128]@[128,128] matmuls
    rows = B * TK
    per_call = 11 * matmul_flops(rows, H, H)
    calls = 2 * LAYERS
    # operands: node table hxT [B,144,512], ti_k/ti_v/q [B,N,H], idx/idxT/
    # gsrc [B,TK], e_w/mask [B,N,K], xd/mld small, out [B,N,H]
    bytes_call = 4 * B * (144 * 512 + 3 * N_CTX * H + 3 * TK
                          + 2 * N_CTX * K + N_CTX * 6 + N_CTX * H)
    acc['edge'] = {'calls': calls, 'flops': per_call * calls,
                   'tile_flops': per_call * calls,
                   'bytes': bytes_call * calls}

    # ---- triplet kernel (ops/pallas/triplet_kernel.py), 1 x 6 layers ----
    # per call over the cubic rows: af@Wa (K=16) per branch (2 narrow), plus
    # 7 full H x H: 2 lane-mean LN matmuls + Wo per branch, and the HH
    rows = B * NN3
    per_call = (2 * matmul_flops(rows, 16, H)
                + 7 * matmul_flops(rows, H, H))
    per_call_tile = (2 * matmul_flops(rows, 16, H, True)
                     + 7 * matmul_flops(rows, H, H, True))
    # operands: angle [B,Nl^3], tkj/tij/q x2 branches [B,Nl^2,H]-ish, out
    # [B,Nl^2,H]
    bytes_call = 4 * B * (NN3 + 6 * NE2 * H)
    acc['triplet'] = {'calls': LAYERS, 'flops': per_call * LAYERS,
                      'tile_flops': per_call_tile * LAYERS,
                      'bytes': bytes_call * LAYERS}

    # ---- bond-dense kernel (ops/pallas/bond_kernel.py), 2 x 6 layers ----
    # same 11-matmul structure over the [B, Nl^2] dense bond edges
    rows = B * NE2
    per_call = 11 * matmul_flops(rows, H, H)
    bytes_call = 4 * B * (5 * NE2 * H)
    acc['bond'] = {'calls': 2 * LAYERS, 'flops': per_call * 2 * LAYERS,
                   'tile_flops': per_call * 2 * LAYERS,
                   'bytes': bytes_call * 2 * LAYERS}
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--skip-microbench', action='store_true')
    ap.add_argument('--trace-ms', type=float, nargs=3,
                    metavar=('EDGE', 'TRIPLET', 'BOND'),
                    default=[5.422, 3.858, 0.300],
                    help='per-step kernel device ms from '
                         'profile_sample_step.py')
    ap.add_argument('--train', action='store_true',
                    help='training-step accounting: custom-VJP kernels '
                         'recompute the forward in VMEM and add the two '
                         'grad matmuls per forward matmul, a structural '
                         '3x FLOP ratio (the measured bwd/fwd TIME ratio '
                         'is ~2.9x — benchmarks/profile_train_step.py); '
                         'trace default is the round-3 41.4 ms split: '
                         'edge 16.9 (fwd 5.5 + bwd 11.4), triplet 15.1 '
                         '(3.9 + 11.2), bond 1.1')
    args = ap.parse_args()
    if args.train and args.trace_ms == [5.422, 3.858, 0.300]:
        args.trace_ms = [16.9, 15.1, 1.1]

    ceil = None
    if not args.skip_microbench:
        ceil = measure_ceilings()
        print('--- measured ceilings ---')
        for k, v in ceil.items():
            print(f'{k:28s} {v:10.2f}')

    acc = step_accounting()
    if args.train:
        for a in acc.values():
            for key in ('flops', 'tile_flops', 'bytes'):
                a[key] *= 3
    times = dict(zip(('edge', 'triplet', 'bond'), args.trace_ms))
    mode = 'train fwd+bwd (3x structural)' if args.train else 'sampling'
    print(f'--- per-step accounting [{mode}] (B={B}, Np={NP}, Nl={NL}, '
          f'ctx pad {N_CTX}) ---')
    tot_f = tot_tf = tot_b = 0
    for name, a in acc.items():
        t = times[name] / 1e3
        print(f'{name:8s} calls/step={a["calls"]:3d} '
              f'MXU={a["flops"] / 1e9:7.1f} GF '
              f'(tile-equiv {a["tile_flops"] / 1e9:7.1f}) '
              f'opnd~{a["bytes"] / 1e6:7.1f} MB '
              f'| at {times[name]:6.3f} ms: '
              f'{a["flops"] / t / 1e12:6.2f} TF/s, '
              f'{a["bytes"] / t / 1e9:6.1f} GB/s')
        tot_f += a['flops']
        tot_tf += a['tile_flops']
        tot_b += a['bytes']
    step_ms = sum(times.values())
    print(f'kernels total: {tot_f / 1e9:.1f} GF (tile-equiv '
          f'{tot_tf / 1e9:.1f}) {tot_b / 1e6:.1f} MB in {step_ms:.2f} ms '
          f'-> {tot_f / (step_ms / 1e3) / 1e12:.2f} TF/s, '
          f'{tot_b / (step_ms / 1e3) / 1e9:.1f} GB/s')
    if ceil:
        print(f'vs streamed f32 matmul rate (kernels may exceed it — '
              f'VMEM-resident operands): '
              f'{tot_f / (step_ms / 1e3) / 1e12 / ceil["mxu_f32_tflops"]:.2%}')
        print(f'fraction of measured HBM ceiling (operand upper bound): '
              f'{tot_b / (step_ms / 1e3) / 1e9 / ceil["hbm_gbps"]:.2%}')


if __name__ == '__main__':
    main()
