"""decompdiff_tpu — a TPU-native (JAX/XLA/Pallas) framework for pocket-conditioned
equivariant molecular diffusion, with the capabilities of bytedance/DecompDiff.

Design (TPU-first, not a port):
  * Ragged protein-ligand graphs become fixed-shape padded/masked arrays in a small
    set of size buckets (``decompdiff_tpu.data.batch.ComplexBatch``).
  * The kNN graph is a masked top-k over a dense distance matrix, yielding a regular
    ``[B, N, K]`` neighbor tensor; scatter_softmax becomes a plain row softmax.
  * The fully-connected ligand bond graph is dense ``[B, Nl, Nl]``; bond-triplet
    angular message passing is a dense ``[B, Nl, Nl, Nl]`` attention with a
    factorized first projection (only the 13-dim angular code pays the O(Nl^3) matmul).
  * The 1000-step reverse diffusion is a single jit-compiled ``lax.scan`` with
    guidance gradients taken by ``jax.grad`` inside the scan — zero host round trips.
  * Multi-device scaling is data-parallel over a ``jax.sharding.Mesh`` (the model is
    ~5M params / 128-dim hidden: TP/PP are structurally unjustified — see
    ``decompdiff_tpu.parallel``).

Reference behavior parity is against bytedance/DecompDiff (cited as file:line in
docstrings throughout).
"""

__version__ = "0.1.0"
