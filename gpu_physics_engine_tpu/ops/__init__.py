"""Device-side ops: the kernel layer.

Each module pairs a pure-jnp reference implementation with TPU fast paths
(Pallas kernels or sort/shift formulations) behind the same signatures:

  morton       Z-order codes (C10 analog)
  grid         broad phase: candidate cells, sorted pairs, dense buckets (C12)
  sort         stable key/value sort: lax.sort | Pallas radix (C4)
  radix_sort   Pallas blockwise LSD radix sort
  scan         prefix sums (C5)
  collision    collision cells + colored GS / bucket-Jacobi solvers (C13-C16)
  fast_solve   gather-free sort+shift Jacobi solver (production array path)
  tiled        persistent dense-tile pipeline (production TPU path)
  tiled_pallas Pallas row kernel for the tiled collide
  integrate    Verlet + boundary clamp (C8)
  resort       Morton locality resort (C9-C11)
  spawn        interactive ring bursts (C7 add_particles)
"""
