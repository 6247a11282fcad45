"""Distribution over a TPU mesh (reference: MPI fan-in + blend's
proportional mapping — SURVEY.md §2 rows 7/10 and the parallelism table).

The reference distributes block-columns to MPI ranks at analysis time and
exchanges fan-in contribution buffers with Isend/Irecv.  Here the same math
is expressed as `shard_map` over a `jax.sharding.Mesh`:

  * `tp` axis — the trailing-update (GEMM) work of every level is
    partitioned across devices; partial contributions to touched tiles are
    summed with one `psum` per level (the fan-in analog, riding ICI).
  * `dp` axis — independent right-hand sides / systems are data-parallel.

The sequential build of the reference (`nompi.h` stubs) corresponds to the
same code on a 1-device mesh.
"""

from pastix_tpu.parallel.mesh import make_mesh
from pastix_tpu.parallel.subtree import (
    build_subtree_factorize_llt,
    proportional_mapping,
)
from pastix_tpu.parallel.sharded import (
    build_sharded_factorize_llt,
    build_sharded_factorize_ldlt,
    build_sharded_factorize_lu,
    build_sharded_solve,
    build_sharded_refine,
    shard_coo,
)

__all__ = [
    "make_mesh",
    "build_sharded_factorize_llt",
    "build_sharded_factorize_ldlt",
    "build_sharded_factorize_lu",
    "build_subtree_factorize_llt",
    "proportional_mapping",
    "build_sharded_solve",
    "build_sharded_refine",
    "shard_coo",
]
