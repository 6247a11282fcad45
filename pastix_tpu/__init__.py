"""pastix_tpu — a TPU-native supernodal sparse direct solver.

A from-scratch JAX/XLA/Pallas framework with the capabilities of PaStiX
(reference: OpenCMISS-Dependencies/pastix, PaStiX 5.2.x — see SURVEY.md):
sparse Cholesky (LL^T), LDL^T and LU with static pivoting, preceded by
fill-reducing ordering (nested dissection / minimum degree / RCM), block
symbolic factorization, and a static tile-level schedule; followed by
triangular solves and iterative refinement (Richardson/CG/GMRES/BiCGStab),
Schur complement extraction, ILU(k) preconditioning, out-of-core-style
panel offload, and a Murge-style incremental assembly API.

Design stance (TPU-first, not a port):
  * Host does everything irregular once per sparsity pattern (ordering,
    symbolic factorization, scheduling) and emits flat static index tables.
  * Device runs one jitted program over a pool of uniform TxT tiles:
    per elimination-tree level, a batched panel factorization, a batched
    TRSM and a batched GEMM + scatter-add. All matmuls land on the MXU.
  * Distribution is `shard_map` over a `jax.sharding.Mesh` with XLA
    collectives, replacing the reference's MPI fan-in messages.

Reference layer map: SURVEY.md section 1; component parity: section 2.
"""

from pastix_tpu.config import (
    PastixConfig,
    SolveReport,
    Factorization,
    Symmetry,
    OrderingMethod,
    RefinementMethod,
    IOStrategy,
    Verbosity,
    Task,
)
from pastix_tpu.sparse import SparseMatrix, check_matrix
from pastix_tpu import generators

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: pastix.py pulls in jax; keep light imports fast.
    # (importlib, not `from ... import`: the submodule shares the name of
    # the pastix() function, which would recurse through this hook)
    if name in ("Pastix", "spsolve", "pastix"):
        import importlib

        mod = importlib.import_module("pastix_tpu.pastix")
        return getattr(mod, name)
    if name == "MurgeSolver":
        import importlib

        return importlib.import_module("pastix_tpu.murge").MurgeSolver
    if name == "drivers":
        import importlib

        return importlib.import_module("pastix_tpu.drivers")
    raise AttributeError(name)

__all__ = [
    "PastixConfig",
    "SolveReport",
    "Factorization",
    "Symmetry",
    "OrderingMethod",
    "RefinementMethod",
    "IOStrategy",
    "Verbosity",
    "Task",
    "SparseMatrix",
    "check_matrix",
    "generators",
    "Pastix",
    "spsolve",
    "pastix",
    "MurgeSolver",
    "drivers",
]
