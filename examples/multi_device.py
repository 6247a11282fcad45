"""Multi-device solve over a device mesh (reference: running pastix()
under mpirun — SURVEY.md §2 parallelism table).

The SAME PastixConfig runs on 1 or N devices: mesh_shape routes the
phases through the owner-computes sharded-pool builders (each device
holds ~npool/ndev tiles of the factor — the reference's local
SolverMatrix per rank), with per-level halo all_gathers and fan-in
psums over the tp axis and RHS columns sharded over dp.

Run (8 virtual devices): XLA_FLAGS=--xla_force_host_platform_device_count=8
  python examples/multi_device.py
"""

import numpy as np

from pastix_tpu import Pastix, PastixConfig
from pastix_tpu.generators import poisson_3d


def main():
    A = poisson_3d(12)
    S = A.to_scipy()
    rng = np.random.default_rng(0)
    B = S @ rng.standard_normal((A.n, 4))

    import jax

    ndev = len(jax.devices())
    dp = 2 if ndev % 2 == 0 and ndev >= 4 else 1
    tp = ndev // dp
    solver = Pastix(
        A,
        PastixConfig(
            tile_size=16,
            mesh_shape=(dp, tp) if dp > 1 else (tp,),
            mesh_axis_names=("dp", "tp") if dp > 1 else ("tp",),
        ),
    )
    X = solver.solve(B)
    res = np.linalg.norm(S @ X - B) / np.linalg.norm(B)
    sh = solver._pool_sharding
    print(
        f"mesh=({dp}x{tp}) n={A.n} pool sharded {sh.ndev} x {sh.nloc} tiles "
        f"(global {solver.layout.npool})"
    )
    print(f"residual ||b-Ax||/||b|| = {res:.3e}")
    assert res < 1e-9


if __name__ == "__main__":
    main()
