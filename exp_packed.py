"""Experiment: projected flop/traffic budget for packed-row-panel E2.

Host-only analysis on the bench problem (3D Poisson 48^3, T=128): compute
per-block-column scalar row supports h_J of L on the extended pattern and
compare

  current  : tile-triple GEMMs, 2*T^3 per (a,b,d) triple
  packed   : one C = O @ O^T per source column, O packed (h_J, T),
             flops 2*H^2*T with H = h_J rounded up to a bucket

plus the scatter-element count (sum H^2 incl. upper-triangle waste) that the
extend-add must move.  Run: python exp_packed.py [nx] [T]
"""

import sys
import time

import numpy as np
import scipy.sparse as sp

import jax

jax.config.update("jax_platforms", "cpu")

from pastix_tpu.generators import poisson_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig


def round_up(x, m):
    return -(-x // m) * m


def scalar_supports(pat: sp.csc_matrix, T: int, nbc: int):
    """Per-block-column union scalar row support of L (rows strictly below
    the diagonal block), by block-column-granular column-merge symbolic."""
    A = sp.coo_matrix(sp.tril(pat, -1))
    order = np.argsort((A.col // T) * np.int64(nbc * T) + A.row, kind="stable")
    r, c = A.row[order], (A.col // T)[order]
    ptr = np.searchsorted(c, np.arange(nbc + 1))
    pending = [[] for _ in range(nbc)]
    supports = [None] * nbc
    for J in range(nbc):
        base = r[ptr[J] : ptr[J + 1]]
        parts = pending[J] + [base]
        supp = np.unique(np.concatenate(parts)) if len(parts) > 1 else np.unique(base)
        supp = supp[supp >= (J + 1) * T]  # below the diagonal block
        pending[J] = None
        supports[J] = supp
        if supp.size:
            parent = int(supp[0] // T)
            pending[parent].append(supp)
    return supports


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    A = poisson_3d(nx)
    solver = Pastix(A, PastixConfig(tile_size=T))
    solver.symbfact()
    t0 = time.time()
    solver.analyze()
    lay = solver.layout
    print(f"n={A.n} next={solver._ext_n} T={T} nbc={lay.nbc} tiles={lay.npool} "
          f"levels={len(lay.levels)} analyze={time.time()-t0:.1f}s")
    useful = solver.report.fact_flops
    padded = lay.padded_flops("llt")
    print(f"useful flops {useful:.3e}  padded {padded:.3e}  ratio {padded/useful:.2f}")

    t0 = time.time()
    supports = scalar_supports(solver._pat_perm_ext, T, lay.nbc)
    print(f"scalar supports: {time.time()-t0:.1f}s")

    # validate: tile pattern derived from supports == layout pattern
    tr, tc = [], []
    for J, supp in enumerate(supports):
        tiles = np.unique(supp // T)
        tr.append(np.concatenate([[J], tiles]))
        tc.append(np.full(tiles.size + 1, J))
    tr = np.concatenate(tr); tc = np.concatenate(tc)
    key = tc * np.int64(lay.nbc) + tr
    same = np.array_equal(np.sort(key), lay.keys)
    print(f"tile pattern match: {same} ({key.size} vs {lay.npool})")

    h = np.array([s.size for s in supports])
    mt = np.array([np.unique(s // T).size for s in supports])
    print(f"h: mean {h.mean():.0f} max {h.max()} sum {h.sum()}")
    print(f"tile rows m: mean {mt.mean():.1f}; tile-grid rows m*T sum {mt.sum()*T}")
    print(f"row fill efficiency h/(m*T): {h.sum()/max(1,mt.sum()*T):.3f}")

    potrf = lay.nbc * T**3 / 3
    for name, bucket in [("mult8", lambda x: round_up(x, 8)),
                         ("mult128", lambda x: round_up(x, 128)),
                         ("pow2_128", lambda x: max(128, 1 << int(np.ceil(np.log2(max(x, 1)))))),
                         ]:
        H = np.array([bucket(int(x)) if x else 0 for x in h])
        gemm = float((2 * H.astype(np.float64) ** 2 * T).sum())
        trsm = float((2 * H.astype(np.float64) * T * T).sum())
        scat = float((H.astype(np.float64) ** 2).sum())
        tot = gemm + trsm + potrf
        print(f"packed[{name}]: gemm {gemm:.3e} trsm {trsm:.3e} total {tot:.3e} "
              f"ratio {tot/useful:.2f}  scatter elems {scat:.3e} "
              f"({scat*16/1e9:.2f} GB traffic est)")

    # current split for reference
    ntr = sum(lv.trsm_panel.size for lv in lay.levels)
    ngm = sum(lv.gemm_a.size for lv in lay.levels)
    print(f"current: potrf {potrf:.3e} trsm {ntr*T**3:.3e} gemm {2*ngm*T**3:.3e}")

    # per-level batch geometry for the packed path (bucketed by H)
    lev_of = lay.level_of_col
    for bname, bucket in [("pow2_128", lambda x: max(128, 1 << int(np.ceil(np.log2(max(x, 1))))))]:
        from collections import Counter
        cnt = Counter()
        for J, s in enumerate(supports):
            if s.size:
                cnt[(int(lev_of[J]), bucket(int(s.size)))] += 1
        levels = sorted(set(k[0] for k in cnt))
        print(f"levels with gemm work: {len(levels)}; (level,H)->count sample:")
        big = sorted(cnt.items(), key=lambda kv: -kv[1])[:12]
        print("  most common:", big)
        hs = sorted(set(k[1] for k in cnt))
        print("  H buckets used:", hs)


if __name__ == "__main__":
    main()
