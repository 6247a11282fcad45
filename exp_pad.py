"""Host-only analysis: where does padded/useful = 3.38 come from, and what
would a splitpart/shape-bucket layout (reference src/blend/src/splitpart.c,
IPARM_MIN/MAX_BLOCKSIZE) actually buy?

Decomposes the flagship's padded flops against a family of hypothetical
layouts parameterized by (width granularity wg, row granularity hg):
  w' = ceil(w / wg) * wg       per amalgamated supernode width
  h' = ceil(h_b / hg) * hg     per off-diagonal block height
  flops = w'^3/3 + w'^2 * S + w' * S * (S+1),   S = sum h'_b
(the reference symbolCost supernodal formula). (128,128) ~ the current
uniform-T scheme; (1,1) = exact flops of the amalgamated pattern; the gap
between useful(exact scalar) and (1,1) is amalgamation fill, the gap
between (1,1) and (128,128) is tile padding, split into column (wg) and
row (hg) parts by the mixed entries.

Run: python exp_pad.py [nx] [T] [kind]   kind in {poisson,elas}
"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from pastix_tpu.generators import poisson_3d, elasticity_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig
from pastix_tpu.symbolic.fax import symbolic_factorization

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
T = int(sys.argv[2]) if len(sys.argv) > 2 else 128
kind = sys.argv[3] if len(sys.argv) > 3 else "poisson"
if kind == "elas":
    A = elasticity_3d(nx)
    cfg = PastixConfig(tile_size=T, dof_nbr=3)
else:
    A = poisson_3d(nx)
    cfg = PastixConfig(tile_size=T)
s = Pastix(A, cfg)
s.order(); s.symbfact(); s.analyze()
lay = s.layout
useful = s.report.fact_flops
print(f"n={A.n} T={T} nbc={lay.nbc} npool={lay.npool} "
      f"levels={len(lay.levels)} useful={useful:.3e} "
      f"tile_padded={lay.padded_flops():.3e} "
      f"ratio={lay.padded_flops()/useful:.2f}")

# --- rebuild the amalgamated supernode bounds (rang2) in ORIGINAL permuted
# coordinates (mirrors Pastix._aligned_ext_map's greedy chain merge)
n = A.n
rang = s.order_.rangtab
if rang is None or rang.size < 2:
    rang = np.array([0, n], dtype=np.int64)
widths = np.diff(rang)
target = max(1, int(cfg.amalg_target_frac * T))
bounds = [0]
acc = 0
for w in widths:
    acc += int(w)
    if acc >= target:
        bounds.append(bounds[-1] + acc)
        acc = 0
if acc:
    bounds.append(bounds[-1] + acc)
rang2 = np.asarray(bounds, dtype=np.int64)
w2 = np.diff(rang2)
print(f"amalgamated supernodes: {w2.size}, width: min={w2.min()} "
      f"med={int(np.median(w2))} mean={w2.mean():.1f} max={w2.max()}")
hist, edges = np.histogram(w2, bins=[0, 16, 32, 48, 64, 96, 128, 256, 10**9])
print("width histogram:", {f"<={int(e)}": int(h) for h, e in zip(hist, edges[1:])})

# permuted (unextended) full symmetric pattern
import scipy.sparse as sp
Af = A.to_scipy().tocoo()
perm = s.order_.permtab
ri, ci = perm[Af.row], perm[Af.col]
pat = sp.coo_matrix((np.ones(ri.size, bool), (ri, ci)), shape=(n, n)).tocsc()
pat = ((pat + pat.T) + sp.eye(n, dtype=bool, format="csc")).astype(bool).tocsc()

sym = symbolic_factorization(pat, rang2)
wsn = np.diff(sym.rangtab).astype(np.float64)
nsup = sym.cblknbr
bh = (sym.blok_lrownum - sym.blok_frownum + 1).astype(np.float64)
owner = np.repeat(np.arange(nsup), np.diff(sym.blok_ptr))


def flops(wg, hg):
    wq = np.ceil(wsn / wg) * wg
    hq = np.ceil(bh / hg) * hg
    S = np.zeros(nsup)
    np.add.at(S, owner, hq)
    potrf = (wq ** 3 / 3.0).sum()
    trsm = (wq ** 2 * S).sum()
    upd = (wq * S * (S + 1.0)).sum()
    return potrf + trsm + upd, (potrf, trsm, upd)


def pool_elems(wg, hg):
    wq = np.ceil(wsn / wg) * wg
    hq = np.ceil(bh / hg) * hg
    S = np.zeros(nsup)
    np.add.at(S, owner, hq)
    return (wq * (wq + S)).sum()


print(f"\nexact-scalar useful (extended pat) = {useful:.3e}")
print(f"current tile layout padded          = {lay.padded_flops():.3e}  "
      f"pool = {lay.npool * T * T * 4 / 2**30:.2f} GiB fp32")
print(f"{'(wg,hg)':>10} {'flops':>11} {'/useful':>8} {'potrf%':>7} "
      f"{'trsm%':>6} {'gemm%':>6} {'pool GiB':>9}")
for wg, hg in [(128, 128), (128, 8), (64, 64), (64, 8), (32, 32), (32, 8),
               (16, 8), (8, 8), (1, 1)]:
    f, (p, t, u) = flops(wg, hg)
    pe = pool_elems(wg, hg) * 4 / 2**30
    print(f"  ({wg:>3},{hg:>3}) {f:>11.3e} {f/useful:>8.2f} "
          f"{100*p/f:>6.1f}% {100*t/f:>5.1f}% {100*u/f:>5.1f}% {pe:>9.2f}")

# flop share by supernode width class under the exact supernodal scheme
f1, _ = flops(1, 1)
wq = wsn
S = np.zeros(nsup)
np.add.at(S, owner, bh)
per_sn = wq ** 3 / 3.0 + wq ** 2 * S + wq * S * (S + 1.0)
print("\nexact flop share by amalgamated width class:")
for lo, hi in [(0, 32), (32, 64), (64, 96), (96, 128), (128, 256),
               (256, 10**9)]:
    m = (wsn > lo) & (wsn <= hi)
    print(f"  width ({lo},{hi}]: {m.sum():>6} supernodes, "
          f"{100 * per_sn[m].sum() / f1:>5.1f}% of exact flops")
