"""Host-only byte/transaction cost model of the flagship factorization.

exp_dma (r4) gives the device laws: DMA stream rate ~240 GB/s, per-
transaction floor ~0.12 us at depth>=8 (~0.95 us round-trip at depth 1,
i.e. the dst accumulators' depth-2 pipeline sees ~0.45 us each).  This
script accounts every level's bytes + transactions under the CURRENT
stream-kernel schedule and under candidate round-5 schedules, to rank
the levers before building kernels:

  cur     : per-pair bf16 operand DMAs (2/pair) + dst RMW per segment
  vcache  : per-chunk unique-tile cache DMA, no per-pair operand DMAs
  vcache+rb: vcache + ROW-BOUNDED dst RMW + row-bounded cache entries

Run: python exp_bytes.py [nx] [amalg] [chunk]
"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from pastix_tpu.generators import poisson_3d
from pastix_tpu.pastix import Pastix
from pastix_tpu.config import PastixConfig

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 100
frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.30
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 8192

A = poisson_3d(nx)
s = Pastix(A, PastixConfig(tile_size=128, amalg_target_frac=frac))
s.order(); s.symbfact(); s.analyze()
lay = s.layout
T = lay.T
useful = s.report.fact_flops
print(f"n={A.n} T={T} npool={lay.npool} levels={len(lay.levels)} "
      f"padded/useful={lay.padded_flops()/useful:.2f}", flush=True)

from pastix_tpu.numeric.grouping import group_plan
plan = list(group_plan(lay.levels, T=T))
unroll_idx = [item for tag, item in plan if tag == "unroll"]
scan_groups = [item for tag, item in plan if tag == "scan"]
print(f"plan: {len(unroll_idx)} unrolled, "
      f"{sum(len(g) for g in scan_groups)} scanned in "
      f"{len(scan_groups)} groups", flush=True)

BW = 240e9          # DMA stream rate
TX = 0.12e-6        # per-transaction floor at depth
TX_SHALLOW = 0.45e-6  # dst accs are depth-2 today
MXU = 100e12        # achievable bf16 MXU rate in this kernel style
KB = 1024.0

rl, rh = lay.row_lo, lay.row_hi
sup = (rh - rl + 1).astype(np.float64)  # scalar row support per tile
supq = np.minimum(np.ceil(sup / 32) * 32, T)  # quantized {32,64,96,128}

tot = {k: 0.0 for k in ("cur", "vc", "vcrb")}
agg = {"dst_b": 0.0, "op_b": 0.0, "op_b_vc": 0.0, "trsm_b": 0.0,
       "dst_b_rb": 0.0, "cache_b_rb": 0.0, "mxu": 0.0, "mxu_rb": 0.0,
       "ntx_pair": 0.0, "ntx_seg": 0.0, "npairs": 0.0, "nt": 0.0}

for li in unroll_idx:
    lv = lay.levels[li]
    nt, ng = lv.trsm_panel.size, lv.gemm_a.size
    if ng == 0:
        continue
    gd = np.sort(lv.gemm_d)
    nseg = 0
    uniq_cache_b = 0.0
    uniq_cache_b_rb = 0.0
    for lo in range(0, ng, CHUNK):
        d = gd[lo:lo + CHUNK]
        nseg += 1 + int((d[1:] != d[:-1]).sum())
        ga = lv.gemm_a[lo:lo + CHUNK]
        gb = lv.gemm_b[lo:lo + CHUNK]
        u = np.unique(np.concatenate([ga, gb]))
        uniq_cache_b += u.size * T * T * 2
        uniq_cache_b_rb += (supq[u] * T * 2).sum()
    dst_b = nseg * (T * T * 4 * 2)                  # fp32 RMW per segment
    dst_b_rb = (supq[gd] * T * 4 * 2)[np.concatenate(
        [[True], gd[1:] != gd[:-1]])].sum() * (nseg / max(1, 1 + (gd[1:] != gd[:-1]).sum()))
    op_b = ng * 2 * T * T * 2                       # 2 bf16 tiles/pair
    trsm_b = nt * (T * T * 4 * 2 + T * T * 2)       # RMW fp32 + bf16 stream
    mxu_t = ng * 2 * T**3 / MXU
    mxu_rb = (supq[lv.gemm_a] * supq[lv.gemm_b] * 2 * T).sum() / MXU

    t_cur = max((dst_b + op_b + trsm_b) / BW,
                ng * 2 * TX + nseg * 2 * TX_SHALLOW, mxu_t)
    t_vc = max((dst_b + uniq_cache_b + trsm_b) / BW,
               nseg * 2 * TX_SHALLOW, mxu_t)
    t_vcrb = max((dst_b_rb + uniq_cache_b_rb + trsm_b) / BW,
                 nseg * 2 * TX, mxu_rb)
    tot["cur"] += t_cur
    tot["vc"] += t_vc
    tot["vcrb"] += t_vcrb
    agg["dst_b"] += dst_b; agg["dst_b_rb"] += dst_b_rb
    agg["op_b"] += op_b; agg["op_b_vc"] += uniq_cache_b
    agg["cache_b_rb"] += uniq_cache_b_rb
    agg["trsm_b"] += trsm_b
    agg["mxu"] += mxu_t; agg["mxu_rb"] += mxu_rb
    agg["ntx_pair"] += ng * 2; agg["ntx_seg"] += nseg * 2
    agg["npairs"] += ng; agg["nt"] += nt

print(f"\nunrolled levels: pairs={agg['npairs']:.3e} "
      f"panel_tiles={agg['nt']:.3e}")
print(f"bytes GB: dst RMW {agg['dst_b']/1e9:6.1f} -> rb {agg['dst_b_rb']/1e9:6.1f}")
print(f"          ops     {agg['op_b']/1e9:6.1f} -> vc {agg['op_b_vc']/1e9:6.1f}"
      f" -> vc+rb {agg['cache_b_rb']/1e9:6.1f}")
print(f"          trsm    {agg['trsm_b']/1e9:6.1f}")
print(f"txn floors: pair-ops {agg['ntx_pair']*TX*1e3:6.1f} ms  "
      f"dst@D2 {agg['ntx_seg']*TX_SHALLOW*1e3:6.1f} ms  "
      f"dst@D8 {agg['ntx_seg']*TX*1e3:6.1f} ms")
print(f"mxu: full {agg['mxu']*1e3:6.1f} ms  row-bounded {agg['mxu_rb']*1e3:6.1f} ms")
print(f"\nmodel E2+TRSM time (unrolled levels only):")
for k, v in tot.items():
    print(f"  {k:6s}: {v*1e3:7.1f} ms")

# scan-tail + diag rough account
nsc = sum(lay.levels[i].gemm_a.size for g in scan_groups for i in g)
ntsc = sum(lay.levels[i].trsm_panel.size for g in scan_groups for i in g)
print(f"\nscan-tail: pairs={nsc:.2e} panels={ntsc:.2e} "
      f"(XLA path, ~{(nsc*4+ntsc*3)*T*T*4/1e9:.1f} GB)")
print(f"diag tiles: {lay.nbc} (chol {lay.nbc*T**3/3/1e9:.1f} GFLOP)")

# ---------------------------------------------------------------------------
# LEFT-LOOKING regroup: updates applied at the TARGET column's level.
# dst RMW collapses to one per stored tile; operand uniqueness re-counted
# under target-level chunking (reuse structure differs from source-level).
# ---------------------------------------------------------------------------
print("\n--- left-looking (target-level grouping) ---", flush=True)
lvl_of_col = lay.level_of_col
# concat all pairs with their target level
GA = np.concatenate([lv.gemm_a for lv in lay.levels])
GB = np.concatenate([lv.gemm_b for lv in lay.levels])
GD = np.concatenate([lv.gemm_d for lv in lay.levels])
tgt_lvl = lvl_of_col[lay.blk_col[GD]]
order = np.argsort(tgt_lvl * np.int64(lay.npool) + GD, kind="stable")
GA, GB, GD, tgt_lvl = GA[order], GB[order], GD[order], tgt_lvl[order]
bnd = np.searchsorted(tgt_lvl, np.arange(tgt_lvl.max() + 2))

tot_ll = 0.0
agg2 = {"dst_b": 0.0, "cache_gather": 0.0, "cache_kern": 0.0,
        "ntx_seg": 0.0, "nseg": 0.0, "npairs": 0.0, "uniq": 0.0}
seg_lens = []
for l in range(len(bnd) - 1):
    lo, hi = bnd[l], bnd[l + 1]
    if hi == lo:
        continue
    ga, gb, gd = GA[lo:hi], GB[lo:hi], GD[lo:hi]
    ng = hi - lo
    nseg = 0
    uniq_b = 0.0
    for c0 in range(0, ng, CHUNK):
        d = gd[c0:c0 + CHUNK]
        ns_ = 1 + int((d[1:] != d[:-1]).sum())
        nseg += ns_
        u = np.unique(np.concatenate([ga[c0:c0 + CHUNK], gb[c0:c0 + CHUNK]]))
        uniq_b += u.size
        seg_lens.append((c0 + CHUNK >= ng) * 0 + ns_ and (min(CHUNK, ng - c0) / ns_))
    dst_b = nseg * T * T * 4 * 2
    # cache build: XLA gather reads fp32 pool + writes bf16; kernel reads bf16
    cache_gather = uniq_b * T * T * (4 + 2)
    cache_kern = uniq_b * T * T * 2
    mxu_t = ng * 2 * T**3 / MXU
    t = max((dst_b + cache_gather + cache_kern) / BW, nseg * 2 * TX, mxu_t)
    tot_ll += t
    agg2["dst_b"] += dst_b; agg2["cache_gather"] += cache_gather
    agg2["cache_kern"] += cache_kern
    agg2["ntx_seg"] += nseg * 2; agg2["nseg"] += nseg
    agg2["npairs"] += ng; agg2["uniq"] += uniq_b

print(f"pairs={agg2['npairs']:.3e} segments={agg2['nseg']:.3e} "
      f"(mean {agg2['npairs']/max(1,agg2['nseg']):.1f} pairs/seg) "
      f"uniq operand tiles (sum over chunks)={agg2['uniq']:.3e} "
      f"(reuse {2*agg2['npairs']/max(1,agg2['uniq']):.1f}x)")
print(f"bytes GB: dst RMW {agg2['dst_b']/1e9:6.1f}  "
      f"cache gather {agg2['cache_gather']/1e9:6.1f}  "
      f"cache kernel-read {agg2['cache_kern']/1e9:6.1f}  trsm {agg['trsm_b']/1e9:6.1f}")
print(f"txn floor dst@D8: {agg2['ntx_seg']*TX*1e3:.1f} ms")
print(f"model E2 (left-looking, vcache): {tot_ll*1e3:7.1f} ms "
      f"(+trsm {agg['trsm_b']/BW*1e3:.0f} ms)")

# residue accounting: pairs targeting scanned-level or tail columns
print("\n--- residue: where do pair targets live? ---", flush=True)
scan_set = set(i for g in scan_groups for i in g)
is_scan_target = np.isin(tgt_lvl, np.array(sorted(scan_set), dtype=tgt_lvl.dtype))
from pastix_tpu.analyze.layout import plan_dense_tail
dt = plan_dense_tail(lay)
if dt is not None:
    tail_target = lay.blk_col[GD] >= dt.s
    print(f"dense tail: s={dt.s} q={dt.q}")
else:
    tail_target = np.zeros(GD.size, bool)
    print("no dense tail")
n_tail = int(tail_target.sum())
n_scan = int((is_scan_target & ~tail_target).sum())
n_unrl = int(GD.size - n_tail - n_scan)
print(f"pairs -> unrolled targets {n_unrl} ({100*n_unrl/GD.size:.1f}%), "
      f"scan targets {n_scan} ({100*n_scan/GD.size:.1f}%), "
      f"tail targets {n_tail} ({100*n_tail/GD.size:.1f}%)")
# tail pre-pass stats: segments + uniq b over the tail pair list
td = GD[tail_target]
o2 = np.argsort(td, kind="stable")
td = td[o2]
nseg_t = 1 + int((td[1:] != td[:-1]).sum()) if td.size else 0
print(f"tail pre-pass: {td.size} pairs, {nseg_t} unique dsts "
      f"(mean {td.size/max(1,nseg_t):.1f} pairs/dst)")
