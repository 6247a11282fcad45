// Native nested-dissection ordering.
//
// The reference delegates fill-reducing ordering to external Scotch/METIS
// (called from pastix_task_scotch in src/sopalin/src/pastix.c — SURVEY.md
// section 2 row 3).  This is our own replacement, the native twin of
// pastix_tpu/order/nd.py: recursive bisection by BFS level structures from
// a pseudo-peripheral vertex, vertex separator at the narrowest level set
// near the median, two-sided separator thinning, RCM on leaf subgraphs.
// Works in-place on one CSR adjacency with vertex-set views (no subgraph
// copies), which is what makes it ~50x the Python version.
//
// C ABI only (loaded with ctypes; no pybind11 in this environment).

#include <cstdint>
#include <vector>
#include <algorithm>
#include <cstring>

extern "C" int64_t pastix_amd(int64_t, const int64_t*, const int64_t*,
                              int64_t*);

namespace {

using i64 = int64_t;

struct Graph {
  const i64* indptr;
  const i64* indices;
  i64 n;
};

struct Workspace {
  std::vector<i64> local;   // global vertex -> local id in current subgraph (-1)
  std::vector<i64> level;   // BFS levels (by local id)
  std::vector<i64> deg;     // degrees within subgraph
  std::vector<uint8_t> side;  // 0=A, 1=B, 2=S (by local id)
  std::vector<i64> frontier, next, tmp;
  explicit Workspace(i64 n) : local(n, -1) {}
};

// BFS levels within the vertex set (local ids); returns eccentricity.
i64 bfs(const Graph& g, const std::vector<i64>& verts, Workspace& w,
        i64 start_local) {
  const i64 m = (i64)verts.size();
  std::fill(w.level.begin(), w.level.begin() + m, (i64)-1);
  w.frontier.clear();
  w.frontier.push_back(start_local);
  w.level[start_local] = 0;
  i64 d = 0;
  while (!w.frontier.empty()) {
    w.next.clear();
    for (i64 ul : w.frontier) {
      const i64 u = verts[ul];
      for (i64 e = g.indptr[u]; e < g.indptr[u + 1]; ++e) {
        const i64 vl = w.local[g.indices[e]];
        if (vl >= 0 && w.level[vl] < 0) {
          w.level[vl] = d + 1;
          w.next.push_back(vl);
        }
      }
    }
    if (w.next.empty()) break;
    ++d;
    std::swap(w.frontier, w.next);
  }
  return d;
}

// pseudo-peripheral start: begin at min subgraph degree, double sweep
i64 pseudo_peripheral(const Graph& g, const std::vector<i64>& verts,
                      Workspace& w) {
  const i64 m = (i64)verts.size();
  i64 start = 0, best_deg = INT64_MAX;
  for (i64 i = 0; i < m; ++i) {
    i64 d = 0;
    const i64 u = verts[i];
    for (i64 e = g.indptr[u]; e < g.indptr[u + 1]; ++e)
      if (w.local[g.indices[e]] >= 0) ++d;
    w.deg[i] = d;
    if (d < best_deg) { best_deg = d; start = i; }
  }
  i64 ecc = bfs(g, verts, w, start);
  for (int it = 0; it < 2; ++it) {
    i64 far = start, fl = -1;
    for (i64 i = 0; i < m; ++i)
      if (w.level[i] > fl) { fl = w.level[i]; far = i; }
    // tie-break toward min degree in the last level (classic GPS heuristic)
    for (i64 i = 0; i < m; ++i)
      if (w.level[i] == fl && w.deg[i] < w.deg[far]) far = i;
    std::vector<i64> save_level;
    i64 ecc2 = bfs(g, verts, w, far);
    if (ecc2 <= ecc) { /* keep this level structure (already in w.level) */
      return far; }
    start = far; ecc = ecc2;
  }
  return start;
}

// RCM ordering of the subgraph; writes global ids into out (appends).
void rcm_leaf(const Graph& g, const std::vector<i64>& verts, Workspace& w,
              std::vector<i64>& out) {
  const i64 m = (i64)verts.size();
  if (m <= 2) {
    for (i64 v : verts) out.push_back(v);
    return;
  }
  // degrees + start from pseudo-peripheral (fills w.level as distances)
  i64 start = pseudo_peripheral(g, verts, w);
  std::vector<uint8_t> seen(m, 0);
  std::vector<i64> order;
  order.reserve(m);
  std::vector<i64> nbr;
  // components: loop until all placed
  i64 placed = 0;
  i64 scan = 0;
  order.push_back(start);
  seen[start] = 1;
  while (placed < m) {
    if (scan == (i64)order.size()) {
      // next component: unseen min-degree vertex
      i64 s = -1, bd = INT64_MAX;
      for (i64 i = 0; i < m; ++i)
        if (!seen[i] && w.deg[i] < bd) { bd = w.deg[i]; s = i; }
      order.push_back(s);
      seen[s] = 1;
      continue;
    }
    const i64 ul = order[scan++];
    ++placed;
    const i64 u = verts[ul];
    nbr.clear();
    for (i64 e = g.indptr[u]; e < g.indptr[u + 1]; ++e) {
      const i64 vl = w.local[g.indices[e]];
      if (vl >= 0 && !seen[vl]) { seen[vl] = 1; nbr.push_back(vl); }
    }
    std::sort(nbr.begin(), nbr.end(),
              [&](i64 a, i64 b) { return w.deg[a] < w.deg[b]; });
    for (i64 v : nbr) order.push_back(v);
  }
  // reverse Cuthill-McKee
  for (i64 i = m - 1; i >= 0; --i) out.push_back(verts[order[i]]);
}

struct NDContext {
  Graph g;
  Workspace* w;
  i64 leaf_size, max_levels;
  double balance;
  std::vector<i64> peritab;
  std::vector<i64> bounds;
};

void emit_leaf(NDContext& ctx, const std::vector<i64>& verts) {
  if (verts.empty()) return;
  // set local ids for the leaf subgraph
  for (size_t i = 0; i < verts.size(); ++i) ctx.w->local[verts[i]] = (i64)i;
  if ((i64)verts.size() > (i64)ctx.w->level.size()) {
    ctx.w->level.resize(verts.size());
    ctx.w->deg.resize(verts.size());
  }
  rcm_leaf(ctx.g, verts, *ctx.w, ctx.peritab);
  for (i64 v : verts) ctx.w->local[v] = -1;
  ctx.bounds.push_back((i64)ctx.peritab.size());
}

void nd_rec(NDContext& ctx, std::vector<i64>& verts, i64 depth) {
  const i64 m = (i64)verts.size();
  if (m == 0) return;
  if (m <= ctx.leaf_size || depth >= ctx.max_levels) {
    emit_leaf(ctx, verts);
    return;
  }
  Workspace& w = *ctx.w;
  if ((i64)w.level.size() < m) {
    w.level.resize(m);
    w.deg.resize(m);
    w.side.resize(m);
  }
  if ((i64)w.side.size() < m) w.side.resize(m);
  for (i64 i = 0; i < m; ++i) w.local[verts[i]] = i;

  // connected components within the set
  {
    std::vector<i64> comp(m, -1);
    i64 nc = 0;
    std::vector<i64>& stack = w.tmp;
    for (i64 s = 0; s < m; ++s) {
      if (comp[s] >= 0) continue;
      stack.clear();
      stack.push_back(s);
      comp[s] = nc;
      while (!stack.empty()) {
        i64 ul = stack.back();
        stack.pop_back();
        const i64 u = verts[ul];
        for (i64 e = ctx.g.indptr[u]; e < ctx.g.indptr[u + 1]; ++e) {
          const i64 vl = w.local[ctx.g.indices[e]];
          if (vl >= 0 && comp[vl] < 0) { comp[vl] = nc; stack.push_back(vl); }
        }
      }
      ++nc;
    }
    if (nc > 1) {
      std::vector<std::vector<i64>> parts(nc);
      for (i64 i = 0; i < m; ++i) parts[comp[i]].push_back(verts[i]);
      for (i64 v : verts) w.local[v] = -1;
      for (auto& p : parts) nd_rec(ctx, p, depth);
      return;
    }
  }

  i64 start = pseudo_peripheral(ctx.g, verts, w);
  (void)start;
  i64 nlev = 0;
  for (i64 i = 0; i < m; ++i) nlev = std::max(nlev, w.level[i]);
  ++nlev;
  if (nlev < 3) {
    for (i64 v : verts) w.local[v] = -1;
    emit_leaf(ctx, verts);
    return;
  }
  // level sizes; separator level = narrowest within the balance window
  std::vector<i64> sizes(nlev, 0);
  for (i64 i = 0; i < m; ++i) ++sizes[w.level[i]];
  std::vector<i64> cum(nlev);
  i64 acc = 0;
  for (i64 l = 0; l < nlev; ++l) { acc += sizes[l]; cum[l] = acc; }
  i64 lo = 1, hi = nlev - 2;
  {
    const double bal = ctx.balance;
    i64 l1 = 0; while (l1 < nlev && cum[l1] < (i64)(bal * m)) ++l1;
    i64 l2 = 0; while (l2 < nlev && cum[l2] < (i64)((1.0 - bal) * m)) ++l2;
    lo = std::max<i64>(1, std::min<i64>(l1, nlev - 2));
    hi = std::max<i64>(lo, std::min<i64>(l2, nlev - 2));
  }
  i64 s = lo;
  for (i64 l = lo; l <= hi; ++l)
    if (sizes[l] < sizes[s]) s = l;

  // sides: A = below, S = level s, B = above
  for (i64 i = 0; i < m; ++i)
    w.side[i] = w.level[i] < s ? 0 : (w.level[i] == s ? 2 : 1);
  // thin the separator (both directions): S vertices not touching B move
  // to A; then S vertices not touching A move to B
  for (int dir = 0; dir < 2; ++dir) {
    const uint8_t target = dir == 0 ? 1 : 0;   // side that must be touched
    const uint8_t move_to = dir == 0 ? 0 : 1;  // else move here
    for (i64 i = 0; i < m; ++i) {
      if (w.side[i] != 2) continue;
      const i64 u = verts[i];
      bool touches = false;
      for (i64 e = ctx.g.indptr[u]; e < ctx.g.indptr[u + 1]; ++e) {
        const i64 vl = w.local[ctx.g.indices[e]];
        if (vl >= 0 && w.side[vl] == target) { touches = true; break; }
      }
      if (!touches) w.side[i] = move_to;
    }
  }
  std::vector<i64> A, B, S;
  A.reserve(m); B.reserve(m);
  for (i64 i = 0; i < m; ++i) {
    if (w.side[i] == 0) A.push_back(verts[i]);
    else if (w.side[i] == 1) B.push_back(verts[i]);
    else S.push_back(verts[i]);
  }

  // hybrid dispatch: a separator this wide means the (sub)graph does not
  // bisect — expander-like irregular structure where level-set ND
  // inflates fill superlinearly.  Order the whole subgraph with
  // approximate minimum degree instead (amd.cpp), the reference's
  // effective behavior via Scotch/METIS strategy selection.
  if ((i64)S.size() > (i64)(0.12 * (double)m) && m > ctx.leaf_size) {
    std::vector<i64> sp(m + 1, 0), si;
    si.reserve(m * 8);
    for (i64 i = 0; i < m; ++i) {
      const i64 u = verts[i];
      for (i64 e = ctx.g.indptr[u]; e < ctx.g.indptr[u + 1]; ++e) {
        const i64 vl = w.local[ctx.g.indices[e]];
        if (vl >= 0) si.push_back(vl);
      }
      sp[i + 1] = (i64)si.size();
    }
    for (i64 v : verts) w.local[v] = -1;
    std::vector<i64> peri(m);
    if (pastix_amd(m, sp.data(), si.data(), peri.data()) == 0) {
      for (i64 i = 0; i < m; ++i) ctx.peritab.push_back(verts[peri[i]]);
      ctx.bounds.push_back((i64)ctx.peritab.size());
      return;
    }
    emit_leaf(ctx, verts);  // AMD failed (should not happen): RCM leaf
    return;
  }

  for (i64 v : verts) w.local[v] = -1;
  if (A.empty() || B.empty()) {
    emit_leaf(ctx, verts);
    return;
  }
  verts.clear();
  verts.shrink_to_fit();
  nd_rec(ctx, A, depth + 1);
  nd_rec(ctx, B, depth + 1);
  if (!S.empty()) emit_leaf(ctx, S);
}

}  // namespace

extern "C" {

// Returns 0 on success.  peritab: length n.  rangtab: length n+1 buffer,
// *nrang written with the number of boundaries (rangtab entries used).
int64_t pastix_nd(int64_t n, const int64_t* indptr, const int64_t* indices,
                  int64_t leaf_size, int64_t max_levels, double balance,
                  int64_t* peritab, int64_t* rangtab, int64_t* nrang) {
  if (n < 0) return 1;
  if (n == 0) { *nrang = 1; rangtab[0] = 0; return 0; }
  NDContext ctx;
  ctx.g = Graph{indptr, indices, n};
  Workspace w(n);
  ctx.w = &w;
  ctx.leaf_size = leaf_size;
  ctx.max_levels = max_levels;
  ctx.balance = balance;
  ctx.peritab.reserve(n);
  ctx.bounds.push_back(0);
  std::vector<i64> all(n);
  for (i64 i = 0; i < n; ++i) all[i] = i;
  nd_rec(ctx, all, 0);
  if ((i64)ctx.peritab.size() != n) return 2;
  std::memcpy(peritab, ctx.peritab.data(), n * sizeof(i64));
  // bounds recorded after phase 0 push: first entry 0 then one per leaf/sep
  std::memcpy(rangtab, ctx.bounds.data(), ctx.bounds.size() * sizeof(i64));
  *nrang = (i64)ctx.bounds.size();
  return 0;
}

// Simple smoke hook for the loader.
int64_t pastix_native_abi(void) { return 1; }
}
