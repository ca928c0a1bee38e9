// Exact transportation network-simplex EMD solver.
//
// Native replacement for the reference's POT dependency (ot.emd2, a C++
// network simplex run with 16 OpenMP threads at reference lmc.py:403-406).
// Solves  min_G <G, C>  s.t. G 1 = a, G^T 1 = b, G >= 0  exactly.
//
// Round-2 rewrite for reference-scale problems (10k x 10k exact W2 curves,
// reference numItermax=1e5): the round-1 transportation simplex recomputed
// ALL duals and ran a full-tree DFS every pivot — O((n+m) * pivots) — which
// capped practical scale at ~2k points. This version is a proper network
// simplex:
//   * rooted spanning-tree basis with parent/depth arrays;
//   * pivot cycle found by walking the two tree paths to the LCA
//     (O(cycle length), no full-tree DFS);
//   * duals updated incrementally: only the re-rooted subtree cut off by
//     the leaving arc is re-labelled (O(|subtree|), not O(n+m));
//   * greedy row-minimum initial basis (near-optimal start for geometric
//     costs, far fewer pivots than the north-west corner rule);
//   * entering arc by OpenMP block search over reduced costs with a
//     ~sqrt(nm) rotating block (Grigoriadis' rule, as in LEMON/POT).
//
// C API (ctypes-friendly), all double precision:
//   int emd_exact(n, m, a, b, cost, max_pivots, total_cost_out, flow_out)
//     returns 0 on optimal, 1 if pivot limit hit, -1 on bad input.
//     flow_out may be NULL (cost only).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Spanning-tree adjacency over n + m nodes (sources 0..n-1, sinks n..n+m-1).
class Basis {
 public:
  Basis(int n, int m) : adj_(n + m) {}

  void add(int u, int v) {
    adj_[u].push_back(v);
    adj_[v].push_back(u);
  }

  void remove(int u, int v) {
    drop(adj_[u], v);
    drop(adj_[v], u);
  }

  const std::vector<int>& neighbors(int u) const { return adj_[u]; }

 private:
  static void drop(std::vector<int>& vec, int x) {
    for (size_t k = 0; k < vec.size(); ++k) {
      if (vec[k] == x) {
        vec[k] = vec.back();
        vec.pop_back();
        return;
      }
    }
  }
  std::vector<std::vector<int>> adj_;
};

}  // namespace

extern "C" int emd_exact(int n, int m, const double* a, const double* b,
                         const double* cost, long max_pivots,
                         double* total_cost_out, double* flow_out) {
  if (n <= 0 || m <= 0 || !a || !b || !cost || !total_cost_out) return -1;

  const int nodes = n + m;
  Basis basis(n, m);
  std::vector<double> supply(a, a + n), demand(b, b + m);

  // Normalize total mass mismatch (tolerate tiny numeric drift).
  double sa = 0, sb = 0;
  for (int i = 0; i < n; ++i) sa += supply[i];
  for (int j = 0; j < m; ++j) sb += demand[j];
  if (sa <= 0 || sb <= 0) return -1;
  const double scale = sa / sb;
  for (int j = 0; j < m; ++j) demand[j] *= scale;

  // Basic flow storage: per-source small vectors (basic arcs per source are
  // few — the basis has n+m-1 arcs total).
  std::vector<std::vector<std::pair<int, double>>> flow(n);
  auto get_flow = [&](int i, int j) -> double {
    for (auto& p : flow[i])
      if (p.first == j) return p.second;
    return 0.0;
  };
  auto add_flow = [&](int i, int j, double dv) {
    for (auto& p : flow[i])
      if (p.first == j) {
        p.second += dv;
        return;
      }
    flow[i].push_back({j, dv});
  };
  auto erase_flow = [&](int i, int j) {
    auto& vec = flow[i];
    for (size_t k = 0; k < vec.size(); ++k)
      if (vec[k].first == j) {
        vec[k] = vec.back();
        vec.pop_back();
        return;
      }
  };

  // --- greedy row-minimum initial basic feasible solution ------------------
  // Each assignment exhausts the source or the sink, so the support is a
  // forest; padding degenerate zero arcs keeps exactly n+m-1 basic arcs and
  // one connected tree (same argument as the NW-corner staircase).
  {
    std::vector<double> s = supply, d = demand;
    std::vector<uint8_t> sink_done(m, 0);
    int open_sinks = m;
    for (int i = 0; i < n; ++i) {
      const double* row = cost + (size_t)i * m;
      const bool last_source = (i == n - 1);
      for (;;) {
        // cheapest sink still open (serial scan; O(nm) total)
        int jb = -1;
        double cb = INFINITY;
        for (int j = 0; j < m; ++j) {
          if (!sink_done[j] && row[j] < cb) {
            cb = row[j];
            jb = j;
          }
        }
        if (jb < 0) break;  // no open sink left (only on the last source)
        double f = std::min(s[i], d[jb]);
        add_flow(i, jb, f);  // may be a degenerate zero arc
        basis.add(i, n + jb);
        // Close exactly one side per arc (the very last arc closes both):
        // ties close the SOURCE, leaving a zero-demand open sink that a
        // later source will absorb with a degenerate arc — this keeps the
        // support a spanning tree with exactly n+m-1 arcs.
        if (s[i] <= d[jb] && !(last_source && open_sinks > 1)) {
          d[jb] -= f;
          break;  // source exhausted: next source
        }
        s[i] -= f;
        d[jb] = 0;
        sink_done[jb] = 1;
        --open_sinks;
        if (last_source && open_sinks == 0) break;
      }
    }
  }

  // --- rooted tree: parent / depth / duals ---------------------------------
  std::vector<int> parent(nodes, -1), depth(nodes, 0);
  std::vector<double> pi(nodes, 0.0);  // u_i = pi[i], v_j = pi[n+j]
  std::vector<int> stack_buf;
  {
    std::vector<uint8_t> seen(nodes, 0);
    stack_buf.push_back(0);
    seen[0] = 1;
    pi[0] = 0.0;
    while (!stack_buf.empty()) {
      int x = stack_buf.back();
      stack_buf.pop_back();
      for (int y : basis.neighbors(x)) {
        if (seen[y]) continue;
        seen[y] = 1;
        parent[y] = x;
        depth[y] = depth[x] + 1;
        if (x < n)
          pi[y] = cost[(size_t)x * m + (y - n)] - pi[x];
        else
          pi[y] = cost[(size_t)y * m + (x - n)] - pi[x];
        stack_buf.push_back(y);
      }
    }
    for (int x = 0; x < nodes; ++x)
      if (!seen[x]) return -1;  // init failed to build a spanning tree
  }

  // --- entering-arc block search (Grigoriadis ~sqrt(nm) blocks) ------------
  const long total_arcs = (long)n * m;
  long block = std::max<long>(
      1024, (long)std::sqrt((double)total_arcs));
  long cursor = 0;
  const double tol = 1e-11;

  auto find_entering = [&](int* ei, int* ej) -> bool {
    long scanned = 0;
    while (scanned < total_arcs) {
      long start = cursor % total_arcs;
      long len = std::min(block, total_arcs - start);
      double best = -tol;
      long best_idx = -1;
#ifdef _OPENMP
      if (len >= 65536) {
#pragma omp parallel
        {
          double lbest = -tol;
          long lidx = -1;
#pragma omp for nowait
          for (long k = 0; k < len; ++k) {
            long idx = start + k;
            int i = (int)(idx / m), j = (int)(idx % m);
            double r = cost[idx] - pi[i] - pi[n + j];
            if (r < lbest) {
              lbest = r;
              lidx = idx;
            }
          }
#pragma omp critical
          {
            if (lbest < best) {
              best = lbest;
              best_idx = lidx;
            }
          }
        }
      } else
#endif
      {
        for (long k = 0; k < len; ++k) {
          long idx = start + k;
          int i = (int)(idx / m), j = (int)(idx % m);
          double r = cost[idx] - pi[i] - pi[n + j];
          if (r < best) {
            best = r;
            best_idx = idx;
          }
        }
      }
      cursor = start + len;
      scanned += len;
      if (best_idx >= 0) {
        *ei = (int)(best_idx / m);
        *ej = (int)(best_idx % m);
        return true;
      }
    }
    return false;
  };

  // --- pivot loop -----------------------------------------------------------
  // Cycle via LCA walk; scratch path buffers reused across pivots.
  std::vector<int> path_a, path_b;  // node sequences up to (excl.) the LCA
  long pivots = 0;
  int ei, ej;
  while (find_entering(&ei, &ej)) {
    if (max_pivots > 0 && ++pivots > max_pivots) {
      *total_cost_out = NAN;
      return 1;
    }
    // Tree paths from both entering endpoints up to (and including) the
    // LCA; the full tree path ei -> ... -> lca -> ... -> (n+ej) is
    // path_a + reversed(path_b without its lca tail).
    path_a.clear();
    path_b.clear();
    {
      int x = ei, y = n + ej;
      path_a.push_back(x);
      path_b.push_back(y);
      while (depth[x] > depth[y]) {
        x = parent[x];
        path_a.push_back(x);
      }
      while (depth[y] > depth[x]) {
        y = parent[y];
        path_b.push_back(y);
      }
      while (x != y) {
        x = parent[x];
        path_a.push_back(x);
        y = parent[y];
        path_b.push_back(y);
      }
      // both back() == lca; splice into path_a = full ei..(n+ej) sequence
      for (size_t k = path_b.size() - 1; k-- > 0;)
        path_a.push_back(path_b[k]);
    }
    const std::vector<int>& seq = path_a;

    // Arc k joins seq[k], seq[k+1]; arcs at even k lose theta, odd k gain
    // (the entering arc ei->(n+ej) closes the cycle and gains).
    auto arc_of = [&](int u, int v, int* ai, int* aj) {
      if (u < n) {
        *ai = u;
        *aj = v - n;
      } else {
        *ai = v;
        *aj = u - n;
      }
    };
    double theta = INFINITY;
    int leave_u = -1, leave_v = -1;  // (source, sink) of leaving arc
    for (size_t k = 0; k + 1 < seq.size(); k += 2) {  // minus arcs
      int aiq, ajq;
      arc_of(seq[k], seq[k + 1], &aiq, &ajq);
      double f = get_flow(aiq, ajq);
      if (f < theta) {
        theta = f;
        leave_u = aiq;
        leave_v = ajq;
      }
    }
    for (size_t k = 0; k + 1 < seq.size(); ++k) {
      int aiq, ajq;
      arc_of(seq[k], seq[k + 1], &aiq, &ajq);
      add_flow(aiq, ajq, (k % 2 == 0) ? -theta : theta);
    }
    add_flow(ei, ej, theta);

    // Swap basis arcs.
    erase_flow(leave_u, leave_v);
    basis.remove(leave_u, n + leave_v);
    basis.add(ei, n + ej);

    // Re-root the subtree cut off by the leaving arc at the entering
    // endpoint inside it; recompute parent/depth/pi for that subtree only.
    // The cut subtree is the CHILD side of the leaving arc in the old tree.
    int child = (parent[leave_u] == n + leave_v) ? leave_u : n + leave_v;
    // Exactly one entering endpoint is inside the cut subtree: the one
    // whose old path to the root passed through `child`. Walk up from ei.
    bool ei_inside = false;
    for (int t = ei; t != -1; t = parent[t]) {
      if (t == child) {
        ei_inside = true;
        break;
      }
      if (depth[t] < depth[child]) break;  // passed above child's depth
    }
    int new_root = ei_inside ? ei : n + ej;
    int anchor = ei_inside ? n + ej : ei;  // stays in the main tree
    // DFS from new_root with parent anchor relabels the whole subtree
    // (its only connection to the main tree is the new entering arc).
    stack_buf.clear();
    parent[new_root] = anchor;
    depth[new_root] = depth[anchor] + 1;
    pi[new_root] = (new_root < n)
                       ? cost[(size_t)new_root * m + (anchor - n)] - pi[anchor]
                       : cost[(size_t)anchor * m + (new_root - n)] - pi[anchor];
    stack_buf.push_back(new_root);
    while (!stack_buf.empty()) {
      int u = stack_buf.back();
      stack_buf.pop_back();
      for (int w : basis.neighbors(u)) {
        if (w == parent[u]) continue;
        parent[w] = u;
        depth[w] = depth[u] + 1;
        pi[w] = (u < n) ? cost[(size_t)u * m + (w - n)] - pi[u]
                        : cost[(size_t)w * m + (u - n)] - pi[u];
        stack_buf.push_back(w);
      }
    }
  }

  double total = 0;
  for (int i = 0; i < n; ++i)
    for (auto& p : flow[i]) total += p.second * cost[(size_t)i * m + p.first];
  *total_cost_out = total;

  if (flow_out) {
    std::memset(flow_out, 0, sizeof(double) * (size_t)n * m);
    for (int i = 0; i < n; ++i)
      for (auto& p : flow[i]) flow_out[(size_t)i * m + p.first] = p.second;
  }
  return 0;
}

extern "C" int emd_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}
