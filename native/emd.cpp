// Exact transportation-simplex EMD solver.
//
// Native replacement for the reference's POT dependency (ot.emd2, a C++
// network simplex run with 16 OpenMP threads at reference lmc.py:403-406).
// Solves  min_G <G, C>  s.t. G 1 = a, G^T 1 = b, G >= 0  exactly.
//
// Algorithm: classic transportation simplex on the bipartite graph.
//   * initial basic feasible solution: north-west corner rule;
//   * duals by tree traversal from the root each pivot;
//   * entering arc by OpenMP-parallel block search over reduced costs
//     (best arc within a rotating block window, falling back to a full
//     scan before declaring optimality);
//   * leaving arc via the unique tree cycle; degenerate pivots allowed.
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

struct Arc {
  int i;  // source node (0..n-1)
  int j;  // sink node (0..m-1)
};

// Spanning-tree basis over n + m nodes (sources then sinks).
class Basis {
 public:
  Basis(int n, int m) : n_(n), m_(m), adj_(n + m) {}

  void add(int u, int v) {
    adj_[u].push_back(v);
    adj_[v].push_back(u);
  }

  void remove(int u, int v) {
    drop(adj_[u], v);
    drop(adj_[v], u);
  }

  const std::vector<int>& neighbors(int u) const { return adj_[u]; }
  int size() const { return n_ + m_; }

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
  int n_, m_;
  std::vector<std::vector<int>> adj_;
};

}  // namespace

extern "C" int emd_exact(int n, int m, const double* a, const double* b,
                         const double* cost, long max_pivots,
                         double* total_cost_out, double* flow_out) {
  if (n <= 0 || m <= 0 || !a || !b || !cost || !total_cost_out) return -1;

  const int nodes = n + m;
  // Flow on basic arcs, keyed by (i, j). Store in a hash-free dense map for
  // basic cells only: basic flows are kept in parallel arrays.
  Basis basis(n, m);
  std::vector<double> supply(a, a + n), demand(b, b + m);

  // Normalize total mass mismatch (tolerate tiny numeric drift).
  double sa = 0, sb = 0;
  for (int i = 0; i < n; ++i) sa += supply[i];
  for (int j = 0; j < m; ++j) sb += demand[j];
  if (sa <= 0 || sb <= 0) return -1;
  const double scale = sa / sb;
  for (int j = 0; j < m; ++j) demand[j] *= scale;

  // Basic flow storage: map basic arc -> flow via per-source small vectors.
  std::vector<std::vector<std::pair<int, double>>> flow(n);

  auto get_flow = [&](int i, int j) -> double {
    for (auto& p : flow[i])
      if (p.first == j) return p.second;
    return 0.0;
  };
  auto set_flow = [&](int i, int j, double v) {
    for (auto& p : flow[i])
      if (p.first == j) {
        p.second = v;
        return;
      }
    flow[i].push_back({j, v});
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

  // --- north-west corner initial BFS --------------------------------------
  {
    std::vector<double> s = supply, d = demand;
    int i = 0, j = 0;
    while (i < n && j < m) {
      double f = std::min(s[i], d[j]);
      set_flow(i, j, f);
      basis.add(i, n + j);
      s[i] -= f;
      d[j] -= f;
      // Advance exactly one index per step (degenerate zero-flow basic
      // cells keep the basis a spanning tree with n+m-1 arcs).
      if (i == n - 1 && j == m - 1) break;
      if (s[i] <= d[j] && i < n - 1)
        ++i;
      else if (j < m - 1)
        ++j;
      else
        ++i;
    }
  }

  std::vector<double> u(n), v(m);
  std::vector<uint8_t> visited(nodes);
  std::vector<int> stack_buf, parent(nodes);

  auto compute_duals = [&]() {
    std::fill(visited.begin(), visited.end(), 0);
    stack_buf.clear();
    stack_buf.push_back(0);
    visited[0] = 1;
    u[0] = 0.0;
    while (!stack_buf.empty()) {
      int x = stack_buf.back();
      stack_buf.pop_back();
      for (int y : basis.neighbors(x)) {
        if (visited[y]) continue;
        visited[y] = 1;
        if (x < n)  // x source, y sink: u_i + v_j = c_ij
          v[y - n] = cost[(size_t)x * m + (y - n)] - u[x];
        else
          u[y] = cost[(size_t)y * m + (x - n)] - v[x - n];
        stack_buf.push_back(y);
      }
    }
  };

  // Entering-arc block search state.
  const long total_arcs = (long)n * m;
  long block = std::max<long>(1024, total_arcs / 128);
  long cursor = 0;
  const double tol = 1e-11;

  auto find_entering = [&](Arc* out) -> bool {
    // scan up to the full matrix in blocks, return first block's best
    long scanned = 0;
    while (scanned < total_arcs) {
      long start = cursor % total_arcs;
      long len = std::min(block, total_arcs - start);
      double best = -tol;
      long best_idx = -1;
#ifdef _OPENMP
#pragma omp parallel
      {
        double lbest = -tol;
        long lidx = -1;
#pragma omp for nowait
        for (long k = 0; k < len; ++k) {
          long idx = start + k;
          int i = (int)(idx / m), j = (int)(idx % m);
          double r = cost[idx] - u[i] - v[j];
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
#else
      for (long k = 0; k < len; ++k) {
        long idx = start + k;
        int i = (int)(idx / m), j = (int)(idx % m);
        double r = cost[idx] - u[i] - v[j];
        if (r < best) {
          best = r;
          best_idx = idx;
        }
      }
#endif
      cursor = start + len;
      scanned += len;
      if (best_idx >= 0) {
        out->i = (int)(best_idx / m);
        out->j = (int)(best_idx % m);
        return true;
      }
    }
    return false;
  };

  // Tree path from source i to sink j (both in node ids) via DFS.
  std::vector<int> path;  // sequence of node ids
  auto tree_path = [&](int src, int dst) {
    std::fill(visited.begin(), visited.end(), 0);
    std::fill(parent.begin(), parent.end(), -1);
    stack_buf.clear();
    stack_buf.push_back(src);
    visited[src] = 1;
    while (!stack_buf.empty()) {
      int x = stack_buf.back();
      stack_buf.pop_back();
      if (x == dst) break;
      for (int y : basis.neighbors(x)) {
        if (!visited[y]) {
          visited[y] = 1;
          parent[y] = x;
          stack_buf.push_back(y);
        }
      }
    }
    path.clear();
    for (int x = dst; x != -1; x = parent[x]) path.push_back(x);
    std::reverse(path.begin(), path.end());
  };

  long pivots = 0;
  compute_duals();
  Arc enter;
  while (find_entering(&enter)) {
    if (max_pivots > 0 && ++pivots > max_pivots) {
      *total_cost_out = NAN;
      return 1;
    }
    // Cycle: enter (i -> n+j) plus the tree path from n+j back to i.
    tree_path(enter.i, n + enter.j);
    // path alternates source/sink ... path[0]=i, path.back()=n+j.
    // Arcs on the path get signs -, +, -, ... (entering arc is +).
    double theta = INFINITY;
    int leave_u = -1, leave_v = -1;
    for (size_t k = 0; k + 1 < path.size(); ++k) {
      int x = path[k], y = path[k + 1];
      int i = x < n ? x : y;
      int j = x < n ? y - n : x - n;
      bool minus = (k % 2 == 0);  // first path arc loses flow
      if (minus) {
        double f = get_flow(i, j);
        if (f < theta) {
          theta = f;
          leave_u = i;
          leave_v = j;
        }
      }
    }
    // Apply the pivot.
    for (size_t k = 0; k + 1 < path.size(); ++k) {
      int x = path[k], y = path[k + 1];
      int i = x < n ? x : y;
      int j = x < n ? y - n : x - n;
      bool minus = (k % 2 == 0);
      set_flow(i, j, get_flow(i, j) + (minus ? -theta : theta));
    }
    set_flow(enter.i, enter.j, get_flow(enter.i, enter.j) + theta);
    basis.add(enter.i, n + enter.j);
    erase_flow(leave_u, leave_v);
    basis.remove(leave_u, n + leave_v);
    compute_duals();
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
