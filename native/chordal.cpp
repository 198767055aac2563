// Native chordal decomposition: MCS + fill-in + maximal cliques.
//
// The reference relied on chompack/cvxopt (native C) for this host-side
// preprocessing (SURVEY.md section 2.1); this is our first-party equivalent.
// Algorithm and tie-breaking mirror sdpcutsel_tpu/qcqp/chordal.py exactly
// (MCS picks the unvisited vertex of max weight, ties -> smallest index;
// elimination in reverse MCS order; clique = v + higher neighbors; maximal
// filter by subset test), so the Python fallback and this fast path are
// bit-identical.  Exposed as a C API for ctypes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <set>
#include <vector>

extern "C" {

// Returns number of maximal cliques (>= 0) or -1 on error.
// clique_data: capacity cap_data ints; clique_off: capacity n+1 ints.
// nfill_out: number of fill-in edges added (optional, may be null).
int chordal_decompose(int n, int nedges, const int32_t* ei, const int32_t* ej,
                      int32_t* clique_data, int cap_data,
                      int32_t* clique_off, int* nfill_out) {
  if (n <= 0) return 0;
  std::vector<std::set<int>> adj(n);
  for (int e = 0; e < nedges; ++e) {
    int i = ei[e], j = ej[e];
    if (i == j || i < 0 || j < 0 || i >= n || j >= n) continue;
    adj[i].insert(j);
    adj[j].insert(i);
  }

  // MCS: max weight, ties -> smallest index; order collected then reversed.
  std::vector<int> weight(n, 0), order;
  std::vector<char> visited(n, 0);
  order.reserve(n);
  for (int it = 0; it < n; ++it) {
    int best = -1, bw = -1;
    for (int i = 0; i < n; ++i)
      if (!visited[i] && weight[i] > bw) { bw = weight[i]; best = i; }
    visited[best] = 1;
    order.push_back(best);
    for (int u : adj[best])
      if (!visited[u]) weight[u]++;
  }
  std::reverse(order.begin(), order.end());
  std::vector<int> pos(n);
  for (int idx = 0; idx < n; ++idx) pos[order[idx]] = idx;

  // Elimination with fill-in; collect candidate cliques.
  std::vector<std::set<int>> work = adj;
  std::vector<std::vector<int>> cliques;
  int nfill = 0;
  for (int idx = 0; idx < n; ++idx) {
    int v = order[idx];
    std::vector<int> higher;
    for (int u : work[v])
      if (pos[u] > idx) higher.push_back(u);
    std::sort(higher.begin(), higher.end());
    std::vector<int> cl;
    cl.push_back(v);
    cl.insert(cl.end(), higher.begin(), higher.end());
    std::sort(cl.begin(), cl.end());
    cliques.push_back(cl);
    for (size_t a = 0; a < higher.size(); ++a)
      for (size_t b = a + 1; b < higher.size(); ++b) {
        int p = higher[a], q = higher[b];
        if (!work[p].count(q)) {
          work[p].insert(q);
          work[q].insert(p);
          nfill++;
        }
      }
  }

  // Maximal filter: sort by size desc (stable), keep non-subsets.
  std::stable_sort(cliques.begin(), cliques.end(),
                   [](const std::vector<int>& a, const std::vector<int>& b) {
                     return a.size() > b.size();
                   });
  std::vector<std::vector<int>> maximal;
  for (const auto& c : cliques) {
    bool sub = false;
    for (const auto& m : maximal) {
      if (std::includes(m.begin(), m.end(), c.begin(), c.end())) {
        sub = true;
        break;
      }
    }
    if (!sub) maximal.push_back(c);
  }

  int off = 0, k = 0;
  for (const auto& c : maximal) {
    if (off + (int)c.size() > cap_data || k >= n) return -1;
    clique_off[k] = off;
    for (int v : c) clique_data[off++] = v;
    ++k;
  }
  clique_off[k] = off;
  if (nfill_out) *nfill_out = nfill;
  return k;
}

}  // extern "C"
