// Native shortest-path router for scenario compilation.
//
// Replaces the route-expansion role of SUMO's jtrrouter/duarouter binaries
// (invoked by the reference at small_grid/data/build_file.py:322-328 and
// implicitly for <flow from to via> trips): Dijkstra over the edge graph in
// CSR form with travel-time costs. Called from Python via ctypes during
// scenario compilation; city-scale nets (10^5+ edges) route in milliseconds
// where the pure-Python fallback crawls.
//
// Build: make -C native   (produces libdscrouter.so next to this file)

#include <cstdint>
#include <queue>
#include <vector>

extern "C" {

// Single-source shortest path from src_edge, tracking predecessor edges.
// indptr/indices: CSR adjacency over edges (indices[j] reachable from i for
// j in [indptr[i], indptr[i+1])). cost[e]: traversal cost of edge e.
// Returns path length (#edges) or -1 if unreachable; writes the edge
// sequence (src..dst inclusive) into out_path (capacity out_cap).
int32_t dsc_shortest_path(int32_t n_edges, const int32_t* indptr,
                          const int32_t* indices, const double* cost,
                          int32_t src, int32_t dst, int32_t* out_path,
                          int32_t out_cap) {
  std::vector<double> dist(n_edges, -1.0);
  std::vector<int32_t> prev(n_edges, -1);
  using QE = std::pair<double, int32_t>;
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
  dist[src] = cost[src];
  pq.push({dist[src], src});
  while (!pq.empty()) {
    auto [d, e] = pq.top();
    pq.pop();
    if (e == dst) break;
    if (d > dist[e]) continue;
    for (int32_t j = indptr[e]; j < indptr[e + 1]; ++j) {
      int32_t nxt = indices[j];
      double nd = d + cost[nxt];
      if (dist[nxt] < 0.0 || nd < dist[nxt]) {
        dist[nxt] = nd;
        prev[nxt] = e;
        pq.push({nd, nxt});
      }
    }
  }
  if (dist[dst] < 0.0) return -1;
  // reconstruct backwards
  std::vector<int32_t> rev;
  for (int32_t e = dst; e != -1; e = prev[e]) rev.push_back(e);
  int32_t n = static_cast<int32_t>(rev.size());
  if (n > out_cap) return -2;
  for (int32_t i = 0; i < n; ++i) out_path[i] = rev[n - 1 - i];
  return n;
}

// Batch variant: routes[i] = path src[i] -> dst[i]; out is [n_pairs, out_cap]
// padded with -1. Returns number of failed pairs.
int32_t dsc_shortest_paths(int32_t n_edges, const int32_t* indptr,
                           const int32_t* indices, const double* cost,
                           int32_t n_pairs, const int32_t* src,
                           const int32_t* dst, int32_t* out,
                           int32_t out_cap) {
  int32_t failures = 0;
  for (int32_t i = 0; i < n_pairs; ++i) {
    int32_t* row = out + static_cast<int64_t>(i) * out_cap;
    for (int32_t j = 0; j < out_cap; ++j) row[j] = -1;
    int32_t n = dsc_shortest_path(n_edges, indptr, indices, cost, src[i],
                                  dst[i], row, out_cap);
    if (n < 0) ++failures;
  }
  return failures;
}

}  // extern "C"
