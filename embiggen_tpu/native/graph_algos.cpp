// Native host-side graph algorithms.
//
// build_alias_tables: Walker alias-table construction for every node's
// neighbour distribution, parallelized over row ranges with std::thread.
// This is the host-side preprocessing feeding the on-device weighted
// first-order walk sampler (embiggen_tpu/ops/walks.py::_sample_neighbor);
// the reference engine does the equivalent sampling setup inside its Rust
// walk kernel (reference call site
// embiggen/sequences/node2vec_sequence.py:190-203).
#include <cstdint>
#include <cmath>
#include <thread>
#include <vector>

extern "C" {

// row_ptr: [n_nodes+1] int64 CSR offsets; weights: [n_edges] float32.
// Outputs aligned with col_idx: prob_out [n_edges] f32, alias_out [n_edges]
// int32 (intra-row neighbour offsets).
void build_alias_tables(const int64_t* row_ptr, int64_t n_nodes,
                        const float* weights, int64_t /*n_edges*/,
                        float* prob_out, int32_t* alias_out) {
  int n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if (n_nodes < 4096) n_threads = 1;

  auto worker = [&](int64_t r0, int64_t r1) {
    std::vector<double> p;
    std::vector<int32_t> small, large;
    for (int64_t r = r0; r < r1; ++r) {
      const int64_t s = row_ptr[r], e = row_ptr[r + 1];
      const int64_t d = e - s;
      if (d == 0) continue;
      double total = 0.0;
      for (int64_t i = s; i < e; ++i) total += (double)weights[i];
      if (total <= 0.0) total = 1.0;
      p.resize(d);
      small.clear();
      large.clear();
      bool uniform = true;
      const double scale = (double)d / total;
      for (int64_t i = 0; i < d; ++i) {
        p[i] = (double)weights[s + i] * scale;
        if (std::fabs(p[i] - 1.0) > 1e-12) uniform = false;
      }
      if (uniform) {
        for (int64_t i = 0; i < d; ++i) {
          prob_out[s + i] = 1.0f;
          alias_out[s + i] = (int32_t)i;
        }
        continue;
      }
      for (int64_t i = 0; i < d; ++i)
        (p[i] < 1.0 ? small : large).push_back((int32_t)i);
      while (!small.empty() && !large.empty()) {
        const int32_t sm = small.back();
        small.pop_back();
        const int32_t lg = large.back();
        large.pop_back();
        prob_out[s + sm] = (float)p[sm];
        alias_out[s + sm] = lg;
        p[lg] -= (1.0 - p[sm]);
        (p[lg] < 1.0 ? small : large).push_back(lg);
      }
      for (int32_t i : large) {
        prob_out[s + i] = 1.0f;
        alias_out[s + i] = i;
      }
      for (int32_t i : small) {  // numerical leftovers
        prob_out[s + i] = 1.0f;
        alias_out[s + i] = i;
      }
    }
  };

  if (n_threads == 1) {
    worker(0, n_nodes);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (n_nodes + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t r0 = t * chunk;
    const int64_t r1 = std::min(n_nodes, r0 + chunk);
    if (r0 >= r1) break;
    threads.emplace_back(worker, r0, r1);
  }
  for (auto& th : threads) th.join();
}

// Union-find connected components over an arc list (treated as undirected).
// Returns the number of components; comp_out[n] = smallest-root id per node
// (renumbered to 0..n_components-1 in first-seen order).
int64_t connected_components(const int32_t* sources, const int32_t* dests,
                             int64_t n_arcs, int64_t n_nodes,
                             int32_t* comp_out) {
  std::vector<int32_t> parent(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i) parent[i] = (int32_t)i;
  auto find = [&](int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  };
  for (int64_t a = 0; a < n_arcs; ++a) {
    int32_t rs = find(sources[a]), rd = find(dests[a]);
    if (rs != rd) parent[rs] = rd;
  }
  int64_t n_comp = 0;
  std::vector<int32_t> remap(n_nodes, -1);
  for (int64_t i = 0; i < n_nodes; ++i) {
    int32_t root = find((int32_t)i);
    if (remap[root] < 0) remap[root] = (int32_t)n_comp++;
    comp_out[i] = remap[root];
  }
  return n_comp;
}

}  // extern "C"
