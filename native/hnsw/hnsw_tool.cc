// hnsw_tool — from-scratch C++17 HNSW approximate nearest-neighbor search.
//
// Native replacement for the external FAISS binary the reference shells out
// to (reference model/BaseLine/infer.py:213-225). Same CLI + file contract:
//
//   hnsw_tool --dataset_vector_file_path=embedding.fbin
//             --dataset_id_file_path=id.u64bin
//             --query_vector_file_path=query.fbin
//             --result_id_file_path=id100.u64bin
//             --query_ann_top_k=10 --faiss_M=64 --faiss_ef_construction=1280
//             --query_ef_search=640 --faiss_metric_type=0
//
// File formats (reference dataset.py:421-434, infer.py:51-65):
//   .fbin   : uint32 rows, uint32 cols, float32 raster
//   .u64bin : uint32 rows, uint32 cols, uint64 raster
//   result  : uint32 num_queries, uint32 top_k, uint64 ids
//
// metric_type 0 = inner product (score = dot, larger better),
//             1 = L2 (smaller better).
//
// Implementation: standard HNSW (Malkov & Yashunin, 2016) — geometric level
// assignment, greedy descent from the top layer, ef-bounded best-first search
// at the base layer, simple nearest-M neighbor selection with degree capping.
// BOTH build and search parallelize (round 4): inserts run concurrently with
// per-node neighbor-list locks (reads copy the list under the node's lock,
// scoring happens outside it — the hnswlib discipline), a global mutex
// guards only the entry-point/max-level update, and levels are assigned by a
// deterministic per-id splitmix64 hash so the graph's level structure does
// not depend on thread interleaving. At the reference operating point
// (efC=1280, M=64) the single-threaded build dominated infer wall clock for
// large corpora; the reference's external FAISS builds parallel.

#include <algorithm>
#include <atomic>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <chrono>
#include <cstring>
#include <fstream>
#include <iostream>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Args {
  std::string dataset_path, id_path, query_path, result_path;
  int top_k = 10;
  int M = 64;
  int ef_construction = 1280;
  int ef_search = 640;
  int metric_type = 0;
  int num_threads = 0;  // 0 = hardware_concurrency
};

Args parse_args(int argc, char** argv) {
  Args a;
  for (int i = 1; i < argc; ++i) {
    std::string s = argv[i];
    auto take = [&](const char* flag, std::string* out) {
      size_t n = std::strlen(flag);
      if (s.compare(0, n, flag) == 0 && s[n] == '=') {
        *out = s.substr(n + 1);
        return true;
      }
      return false;
    };
    std::string v;
    if (take("--dataset_vector_file_path", &a.dataset_path)) continue;
    if (take("--dataset_id_file_path", &a.id_path)) continue;
    if (take("--query_vector_file_path", &a.query_path)) continue;
    if (take("--result_id_file_path", &a.result_path)) continue;
    if (take("--query_ann_top_k", &v)) { a.top_k = std::stoi(v); continue; }
    if (take("--faiss_M", &v)) { a.M = std::stoi(v); continue; }
    if (take("--faiss_ef_construction", &v)) { a.ef_construction = std::stoi(v); continue; }
    if (take("--query_ef_search", &v)) { a.ef_search = std::stoi(v); continue; }
    if (take("--faiss_metric_type", &v)) { a.metric_type = std::stoi(v); continue; }
    if (take("--num_threads", &v)) { a.num_threads = std::stoi(v); continue; }
    std::cerr << "unknown flag: " << s << "\n";
  }
  return a;
}

std::vector<float> read_fbin(const std::string& path, uint32_t* rows,
                             uint32_t* cols) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { std::cerr << "cannot open " << path << "\n"; std::exit(1); }
  f.read(reinterpret_cast<char*>(rows), 4);
  f.read(reinterpret_cast<char*>(cols), 4);
  std::vector<float> data(size_t(*rows) * *cols);
  f.read(reinterpret_cast<char*>(data.data()), data.size() * sizeof(float));
  return data;
}

std::vector<uint64_t> read_u64bin(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { std::cerr << "cannot open " << path << "\n"; std::exit(1); }
  uint32_t rows, cols;
  f.read(reinterpret_cast<char*>(&rows), 4);
  f.read(reinterpret_cast<char*>(&cols), 4);
  std::vector<uint64_t> data(size_t(rows) * cols);
  f.read(reinterpret_cast<char*>(data.data()), data.size() * sizeof(uint64_t));
  return data;
}

// Deterministic per-id uniform double in [0, 1) — the level draw must not
// depend on insertion (thread) order.
double id_uniform(uint64_t id) {
  uint64_t z = id + 0x9e3779b97f4a7c15ull;
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
  z ^= z >> 31;
  return double(z >> 11) * (1.0 / 9007199254740992.0);  // 53-bit mantissa
}

// Per-thread search scratch: visited stamps + a neighbor-copy buffer.
struct Scratch {
  std::vector<uint32_t> visited;
  uint32_t stamp = 0;
  std::vector<uint32_t> nbrs;
  explicit Scratch(size_t n) : visited(n, 0) { nbrs.reserve(256); }
};

class HNSW {
 public:
  HNSW(const float* data, size_t n, size_t dim, int M, int ef_construction,
       int metric)
      : data_(data), n_(n), dim_(dim), M_(M), M0_(2 * M),
        efc_(ef_construction), metric_(metric),
        mult_(1.0 / std::log(double(M))) {
    levels_.resize(n_);
    links_.resize(n_);
    locks_ = std::make_unique<std::mutex[]>(n_ ? n_ : 1);
  }

  // score: larger is better (IP = dot; L2 = -squared distance)
  float score(const float* a, const float* b) const {
    float s = 0.f;
    if (metric_ == 0) {
      for (size_t i = 0; i < dim_; ++i) s += a[i] * b[i];
      return s;
    }
    for (size_t i = 0; i < dim_; ++i) {
      float d = a[i] - b[i];
      s += d * d;
    }
    return -s;
  }
  float score_id(const float* q, uint32_t id) const {
    return score(q, data_ + size_t(id) * dim_);
  }

  void build(unsigned threads) {
    if (n_ == 0) return;
    // point 0 seeds the graph serially; everything after inserts in
    // parallel against the live structure
    {
      Scratch sc(n_);
      add_point(0, level_for(0), sc);
    }
    entry_ = 0;
    max_level_ = levels_[0];
    std::atomic<uint32_t> next{1};
    auto worker = [&]() {
      Scratch sc(n_);
      for (;;) {
        uint32_t i = next.fetch_add(1);
        if (i >= n_) break;
        add_point(i, level_for(i), sc);
      }
    };
    if (threads <= 1 || n_ < 64) {
      worker();
      return;
    }
    std::vector<std::thread> pool;
    for (unsigned t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }

  // best-first search at one layer; returns up to ef (score, id) descending.
  // ``locked``: take the per-node lock when reading neighbor lists (required
  // while concurrent inserts mutate the graph; query-time search passes
  // false — the graph is frozen after build()).
  std::vector<std::pair<float, uint32_t>> search_layer(
      const float* q, uint32_t entry, int level, int ef, Scratch& sc,
      bool locked) const {
    using SP = std::pair<float, uint32_t>;
    std::priority_queue<SP> cand;                       // best first
    std::priority_queue<SP, std::vector<SP>, std::greater<SP>> top;  // worst first
    float se = score_id(q, entry);
    cand.emplace(se, entry);
    top.emplace(se, entry);
    sc.visited[entry] = sc.stamp;
    while (!cand.empty()) {
      auto [cs, cid] = cand.top();
      cand.pop();
      if (!top.empty() && cs < top.top().first && int(top.size()) >= ef) break;
      copy_neighbors(cid, level, locked, sc.nbrs);
      for (uint32_t nb : sc.nbrs) {
        if (sc.visited[nb] == sc.stamp) continue;
        sc.visited[nb] = sc.stamp;
        float s = score_id(q, nb);
        if (int(top.size()) < ef || s > top.top().first) {
          cand.emplace(s, nb);
          top.emplace(s, nb);
          if (int(top.size()) > ef) top.pop();
        }
      }
    }
    std::vector<SP> out;
    out.reserve(top.size());
    while (!top.empty()) { out.push_back(top.top()); top.pop(); }
    std::reverse(out.begin(), out.end());               // descending score
    return out;
  }

  std::vector<uint32_t> search(const float* q, int k, int ef,
                               Scratch& sc) const {
    uint32_t ep = entry_;
    for (int level = max_level_; level > 0; --level) {
      ++sc.stamp;
      auto r = search_layer(q, ep, level, 1, sc, /*locked=*/false);
      if (!r.empty()) ep = r[0].second;
    }
    ++sc.stamp;
    auto r = search_layer(q, ep, 0, std::max(ef, k), sc, /*locked=*/false);
    std::vector<uint32_t> ids;
    for (int i = 0; i < int(r.size()) && i < k; ++i) ids.push_back(r[i].second);
    return ids;
  }

 private:
  int level_for(uint64_t id) const {
    double r = std::max(id_uniform(id), 1e-12);
    return int(-std::log(r) * mult_);
  }

  void copy_neighbors(uint32_t id, int level, bool locked,
                      std::vector<uint32_t>& out) const {
    if (locked) {
      std::lock_guard<std::mutex> g(locks_[id]);
      if (level >= int(links_[id].size())) { out.clear(); return; }
      out = links_[id][level];
      return;
    }
    if (level >= int(links_[id].size())) { out.clear(); return; }
    out = links_[id][level];
  }

  void add_point(uint32_t id, int level, Scratch& sc) {
    {
      // the node's link lists must exist before any other thread can link
      // to it (it becomes reachable only once WE link it below, but the
      // reverse edge push happens under the neighbor's lock first)
      std::lock_guard<std::mutex> g(locks_[id]);
      levels_[id] = level;
      links_[id].assign(level + 1, {});
    }
    if (id == 0) return;
    const float* q = data_ + size_t(id) * dim_;
    uint32_t ep;
    int top_level;
    {
      std::lock_guard<std::mutex> g(global_mu_);
      ep = entry_;
      top_level = max_level_;
    }
    for (int l = top_level; l > level; --l) {
      ++sc.stamp;
      auto r = search_layer(q, ep, l, 1, sc, /*locked=*/true);
      if (!r.empty()) ep = r[0].second;
    }
    for (int l = std::min(level, top_level); l >= 0; --l) {
      ++sc.stamp;
      auto cands = search_layer(q, ep, l, efc_, sc, /*locked=*/true);
      int cap = (l == 0) ? M0_ : M_;
      int m = std::min<int>(M_, cands.size());
      {
        std::lock_guard<std::mutex> g(locks_[id]);
        for (int i = 0; i < m; ++i) links_[id][l].push_back(cands[i].second);
      }
      for (int i = 0; i < m; ++i) {
        uint32_t nb = cands[i].second;
        std::lock_guard<std::mutex> g(locks_[nb]);
        if (l >= int(links_[nb].size())) continue;  // raced a fresh node
        auto& rl = links_[nb][l];
        rl.push_back(id);
        if (int(rl.size()) > cap) prune_locked(nb, l, cap);
      }
      if (!cands.empty()) ep = cands[0].second;
    }
    if (level > top_level) {
      std::lock_guard<std::mutex> g(global_mu_);
      if (level > max_level_) {
        max_level_ = level;
        entry_ = id;
      }
    }
  }

  // caller holds locks_[id]
  void prune_locked(uint32_t id, int level, int cap) {
    auto& nb = links_[id][level];
    const float* v = data_ + size_t(id) * dim_;
    std::vector<std::pair<float, uint32_t>> scored;
    scored.reserve(nb.size());
    for (uint32_t x : nb) scored.emplace_back(score_id(v, x), x);
    std::partial_sort(scored.begin(), scored.begin() + cap, scored.end(),
                      std::greater<>());
    nb.clear();
    for (int i = 0; i < cap; ++i) nb.push_back(scored[i].second);
  }

  const float* data_;
  size_t n_, dim_;
  int M_, M0_, efc_, metric_;
  double mult_;
  std::vector<int> levels_;
  std::vector<std::vector<std::vector<uint32_t>>> links_;
  std::unique_ptr<std::mutex[]> locks_;
  std::mutex global_mu_;
  uint32_t entry_ = 0;
  int max_level_ = 0;
};

}  // namespace

int main(int argc, char** argv) {
  Args a = parse_args(argc, argv);
  uint32_t n, dim, nq, qdim;
  std::vector<float> base = read_fbin(a.dataset_path, &n, &dim);
  std::vector<uint64_t> ids = read_u64bin(a.id_path);
  std::vector<float> queries = read_fbin(a.query_path, &nq, &qdim);
  if (dim != qdim) {
    std::cerr << "dim mismatch: base " << dim << " vs query " << qdim << "\n";
    return 1;
  }
  unsigned hw = a.num_threads > 0
                    ? unsigned(a.num_threads)
                    : std::max(1u, std::thread::hardware_concurrency());
  std::fprintf(stderr,
               "hnsw_tool: n=%u dim=%u nq=%u M=%d efc=%d efs=%d k=%d "
               "metric=%d threads=%u\n",
               n, dim, nq, a.M, a.ef_construction, a.ef_search, a.top_k,
               a.metric_type, hw);

  HNSW index(base.data(), n, dim, a.M, a.ef_construction, a.metric_type);
  auto t0 = std::chrono::steady_clock::now();
  index.build(hw);
  auto build_s = std::chrono::duration<double>(
                     std::chrono::steady_clock::now() - t0).count();
  std::fprintf(stderr, "hnsw_tool: build %.2fs\n", build_s);

  std::vector<uint64_t> result(size_t(nq) * a.top_k, 0);
  std::atomic<uint32_t> next{0};
  auto worker = [&]() {
    Scratch sc(n);
    for (;;) {
      uint32_t qi = next.fetch_add(1);
      if (qi >= nq) break;
      auto top = index.search(queries.data() + size_t(qi) * dim, a.top_k,
                              a.ef_search, sc);
      for (size_t j = 0; j < top.size(); ++j)
        result[size_t(qi) * a.top_k + j] = ids[top[j]];
    }
  };
  std::vector<std::thread> threads;
  for (unsigned t = 0; t < hw; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();

  std::ofstream out(a.result_path, std::ios::binary);
  uint32_t k32 = a.top_k;
  out.write(reinterpret_cast<const char*>(&nq), 4);
  out.write(reinterpret_cast<const char*>(&k32), 4);
  out.write(reinterpret_cast<const char*>(result.data()),
            result.size() * sizeof(uint64_t));
  return 0;
}
