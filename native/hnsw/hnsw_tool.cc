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
// Build is single-threaded; search parallelizes over queries.

#include <algorithm>
#include <atomic>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
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

class HNSW {
 public:
  HNSW(const float* data, size_t n, size_t dim, int M, int ef_construction,
       int metric)
      : data_(data), n_(n), dim_(dim), M_(M), M0_(2 * M),
        efc_(ef_construction), metric_(metric),
        mult_(1.0 / std::log(double(M))), rng_(42) {
    levels_.resize(n_);
    links_.resize(n_);
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

  void build() {
    if (n_ == 0) return;
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    visited_.assign(n_, 0);
    add_point(0, 0);
    entry_ = 0;
    max_level_ = 0;
    for (uint32_t i = 1; i < n_; ++i) {
      double r = uni(rng_);
      int level = int(-std::log(std::max(r, 1e-12)) * mult_);
      add_point(i, level);
    }
  }

  // best-first search at one layer; returns up to ef (score, id) descending
  std::vector<std::pair<float, uint32_t>> search_layer(
      const float* q, uint32_t entry, int level, int ef,
      std::vector<uint32_t>& visited, uint32_t stamp) const {
    using SP = std::pair<float, uint32_t>;
    std::priority_queue<SP> cand;                       // best first
    std::priority_queue<SP, std::vector<SP>, std::greater<SP>> top;  // worst first
    float se = score_id(q, entry);
    cand.emplace(se, entry);
    top.emplace(se, entry);
    visited[entry] = stamp;
    while (!cand.empty()) {
      auto [cs, cid] = cand.top();
      cand.pop();
      if (!top.empty() && cs < top.top().first && int(top.size()) >= ef) break;
      for (uint32_t nb : neighbors(cid, level)) {
        if (visited[nb] == stamp) continue;
        visited[nb] = stamp;
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
                               std::vector<uint32_t>& visited,
                               uint32_t* stamp) const {
    uint32_t ep = entry_;
    for (int level = max_level_; level > 0; --level) {
      ++*stamp;
      auto r = search_layer(q, ep, level, 1, visited, *stamp);
      if (!r.empty()) ep = r[0].second;
    }
    ++*stamp;
    auto r = search_layer(q, ep, 0, std::max(ef, k), visited, *stamp);
    std::vector<uint32_t> ids;
    for (int i = 0; i < int(r.size()) && i < k; ++i) ids.push_back(r[i].second);
    return ids;
  }

 private:
  const std::vector<uint32_t>& neighbors(uint32_t id, int level) const {
    return links_[id][level];
  }

  void add_point(uint32_t id, int level) {
    levels_[id] = level;
    links_[id].assign(level + 1, {});
    if (id == 0) return;
    const float* q = data_ + size_t(id) * dim_;
    uint32_t ep = entry_;
    for (int l = max_level_; l > level; --l) {
      ++stamp_;
      auto r = search_layer(q, ep, l, 1, visited_, stamp_);
      if (!r.empty()) ep = r[0].second;
    }
    for (int l = std::min(level, max_level_); l >= 0; --l) {
      ++stamp_;
      auto cands = search_layer(q, ep, l, efc_, visited_, stamp_);
      int cap = (l == 0) ? M0_ : M_;
      int m = std::min<int>(M_, cands.size());
      for (int i = 0; i < m; ++i) {
        uint32_t nb = cands[i].second;
        links_[id][l].push_back(nb);
        auto& rl = links_[nb][l];
        rl.push_back(id);
        if (int(rl.size()) > cap) prune(nb, l, cap);
      }
      if (!cands.empty()) ep = cands[0].second;
    }
    if (level > max_level_) {
      max_level_ = level;
      entry_ = id;
    }
  }

  void prune(uint32_t id, int level, int cap) {
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
  std::mt19937_64 rng_;
  std::vector<int> levels_;
  std::vector<std::vector<std::vector<uint32_t>>> links_;
  uint32_t entry_ = 0;
  int max_level_ = 0;
  std::vector<uint32_t> visited_;
  uint32_t stamp_ = 0;
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
  std::fprintf(stderr, "hnsw_tool: n=%u dim=%u nq=%u M=%d efc=%d efs=%d k=%d metric=%d\n",
               n, dim, nq, a.M, a.ef_construction, a.ef_search, a.top_k,
               a.metric_type);

  HNSW index(base.data(), n, dim, a.M, a.ef_construction, a.metric_type);
  index.build();

  std::vector<uint64_t> result(size_t(nq) * a.top_k, 0);
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<uint32_t> next{0};
  auto worker = [&]() {
    std::vector<uint32_t> visited(n, 0);
    uint32_t stamp = 0;
    for (;;) {
      uint32_t qi = next.fetch_add(1);
      if (qi >= nq) break;
      auto top = index.search(queries.data() + size_t(qi) * dim, a.top_k,
                              a.ef_search, visited, &stamp);
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
