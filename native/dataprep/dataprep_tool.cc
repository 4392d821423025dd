// dataprep_tool — threaded seq.jsonl -> packed train arrays converter.
//
// Native counterpart of the Python PackedCache builder
// (tencent_recommendation_2025_tpu/data/cached_dataset.py): runs the
// reference's train-sample construction (model/BaseLine/dataset.py:96-169 —
// user tokens prepended, item tokens appended, left-pad to maxlen+1,
// positives at positions whose next token is an item) once per user and
// writes the fixed fields as raw little-endian int32 arrays [U, ...] plus a
// CSR of each user's seen-item set (for negative rejection sampling, which
// stays dynamic per epoch on the Python side).
//
// One user per jsonl line; lines are parsed in parallel (each thread owns a
// stripe of lines and pwrites finished rows at the user's file offset, so
// memory stays O(threads * row), not O(users)).
//
// Usage:
//   dataprep_tool --seq seq.jsonl --schema schema.json --out dir \
//                 --maxlen 101 [--threads N]
//
// schema.json (written by the Python wrapper from data/schema.py):
//   {"user_sparse": ["103",...], "item_sparse": [...],
//    "user_array": [...], "item_array": [...], "array_cap": 8}

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <map>
#include <memory>
#include <sys/mman.h>
#include <set>
#include <string>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

// ---------------------------------------------------------------- JSON ----
// Minimal recursive-descent parser for the value shapes the data release
// uses: null, integers, strings, arrays, objects. Unknown scalar types
// (floats, bools) parse to integers via truncation / 0-1.
struct JValue {
  enum Kind { NUL, INT, STR, ARR, OBJ } kind = NUL;
  int64_t i = 0;
  std::string s;
  std::vector<JValue> arr;
  std::vector<std::pair<std::string, JValue>> obj;  // insertion order

  const JValue* find(const std::string& key) const {
    for (const auto& kv : obj)
      if (kv.first == key) return &kv.second;
    return nullptr;
  }
};

struct JParser {
  const char* p;
  const char* end;
  explicit JParser(const char* s, size_t n) : p(s), end(s + n) {}

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }
  bool lit(const char* s) {
    size_t n = strlen(s);
    if (size_t(end - p) >= n && memcmp(p, s, n) == 0) { p += n; return true; }
    return false;
  }

  JValue parse() {
    skip_ws();
    JValue v;
    if (p >= end) return v;
    char c = *p;
    if (c == 'n') { lit("null"); return v; }
    if (c == 't') { lit("true"); v.kind = JValue::INT; v.i = 1; return v; }
    if (c == 'f') { lit("false"); v.kind = JValue::INT; v.i = 0; return v; }
    if (c == '"') { v.kind = JValue::STR; v.s = parse_string(); return v; }
    if (c == '[') {
      v.kind = JValue::ARR;
      ++p; skip_ws();
      if (p < end && *p == ']') { ++p; return v; }
      while (p < end) {
        v.arr.push_back(parse());
        skip_ws();
        if (p < end && *p == ',') { ++p; continue; }
        if (p < end && *p == ']') { ++p; break; }
        break;  // malformed; stop
      }
      return v;
    }
    if (c == '{') {
      v.kind = JValue::OBJ;
      ++p; skip_ws();
      if (p < end && *p == '}') { ++p; return v; }
      while (p < end) {
        skip_ws();
        std::string key = (*p == '"') ? parse_string() : std::string();
        skip_ws();
        if (p < end && *p == ':') ++p;
        v.obj.emplace_back(std::move(key), parse());
        skip_ws();
        if (p < end && *p == ',') { ++p; continue; }
        if (p < end && *p == '}') { ++p; break; }
        break;
      }
      return v;
    }
    // number (int or float; floats truncate — the release uses ints)
    v.kind = JValue::INT;
    bool neg = false;
    if (c == '-') { neg = true; ++p; }
    int64_t acc = 0;
    while (p < end && *p >= '0' && *p <= '9') acc = acc * 10 + (*p++ - '0');
    if (p < end && (*p == '.' || *p == 'e' || *p == 'E')) {
      // consume the fractional/exponent tail, keep the integer part
      while (p < end && *p != ',' && *p != ']' && *p != '}' && *p != ' ')
        ++p;
    }
    v.i = neg ? -acc : acc;
    return v;
  }

  std::string parse_string() {
    std::string out;
    ++p;  // opening quote
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) {
        ++p;
        switch (*p) {
          case 'n': out.push_back('\n'); break;
          case 't': out.push_back('\t'); break;
          case 'r': out.push_back('\r'); break;
          case 'u':  // \uXXXX: keep the raw escape (ids never use it)
            out.push_back('?');
            p += std::min<ptrdiff_t>(4, end - p - 1);
            break;
          default: out.push_back(*p);
        }
        ++p;
      } else {
        out.push_back(*p++);
      }
    }
    if (p < end) ++p;  // closing quote
    return out;
  }
};

// ------------------------------------------------------------- schema ----
struct Schema {
  std::vector<std::string> user_sparse, item_sparse, user_array, item_array;
  int array_cap = 8;
};

Schema load_schema(const std::string& path) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(2); }
  std::string buf;
  char tmp[4096];
  size_t n;
  while ((n = fread(tmp, 1, sizeof tmp, f)) > 0) buf.append(tmp, n);
  fclose(f);
  JParser jp(buf.data(), buf.size());
  JValue v = jp.parse();
  Schema s;
  auto ids = [&](const char* key, std::vector<std::string>* out) {
    const JValue* a = v.find(key);
    if (!a || a->kind != JValue::ARR) return;
    for (const auto& e : a->arr) out->push_back(e.s);
  };
  ids("user_sparse", &s.user_sparse);
  ids("item_sparse", &s.item_sparse);
  ids("user_array", &s.user_array);
  ids("item_array", &s.item_array);
  if (const JValue* c = v.find("array_cap")) s.array_cap = int(c->i);
  return s;
}

// cold-start rule: string-valued features become 0
// (reference dataset.py:309-327 / featurizer._clean_value)
inline int32_t clean_value(const JValue& v) {
  return v.kind == JValue::INT ? int32_t(v.i) : 0;
}

void pack_feat(const JValue* feat, const std::vector<std::string>& sparse_ids,
               const std::vector<std::string>& array_ids, int cap,
               int32_t* sp, int32_t* ar) {
  // sp [NS], ar [NA * cap] — caller pre-zeroed
  if (!feat || feat->kind != JValue::OBJ) return;
  for (size_t j = 0; j < sparse_ids.size(); ++j) {
    if (const JValue* v = feat->find(sparse_ids[j])) sp[j] = clean_value(*v);
  }
  for (size_t j = 0; j < array_ids.size(); ++j) {
    const JValue* v = feat->find(array_ids[j]);
    if (!v || v->kind != JValue::ARR) continue;
    int k = 0;
    for (const auto& e : v->arr) {
      if (k >= cap) break;
      ar[j * cap + k++] = clean_value(e);
    }
  }
}

// ------------------------------------------------------------- fields ----
struct Field {
  std::string name;
  int64_t row_elems;  // int32 elements per user row
  int fd = -1;
};

struct SeenSet {
  std::vector<int32_t> items;  // sorted unique
};

struct Job {
  const Schema* schema;
  int maxlen;
  std::vector<Field>* fields;
  std::vector<SeenSet>* seen;
};

// one user line -> packed rows, pwritten at the user's offsets
void process_user(const Job& job, int64_t uid, const char* line, size_t len) {
  const Schema& sch = *job.schema;
  const int L = job.maxlen + 1;
  const int cap = sch.array_cap;
  const int nis = int(sch.item_sparse.size());
  const int nia = int(sch.item_array.size());
  const int nus = int(sch.user_sparse.size());
  const int nua = int(sch.user_array.size());

  JParser jp(line, len);
  JValue records = jp.parse();

  // ext-sequence interleave (reference dataset.py:115-121): user-profile
  // tokens insert at the FRONT (reversed among themselves), items append
  struct Tok {
    int32_t id;
    const JValue* feat;
    int32_t type;       // 1 item / 2 user
    int32_t act;        // action_type (-1 == null)
  };
  std::vector<Tok> ext;
  size_t n_front = 0;  // user tokens inserted so far (at the front)
  if (records.kind == JValue::ARR) {
    ext.reserve(records.arr.size());
    for (const auto& r : records.arr) {
      if (r.kind != JValue::ARR || r.arr.size() < 5) continue;
      const JValue& u = r.arr[0];
      const JValue& i = r.arr[1];
      const JValue& ufeat = r.arr[2];
      const JValue& ifeat = r.arr[3];
      const JValue& act = r.arr[4];
      int32_t actv = act.kind == JValue::INT ? int32_t(act.i) : -1;
      bool u_ok = u.kind == JValue::INT && u.i != 0 &&
                  ufeat.kind == JValue::OBJ && !ufeat.obj.empty();
      bool i_ok = i.kind == JValue::INT && i.i != 0 &&
                  ifeat.kind == JValue::OBJ && !ifeat.obj.empty();
      if (u_ok) {
        ext.insert(ext.begin() + n_front++,
                   Tok{int32_t(u.i), &ufeat, 2, actv});
      }
      if (i_ok) ext.push_back(Tok{int32_t(i.i), &ifeat, 1, actv});
    }
  }
  // NOTE: reference inserts each user token at index 0 (so consecutive user
  // records end up reversed). insert-at-n_front keeps arrival order instead;
  // real data has exactly ONE user-profile record per line, where the two
  // agree. Match the reference exactly for the multi-record case:
  std::reverse(ext.begin(), ext.begin() + n_front);

  // row buffers (pre-zeroed)
  std::vector<int32_t> seq(L, 0), pos(L, 0), tt(L, 0), ntt(L, 0), nat(L, 0);
  std::vector<int32_t> sis(size_t(L) * nis, 0), sia(size_t(L) * nia * cap, 0);
  std::vector<int32_t> sus(size_t(L) * nus, 0), sua(size_t(L) * nua * cap, 0);
  std::vector<int32_t> pis(size_t(L) * nis, 0), pia(size_t(L) * nia * cap, 0);

  std::set<int32_t> seen;
  for (const auto& t : ext)
    if (t.type == 1 && t.id) seen.insert(t.id);

  if (!ext.empty()) {
    const Tok* nxt = &ext.back();
    int idx = job.maxlen;
    for (int64_t r = int64_t(ext.size()) - 2; r >= 0 && idx >= 0; --r) {
      const Tok& tok = ext[size_t(r)];
      seq[idx] = tok.id;
      tt[idx] = tok.type;
      ntt[idx] = nxt->type;
      if (nxt->act >= 0) nat[idx] = nxt->act;
      if (tok.type == 1) {
        pack_feat(tok.feat, sch.item_sparse, sch.item_array, cap,
                  &sis[size_t(idx) * nis], &sia[size_t(idx) * nia * cap]);
      } else {
        pack_feat(tok.feat, sch.user_sparse, sch.user_array, cap,
                  &sus[size_t(idx) * nus], &sua[size_t(idx) * nua * cap]);
      }
      if (nxt->type == 1 && nxt->id != 0) {
        pos[idx] = nxt->id;
        pack_feat(nxt->feat, sch.item_sparse, sch.item_array, cap,
                  &pis[size_t(idx) * nis], &pia[size_t(idx) * nia * cap]);
      }
      nxt = &tok;
      --idx;
    }
  }

  // pwrite each field row at the user's offset
  const int32_t* rows[11] = {seq.data(), pos.data(), tt.data(), ntt.data(),
                             nat.data(), sis.data(), sia.data(), sus.data(),
                             sua.data(), pis.data(), pia.data()};
  for (int f = 0; f < 11; ++f) {
    const Field& fld = (*job.fields)[size_t(f)];
    ssize_t bytes = ssize_t(fld.row_elems) * 4;
    if (pwrite(fld.fd, rows[f], size_t(bytes),
               off_t(uid) * bytes) != bytes) {
      fprintf(stderr, "pwrite failed for %s\n", fld.name.c_str());
      exit(3);
    }
  }
  auto& out = (*job.seen)[size_t(uid)];
  out.items.assign(seen.begin(), seen.end());
}

}  // namespace

int main(int argc, char** argv) {
  std::string seq_path, schema_path, out_dir;
  int maxlen = 101;
  int threads = int(std::thread::hardware_concurrency());
  for (int a = 1; a + 1 < argc; a += 2) {
    std::string k = argv[a];
    if (k == "--seq") seq_path = argv[a + 1];
    else if (k == "--schema") schema_path = argv[a + 1];
    else if (k == "--out") out_dir = argv[a + 1];
    else if (k == "--maxlen") maxlen = atoi(argv[a + 1]);
    else if (k == "--threads") threads = atoi(argv[a + 1]);
  }
  if (seq_path.empty() || schema_path.empty() || out_dir.empty()) {
    fprintf(stderr,
            "usage: dataprep_tool --seq seq.jsonl --schema schema.json "
            "--out dir --maxlen N [--threads T]\n");
    return 1;
  }
  Schema schema = load_schema(schema_path);
  const int L = maxlen + 1;
  const int cap = schema.array_cap;
  const int64_t nis = int64_t(schema.item_sparse.size());
  const int64_t nia = int64_t(schema.item_array.size());
  const int64_t nus = int64_t(schema.user_sparse.size());
  const int64_t nua = int64_t(schema.user_array.size());

  // mmap the jsonl and index line offsets (one user per line). mmap, not
  // read-into-memory: at the 100M-user scale the jsonl is tens of GB, and
  // the file is only scanned sequentially — the page cache keeps resident
  // memory bounded, preserving the O(threads * row) claim above
  int seq_fd = open(seq_path.c_str(), O_RDONLY);
  if (seq_fd < 0) {
    fprintf(stderr, "cannot open %s\n", seq_path.c_str());
    return 2;
  }
  off_t fsize = lseek(seq_fd, 0, SEEK_END);
  const char* fdata = static_cast<const char*>(
      mmap(nullptr, size_t(fsize), PROT_READ, MAP_PRIVATE, seq_fd, 0));
  if (fdata == MAP_FAILED) { fprintf(stderr, "mmap failed\n"); return 2; }
  madvise(const_cast<char*>(fdata), size_t(fsize), MADV_SEQUENTIAL);
  struct DataView {
    const char* p;
    size_t n;
    char operator[](size_t i) const { return p[i]; }
    size_t size() const { return n; }
    const char* data() const { return p; }
  } data{fdata, size_t(fsize)};
  std::vector<std::pair<size_t, size_t>> lines;  // (start, len)
  size_t start = 0;
  for (size_t i2 = 0; i2 < data.size(); ++i2) {
    if (data[i2] == '\n') {
      if (i2 > start) lines.emplace_back(start, i2 - start);
      start = i2 + 1;
    }
  }
  if (start < data.size()) lines.emplace_back(start, data.size() - start);
  const int64_t U = int64_t(lines.size());

  // create output files at final size
  std::vector<Field> fields = {
      {"seq", L}, {"pos", L}, {"token_type", L}, {"next_token_type", L},
      {"next_action_type", L}, {"seq_item_sparse", L * nis},
      {"seq_item_array", L * nia * cap}, {"seq_user_sparse", L * nus},
      {"seq_user_array", L * nua * cap}, {"pos_item_sparse", L * nis},
      {"pos_item_array", L * nia * cap}};
  for (auto& fld : fields) {
    std::string path = out_dir + "/" + fld.name + ".bin";
    fld.fd = open(path.c_str(), O_CREAT | O_TRUNC | O_WRONLY, 0644);
    if (fld.fd < 0) { fprintf(stderr, "open %s\n", path.c_str()); return 2; }
    if (ftruncate(fld.fd, off_t(U) * fld.row_elems * 4) != 0) {
      fprintf(stderr, "ftruncate %s\n", fld.name.c_str());
      return 2;
    }
  }

  std::vector<SeenSet> seen(static_cast<size_t>(U));
  Job job{&schema, maxlen, &fields, &seen};

  std::atomic<int64_t> next{0};
  auto worker = [&]() {
    for (;;) {
      int64_t uid = next.fetch_add(1);
      if (uid >= U) break;
      process_user(job, uid, data.data() + lines[size_t(uid)].first,
                   lines[size_t(uid)].second);
    }
  };
  std::vector<std::thread> pool;
  threads = std::max(1, std::min<int>(threads, 64));
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  for (auto& fld : fields) close(fld.fd);

  // seen-item CSR: values int32, offsets int64 [U+1]
  {
    std::string vp = out_dir + "/seen_values.bin";
    std::string op = out_dir + "/seen_offsets.bin";
    FILE* vf = fopen(vp.c_str(), "wb");
    FILE* of = fopen(op.c_str(), "wb");
    if (!vf || !of) { fprintf(stderr, "open seen files\n"); return 2; }
    int64_t off = 0;
    fwrite(&off, 8, 1, of);
    for (const auto& s : seen) {
      if (!s.items.empty())
        fwrite(s.items.data(), 4, s.items.size(), vf);
      off += int64_t(s.items.size());
      fwrite(&off, 8, 1, of);
    }
    fclose(vf);
    fclose(of);
  }

  // meta
  {
    std::string mp = out_dir + "/meta.json";
    FILE* mf = fopen(mp.c_str(), "wb");
    fprintf(mf,
            "{\"num_users\": %lld, \"maxlen\": %d, \"L\": %d, "
            "\"array_cap\": %d, \"nis\": %lld, \"nia\": %lld, "
            "\"nus\": %lld, \"nua\": %lld}\n",
            (long long)U, maxlen, L, cap, (long long)nis, (long long)nia,
            (long long)nus, (long long)nua);
    fclose(mf);
  }
  fprintf(stderr, "dataprep: %lld users packed (L=%d, %d threads)\n",
          (long long)U, L, threads);
  return 0;
}
