// Native CIDEr-D scorer (CPython extension, no external deps).
//
// The RL stage scores a few hundred sampled captions against cached n-gram
// document frequencies EVERY training step, on the host, between two jit'd
// device phases (see boficap_tpu/train/steps.py).  The pure-python scorer
// costs ~170 ms per step at the reference's RL batch (50 imgs x 5 samples)
// — longer than the device step — so this is the framework's genuine native
// hot spot.  (The reference itself has no native code; its scorer is the
// external pyciderevalcap package.  Semantics here match
// boficap_tpu/rewards/cider.py::CiderD, which is tested against the
// reference's published CIDEr-D definition.)
//
// Captions are space-joined token strings (the id-string form the RL path
// uses, rewards/self_critical.py::array_to_str).  N-grams are hashed with a
// 64-bit FNV-1a over the token bytes with separators; collisions at n<=4,
// vocab ~10k are negligible (and identical between df build and scoring, so
// any collision is at worst a shared-key merge, same as a hash-based python
// dict would suffer).
//
// API (module _ciderd):
//   set_df(keys: list[str], vals: list[float], ref_len: float) -> None
//       install a cached document-frequency table ('' key form: the ngram's
//       space-joined tokens); ref_len = number of corpus images.
//   clear_df() -> None
//   score(cands: list[str], refs: list[list[str]]) -> list[float]
//       CIDEr-D per candidate.  With no installed df, builds corpus df from
//       the refs of THIS call (df mode 'corpus'), exactly like the python
//       scorer.
//   score_ids(cands, cand_width, refs, ref_counts, ref_width, img_idx)
//       -> list[float]
//       Same scores straight from int32 id arrays — no Python id->string
//       building (that serialization was ~1.9 ms of the RL host phase at
//       the reference batch; the reference itself pays it in
//       captioning/utils/rewards.py:33-39 array_to_str).  Tokens are
//       hashed by their DECIMAL DIGITS with the same separator as the
//       string path, so hashes (and cached-df lookups) are bit-identical
//       to score() on array_to_str output.  Shapes:
//         cands      int32 [N, Lc]   candidate rows
//         cand_width int32 [N]      true row width BEFORE any zero padding
//         refs       int32 [M, R, Lr] per-image reference bank
//         ref_counts int32 [M]      refs per image
//         ref_width  int32 [M]      true ref row width per image
//         img_idx    int32 [N]      candidate i scores against image
//                                   img_idx[i]'s refs
//       A row's token sequence stops at the first 0 INCLUSIVE (the
//       array_to_str convention); rows without a 0 inside their true
//       width take every token.  Corpus mode builds df per CANDIDATE
//       (each candidate's ref set counts once, duplicates across
//       candidates of one image count repeatedly) with ref_len = N —
//       exactly the alignment the string path produces.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <array>
#include <cmath>
#include <cstdint>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kN = 4;
constexpr double kSigma = 6.0;

using NgramCounts = std::unordered_map<uint64_t, int>;
using CountsN = std::array<NgramCounts, kN>;

struct Vec {
  std::unordered_map<uint64_t, double> w[kN];
  double norm[kN] = {0, 0, 0, 0};
  int length = 0;
};

struct State {
  std::unordered_map<uint64_t, double> df;
  double log_ref_len = 0.0;
  bool has_df = false;
};

State g_state;

inline uint64_t fnv1a(const char* s, size_t len, uint64_t h) {
  for (size_t i = 0; i < len; ++i) {
    h ^= (unsigned char)s[i];
    h *= 1099511628211ULL;
  }
  return h;
}

// tokenize by spaces; emit (ngram_hash, n_index) counts for n = 1..4
void count_ngrams(const std::string& sent, CountsN& out) {
  std::vector<std::pair<size_t, size_t>> toks;  // (start, len)
  size_t i = 0;
  while (i < sent.size()) {
    while (i < sent.size() && sent[i] == ' ') ++i;
    size_t start = i;
    while (i < sent.size() && sent[i] != ' ') ++i;
    if (i > start) toks.emplace_back(start, i - start);
  }
  const uint64_t seed = 1469598103934665603ULL;
  for (size_t a = 0; a < toks.size(); ++a) {
    uint64_t h = seed;
    for (int n = 0; n < kN && a + n < toks.size(); ++n) {
      h = fnv1a(sent.data() + toks[a + n].first, toks[a + n].second, h);
      h = fnv1a("\x1f", 1, h);  // token separator
      out[n][h] += 1;
    }
  }
}

// hash one int32 token by its decimal digits + the token separator —
// byte-identical to hashing str(int(x)) inside a space-joined sentence
// (count_ngrams tokenizes on spaces, then hashes token bytes + "\x1f")
inline uint64_t hash_token(int32_t v, uint64_t h) {
  char buf[13];  // sign + 10 digits + sep
  int p = 0;
  if (v < 0) {
    buf[p++] = '-';
    // avoid INT_MIN overflow: format via int64
  }
  int64_t a = v < 0 ? -static_cast<int64_t>(v) : v;
  char digits[12];
  int d = 0;
  do {
    digits[d++] = char('0' + (a % 10));
    a /= 10;
  } while (a);
  while (d) buf[p++] = digits[--d];
  h = fnv1a(buf, size_t(p), h);
  return fnv1a("\x1f", 1, h);
}

// token run = row[0:width] truncated at the first 0 INCLUSIVE
// (array_to_str keeps the terminating '0' token)
inline size_t id_run(const int32_t* row, size_t width) {
  for (size_t i = 0; i < width; ++i)
    if (row[i] == 0) return i + 1;
  return width;
}

void count_ngrams_ids(const int32_t* row, size_t width, CountsN& out) {
  const size_t ntok = id_run(row, width);
  const uint64_t seed = 1469598103934665603ULL;
  for (size_t a = 0; a < ntok; ++a) {
    uint64_t h = seed;
    for (int n = 0; n < kN && a + n < ntok; ++n) {
      h = hash_token(row[a + n], h);
      out[n][h] += 1;
    }
  }
}

Vec to_vec(const CountsN& counts, const State& st) {
  Vec v;
  for (int n = 0; n < kN; ++n) {
    for (const auto& kv : counts[n]) {
      auto it = st.df.find(kv.first);
      double df = it == st.df.end() ? 0.0 : it->second;
      double idf = st.log_ref_len - std::log(std::max(1.0, df));
      double w = double(kv.second) * idf;
      v.w[n][kv.first] = w;
      v.norm[n] += w * w;
      if (n == 0) v.length += kv.second;
    }
    v.norm[n] = std::sqrt(v.norm[n]);
  }
  return v;
}

double sim(const Vec& h, const Vec& r) {
  double total = 0.0;
  double delta = double(h.length - r.length);
  double pen = std::exp(-(delta * delta) / (2 * kSigma * kSigma));
  for (int n = 0; n < kN; ++n) {
    double s = 0.0;
    for (const auto& kv : h.w[n]) {
      auto it = r.w[n].find(kv.first);
      if (it != r.w[n].end())
        s += std::min(kv.second, it->second) * it->second;  // D-clipping
    }
    if (h.norm[n] != 0 && r.norm[n] != 0) s /= h.norm[n] * r.norm[n];
    total += s * pen;
  }
  return total / kN;
}

// false (with the Python error indicator set) when o is NULL (a failed
// PyList_GetItem) or not str — the caller must return nullptr, not keep
// going with a silently-empty string and a pending exception
bool pystr(PyObject* o, std::string* out) {
  if (!o) return false;
  Py_ssize_t len;
  const char* s = PyUnicode_AsUTF8AndSize(o, &len);
  if (!s) return false;
  out->assign(s, size_t(len));
  return true;
}

bool check_list(PyObject* o, const char* what) {
  if (PyList_Check(o)) return true;
  PyErr_Format(PyExc_TypeError, "%s must be a list", what);
  return false;
}

PyObject* set_df(PyObject*, PyObject* args) {
  PyObject *keys, *vals;
  double ref_len;
  if (!PyArg_ParseTuple(args, "OOd", &keys, &vals, &ref_len)) return nullptr;
  if (!check_list(keys, "keys") || !check_list(vals, "vals")) return nullptr;
  if (PyList_Size(vals) != PyList_Size(keys)) {
    PyErr_SetString(PyExc_ValueError, "keys and vals length mismatch");
    return nullptr;
  }
  // from here on the old table is gone: any failure must leave the module
  // in explicit corpus mode (has_df=false), never "cached mode, empty df"
  g_state.df.clear();
  g_state.has_df = false;
  Py_ssize_t n = PyList_Size(keys);
  for (Py_ssize_t i = 0; i < n; ++i) {
    std::string k;
    if (!pystr(PyList_GetItem(keys, i), &k)) {
      g_state.df.clear();
      return nullptr;
    }
    double dfv = PyFloat_AsDouble(PyList_GetItem(vals, i));
    if (dfv == -1.0 && PyErr_Occurred()) {
      g_state.df.clear();
      return nullptr;
    }
    // hash the space-joined ngram the same way count_ngrams does
    CountsN tmp;
    count_ngrams(k, tmp);
    // the full ngram = the longest one counted (single hash covering all
    // tokens) — find it in level (ntokens-1)
    int ntok = 0;
    bool in = false;
    for (char c : k) {
      if (c != ' ' && !in) { ++ntok; in = true; }
      if (c == ' ') in = false;
    }
    if (ntok < 1 || ntok > kN) continue;
    // the level (ntok-1) map contains exactly one entry: the whole ngram
    for (const auto& kv : tmp[ntok - 1])
      g_state.df[kv.first] = dfv;
  }
  g_state.log_ref_len = std::log(std::max(ref_len, 1.0));
  g_state.has_df = true;
  Py_RETURN_NONE;
}

PyObject* clear_df(PyObject*, PyObject*) {
  g_state.df.clear();
  g_state.has_df = false;
  Py_RETURN_NONE;
}

PyObject* score(PyObject*, PyObject* args) {
  PyObject *cands, *refs;
  if (!PyArg_ParseTuple(args, "OO", &cands, &refs)) return nullptr;
  if (!check_list(cands, "cands") || !check_list(refs, "refs"))
    return nullptr;
  Py_ssize_t n = PyList_Size(cands);
  if (PyList_Size(refs) != n) {
    PyErr_SetString(PyExc_ValueError, "cands and refs length mismatch");
    return nullptr;
  }

  // pre-count every sentence once
  std::vector<CountsN> cand_counts(n);
  std::vector<std::vector<CountsN>> ref_counts(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    std::string s;
    if (!pystr(PyList_GetItem(cands, i), &s)) return nullptr;
    count_ngrams(s, cand_counts[i]);
    PyObject* rl = PyList_GetItem(refs, i);
    if (!rl || !check_list(rl, "refs[i]")) return nullptr;
    Py_ssize_t m = PyList_Size(rl);
    ref_counts[i].resize(m);
    for (Py_ssize_t j = 0; j < m; ++j) {
      if (!pystr(PyList_GetItem(rl, j), &s)) return nullptr;
      count_ngrams(s, ref_counts[i][j]);
    }
  }

  State local;
  const State* st = &g_state;
  if (!g_state.has_df) {
    // corpus mode: df over THIS call's reference sets (document = image;
    // identical ref lists share hashing so duplicates count per image)
    for (Py_ssize_t i = 0; i < n; ++i) {
      std::unordered_map<uint64_t, char> seen;
      for (auto& rc : ref_counts[i])
        for (int nn = 0; nn < kN; ++nn)
          for (const auto& kv : rc[nn]) seen[kv.first] = 1;
      for (const auto& kv : seen) local.df[kv.first] += 1.0;
    }
    local.log_ref_len = std::log(std::max(double(n), 1.0));
    st = &local;
  }

  PyObject* out = PyList_New(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    Vec hv = to_vec(cand_counts[i], *st);
    double s = 0.0;
    size_t m = ref_counts[i].size();
    for (size_t j = 0; j < m; ++j) s += sim(hv, to_vec(ref_counts[i][j], *st));
    if (m) s /= double(m);
    PyList_SetItem(out, i, PyFloat_FromDouble(s * 10.0));
  }
  return out;
}

// RAII over Py_buffer: every early return releases acquired views
struct BufView {
  Py_buffer view{};
  bool ok = false;
  ~BufView() {
    if (ok) PyBuffer_Release(&view);
  }
  bool acquire(PyObject* o, int ndim_want, const char* what) {
    if (PyObject_GetBuffer(o, &view, PyBUF_C_CONTIGUOUS) != 0) return false;
    ok = true;
    if (view.ndim != ndim_want) {
      PyErr_Format(PyExc_ValueError, "%s must be %d-d, got %d-d", what,
                   ndim_want, view.ndim);
      return false;
    }
    if (view.itemsize != 4) {
      PyErr_Format(PyExc_ValueError, "%s must be int32", what);
      return false;
    }
    return true;
  }
  const int32_t* data() const {
    return static_cast<const int32_t*>(view.buf);
  }
  Py_ssize_t dim(int i) const { return view.shape[i]; }
};

PyObject* score_ids(PyObject*, PyObject* args) {
  PyObject *cands_o, *cw_o, *refs_o, *rc_o, *rw_o, *idx_o;
  if (!PyArg_ParseTuple(args, "OOOOOO", &cands_o, &cw_o, &refs_o, &rc_o,
                        &rw_o, &idx_o))
    return nullptr;
  BufView cands, cw, refs, rc, rw, idx;
  if (!cands.acquire(cands_o, 2, "cands") ||
      !cw.acquire(cw_o, 1, "cand_width") ||
      !refs.acquire(refs_o, 3, "refs") ||
      !rc.acquire(rc_o, 1, "ref_counts") ||
      !rw.acquire(rw_o, 1, "ref_width") || !idx.acquire(idx_o, 1, "img_idx"))
    return nullptr;
  const Py_ssize_t N = cands.dim(0), Lc = cands.dim(1);
  const Py_ssize_t M = refs.dim(0), R = refs.dim(1), Lr = refs.dim(2);
  if (cw.dim(0) != N || idx.dim(0) != N || rc.dim(0) != M ||
      rw.dim(0) != M) {
    PyErr_SetString(PyExc_ValueError, "score_ids shape mismatch");
    return nullptr;
  }

  // count each image's ref set ONCE (the string path re-counts it per
  // candidate — at train_sample_n=5 that is 5x the ref hashing work)
  std::vector<std::vector<CountsN>> ref_counts(M);
  for (Py_ssize_t m = 0; m < M; ++m) {
    int cnt = rc.data()[m];
    int width = rw.data()[m];
    if (cnt < 0 || cnt > R || width < 0 || width > Lr) {
      PyErr_SetString(PyExc_ValueError, "ref_counts/ref_width out of range");
      return nullptr;
    }
    ref_counts[m].resize(cnt);
    for (int j = 0; j < cnt; ++j)
      count_ngrams_ids(refs.data() + (m * R + j) * Lr, size_t(width),
                       ref_counts[m][j]);
  }
  std::vector<CountsN> cand_counts(N);
  for (Py_ssize_t i = 0; i < N; ++i) {
    int width = cw.data()[i];
    int m = idx.data()[i];
    if (width < 0 || width > Lc || m < 0 || m >= M) {
      PyErr_SetString(PyExc_ValueError, "cand_width/img_idx out of range");
      return nullptr;
    }
    count_ngrams_ids(cands.data() + i * Lc, size_t(width), cand_counts[i]);
  }

  State local;
  const State* st = &g_state;
  if (!g_state.has_df) {
    // corpus mode, aligned with score(): df increments once per CANDIDATE
    // per unique ngram of that candidate's ref set; ref_len = N.  The
    // per-image unique set is computed once and added idx-count times.
    std::vector<std::unordered_map<uint64_t, char>> uniq(M);
    std::vector<int> uses(M, 0);
    for (Py_ssize_t i = 0; i < N; ++i) ++uses[idx.data()[i]];
    for (Py_ssize_t m = 0; m < M; ++m) {
      if (!uses[m]) continue;
      for (auto& rcs : ref_counts[m])
        for (int nn = 0; nn < kN; ++nn)
          for (const auto& kv : rcs[nn]) uniq[m][kv.first] = 1;
      for (const auto& kv : uniq[m]) local.df[kv.first] += double(uses[m]);
    }
    local.log_ref_len = std::log(std::max(double(N), 1.0));
    st = &local;
  }

  // ref tf-idf vectors once per image (string path: once per candidate)
  std::vector<std::vector<Vec>> ref_vecs(M);
  for (Py_ssize_t m = 0; m < M; ++m) {
    ref_vecs[m].reserve(ref_counts[m].size());
    for (auto& rcs : ref_counts[m]) ref_vecs[m].push_back(to_vec(rcs, *st));
  }

  PyObject* out = PyList_New(N);
  if (!out) return nullptr;
  for (Py_ssize_t i = 0; i < N; ++i) {
    Vec hv = to_vec(cand_counts[i], *st);
    const auto& rv = ref_vecs[idx.data()[i]];
    double s = 0.0;
    for (const Vec& r : rv) s += sim(hv, r);
    if (!rv.empty()) s /= double(rv.size());
    PyList_SetItem(out, i, PyFloat_FromDouble(s * 10.0));
  }
  return out;
}

PyMethodDef kMethods[] = {
    {"set_df", set_df, METH_VARARGS, "install cached df table"},
    {"clear_df", clear_df, METH_NOARGS, "remove cached df"},
    {"score", score, METH_VARARGS, "CIDEr-D per candidate"},
    {"score_ids", score_ids, METH_VARARGS,
     "CIDEr-D per candidate from int32 id arrays"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_ciderd",
                       "native CIDEr-D scorer", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__ciderd(void) { return PyModule_Create(&kModule); }
