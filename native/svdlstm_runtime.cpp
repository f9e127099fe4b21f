// svdlstm_runtime — dependency-free C++17 streaming inference engine.
//
// The reference exports per-gate CSV weights for a LabVIEW real-time
// consumer (reference code/load_preprocess.py:93-126); this is that
// consumer, rebuilt: it loads the CSV export directory and runs
// state-carrying batch-1 inference, either with dense cells (the v1 NumPy
// semantics, reference code/old_versions/svd_classes.py:25-42) or with the
// exact two-step reduced cells (reference :45-101: wix[:r] = B·x;
// wix[r:] = C·wix[:r]).
//
// Exposed as a C ABI for ctypes (svd_lstm_tpu/io/native.py). Single file,
// no dependencies beyond the C++ standard library.

#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

using Mat = std::vector<std::vector<float>>;  // row-major [rows][cols]

bool load_csv(const std::string& path, Mat* out) {
  FILE* f = std::fopen(path.c_str(), "r");
  if (!f) return false;
  out->clear();
  std::string line;
  char buf[1 << 16];
  while (std::fgets(buf, sizeof(buf), f)) {
    std::vector<float> row;
    char* p = buf;
    while (*p) {
      char* end = nullptr;
      float v = std::strtof(p, &end);
      if (end == p) break;
      row.push_back(v);
      p = end;
      while (*p == ',' || *p == ' ' || *p == '\n' || *p == '\r') ++p;
    }
    if (!row.empty()) out->push_back(std::move(row));
  }
  std::fclose(f);
  return !out->empty();
}

inline float sigmoidf(float x) { return 1.0f / (1.0f + std::exp(-x)); }

// y += M^T x  with M stored (in_dim x out_dim): y[j] += sum_i x[i]*M[i][j]
void accum_xTM(const std::vector<float>& x, const Mat& M, float* y) {
  const size_t rows = M.size(), cols = M[0].size();
  for (size_t i = 0; i < rows; ++i) {
    const float xi = x[i];
    if (xi == 0.0f) continue;
    const std::vector<float>& mrow = M[i];
    for (size_t j = 0; j < cols; ++j) y[j] += xi * mrow[j];
  }
}

struct GatePair {        // two-step factors for one gate: z = [vB, (vB)C]
  Mat B;                 // (in_dim, r)
  Mat C;                 // (r, n - r)  (may have 0 cols when r == n)
};

struct Layer {
  bool reduced = false;
  // dense: W/U per gate (in_dim x n), (n x n)
  Mat W[4], U[4];
  // reduced: per-gate two-step pairs for input and recurrent sides
  GatePair wBC[4], uBC[4];
  std::vector<float> b[4];  // per-gate bias (n)
  int units = 0;
  std::vector<float> h, c;  // state
};

struct Model {
  std::vector<Layer> layers;
  std::vector<float> head_w;  // (n)
  float head_b = 0.0f;
};

const char* kGates = "ifco";

bool load_dense_layer(const std::string& dir, Layer* L, bool transposed) {
  for (int g = 0; g < 4; ++g) {
    Mat W, U, b;
    std::string gs(1, kGates[g]);
    if (!load_csv(dir + "/W" + gs + ".csv", &W)) return false;
    if (!load_csv(dir + "/U" + gs + ".csv", &U)) return false;
    if (!load_csv(dir + "/b" + gs + ".csv", &b)) return false;
    if (transposed) {  // files store (n x in_dim); we want (in_dim x n)
      Mat Wt(W[0].size(), std::vector<float>(W.size()));
      for (size_t i = 0; i < W.size(); ++i)
        for (size_t j = 0; j < W[0].size(); ++j) Wt[j][i] = W[i][j];
      Mat Ut(U[0].size(), std::vector<float>(U.size()));
      for (size_t i = 0; i < U.size(); ++i)
        for (size_t j = 0; j < U[0].size(); ++j) Ut[j][i] = U[i][j];
      W.swap(Wt);
      U.swap(Ut);
    }
    L->W[g] = std::move(W);
    L->U[g] = std::move(U);
    L->b[g].clear();
    for (auto& row : b)
      for (float v : row) L->b[g].push_back(v);
  }
  L->units = static_cast<int>(L->U[0].size());  // U is (n x n)
  L->reduced = false;
  return true;
}

bool load_reduced_layer(const std::string& dir, Layer* L) {
  for (int g = 0; g < 4; ++g) {
    std::string gs(1, kGates[g]);
    if (!load_csv(dir + "/wB" + gs + ".csv", &L->wBC[g].B)) return false;
    if (!load_csv(dir + "/uB" + gs + ".csv", &L->uBC[g].B)) return false;
    // C may be absent (full rank) — treat as 0-column
    Mat C;
    if (load_csv(dir + "/wC" + gs + ".csv", &C)) L->wBC[g].C = C; else L->wBC[g].C.clear();
    C.clear();
    if (load_csv(dir + "/uC" + gs + ".csv", &C)) L->uBC[g].C = C; else L->uBC[g].C.clear();
    Mat b;
    if (!load_csv(dir + "/b" + gs + ".csv", &b)) return false;
    L->b[g].clear();
    for (auto& row : b)
      for (float v : row) L->b[g].push_back(v);
  }
  L->units = static_cast<int>(L->uBC[0].B.size());  // uB is (n x r)
  L->reduced = true;
  return true;
}

// z_g = two_step(v, B, C): first r entries v·B, rest (v·B)·C
void two_step_into(const std::vector<float>& v, const GatePair& p, int n,
                   float* z) {
  const int r = static_cast<int>(p.B[0].size());
  for (int j = 0; j < n; ++j) z[j] = 0.0f;
  accum_xTM(v, p.B, z);  // z[0..r)
  if (!p.C.empty()) {
    std::vector<float> top(z, z + r);
    accum_xTM(top, p.C, z + r);
  }
}

void layer_step(Layer& L, const std::vector<float>& x) {
  const int n = L.units;
  float zg[4 * 4096];  // gate pre-activations, generous cap
  for (int g = 0; g < 4; ++g) {
    float* z = zg + g * n;
    if (L.reduced) {
      std::vector<float> zx(n), zu(n);
      two_step_into(x, L.wBC[g], n, zx.data());
      two_step_into(L.h, L.uBC[g], n, zu.data());
      for (int j = 0; j < n; ++j) z[j] = zx[j] + zu[j] + L.b[g][j];
    } else {
      for (int j = 0; j < n; ++j) z[j] = L.b[g][j];
      accum_xTM(x, L.W[g], z);
      accum_xTM(L.h, L.U[g], z);
    }
  }
  for (int j = 0; j < n; ++j) {
    const float i = sigmoidf(zg[0 * n + j]);
    const float f = sigmoidf(zg[1 * n + j]);
    const float gg = std::tanh(zg[2 * n + j]);
    const float o = sigmoidf(zg[3 * n + j]);
    L.c[j] = f * L.c[j] + i * gg;
    L.h[j] = o * std::tanh(L.c[j]);
  }
}

}  // namespace

extern "C" {

// dirs: colon-separated layer directories, then dense_top dir.
// kind per layer: 'd' dense, 'r' reduced (string, one char per layer).
void* svdlstm_load(const char* base, const char* layer_dirs,
                   const char* kinds, int transposed) {
  auto* m = new Model();
  std::string basedir(base), dirs(layer_dirs), kindstr(kinds);
  size_t pos = 0;
  int li = 0;
  while (pos != std::string::npos && li < static_cast<int>(kindstr.size())) {
    size_t next = dirs.find(':', pos);
    std::string d = basedir + "/" +
        dirs.substr(pos, next == std::string::npos ? next : next - pos);
    Layer L;
    bool ok = (kindstr[li] == 'r') ? load_reduced_layer(d, &L)
                                   : load_dense_layer(d, &L, transposed != 0);
    if (!ok) {
      delete m;
      return nullptr;
    }
    L.h.assign(L.units, 0.0f);
    L.c.assign(L.units, 0.0f);
    m->layers.push_back(std::move(L));
    pos = (next == std::string::npos) ? next : next + 1;
    ++li;
  }
  Mat w, b;
  if (!load_csv(basedir + "/dense_top/weights.csv", &w) ||
      !load_csv(basedir + "/dense_top/bias.csv", &b)) {
    delete m;
    return nullptr;
  }
  for (auto& row : w)
    for (float v : row) m->head_w.push_back(v);
  m->head_b = b[0][0];
  return m;
}

void svdlstm_reset(void* handle) {
  auto* m = static_cast<Model*>(handle);
  for (auto& L : m->layers) {
    std::fill(L.h.begin(), L.h.end(), 0.0f);
    std::fill(L.c.begin(), L.c.end(), 0.0f);
  }
}

// One frame in, one prediction out (state carried inside the handle).
float svdlstm_step(void* handle, const float* frame, int d) {
  auto* m = static_cast<Model*>(handle);
  std::vector<float> x(frame, frame + d);
  for (auto& L : m->layers) {
    layer_step(L, x);
    x = L.h;
  }
  float y = m->head_b;
  for (size_t j = 0; j < m->head_w.size(); ++j) y += x[j] * m->head_w[j];
  return y;
}

// Run a whole sequence: frames row-major (T x d), out (T).
void svdlstm_run(void* handle, const float* frames, int T, int d, float* out) {
  for (int t = 0; t < T; ++t) out[t] = svdlstm_step(handle, frames + t * d, d);
}

void svdlstm_free(void* handle) { delete static_cast<Model*>(handle); }

}  // extern "C"
