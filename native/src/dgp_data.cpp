// Native data-layer runtime for dgps_with_iwvi_tpu.
//
// The reference stack's data path is bayesian_benchmarks (numpy + urllib)
// feeding TF1's native input machinery (bb:bayesian_benchmarks/data.py;
// SURVEY.md §2.5). This library is the TPU rebuild's native equivalent for
// the host-side work that sits OFF the XLA compute path but on the critical
// path of large-N experiment startup and training input:
//
//   * dgp_parse_table:  zero-copy-ish delimited-text parser (CSV/TSV/space)
//                       -> contiguous row-major double matrix. np.loadtxt is
//                       10-100x slower on `year`-scale (515345 x 90) files.
//   * dgp_standardize:  train-stats standardization in one fused pass.
//                       (splitmix64 PRNG keyed by split index).
//                       (xoshiro256**), the gpflow-Minibatch semantics, for
//                       host-driven input pipelines.
//   * dgp_kmeans:       kmeans++ seeding + Lloyd iterations for inducing-
//                       point init on large N (builder fallback path).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: `make -C native` -> native/libdgpdata.so.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- PRNG ----
static inline uint64_t splitmix64(uint64_t* s) {
  uint64_t z = (*s += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

struct Xoshiro {
  uint64_t s[4];
};

static inline uint64_t rotl(uint64_t x, int k) {
  return (x << k) | (x >> (64 - k));
}

static void xoshiro_seed(Xoshiro* g, uint64_t seed) {
  uint64_t sm = seed;
  for (int i = 0; i < 4; i++) g->s[i] = splitmix64(&sm);
}

static inline uint64_t xoshiro_next(Xoshiro* g) {
  const uint64_t result = rotl(g->s[1] * 5, 7) * 9;
  const uint64_t t = g->s[1] << 17;
  g->s[2] ^= g->s[0];
  g->s[3] ^= g->s[1];
  g->s[1] ^= g->s[2];
  g->s[0] ^= g->s[3];
  g->s[2] ^= t;
  g->s[3] = rotl(g->s[3], 45);
  return result;
}

// Lemire's nearly-divisionless bounded draw.
static inline uint64_t bounded(Xoshiro* g, uint64_t n) {
  __uint128_t m = (__uint128_t)xoshiro_next(g) * (__uint128_t)n;
  return (uint64_t)(m >> 64);
}

// -------------------------------------------------------------- parsing ----
// Parse a delimited numeric table. Any of ",;\t " delimits; blank lines and
// lines starting with '#' are skipped. Leading non-numeric lines (column
// headers, as in the UCI wine/protein/kin8nm CSVs) are skipped until the
// first fully-numeric row; after that a non-numeric field is an error.
// Returns 0 on success. On success *out is malloc'd row-major
// [*n_rows x *n_cols]; caller frees via dgp_free. A ragged row -> error 3.
// Non-numeric field after data started -> error 4.
int dgp_parse_table(const char* path, double** out, int64_t* n_rows,
                    int64_t* n_cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf((size_t)size + 1);
  if (fread(buf.data(), 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    return 2;
  }
  fclose(f);
  buf[(size_t)size] = '\0';

  std::vector<double> vals;
  vals.reserve(1 << 20);
  int64_t rows = 0, cols = -1;
  char* p = buf.data();
  char* end = buf.data() + size;
  while (p < end) {
    // one line
    char* line_end = (char*)memchr(p, '\n', (size_t)(end - p));
    if (!line_end) line_end = end;
    *line_end = '\0';
    // skip comments/blank
    char* q = p;
    while (*q == ' ' || *q == '\t' || *q == '\r') q++;
    if (*q != '\0' && *q != '#') {
      int64_t c = 0;
      size_t line_start = vals.size();
      bool bad = false;
      while (*q != '\0') {
        char* next = nullptr;
        double v = strtod(q, &next);
        if (next == q) {
          if (rows == 0) {  // header line before any data: skip it
            vals.resize(line_start);
            bad = true;
            break;
          }
          return 4;
        }
        vals.push_back(v);
        c++;
        q = next;
        while (*q == ',' || *q == ';' || *q == '\t' || *q == ' ' ||
               *q == '\r')
          q++;
      }
      if (!bad) {
        if (cols < 0) cols = c;
        else if (c != cols) return 3;
        rows++;
      }
    }
    p = line_end + 1;
  }
  double* m = (double*)malloc(sizeof(double) * vals.size());
  if (!m) return 5;
  memcpy(m, vals.data(), sizeof(double) * vals.size());
  *out = m;
  *n_rows = rows;
  *n_cols = cols < 0 ? 0 : cols;
  return 0;
}

void dgp_free(void* p) { free(p); }

// -------------------------------------------------------- standardizing ----
// One fused pass: mean/std over the first n_train rows of X [n x d]
// (row-major), then (x - mean) / max(std, eps) applied to ALL rows in
// place. mean/std buffers are caller-provided [d].
void dgp_standardize(double* X, int64_t n, int64_t d, int64_t n_train,
                     double* mean, double* stddev, double eps) {
  for (int64_t j = 0; j < d; j++) {
    mean[j] = 0.0;
    stddev[j] = 0.0;
  }
  for (int64_t i = 0; i < n_train; i++)
    for (int64_t j = 0; j < d; j++) mean[j] += X[i * d + j];
  for (int64_t j = 0; j < d; j++) mean[j] /= (double)n_train;
  for (int64_t i = 0; i < n_train; i++)
    for (int64_t j = 0; j < d; j++) {
      double c = X[i * d + j] - mean[j];
      stddev[j] += c * c;
    }
  for (int64_t j = 0; j < d; j++) {
    stddev[j] = sqrt(stddev[j] / (double)n_train);
    if (stddev[j] <= eps) stddev[j] = 1.0;
  }
  for (int64_t i = 0; i < n; i++)
    for (int64_t j = 0; j < d; j++)
      X[i * d + j] = (X[i * d + j] - mean[j]) / stddev[j];
}

// --------------------------------------------------------------- kmeans ----
// kmeans++ seeding + `iters` Lloyd iterations. X [n x d] row-major,
// centers out [k x d]. Empty clusters keep their previous centre.
void dgp_kmeans(const double* X, int64_t n, int64_t d, int64_t k,
                int64_t iters, uint64_t seed, double* centers) {
  Xoshiro g;
  xoshiro_seed(&g, seed);
  std::vector<double> d2(n);
  std::vector<int64_t> assign(n);
  // k-means++ seeding
  int64_t first = (int64_t)bounded(&g, (uint64_t)n);
  memcpy(centers, X + first * d, sizeof(double) * (size_t)d);
  for (int64_t c = 1; c < k; c++) {
    double total = 0.0;
    for (int64_t i = 0; i < n; i++) {
      double best = 1e300;
      for (int64_t cc = 0; cc < c; cc++) {
        double s = 0.0;
        for (int64_t j = 0; j < d; j++) {
          double diff = X[i * d + j] - centers[cc * d + j];
          s += diff * diff;
        }
        if (s < best) best = s;
      }
      d2[i] = best;
      total += best;
    }
    double r = (double)(xoshiro_next(&g) >> 11) * (1.0 / 9007199254740992.0)
               * total;
    int64_t pick = n - 1;
    double acc = 0.0;
    for (int64_t i = 0; i < n; i++) {
      acc += d2[i];
      if (acc >= r) {
        pick = i;
        break;
      }
    }
    memcpy(centers + c * d, X + pick * d, sizeof(double) * (size_t)d);
  }
  // Lloyd
  std::vector<double> sums((size_t)(k * d));
  std::vector<int64_t> counts((size_t)k);
  for (int64_t it = 0; it < iters; it++) {
    std::fill(sums.begin(), sums.end(), 0.0);
    std::fill(counts.begin(), counts.end(), 0);
    for (int64_t i = 0; i < n; i++) {
      double best = 1e300;
      int64_t bc = 0;
      for (int64_t c = 0; c < k; c++) {
        double s = 0.0;
        for (int64_t j = 0; j < d; j++) {
          double diff = X[i * d + j] - centers[c * d + j];
          s += diff * diff;
        }
        if (s < best) {
          best = s;
          bc = c;
        }
      }
      assign[i] = bc;
      counts[bc]++;
      for (int64_t j = 0; j < d; j++) sums[bc * d + j] += X[i * d + j];
    }
    for (int64_t c = 0; c < k; c++)
      if (counts[c] > 0)
        for (int64_t j = 0; j < d; j++)
          centers[c * d + j] = sums[c * d + j] / (double)counts[c];
  }
}

}  // extern "C"
