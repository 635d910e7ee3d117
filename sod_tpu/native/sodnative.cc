// sodnative — C++ host-side kernels for the sod_tpu framework.
//
// The reference delegates these to external native libraries (SURVEY §2
// native table): pycocotools' C RLE codec (datasets/duts.py:11,
// mask_generator), scipy's C++ Hungarian (criterion pyc 295) and scipy
// ndimage's C connected-components / hole filling
// (bilateral_solver.py:184-185).  This library provides TPU-host-native
// equivalents exposed through a plain C ABI consumed via ctypes
// (sod_tpu/native/__init__.py); every entry point has a NumPy fallback so
// the framework works unbuilt.
//
// Build: `make` in this directory (g++ -O3 -shared).

#include <cstdint>
#include <cstring>
#include <vector>
#include <queue>
#include <limits>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// COCO RLE codec (column-major runs, LEB128-like base-32 strings)
// ---------------------------------------------------------------------------

// mask (row-major h*w, uint8) -> column-major run lengths starting with a
// (possibly zero) run of 0s.  Returns count of runs, or -1 if out of space.
int64_t rle_counts_from_mask(const uint8_t* mask, int64_t h, int64_t w,
                             int64_t* counts, int64_t max_counts) {
  int64_t n = 0;
  uint8_t prev = 0;
  int64_t run = 0;
  for (int64_t c = 0; c < w; ++c) {
    for (int64_t r = 0; r < h; ++r) {
      uint8_t v = mask[r * w + c] ? 1 : 0;
      if (v == prev) {
        ++run;
      } else {
        if (n >= max_counts) return -1;
        counts[n++] = run;
        prev = v;
        run = 1;
      }
    }
  }
  if (n >= max_counts) return -1;
  counts[n++] = run;
  return n;
}

// counts -> row-major mask.  Returns 0 on success, -1 on size mismatch or
// malformed counts (negatives could otherwise sum to h*w while driving
// `pos` out of bounds — defense in depth on top of the Python guard).
int rle_mask_from_counts(const int64_t* counts, int64_t n, uint8_t* mask,
                         int64_t h, int64_t w) {
  int64_t total = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (counts[i] < 0) return -1;
    total += counts[i];
  }
  if (total != h * w) return -1;
  int64_t pos = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint8_t v = (i % 2) ? 1 : 0;
    for (int64_t j = 0; j < counts[i]; ++j, ++pos) {
      int64_t r = pos % h, c = pos / h;   // column-major order
      mask[r * w + c] = v;
    }
  }
  return 0;
}

// counts -> COCO base-32 varint string (delta-coded from i-2 for i > 2).
// Returns string length or -1 if out of space.
int64_t rle_string_from_counts(const int64_t* counts, int64_t n, char* out,
                               int64_t max_len) {
  int64_t p = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t x = counts[i];
    if (i > 2) x -= counts[i - 2];
    bool more = true;
    while (more) {
      int64_t c = x & 0x1f;
      x >>= 5;
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      if (p >= max_len) return -1;
      out[p++] = static_cast<char>(c + 48);
    }
  }
  return p;
}

// COCO string -> counts.  Returns count of runs or -1 if out of space.
int64_t rle_counts_from_string(const char* s, int64_t len, int64_t* counts,
                               int64_t max_counts) {
  int64_t n = 0;
  int64_t i = 0;
  while (i < len) {
    int64_t x = 0;
    int64_t k = 0;
    bool more = true;
    int64_t c = 0;
    while (more && i < len) {
      c = static_cast<int64_t>(s[i]) - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
    }
    if (!more && (c & 0x10)) x |= -1LL << (5 * k);
    if (n > 2) x += counts[n - 2];
    if (n >= max_counts) return -1;
    counts[n++] = x;
  }
  return n;
}

// ---------------------------------------------------------------------------
// Hungarian assignment (Jonker-Volgenant shortest augmenting path)
// ---------------------------------------------------------------------------

// cost: nr x nc row-major, nr <= nc.  col4row: nr entries (0-based column
// per row).  Exact minimum-cost assignment.
void hungarian_solve(const double* cost, int nr, int nc, int* col4row) {
  const double INF = std::numeric_limits<double>::infinity();
  std::vector<double> u(nr + 1, 0.0), v(nc + 1, 0.0);
  std::vector<int> p(nc + 1, 0), way(nc + 1, 0);
  for (int i = 1; i <= nr; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(nc + 1, INF);
    std::vector<char> used(nc + 1, 0);
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = 0;
      double delta = INF;
      for (int j = 1; j <= nc; ++j) {
        if (used[j]) continue;
        double cur = cost[(i0 - 1) * nc + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) { minv[j] = cur; way[j] = j0; }
        if (minv[j] < delta) { delta = minv[j]; j1 = j; }
      }
      for (int j = 0; j <= nc; ++j) {
        if (used[j]) { u[p[j]] += delta; v[j] -= delta; }
        else { minv[j] -= delta; }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  for (int j = 1; j <= nc; ++j)
    if (p[j] > 0) col4row[p[j] - 1] = j - 1;
}

// ---------------------------------------------------------------------------
// Connected components + hole filling (4-connectivity, scipy-compatible)
// ---------------------------------------------------------------------------

// Label foreground components (4-conn), labels start at 1; returns count.
int label_components(const uint8_t* binary, int64_t h, int64_t w,
                     int32_t* labels) {
  std::memset(labels, 0, sizeof(int32_t) * h * w);
  int next = 0;
  std::vector<int64_t> stack;
  for (int64_t start = 0; start < h * w; ++start) {
    if (!binary[start] || labels[start]) continue;
    ++next;
    stack.clear();
    stack.push_back(start);
    labels[start] = next;
    while (!stack.empty()) {
      int64_t cur = stack.back();
      stack.pop_back();
      int64_t r = cur / w, c = cur % w;
      const int64_t nbr[4][2] = {{r - 1, c}, {r + 1, c}, {r, c - 1},
                                 {r, c + 1}};
      for (auto& nb : nbr) {
        int64_t rr = nb[0], cc = nb[1];
        if (rr < 0 || rr >= h || cc < 0 || cc >= w) continue;
        int64_t idx = rr * w + cc;
        if (binary[idx] && !labels[idx]) {
          labels[idx] = next;
          stack.push_back(idx);
        }
      }
    }
  }
  return next;
}

// In-place binary_fill_holes (scipy-compatible: zeros not 4-connected to
// the border become ones).
void fill_holes(uint8_t* binary, int64_t h, int64_t w) {
  std::vector<char> outside(h * w, 0);
  std::vector<int64_t> stack;
  auto push = [&](int64_t r, int64_t c) {
    if (r < 0 || r >= h || c < 0 || c >= w) return;
    int64_t idx = r * w + c;
    if (!binary[idx] && !outside[idx]) {
      outside[idx] = 1;
      stack.push_back(idx);
    }
  };
  for (int64_t c = 0; c < w; ++c) { push(0, c); push(h - 1, c); }
  for (int64_t r = 0; r < h; ++r) { push(r, 0); push(r, w - 1); }
  while (!stack.empty()) {
    int64_t cur = stack.back();
    stack.pop_back();
    int64_t r = cur / w, c = cur % w;
    push(r - 1, c); push(r + 1, c); push(r, c - 1); push(r, c + 1);
  }
  for (int64_t i = 0; i < h * w; ++i)
    if (!binary[i] && !outside[i]) binary[i] = 1;
}

}  // extern "C"
