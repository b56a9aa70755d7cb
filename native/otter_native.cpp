// otter-tpu native runtime helpers.
//
// Host-side C++ components complementing the TPU compute path:
//   * banded unit-cost edit distance (the CPU analog of the Pallas kernel;
//     used as the bench baseline and as a host fast path for stragglers)
//   * batch driver with OpenMP-style threading via std::thread
//
// Built as a shared library and bound via ctypes (see otter_tpu/native.py).
// Implements the same Ukkonen-banded recurrence as
// otter_tpu/kernels/edit_pallas.py: band of diagonals |j - i| <= k; a result
// <= k is the exact Levenshtein distance.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>
#include <thread>

namespace {

constexpr int32_t kInf = 1 << 24;

// Banded Levenshtein on raw byte strings. Returns a value <= k iff the true
// distance is <= k (then exact); otherwise a value > k.
int32_t banded_edit(const uint8_t* a, int32_t m, const uint8_t* b, int32_t n,
                    int32_t k, int32_t* work) {
  if (m < n) {  // pattern = longer sequence
    std::swap(a, b);
    std::swap(m, n);
  }
  if (m - n > k) return kInf;
  const int32_t W = 2 * k + 2;
  int32_t* prev = work;
  int32_t* cur = work + W;
  // row 0: D[0][j] = j at band coord w = j + (k+1)
  for (int32_t w = 0; w < W; ++w) {
    const int32_t j = w - (k + 1);
    prev[w] = (j >= 0 && j <= n) ? j : kInf;
  }
  for (int32_t i = 1; i <= m; ++i) {
    const uint8_t ac = a[i - 1];
    const int32_t j_lo = std::max(0, i - k - 1);
    const int32_t j_hi = std::min(n, i + k);
    int32_t left = kInf;  // D[i][j-1]
    for (int32_t w = 0; w < W; ++w) {
      const int32_t j = i + w - (k + 1);
      if (j < j_lo || j > j_hi) {
        cur[w] = kInf;
        if (j == j_lo - 1) left = kInf;
        continue;
      }
      int32_t best;
      if (j == 0) {
        best = i;
      } else {
        const int32_t up = (w + 1 < W) ? prev[w + 1] + 1 : kInf;
        const int32_t diag = prev[w] + (b[j - 1] == ac ? 0 : 1);
        best = std::min(up, diag);
        if (left < kInf && left + 1 < best) best = left + 1;
      }
      cur[w] = best;
      left = best;
    }
    std::swap(prev, cur);
  }
  const int32_t w_final = n - m + (k + 1);
  if (w_final < 0 || w_final >= W) return kInf;
  return prev[w_final];
}

}  // namespace

extern "C" {

// Single pair, adaptive band doubling until exact.
int32_t otter_edit_distance(const uint8_t* a, int32_t m, const uint8_t* b,
                            int32_t n, int64_t* cells) {
  if (m == n && std::memcmp(a, b, m) == 0) return 0;
  int32_t k = 63;
  const int32_t maxlen = std::max(m, n);
  std::vector<int32_t> work;
  for (;;) {
    if (k >= std::abs(m - n)) {
      work.resize(2 * (2 * k + 2));
      const int32_t d = banded_edit(a, m, b, n, k, work.data());
      if (cells) *cells += int64_t(std::max(m, n)) * (2 * k + 2);
      if (d <= k) return d;
    }
    if (k >= maxlen) return std::max(m, n);  // degenerate (empty string)
    k = std::min(maxlen, 2 * k + 1);
  }
}

// Batch of packed pairs. offsets has nb+1 entries into seqs for each of the
// 2*nb sequences laid out pairwise: [a0, b0, a1, b1, ...].
void otter_edit_distance_batch(const uint8_t* seqs, const int64_t* offsets,
                               int32_t n_pairs, int32_t n_threads,
                               int32_t* out, int64_t* cells) {
  if (n_threads < 1) n_threads = 1;
  std::vector<int64_t> cell_acc(n_threads, 0);
  auto worker = [&](int32_t t) {
    for (int32_t p = t; p < n_pairs; p += n_threads) {
      const uint8_t* a = seqs + offsets[2 * p];
      const int32_t m = int32_t(offsets[2 * p + 1] - offsets[2 * p]);
      const uint8_t* b = seqs + offsets[2 * p + 1];
      const int32_t n = int32_t(offsets[2 * p + 2] - offsets[2 * p + 1]);
      out[p] = otter_edit_distance(a, m, b, n, &cell_acc[t]);
    }
  };
  if (n_threads == 1) {
    worker(0);
  } else {
    std::vector<std::thread> threads;
    for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();
  }
  if (cells) {
    int64_t total = 0;
    for (const auto c : cell_acc) total += c;
    *cells += total;
  }
}

}  // extern "C"
