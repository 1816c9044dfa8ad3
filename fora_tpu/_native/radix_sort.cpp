// Parallel LSD radix sort + duplicate-run compaction for the index packer.
//
// pack_index's fast path reduces the whole (bucket, dst, src) ordering +
// duplicate-merge problem to ONE sort of a packed uint64 key per index
// edge [R: build.h index packing — reconstruction, SURVEY.md Sec. 3.3].
// At judged scale that is ~190M keys, and numpy's single-threaded
// introsort-argsort was the 170 s majority of the 258 s build
// (BUILD_r04.json).  An LSD radix sort is O(passes * E) with purely
// sequential memory traffic — memory-bound, not compare-bound — and
// parallelizes over both histogram and scatter phases.
//
// fora_sort_unique_u64(keys, len, key_bits, mult_out, n_threads):
//   1. sorts keys ascending in place (ping-pong scratch buffer),
//   2. compacts equal-key runs in place, writing each run's length to
//      mult_out (caller allocates len floats),
//   3. returns the unique count, or -1 on allocation failure (caller
//      falls back to the numpy path).
//
// Digit width 16 (65536 buckets): 48-bit judged-scale keys sort in 3
// passes (each pass is 2 sequential sweeps of the whole array, so pass
// count is the cost driver); per-thread histograms are 512 KB — L2-
// resident on this host.  A pass whose digit is constant across all keys
// (common for the high bucket bits) skips its scatter sweep entirely.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kDigitBits = 16;
constexpr int kRadix = 1 << kDigitBits;

void histogram_range(const uint64_t* keys, int64_t lo, int64_t hi, int shift,
                     int64_t* hist) {
  std::memset(hist, 0, sizeof(int64_t) * kRadix);
  for (int64_t i = lo; i < hi; ++i)
    ++hist[(keys[i] >> shift) & (kRadix - 1)];
}

void scatter_range(const uint64_t* keys, int64_t lo, int64_t hi, int shift,
                   int64_t* offs, uint64_t* out) {
  for (int64_t i = lo; i < hi; ++i)
    out[offs[(keys[i] >> shift) & (kRadix - 1)]++] = keys[i];
}

}  // namespace

extern "C" {

int64_t fora_sort_unique_u64(uint64_t* keys, int64_t len, int key_bits,
                             float* mult_out, int n_threads) {
  if (len <= 0) return 0;
  uint64_t* scratch =
      static_cast<uint64_t*>(std::malloc(sizeof(uint64_t) * len));
  if (!scratch) return -1;

  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int T = n_threads > 0 ? n_threads : (hw > 0 ? hw : 1);
  if (static_cast<int64_t>(T) > len) T = 1;
  int passes = (key_bits + kDigitBits - 1) / kDigitBits;
  if (passes < 1) passes = 1;

  std::vector<int64_t> bounds(T + 1);
  for (int t = 0; t <= T; ++t) bounds[t] = len * t / T;
  std::vector<int64_t> hist(static_cast<size_t>(T) * kRadix);

  uint64_t* cur = keys;
  uint64_t* nxt = scratch;
  for (int p = 0; p < passes; ++p) {
    int shift = p * kDigitBits;
    // per-thread digit histograms
    {
      std::vector<std::thread> ts;
      for (int t = 0; t < T; ++t)
        ts.emplace_back(histogram_range, cur, bounds[t], bounds[t + 1],
                        shift, hist.data() + static_cast<size_t>(t) * kRadix);
      for (auto& th : ts) th.join();
    }
    // constant-digit pass: every key shares this digit -> scatter is the
    // identity permutation; skip the sweep
    bool constant = false;
    for (int d = 0; d < kRadix; ++d) {
      int64_t c = 0;
      for (int t = 0; t < T; ++t)
        c += hist[static_cast<size_t>(t) * kRadix + d];
      if (c == len) { constant = true; break; }
      if (c != 0) break;
    }
    if (constant) continue;
    // exclusive prefix over (digit major, thread minor): stable scatter
    int64_t sum = 0;
    for (int d = 0; d < kRadix; ++d)
      for (int t = 0; t < T; ++t) {
        int64_t c = hist[static_cast<size_t>(t) * kRadix + d];
        hist[static_cast<size_t>(t) * kRadix + d] = sum;
        sum += c;
      }
    {
      std::vector<std::thread> ts;
      for (int t = 0; t < T; ++t)
        ts.emplace_back(scatter_range, cur, bounds[t], bounds[t + 1], shift,
                        hist.data() + static_cast<size_t>(t) * kRadix, nxt);
      for (auto& th : ts) th.join();
    }
    uint64_t* tmp = cur;
    cur = nxt;
    nxt = tmp;
  }
  if (cur != keys) {  // odd pass count: result sits in scratch
    std::memcpy(keys, cur, sizeof(uint64_t) * len);
  }
  std::free(scratch);

  // compact equal-key runs in place; run lengths -> mult_out
  int64_t u = 0;
  int64_t run = 1;
  for (int64_t i = 1; i < len; ++i) {
    if (keys[i] == keys[u]) {
      ++run;
    } else {
      mult_out[u] = static_cast<float>(run);
      keys[++u] = keys[i];
      run = 1;
    }
  }
  mult_out[u] = static_cast<float>(run);
  return u + 1;
}

}  // extern "C"

namespace {

void pack_range(const int64_t* offsets, const int64_t* counts,
                const int64_t* cut, const int32_t* endpoints, int nq,
                int nb, int64_t v_lo, int64_t v_hi, uint64_t* key_out) {
  for (int64_t v = v_lo; v < v_hi; ++v) {
    int64_t K = counts[v];
    if (!K) continue;
    const int64_t* cv = cut + v * nq;
    const int32_t* ep = endpoints + offsets[v];
    uint64_t* out = key_out + offsets[v];
    uint64_t vbits = static_cast<uint64_t>(v);
    int b = nq - 1;
    for (int64_t j = 0; j < K; ++j) {
      while (b > 0 && j >= cv[b]) --b;  // cutoffs decrease with depth
      out[j] = (static_cast<uint64_t>(b) << (2 * nb)) |
               (static_cast<uint64_t>(static_cast<uint32_t>(ep[j])) << nb) |
               vbits;
    }
  }
}

void unpack_range(const uint64_t* keys, int64_t lo, int64_t hi, int nb,
                  int32_t* src, int32_t* dst, int8_t* bucket) {
  uint64_t mask = (uint64_t(1) << nb) - 1;
  for (int64_t i = lo; i < hi; ++i) {
    uint64_t k = keys[i];
    src[i] = static_cast<int32_t>(k & mask);
    dst[i] = static_cast<int32_t>((k >> nb) & mask);
    bucket[i] = static_cast<int8_t>(k >> (2 * nb));
  }
}

}  // namespace

extern "C" {

// Write the packed (bucket, dst, src) sort keys for every pool entry in
// one parallel pass: the bucket of entry j of node v is the number of
// per-node cutoffs cut[v, 1..nq-1] exceeding j (cutoffs decrease with
// depth), so a per-node descending pointer emits it in O(1) amortized —
// replacing the numpy chain (per-edge prefix sums + int64 shifts/ors over
// [E] temporaries) that was ~35 s of the judged-scale pack on this
// 2-core host.
void fora_pack_keys(const int64_t* offsets, const int64_t* counts,
                    const int64_t* cut, const int32_t* endpoints,
                    int64_t n, int nq, int nb, uint64_t* key_out,
                    int64_t total, int n_threads) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int T = n_threads > 0 ? n_threads : (hw > 0 ? hw : 1);
  if (static_cast<int64_t>(T) > n) T = 1;
  // balance threads by ENTRY count, not node count (power-law pools)
  std::vector<int64_t> vb(T + 1, n);
  vb[0] = 0;
  int64_t v = 0;
  for (int t = 1; t < T; ++t) {
    int64_t target = total * t / T;
    while (v < n && offsets[v] < target) ++v;
    vb[t] = v;
  }
  std::vector<std::thread> ts;
  for (int t = 0; t < T; ++t)
    ts.emplace_back(pack_range, offsets, counts, cut, endpoints, nq, nb,
                    vb[t], vb[t + 1], key_out);
  for (auto& th : ts) th.join();
}

// Split sorted unique keys back into (src i32, dst i32, bucket i8) in one
// parallel pass (three numpy int64 mask/shift passes were ~24 s at 210M
// unique keys).
void fora_unpack_keys(const uint64_t* keys, int64_t len, int nb,
                      int32_t* src, int32_t* dst, int8_t* bucket,
                      int n_threads) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int T = n_threads > 0 ? n_threads : (hw > 0 ? hw : 1);
  if (static_cast<int64_t>(T) > len) T = 1;
  std::vector<std::thread> ts;
  for (int t = 0; t < T; ++t)
    ts.emplace_back(unpack_range, keys, len * t / T, len * (t + 1) / T,
                    nb, src, dst, bucket);
  for (auto& th : ts) th.join();
}

}  // extern "C"
