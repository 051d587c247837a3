// Host-side MSM bucket scheduling: digit recode + per-window counting
// sort.
//
// The balanced-lane MSM engine (ops/msm_balanced.py) needs, per window,
// a stable sort of point indices by bucket digit plus bucket counts.
// numpy's per-window argsort costs 3.5-5.5s per 2^20-point MSM call
// (benchmarks/probe_dispatch_r5.log, msm.host_schedule) — a real slice
// of the prove wall now that the device phases are balanced.  This is
// the O(N)-per-window counting-sort replacement, threaded: recode
// parallel over point ranges (the signed carry chain runs across
// windows *within* one scalar), sort parallel over windows.
//
// The reference gets scheduling for free inside ark-ec's rayon
// Pippenger (SURVEY.md §2.2 MSM row); this is the native piece of the
// TPU build's equivalent.
//
// Layout: scalars are N x L little-endian canonical u16 limbs.  Digits
// are c-bit windows, c <= 16.  In signed mode digits are recoded to
// [-2^(c-1), 2^(c-1)-1] with carry; bucket lane = |d|-1, dead = nb.
// Outputs: order/sgn (K x N), counts (K x (nb+1), last = dead lane).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" void msm_schedule(const uint16_t* limbs, int64_t N, int32_t L,
                             int32_t K, int32_t c, int32_t signed_mode,
                             int32_t* order, int8_t* sgn, int64_t* counts,
                             int32_t nthreads) {
  const int64_t nb = signed_mode ? (1LL << (c - 1)) : (1LL << c);
  const uint32_t cmask = (c == 32) ? 0xffffffffu : ((1u << c) - 1u);
  // lane per (window, point); sign packed in bit 31
  std::vector<int32_t> lane((size_t)K * N);
  if (nthreads < 1) nthreads = 1;

  // ---- recode phase: parallel over point ranges
  auto recode = [&](int64_t i0, int64_t i1) {
    for (int64_t i = i0; i < i1; ++i) {
      const uint16_t* row = limbs + (size_t)i * L;
      int64_t carry = 0;
      for (int32_t k = 0; k < K; ++k) {
        const int64_t bit = (int64_t)k * c;
        const int64_t li = bit >> 4;
        const int32_t off = (int32_t)(bit & 15);
        uint32_t d32 = 0;
        if (li < L) d32 = (uint32_t)row[li] >> off;
        if (off && li + 1 < L) d32 |= (uint32_t)row[li + 1] << (16 - off);
        int64_t d = (int64_t)(d32 & cmask);
        int32_t out;
        if (signed_mode) {
          d += carry;
          carry = 0;
          if (k < K - 1 && d >= (int64_t)nb) {  // nb == 2^(c-1) here
            d -= (1LL << c);
            carry = 1;
          }
          if (d < 0)
            out = (int32_t)(-d - 1) | (int32_t)0x80000000;
          else if (d > 0)
            out = (int32_t)(d - 1);
          else
            out = (int32_t)nb;  // dead
        } else {
          out = d > 0 ? (int32_t)d : (int32_t)nb;  // lane = digit; 0 dead
        }
        lane[(size_t)k * N + i] = out;
      }
    }
  };
  {
    std::vector<std::thread> ts;
    const int64_t per = (N + nthreads - 1) / nthreads;
    for (int32_t t = 0; t < nthreads; ++t) {
      const int64_t i0 = t * per;
      const int64_t i1 = i0 + per < N ? i0 + per : N;
      if (i0 >= i1) break;
      ts.emplace_back(recode, i0, i1);
    }
    for (auto& t : ts) t.join();
  }

  // ---- counting-sort phase: parallel over windows
  auto sortw = [&](int32_t k0, int32_t k1) {
    std::vector<int64_t> pos(nb + 1);
    for (int32_t k = k0; k < k1; ++k) {
      const int32_t* lk = lane.data() + (size_t)k * N;
      int64_t* cnt = counts + (size_t)k * (nb + 1);
      std::memset(cnt, 0, sizeof(int64_t) * (nb + 1));
      for (int64_t i = 0; i < N; ++i) cnt[lk[i] & 0x7fffffff]++;
      int64_t acc = 0;
      for (int64_t b = 0; b <= nb; ++b) {
        pos[b] = acc;
        acc += cnt[b];
      }
      int32_t* ok = order + (size_t)k * N;
      int8_t* sk = sgn + (size_t)k * N;
      for (int64_t i = 0; i < N; ++i) {
        const int32_t v = lk[i];
        const int64_t p = pos[v & 0x7fffffff]++;
        ok[p] = (int32_t)i;
        sk[p] = (v < 0) ? 1 : 0;
      }
    }
  };
  {
    std::vector<std::thread> ts;
    const int32_t per = (K + nthreads - 1) / nthreads;
    for (int32_t t = 0; t < nthreads; ++t) {
      const int32_t k0 = t * per;
      const int32_t k1 = k0 + per < K ? k0 + per : K;
      if (k0 >= k1) break;
      ts.emplace_back(sortw, k0, k1);
    }
    for (auto& t : ts) t.join();
  }
}
