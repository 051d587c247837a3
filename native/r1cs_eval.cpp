// Host-side R1CS sparse-matrix evaluation engine.
//
// The Groth16 prover's host-side serial bottleneck (SURVEY.md §3.4 step 2)
// is evaluating <A_row, z>, <B_row, z>, <C_row, z> over F_r for millions of
// nonzeros; the reference gets this from arkworks' Rust core.  This is the
// TPU build's native equivalent: 4x64-limb Montgomery arithmetic (CIOS,
// __int128) over any <=256-bit prime, driven through ctypes from
// contangle_zkcp_tpu.r1cs.native.
//
// Layout: field elements are 4 little-endian u64 limbs.  The caller passes
// the modulus, R^2 mod p and -p^{-1} mod 2^64; values cross the boundary in
// canonical (non-Montgomery) form.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

typedef unsigned __int128 u128;

struct Fp256 {
  uint64_t p[4];
  uint64_t r2[4];
  uint64_t n0inv;
};

static inline int geq(const uint64_t a[4], const uint64_t b[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] > b[i]) return 1;
    if (a[i] < b[i]) return 0;
  }
  return 1;
}

static inline void sub_p(uint64_t a[4], const uint64_t p[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - p[i] - (uint64_t)borrow;
    a[i] = (uint64_t)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

static inline void add_mod(uint64_t out[4], const uint64_t a[4],
                           const uint64_t b[4], const uint64_t p[4]) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a[i] + b[i] + (uint64_t)carry;
    out[i] = (uint64_t)s;
    carry = s >> 64;
  }
  if (carry || geq(out, p)) sub_p(out, p);
}

// CIOS Montgomery multiply: out = a*b*R^-1 mod p
static void mont_mul(uint64_t out[4], const uint64_t a[4], const uint64_t b[4],
                     const Fp256 *f) {
  uint64_t t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)t[j] + (u128)a[i] * b[j] + (uint64_t)carry;
      t[j] = (uint64_t)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + (uint64_t)carry;
    t[4] = (uint64_t)cur;
    t[5] = (uint64_t)(cur >> 64);

    uint64_t m = t[0] * f->n0inv;
    carry = 0;
    {
      u128 c0 = (u128)t[0] + (u128)m * f->p[0];
      carry = c0 >> 64;
    }
    for (int j = 1; j < 4; ++j) {
      u128 cur2 = (u128)t[j] + (u128)m * f->p[j] + (uint64_t)carry;
      t[j - 1] = (uint64_t)cur2;
      carry = cur2 >> 64;
    }
    u128 cur3 = (u128)t[4] + (uint64_t)carry;
    t[3] = (uint64_t)cur3;
    t[4] = t[5] + (uint64_t)(cur3 >> 64);
    t[5] = 0;
  }
  uint64_t res[4] = {t[0], t[1], t[2], t[3]};
  if (t[4] || geq(res, f->p)) sub_p(res, f->p);
  memcpy(out, res, sizeof(res));
}

extern "C" {

// out[nrows] = per-row dot products of a COO matrix with z (canonical in,
// canonical out).  rows must be < nrows; entries may be unsorted.
void r1cs_eval_rows(const uint64_t *p_limbs, const uint64_t *r2_limbs,
                    uint64_t n0inv, const uint32_t *rows, const uint32_t *cols,
                    const uint64_t *coeffs /* nnz*4, canonical */, int64_t nnz,
                    const uint64_t *z /* nz*4, canonical */, int64_t nz,
                    uint64_t *out /* nrows*4, zeroed by callee */,
                    int64_t nrows) {
  Fp256 f;
  memcpy(f.p, p_limbs, 32);
  memcpy(f.r2, r2_limbs, 32);
  f.n0inv = n0inv;

  // z into Montgomery form once
  uint64_t *zm = new uint64_t[nz * 4];
  for (int64_t i = 0; i < nz; ++i) mont_mul(zm + 4 * i, z + 4 * i, f.r2, &f);

  memset(out, 0, (size_t)nrows * 32);
  uint64_t prod[4];
  for (int64_t k = 0; k < nnz; ++k) {
    // coeff (canonical) * z_mont = (coeff * z * R) * R^-1 = coeff*z  — one
    // Montgomery multiply lands directly in canonical form.
    mont_mul(prod, coeffs + 4 * k, zm + 4 * cols[k], &f);
    add_mod(out + 4 * rows[k], out + 4 * rows[k], prod, f.p);
  }
  delete[] zm;
}

// Three-matrix evaluation sharing one z->Montgomery conversion, threaded.
//
// rows of each COO must be sorted ascending (the r1cs builder emits rows
// in constraint order; QAP appends its input-consistency rows at the end,
// preserving order) — thread partitions are aligned to row boundaries so
// writers never share a row.  The Python bridge falls back to
// r1cs_eval_rows when its sortedness check fails.
static void eval_span(const Fp256 *f, const uint32_t *rows,
                      const uint32_t *cols, const uint64_t *coeffs,
                      int64_t lo, int64_t hi, const uint64_t *zm,
                      uint64_t *out) {
  uint64_t prod[4];
  for (int64_t k = lo; k < hi; ++k) {
    mont_mul(prod, coeffs + 4 * k, zm + 4 * cols[k], f);
    add_mod(out + 4 * rows[k], out + 4 * rows[k], prod, f->p);
  }
}

void r1cs_eval_abc(const uint64_t *p_limbs, const uint64_t *r2_limbs,
                   uint64_t n0inv,
                   const uint32_t *rowsA, const uint32_t *colsA,
                   const uint64_t *coefA, int64_t nnzA,
                   const uint32_t *rowsB, const uint32_t *colsB,
                   const uint64_t *coefB, int64_t nnzB,
                   const uint32_t *rowsC, const uint32_t *colsC,
                   const uint64_t *coefC, int64_t nnzC,
                   const uint64_t *z, int64_t nz,
                   uint64_t *outA, uint64_t *outB, uint64_t *outC,
                   int64_t nrows, int64_t nthreads) {
  Fp256 f;
  memcpy(f.p, p_limbs, 32);
  memcpy(f.r2, r2_limbs, 32);
  f.n0inv = n0inv;
  if (nthreads < 1) nthreads = 1;

  uint64_t *zm = new uint64_t[nz * 4];
  {
    std::vector<std::thread> ts;
    int64_t step = (nz + nthreads - 1) / nthreads;
    for (int64_t t = 0; t < nthreads; ++t) {
      int64_t lo = t * step, hi = lo + step < nz ? lo + step : nz;
      if (lo >= hi) break;
      ts.emplace_back([&, lo, hi] {
        for (int64_t i = lo; i < hi; ++i)
          mont_mul(zm + 4 * i, z + 4 * i, f.r2, &f);
      });
    }
    for (auto &t : ts) t.join();
  }

  memset(outA, 0, (size_t)nrows * 32);
  memset(outB, 0, (size_t)nrows * 32);
  memset(outC, 0, (size_t)nrows * 32);

  struct Mat {
    const uint32_t *rows, *cols;
    const uint64_t *coefs;
    int64_t nnz;
    uint64_t *out;
  } mats[3] = {{rowsA, colsA, coefA, nnzA, outA},
               {rowsB, colsB, coefB, nnzB, outB},
               {rowsC, colsC, coefC, nnzC, outC}};

  std::vector<std::thread> ts;
  for (auto &m : mats) {
    if (!m.nnz) continue;
    int64_t step = (m.nnz + nthreads - 1) / nthreads;
    int64_t lo = 0;
    while (lo < m.nnz) {
      int64_t hi = lo + step < m.nnz ? lo + step : m.nnz;
      // advance hi to the next row boundary so rows never straddle threads
      while (hi < m.nnz && m.rows[hi] == m.rows[hi - 1]) ++hi;
      ts.emplace_back(eval_span, &f, m.rows, m.cols, m.coefs, lo, hi, zm,
                      m.out);
      lo = hi;
    }
  }
  for (auto &t : ts) t.join();
  delete[] zm;
}

// batch c = a*b mod p (canonical in/out), for host-side tooling
void fp256_mul_batch(const uint64_t *p_limbs, const uint64_t *r2_limbs,
                     uint64_t n0inv, const uint64_t *a, const uint64_t *b,
                     uint64_t *out, int64_t n) {
  Fp256 f;
  memcpy(f.p, p_limbs, 32);
  memcpy(f.r2, r2_limbs, 32);
  f.n0inv = n0inv;
  uint64_t am[4], t[4];
  for (int64_t i = 0; i < n; ++i) {
    mont_mul(am, a + 4 * i, f.r2, &f);      // a*R
    mont_mul(t, am, b + 4 * i, &f);         // a*b
    memcpy(out + 4 * i, t, 32);
  }
}
}
