// C++-speed sequential combine micro-benchmark for baseline calibration.
//
// Implements the reference's per-record, per-call hot loop at compiled
// speed: forward cell pointers per sample (the END-ordered sweep of
// query_variants.cc:334-478 reduced to its data movement), then for
// every live call the PL genotype reorder / AD allele reorder /
// INFO-DP logic of variant_field_handler.cc:42-296 and
// broad_combined_gvcf.cc:689-726.  This gives BENCH vs_baseline a
// defensible meaning: "vs a C++-speed sequential engine running the
// same semantics on the same cohort" — the reference itself cannot be
// built here (TileDB submodule is not vendored).
//
// Exposed via the same C ABI .so as the import/render kernels.

#include <cstdint>

namespace {
constexpr int32_t INT_MISSING = INT32_MIN;
}

extern "C" {

// Returns an int32 wraparound checksum over all remapped outputs (the
// same reduction bench.py fetches from the device), so the work cannot
// be dead-code-eliminated and results are comparable.
int32_t gdb_seq_combine_bench(
    const int64_t* col, const int64_t* end_, int64_t S, int64_t C,
    const int32_t* pl, int64_t G_in, const int32_t* pl_len,
    const int32_t* ad, int64_t A_in, const int32_t* ad_len,
    const int32_t* inv_bs, const int32_t* nr_bs, int64_t M,
    const int32_t* dp_info, const int32_t* dp_fmt, const int32_t* min_dp,
    const int64_t* starts, const int32_t* rec_nm, int64_t B) {
  int32_t checksum = 0;
  // forward pointer per sample (the scan keeps an iterator per row)
  int64_t* ptr = new int64_t[S]();
  for (int64_t b = 0; b < B; ++b) {
    const int64_t st = starts[b];
    const int32_t nm = rec_nm[b];
    int32_t dp_sum = 0;
    for (int64_t s = 0; s < S; ++s) {
      const int64_t* cs = col + s * C;
      const int64_t* es = end_ + s * C;
      int64_t& p = ptr[s];
      while (p + 1 < C && cs[p + 1] <= st) ++p;
      if (!(cs[p] <= st && st <= es[p])) continue;  // no live call
      const int64_t cell = s * C + p;
      const int32_t* inv = inv_bs + (b * S + s) * M;
      const int32_t nr = nr_bs[b * S + s];
      const int32_t pll = pl_len[cell];
      const int32_t* plv = pl + cell * G_in;
      // PL reorder: diploid genotype enumeration over merged alleles
      // (remap_data_based_on_genotype_diploid,
      // variant_field_handler.cc:135-198)
      for (int32_t a2 = 0; a2 < nm; ++a2) {
        int32_t i2 = (a2 < M) ? inv[a2] : -1;
        if (i2 == -1) i2 = nr;
        for (int32_t a1 = 0; a1 <= a2; ++a1) {
          int32_t i1 = (a1 < M) ? inv[a1] : -1;
          if (i1 == -1) i1 = nr;
          int32_t out = INT_MISSING;
          if (i1 >= 0 && i2 >= 0) {
            const int32_t lo = i1 < i2 ? i1 : i2;
            const int32_t hi = i1 < i2 ? i2 : i1;
            const int32_t gt = hi * (hi + 1) / 2 + lo;
            if (gt < pll && gt < G_in) out = plv[gt];
          }
          checksum += out;
        }
      }
      // AD reorder (remap_data_based_on_alleles,
      // variant_field_handler.cc:42-82)
      const int32_t adl = ad_len[cell];
      const int32_t* adv = ad + cell * A_in;
      for (int32_t m = 0; m < nm; ++m) {
        int32_t ia = (m < M) ? inv[m] : -1;
        if (ia == -1) ia = nr;
        int32_t out = INT_MISSING;
        if (ia >= 0 && ia < adl && ia < A_in) out = adv[ia];
        checksum += out;
      }
      // INFO DP (broad_combined_gvcf.cc:689-726)
      int32_t dv = dp_info[cell];
      if (dv == INT_MISSING) {
        dv = (min_dp[cell] != INT_MISSING) ? min_dp[cell]
                                           : dp_fmt[cell];
      }
      if (dv != INT_MISSING) dp_sum += dv;
    }
    checksum += dp_sum;
  }
  delete[] ptr;
  return checksum;
}

}  // extern "C"
