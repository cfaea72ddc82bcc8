// Native host kernels for the orchestration layer.
//
// The TPU owns the hot path (everything per-sim is XLA-compiled); these are
// the host-side loops that run once per lowering and would otherwise be
// interpreted Python: the deterministic largest-remainder factor walk (up to
// max_rows x n_levels iterations — the prefix-stable allocation the CRN grid
// depends on; reference semantics at crates/engine-core/src/data_gen.rs:943)
// and the pool-adjacent-violators isotonic fit used by every crossing
// read-off (reference fit.rs). Compiled lazily by mcpower_tpu.native with a
// pure-Python fallback, exposed through ctypes (no pybind11 dependency).

#include <cstddef>
#include <cstdint>
#include <vector>

using std::size_t;

extern "C" {

// Largest-remainder walk: row i gets the level with the largest running
// deficit p_g*(i+1) - counts_g, ties to the lowest level index. probs are
// normalized internally. out must hold n int32 values.
void mcp_fixed_alloc(const double* probs, int32_t k, int64_t n, int32_t* out) {
    if (k <= 0 || n <= 0) return;
    std::vector<double> p(k);
    double total = 0.0;
    for (int32_t g = 0; g < k; ++g) total += probs[g];
    for (int32_t g = 0; g < k; ++g)
        p[g] = total > 0.0 ? probs[g] / total : 1.0 / k;
    std::vector<int64_t> counts(k, 0);
    for (int64_t i = 0; i < n; ++i) {
        int32_t best = 0;
        double best_deficit = p[0] * (double)(i + 1) - (double)counts[0];
        for (int32_t g = 1; g < k; ++g) {
            double d = p[g] * (double)(i + 1) - (double)counts[g];
            if (d > best_deficit) {
                best_deficit = d;
                best = g;
            }
        }
        out[i] = best;
        counts[best] += 1;
    }
}

// Pool-adjacent-violators: least-squares non-decreasing fit, unweighted.
// In/out length n; in-place into `fitted`.
void mcp_pava(const double* y, int64_t n, double* fitted) {
    if (n <= 0) return;
    std::vector<double> means;
    std::vector<int64_t> lens;
    means.reserve(n);
    lens.reserve(n);
    for (int64_t i = 0; i < n; ++i) {
        means.push_back(y[i]);
        lens.push_back(1);
        while (means.size() >= 2 &&
               means[means.size() - 2] > means[means.size() - 1]) {
            double m1 = means.back();
            int64_t l1 = lens.back();
            means.pop_back();
            lens.pop_back();
            double m0 = means.back();
            int64_t l0 = lens.back();
            means.back() = (m0 * (double)l0 + m1 * (double)l1) / (double)(l0 + l1);
            lens.back() = l0 + l1;
        }
    }
    int64_t pos = 0;
    for (size_t b = 0; b < means.size(); ++b)
        for (int64_t j = 0; j < lens[b]; ++j) fitted[pos++] = means[b];
}

}  // extern "C"
