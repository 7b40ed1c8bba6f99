// Native host-side acceleration for libpointmatcher_tpu.
//
// The reference implements its file parsers and sequential algorithms in
// C++ (reference: IO.cpp, CovarianceSampling.cpp). Our IO layer is
// numpy-based, which is fine for binary bodies (np.frombuffer) but slow for
// large ASCII tables: Python float() parses ~5 MB/s. This translation unit
// supplies the hot host primitives behind a plain C ABI consumed via
// ctypes:
//
//   pm_parse_floats        — tokenize a delimited ASCII block into float32s
//   pm_parse_doubles       — same, float64
//   pm_covariance_greedy   — CovarianceSampling's sequential stability pick
//
// Delimiters: spaces, tabs, CR/LF, commas, semicolons.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Parse up to max_out floats from data[0..len). Returns the number parsed,
// or -1 if a token failed to parse as a number.
long pm_parse_floats(const char* data, long len, float* out, long max_out) {
    const char* p = data;
    const char* end = data + len;
    long n = 0;
    while (p < end && n < max_out) {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' ||
                           *p == '\n' || *p == ',' || *p == ';')) {
            ++p;
        }
        if (p >= end) break;
        char* next = nullptr;
        float v = strtof(p, &next);
        if (next == p) return -1;  // non-numeric token
        out[n++] = v;
        p = next;
    }
    // trailing garbage check
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' ||
                       *p == '\n' || *p == ',' || *p == ';')) {
        ++p;
    }
    if (p < end && n >= max_out) return -2;  // buffer too small
    return n;
}

long pm_parse_doubles(const char* data, long len, double* out, long max_out) {
    const char* p = data;
    const char* end = data + len;
    long n = 0;
    while (p < end && n < max_out) {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' ||
                           *p == '\n' || *p == ',' || *p == ';')) {
            ++p;
        }
        if (p >= end) break;
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) return -1;
        out[n++] = v;
        p = next;
    }
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' ||
                       *p == '\n' || *p == ',' || *p == ';')) {
        ++p;
    }
    if (p < end && n >= max_out) return -2;
    return n;
}

// Parse exactly `want` doubles starting at data[0..len), writing how many
// input bytes were consumed to *consumed (so sectioned formats like legacy
// VTK can continue after the numeric block). Returns values parsed (< want
// if the block ends early at a non-numeric token).
long pm_parse_doubles_n(const char* data, long len, double* out, long want,
                        long* consumed) {
    const char* p = data;
    const char* end = data + len;
    long n = 0;
    while (p < end && n < want) {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' ||
                           *p == '\n' || *p == ',' || *p == ';')) {
            ++p;
        }
        if (p >= end) break;
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) break;  // hit a non-numeric token: stop cleanly
        out[n++] = v;
        p = next;
    }
    *consumed = (long)(p - data);
    return n;
}

// Format a float32 table as ASCII rows (single pass, %.9g per value,
// ' ' column delimiter, '\n' row terminator). Returns bytes written or -1
// if the output buffer is too small.
long pm_format_floats(const float* values, long rows, long cols,
                      char* out, long cap) {
    long w = 0;
    for (long r = 0; r < rows; ++r) {
        for (long c = 0; c < cols; ++c) {
            if (cap - w < 32) return -1;
            if (c) out[w++] = ' ';
            int k = snprintf(out + w, cap - w, "%.9g",
                             (double)values[r * cols + c]);
            if (k < 0) return -1;
            w += k;
        }
        if (cap - w < 2) return -1;
        out[w++] = '\n';
    }
    return w;
}

// CovarianceSampling's greedy stability selection (behavioral contract:
// reference CovarianceSampling.cpp:112-180 — sequential by construction:
// every pick updates the 6 accumulated constraints that choose the next
// direction). mag is row-major [n, 6]; writes nb selected row indices to
// keep, in pick order. Per pick: the least-constrained eigen-direction
// (argmin of t, first index on ties) takes its not-yet-sampled point of
// largest |magnitude| (stable descending order). O(6 n log n) sort +
// O(nb) picks.
long pm_covariance_greedy(const double* mag, long n, long nb, long* keep) {
    if (nb > n) nb = n;
    // Only the top-2·nb candidates per direction can ever be consumed:
    // pointer k advances past at most nb sampled entries (total picks)
    // plus its own ≤ nb picks. nth_element to that bound, then sort just
    // the shortlist — O(n) selection instead of O(n log n) full sorts.
    const long m = std::min(2 * nb, n);
    auto better = [mag](int k) {
        return [mag, k](long a, long b) {
            double fa = std::fabs(mag[a * 6 + k]);
            double fb = std::fabs(mag[b * 6 + k]);
            if (fa != fb) return fa > fb;
            return a < b;  // deterministic tie order (stable by index)
        };
    };
    std::vector<long> order((size_t)6 * m);
    std::vector<long> scratch(n);
    for (int k = 0; k < 6; ++k) {
        std::iota(scratch.begin(), scratch.end(), 0L);
        auto cmp = better(k);
        if (m < n) {
            std::nth_element(scratch.begin(), scratch.begin() + m,
                             scratch.end(), cmp);
        }
        std::sort(scratch.begin(), scratch.begin() + m, cmp);
        std::copy(scratch.begin(), scratch.begin() + m,
                  order.begin() + (size_t)k * m);
    }
    std::vector<unsigned char> sampled(n, 0);
    long ptr[6] = {0, 0, 0, 0, 0, 0};
    double t[6] = {0, 0, 0, 0, 0, 0};
    for (long i = 0; i < nb; ++i) {
        int k = 0;
        for (int j = 1; j < 6; ++j) {
            if (t[j] < t[k]) k = j;
        }
        const long* ord = order.data() + (size_t)k * m;
        while (ptr[k] < m && sampled[ord[ptr[k]]]) ++ptr[k];
        if (ptr[k] >= m) return i;  // unreachable per the 2·nb bound
        long idx = ord[ptr[k]++];
        sampled[idx] = 1;
        for (int j = 0; j < 6; ++j) {
            double v = mag[idx * 6 + j];
            t[j] += v * v;
        }
        keep[i] = idx;
    }
    return nb;
}

}  // extern "C"
