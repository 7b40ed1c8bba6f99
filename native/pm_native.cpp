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

// ---------------------------------------------------------------------------
// Compiled single-thread CPU ICP baseline (bench.py). Stands in for the
// reference's compiled loop (MatchersImpl.cpp:78-101 kd-tree queries +
// PointToPlane.cpp:213-247 solve) so the benchmark's vs_baseline is
// measured against compiled C++ of the same algorithm, not a numpy loop.
// 3-D only (the benchmark workload).

namespace {

struct PmKD {
    std::vector<double> pts;   // [n, 3] tree order
    std::vector<long> ids;     // original row of each tree slot
    std::vector<int> axis;     // split axis per slot (implicit tree)
    long n = 0;

    void build(const double* p, long count) {
        n = count;
        pts.resize((size_t)n * 3);
        ids.resize(n);
        axis.assign(n, 0);
        std::vector<long> ord(n);
        std::iota(ord.begin(), ord.end(), 0L);
        build_rec(p, ord.data(), 0, n);
        for (long i = 0; i < n; ++i) {
            for (int c = 0; c < 3; ++c) pts[i * 3 + c] = p[ids[i] * 3 + c];
        }
    }

    // implicit balanced tree over [lo, hi): median slot = (lo+hi)/2,
    // split axis = largest extent of the range
    void build_rec(const double* p, long* ord, long lo, long hi) {
        if (lo >= hi) return;
        long mid = (lo + hi) / 2;
        double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
        for (long i = lo; i < hi; ++i) {
            for (int c = 0; c < 3; ++c) {
                double v = p[ord[i] * 3 + c];
                if (v < mn[c]) mn[c] = v;
                if (v > mx[c]) mx[c] = v;
            }
        }
        int ax = 0;
        for (int c = 1; c < 3; ++c) {
            if (mx[c] - mn[c] > mx[ax] - mn[ax]) ax = c;
        }
        std::nth_element(ord + lo, ord + mid, ord + hi,
                         [p, ax](long a, long b) {
                             return p[a * 3 + ax] < p[b * 3 + ax];
                         });
        axis[mid] = ax;
        ids[mid] = ord[mid];
        build_rec(p, ord, lo, mid);
        build_rec(p, ord, mid + 1, hi);
    }

    void nn1_rec(const double* q, long lo, long hi,
                 double& best_d2, long& best_slot) const {
        if (lo >= hi) return;
        long mid = (lo + hi) / 2;
        const double* s = &pts[mid * 3];
        double d2 = 0;
        for (int c = 0; c < 3; ++c) {
            double df = q[c] - s[c];
            d2 += df * df;
        }
        if (d2 < best_d2) {
            best_d2 = d2;
            best_slot = mid;
        }
        int ax = axis[mid];
        double delta = q[ax] - s[ax];
        if (delta < 0) {
            nn1_rec(q, lo, mid, best_d2, best_slot);
            if (delta * delta < best_d2) nn1_rec(q, mid + 1, hi, best_d2, best_slot);
        } else {
            nn1_rec(q, mid + 1, hi, best_d2, best_slot);
            if (delta * delta < best_d2) nn1_rec(q, lo, mid, best_d2, best_slot);
        }
    }

    long query1(const double* q, double* d2_out) const {
        double best = 1e300;
        long slot = -1;
        nn1_rec(q, 0, n, best, slot);
        if (d2_out) *d2_out = best;
        return slot >= 0 ? ids[slot] : -1;
    }

    // k-NN with a flat max-"heap" (linear scan over k entries — k ≤ 32
    // in the baseline, dwarfed by tree traversal cost)
    void nnk_rec(const double* q, long lo, long hi, long k,
                 double* hd, long* hi_ids, long& filled) const {
        if (lo >= hi) return;
        long mid = (lo + hi) / 2;
        const double* s = &pts[mid * 3];
        double d2 = 0;
        for (int c = 0; c < 3; ++c) {
            double df = q[c] - s[c];
            d2 += df * df;
        }
        long worst = 0;
        for (long j = 1; j < filled; ++j) {
            if (hd[j] > hd[worst]) worst = j;
        }
        if (filled < k) {
            hd[filled] = d2;
            hi_ids[filled] = ids[mid];
            ++filled;
        } else if (d2 < hd[worst]) {
            hd[worst] = d2;
            hi_ids[worst] = ids[mid];
        }
        int ax = axis[mid];
        double delta = q[ax] - s[ax];
        if (delta < 0) {
            nnk_rec(q, lo, mid, k, hd, hi_ids, filled);
            if (filled < k || delta * delta < worst_of(hd, filled))
                nnk_rec(q, mid + 1, hi, k, hd, hi_ids, filled);
        } else {
            nnk_rec(q, mid + 1, hi, k, hd, hi_ids, filled);
            if (filled < k || delta * delta < worst_of(hd, filled))
                nnk_rec(q, lo, mid, k, hd, hi_ids, filled);
        }
    }

    static double worst_of(const double* hd, long filled) {
        double w = 0;
        for (long j = 0; j < filled; ++j) {
            if (hd[j] > w) w = hd[j];
        }
        return w;
    }
};

// Jacobi eigen decomposition of a symmetric 3x3; returns the eigenvector
// of the smallest eigenvalue (the surface normal of a neighborhood).
void smallest_eigvec3(const double A_in[9], double out[3]) {
    double A[9];
    std::memcpy(A, A_in, sizeof(A));
    double V[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
    for (int sweep = 0; sweep < 16; ++sweep) {
        double off = std::fabs(A[1]) + std::fabs(A[2]) + std::fabs(A[5]);
        if (off < 1e-14) break;
        static const int PQ[3][2] = {{0, 1}, {0, 2}, {1, 2}};
        for (int t = 0; t < 3; ++t) {
            int p = PQ[t][0], q = PQ[t][1];
            double apq = A[p * 3 + q];
            if (std::fabs(apq) < 1e-300) continue;
            double app = A[p * 3 + p], aqq = A[q * 3 + q];
            double tau = (aqq - app) / (2 * apq);
            double tth = (tau >= 0 ? 1.0 : -1.0) /
                         (std::fabs(tau) + std::sqrt(1 + tau * tau));
            double c = 1.0 / std::sqrt(1 + tth * tth), s = tth * c;
            for (int r = 0; r < 3; ++r) {
                double arp = A[r * 3 + p], arq = A[r * 3 + q];
                A[r * 3 + p] = c * arp - s * arq;
                A[r * 3 + q] = s * arp + c * arq;
            }
            for (int r = 0; r < 3; ++r) {
                double apr = A[p * 3 + r], aqr = A[q * 3 + r];
                A[p * 3 + r] = c * apr - s * aqr;
                A[q * 3 + r] = s * apr + c * aqr;
            }
            for (int r = 0; r < 3; ++r) {
                double vrp = V[r * 3 + p], vrq = V[r * 3 + q];
                V[r * 3 + p] = c * vrp - s * vrq;
                V[r * 3 + q] = s * vrp + c * vrq;
            }
        }
    }
    int kmin = 0;
    double lmin = A[0];
    if (A[4] < lmin) { lmin = A[4]; kmin = 1; }
    if (A[8] < lmin) { kmin = 2; }
    for (int r = 0; r < 3; ++r) out[r] = V[r * 3 + kmin];
}

// 6x6 linear solve, Gaussian elimination with partial pivoting
void solve6(double A[36], double b[6], double x[6]) {
    int piv[6];
    for (int i = 0; i < 6; ++i) piv[i] = i;
    for (int k = 0; k < 6; ++k) {
        int p = k;
        for (int i = k + 1; i < 6; ++i) {
            if (std::fabs(A[i * 6 + k]) > std::fabs(A[p * 6 + k])) p = i;
        }
        if (p != k) {
            for (int j = 0; j < 6; ++j) std::swap(A[k * 6 + j], A[p * 6 + j]);
            std::swap(b[k], b[p]);
        }
        double d = A[k * 6 + k];
        if (std::fabs(d) < 1e-300) d = (d >= 0 ? 1e-300 : -1e-300);
        for (int i = k + 1; i < 6; ++i) {
            double f = A[i * 6 + k] / d;
            for (int j = k; j < 6; ++j) A[i * 6 + j] -= f * A[k * 6 + j];
            b[i] -= f * b[k];
        }
    }
    for (int k = 5; k >= 0; --k) {
        double s = b[k];
        for (int j = k + 1; j < 6; ++j) s -= A[k * 6 + j] * x[j];
        double d = A[k * 6 + k];
        if (std::fabs(d) < 1e-300) d = (d >= 0 ? 1e-300 : -1e-300);
        x[k] = s / d;
    }
    (void)piv;
}

void rotvec_to_matrix(const double w[3], double R[9]) {
    double th = std::sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]);
    double I[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
    if (th < 1e-12) {
        std::memcpy(R, I, sizeof(I));
        return;
    }
    double k[3] = {w[0] / th, w[1] / th, w[2] / th};
    double K[9] = {0, -k[2], k[1], k[2], 0, -k[0], -k[1], k[0], 0};
    double K2[9];
    for (int i = 0; i < 3; ++i) {
        for (int j = 0; j < 3; ++j) {
            double s = 0;
            for (int l = 0; l < 3; ++l) s += K[i * 3 + l] * K[l * 3 + j];
            K2[i * 3 + j] = s;
        }
    }
    double st = std::sin(th), ct = std::cos(th);
    for (int i = 0; i < 9; ++i) R[i] = I[i] + st * K[i] + (1 - ct) * K2[i];
}

// np.quantile(d, q) with linear interpolation, via two nth_elements
double quantile(std::vector<double>& v, double q) {
    if (v.empty()) return 0;
    double pos = q * (double)(v.size() - 1);
    size_t lo = (size_t)pos;
    double frac = pos - (double)lo;
    std::nth_element(v.begin(), v.begin() + lo, v.end());
    double a = v[lo];
    if (frac == 0 || lo + 1 >= v.size()) return a;
    double b = *std::min_element(v.begin() + lo + 1, v.end());
    return a + frac * (b - a);
}

}  // namespace

extern "C" {

void* pm_kdtree_build(const double* pts, long n) {
    PmKD* kd = new PmKD();
    kd->build(pts, n);
    return kd;
}

void pm_kdtree_free(void* h) { delete static_cast<PmKD*>(h); }

// knn=k neighbor ids of every row of pts (self-query; the normal-estimation
// prep of the baseline). out_ids is [n, k].
void pm_kdtree_knn(void* h, const double* pts, long n, long k,
                   long* out_ids) {
    PmKD* kd = static_cast<PmKD*>(h);
    std::vector<double> hd(k);
    std::vector<long> hids(k);
    for (long i = 0; i < n; ++i) {
        long filled = 0;
        kd->nnk_rec(pts + i * 3, 0, kd->n, k, hd.data(), hids.data(), filled);
        // ascending by distance (the numpy baseline sorts too)
        std::vector<long> ordv(filled);
        std::iota(ordv.begin(), ordv.end(), 0L);
        std::sort(ordv.begin(), ordv.end(),
                  [&](long a, long b) { return hd[a] < hd[b]; });
        for (long j = 0; j < k; ++j) {
            out_ids[i * k + j] = j < filled ? hids[ordv[j]] : -1;
        }
    }
}

// per-point normals from k-NN covariance (the baseline's map prep)
void pm_cpu_normals(void* h, const double* pts, long n, long k,
                    double* out_normals) {
    PmKD* kd = static_cast<PmKD*>(h);
    std::vector<double> hd(k);
    std::vector<long> hids(k);
    for (long i = 0; i < n; ++i) {
        long filled = 0;
        kd->nnk_rec(pts + i * 3, 0, kd->n, k, hd.data(), hids.data(), filled);
        double mean[3] = {0, 0, 0};
        for (long j = 0; j < filled; ++j) {
            for (int c = 0; c < 3; ++c) mean[c] += pts[hids[j] * 3 + c];
        }
        for (int c = 0; c < 3; ++c) mean[c] /= (double)(filled > 0 ? filled : 1);
        double C[9] = {0};
        for (long j = 0; j < filled; ++j) {
            double d0 = pts[hids[j] * 3 + 0] - mean[0];
            double d1 = pts[hids[j] * 3 + 1] - mean[1];
            double d2 = pts[hids[j] * 3 + 2] - mean[2];
            C[0] += d0 * d0; C[1] += d0 * d1; C[2] += d0 * d2;
            C[4] += d1 * d1; C[5] += d1 * d2; C[8] += d2 * d2;
        }
        C[3] = C[1]; C[6] = C[2]; C[7] = C[5];
        smallest_eigvec3(C, out_normals + i * 3);
    }
}

// One registration at a fixed iteration budget: per iteration, transform
// src by T, 1-NN query every point, trim at the `trim` distance quantile,
// accumulate the point-to-plane normal equations and solve. Mirrors
// bench.py::cpu_register exactly (which mirrors the reference default
// chain's per-registration work). T_io is 4x4 row-major, in/out.
void pm_icp_cpu_register(void* h, const double* ref, const double* normals,
                         const double* src, long n_src, long iterations,
                         double trim, double* T_io) {
    PmKD* kd = static_cast<PmKD*>(h);
    std::vector<double> cur((size_t)n_src * 3);
    std::vector<double> d(n_src);
    std::vector<double> dq(n_src);
    std::vector<long> idx(n_src);
    double T[16];
    std::memcpy(T, T_io, sizeof(T));
    for (long it = 0; it < iterations; ++it) {
        for (long i = 0; i < n_src; ++i) {
            const double* s = src + i * 3;
            for (int r = 0; r < 3; ++r) {
                cur[i * 3 + r] = T[r * 4 + 0] * s[0] + T[r * 4 + 1] * s[1] +
                                 T[r * 4 + 2] * s[2] + T[r * 4 + 3];
            }
            double d2;
            idx[i] = kd->query1(&cur[i * 3], &d2);
            d[i] = std::sqrt(d2);
        }
        dq.assign(d.begin(), d.end());
        double lim = quantile(dq, trim);
        double A[36] = {0}, b[6] = {0};
        for (long i = 0; i < n_src; ++i) {
            if (d[i] > lim || idx[i] < 0) continue;
            const double* p = &cur[i * 3];
            const double* q = ref + idx[i] * 3;
            const double* nv = normals + idx[i] * 3;
            double c0 = p[1] * nv[2] - p[2] * nv[1];
            double c1 = p[2] * nv[0] - p[0] * nv[2];
            double c2 = p[0] * nv[1] - p[1] * nv[0];
            double F[6] = {c0, c1, c2, nv[0], nv[1], nv[2]};
            double e = (p[0] - q[0]) * nv[0] + (p[1] - q[1]) * nv[1] +
                       (p[2] - q[2]) * nv[2];
            for (int r = 0; r < 6; ++r) {
                for (int cc = 0; cc < 6; ++cc) A[r * 6 + cc] += F[r] * F[cc];
                b[r] -= F[r] * e;
            }
        }
        double x[6];
        solve6(A, b, x);
        double R[9];
        rotvec_to_matrix(x, R);
        double Tn[16] = {R[0], R[1], R[2], x[3],
                         R[3], R[4], R[5], x[4],
                         R[6], R[7], R[8], x[5],
                         0, 0, 0, 1};
        double Tout[16];
        for (int r = 0; r < 4; ++r) {
            for (int cc = 0; cc < 4; ++cc) {
                double s = 0;
                for (int l = 0; l < 4; ++l) s += Tn[r * 4 + l] * T[l * 4 + cc];
                Tout[r * 4 + cc] = s;
            }
        }
        std::memcpy(T, Tout, sizeof(T));
    }
    std::memcpy(T_io, T, sizeof(T));
}

// Convergence-stopped variant: identical per-iteration work, but the loop
// stops by the reference's Differential checker semantics
// (TransformationCheckersImpl.cpp:85-158 — mean |drot| and |dtrans| of
// consecutive T_iter over a sliding window of `smooth` steps both below
// the thresholds, evaluated only once the history exceeds the window) or
// at max_iterations. Returns the number of iterations run, so CPU
// time-to-convergence is measurable instead of a fixed budget.
long pm_icp_cpu_register_conv(void* h, const double* ref,
                              const double* normals, const double* src,
                              long n_src, long max_iterations, double trim,
                              double rot_thresh, double trans_thresh,
                              long smooth, double* T_io) {
    PmKD* kd = static_cast<PmKD*>(h);
    std::vector<double> cur((size_t)n_src * 3);
    std::vector<double> d(n_src);
    std::vector<double> dq(n_src);
    std::vector<long> idx(n_src);
    double T[16];
    std::memcpy(T, T_io, sizeof(T));
    if (smooth < 1) smooth = 1;
    std::vector<double> rot_hist, trans_hist;  // per-step |delta|
    double Rprev[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
    double tprev[3] = {T_io[3], T_io[7], T_io[11]};
    Rprev[0] = T_io[0]; Rprev[1] = T_io[1]; Rprev[2] = T_io[2];
    Rprev[3] = T_io[4]; Rprev[4] = T_io[5]; Rprev[5] = T_io[6];
    Rprev[6] = T_io[8]; Rprev[7] = T_io[9]; Rprev[8] = T_io[10];
    long it = 0;
    for (; it < max_iterations; ++it) {
        for (long i = 0; i < n_src; ++i) {
            const double* s = src + i * 3;
            for (int r = 0; r < 3; ++r) {
                cur[i * 3 + r] = T[r * 4 + 0] * s[0] + T[r * 4 + 1] * s[1] +
                                 T[r * 4 + 2] * s[2] + T[r * 4 + 3];
            }
            double d2;
            idx[i] = kd->query1(&cur[i * 3], &d2);
            d[i] = std::sqrt(d2);
        }
        dq.assign(d.begin(), d.end());
        double lim = quantile(dq, trim);
        double A[36] = {0}, b[6] = {0};
        for (long i = 0; i < n_src; ++i) {
            if (d[i] > lim || idx[i] < 0) continue;
            const double* p = &cur[i * 3];
            const double* q = ref + idx[i] * 3;
            const double* nv = normals + idx[i] * 3;
            double c0 = p[1] * nv[2] - p[2] * nv[1];
            double c1 = p[2] * nv[0] - p[0] * nv[2];
            double c2 = p[0] * nv[1] - p[1] * nv[0];
            double F[6] = {c0, c1, c2, nv[0], nv[1], nv[2]};
            double e = (p[0] - q[0]) * nv[0] + (p[1] - q[1]) * nv[1] +
                       (p[2] - q[2]) * nv[2];
            for (int r = 0; r < 6; ++r) {
                for (int cc = 0; cc < 6; ++cc) A[r * 6 + cc] += F[r] * F[cc];
                b[r] -= F[r] * e;
            }
        }
        double x[6];
        solve6(A, b, x);
        double R[9];
        rotvec_to_matrix(x, R);
        double Tn[16] = {R[0], R[1], R[2], x[3],
                         R[3], R[4], R[5], x[4],
                         R[6], R[7], R[8], x[5],
                         0, 0, 0, 1};
        double Tout[16];
        for (int r = 0; r < 4; ++r) {
            for (int cc = 0; cc < 4; ++cc) {
                double s = 0;
                for (int l = 0; l < 4; ++l) s += Tn[r * 4 + l] * T[l * 4 + cc];
                Tout[r * 4 + cc] = s;
            }
        }
        std::memcpy(T, Tout, sizeof(T));
        // differential deltas vs previous T_iter
        double Rc[9] = {T[0], T[1], T[2], T[4], T[5], T[6], T[8], T[9], T[10]};
        double tc[3] = {T[3], T[7], T[11]};
        double tracev = 0;
        for (int r = 0; r < 3; ++r) {
            for (int cc = 0; cc < 3; ++cc) {
                // trace(Rprev^T * Rc)
                tracev += Rprev[cc * 3 + r] * Rc[cc * 3 + r];
            }
        }
        // guard acos domain like the engine's rotation_angle_between
        double carg = (tracev - 1.0) / 2.0;
        if (carg > 1.0) carg = 1.0;
        if (carg < -1.0) carg = -1.0;
        rot_hist.push_back(std::acos(carg));
        double dt2 = 0;
        for (int c = 0; c < 3; ++c) {
            double df = tc[c] - tprev[c];
            dt2 += df * df;
        }
        trans_hist.push_back(std::sqrt(dt2));
        std::memcpy(Rprev, Rc, sizeof(Rc));
        std::memcpy(tprev, tc, sizeof(tc));
        if ((long)rot_hist.size() >= smooth) {
            double mr = 0, mt = 0;
            for (long j = 0; j < smooth; ++j) {
                mr += rot_hist[rot_hist.size() - 1 - j];
                mt += trans_hist[trans_hist.size() - 1 - j];
            }
            mr /= (double)smooth;
            mt /= (double)smooth;
            if (mr < rot_thresh && mt < trans_thresh) {
                ++it;
                break;
            }
        }
    }
    std::memcpy(T_io, T, sizeof(T));
    return it;
}

}  // extern "C"
