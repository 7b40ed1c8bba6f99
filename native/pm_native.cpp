// Native IO acceleration for libpointmatcher_tpu.
//
// The reference implements its file parsers in C++ (reference: IO.cpp, 2353
// LoC — CSV/VTK/PLY/PCD). Our IO layer is numpy-based, which is fine for
// binary bodies (np.frombuffer) but slow for large ASCII tables: Python
// float() parses ~5 MB/s. This translation unit supplies the hot ASCII
// primitives behind a plain C ABI consumed via ctypes:
//
//   pm_parse_floats  — tokenize a delimited ASCII block into float32s
//   pm_parse_doubles — same, float64
//
// Delimiters: spaces, tabs, CR/LF, commas, semicolons.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

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

}  // extern "C"
