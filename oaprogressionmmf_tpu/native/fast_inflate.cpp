// Native gzip inflate for the host input pipeline.
//
// The data loader's hot host path is NIfTI-gzip decode (measured 4.8
// knees/s/core through Python's gzip module, scripts/bench_input_pipeline
// .py). This helper inflates a .gz file directly into a caller-provided
// buffer (a numpy array): no PyBytes chunk list, no join copy, and the
// GIL is released for the whole call (ctypes), so the BatchLoader's
// decode threads scale across cores.
//
// Replaces the role of the reference's multi-process joblib/num_workers
// decode parallelism (koafusion run apps) with threads + native code.
//
// Build: make -C oaprogressionmmf_tpu/native   (g++ + zlib only)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <zlib.h>

extern "C" {

// Inflate `path` into out[0..cap). Returns bytes written, or:
//   -1 open failed, -2 corrupt stream, -3 buffer too small (more data
//   remained — e.g. a multi-member gzip whose ISIZE undercounts).
int64_t fnifti_inflate(const char* path, uint8_t* out, int64_t cap) {
    gzFile f = gzopen(path, "rb");
    if (!f) return -1;
    gzbuffer(f, 1 << 20);
    int64_t total = 0;
    while (total < cap) {
        unsigned chunk = (unsigned)std::min<int64_t>(cap - total, 1 << 30);
        int n = gzread(f, out + total, chunk);
        if (n < 0) { gzclose(f); return -2; }
        if (n == 0) { gzclose(f); return total; }
        total += n;
    }
    // buffer full: check for trailing data
    uint8_t probe;
    int n = gzread(f, &probe, 1);
    gzclose(f);
    return (n > 0) ? -3 : total;
}

// Uncompressed size of a single-member gzip (ISIZE field, mod 2^32);
// returns -1 on IO error.
int64_t fnifti_gz_isize(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    if (fseek(f, -4, SEEK_END) != 0) { fclose(f); return -1; }
    uint8_t b[4];
    if (fread(b, 1, 4, f) != 4) { fclose(f); return -1; }
    fclose(f);
    return (int64_t)b[0] | ((int64_t)b[1] << 8) | ((int64_t)b[2] << 16) |
           ((int64_t)b[3] << 24);
}

}  // extern "C"
