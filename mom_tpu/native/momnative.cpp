// Native runtime components (C ABI, loaded via ctypes).
//
// The reference's native layer is its CUDA kernels (rasterizer, simple-knn)
// plus host-side IO helpers; the TPU compute path lives in XLA/Pallas, and
// this library provides the host runtime around it:
//   - buffered binary PLY serialization (255MB artifacts at 1.15M points)
//   - a threaded libpng frame writer for the 4x60-frame render dumps
//     (replacing the reference's python ThreadPool + torchvision.save_image,
//     render_4DGS.py:32-47)
//   - a CPU Morton-order 3-NN mean distance (same algorithm family as
//     simple-knn's boxMeanDist, simple_knn.cu:147-183) as a JAX-free
//     fallback for initialization.
//
// Build: g++ -O3 -march=native -shared -fPIC momnative.cpp -o libmomnative.so
//        -lpng -lz -pthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// PLY

int ply_write(const char* path, const char* header, const float* data,
              int64_t n_rows, int64_t n_cols) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    setvbuf(f, nullptr, _IOFBF, 1 << 22);
    std::fwrite(header, 1, std::strlen(header), f);
    const size_t total = (size_t)n_rows * (size_t)n_cols;
    size_t written = std::fwrite(data, sizeof(float), total, f);
    std::fclose(f);
    return written == total ? 0 : -2;
}

// ---------------------------------------------------------------------------
// PNG

static int write_one_png(const char* path, const uint8_t* rgb, int w, int h) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                              nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_write_struct(&png, &info);
        std::fclose(f);
        return -2;
    }
    png_init_io(png, f);
    png_set_compression_level(png, 1);     // fast; frames are transient
    png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
                 PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
    png_write_info(png, info);
    std::vector<png_bytep> rows(h);
    for (int y = 0; y < h; y++)
        rows[y] = const_cast<png_bytep>(rgb + (size_t)y * w * 3);
    png_write_image(png, rows.data());
    png_write_end(png, nullptr);
    png_destroy_write_struct(&png, &info);
    std::fclose(f);
    return 0;
}

int png_write_rgb8(const char* path, const uint8_t* rgb, int w, int h) {
    return write_one_png(path, rgb, w, h);
}

// paths: n zero-terminated strings concatenated; frames: n*h*w*3 bytes
int png_write_batch(const char* paths, const uint8_t* frames, int n, int w,
                    int h, int n_threads) {
    std::vector<const char*> ps(n);
    const char* p = paths;
    for (int i = 0; i < n; i++) {
        ps[i] = p;
        p += std::strlen(p) + 1;
    }
    std::atomic<int> next(0), errors(0);
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            if (write_one_png(ps[i], frames + (size_t)i * w * h * 3, w, h))
                errors.fetch_add(1);
        }
    };
    int nt = std::max(1, std::min(n_threads, n));
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; t++) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    return errors.load();
}

// ---------------------------------------------------------------------------
// Morton 3-NN mean squared distance (CPU)

static inline uint32_t spread10(uint32_t v) {
    v &= 0x3ff;
    v = (v | (v << 16)) & 0x30000FF;
    v = (v | (v << 8)) & 0x300F00F;
    v = (v | (v << 4)) & 0x30C30C3;
    v = (v | (v << 2)) & 0x9249249;
    return v;
}

void knn3_morton(const float* pts, int64_t n, int window, float* out) {
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = 0; i < n; i++)
        for (int d = 0; d < 3; d++) {
            mn[d] = std::min(mn[d], pts[3 * i + d]);
            mx[d] = std::max(mx[d], pts[3 * i + d]);
        }
    std::vector<std::pair<uint32_t, int64_t>> codes(n);
    for (int64_t i = 0; i < n; i++) {
        uint32_t c = 0;
        for (int d = 0; d < 3; d++) {
            float s = (mx[d] - mn[d]) > 1e-12f
                ? (pts[3 * i + d] - mn[d]) / (mx[d] - mn[d]) : 0.0f;
            c |= spread10((uint32_t)(s * 1023.0f)) << d;
        }
        codes[i] = {c, i};
    }
    std::sort(codes.begin(), codes.end());

    int nt = std::max(1u, std::thread::hardware_concurrency());
    std::vector<std::thread> threads;
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t s = lo; s < hi; s++) {
            int64_t i = codes[s].second;
            float best[3] = {1e30f, 1e30f, 1e30f};
            int64_t a = std::max<int64_t>(0, s - window);
            int64_t b = std::min<int64_t>(n - 1, s + window);
            for (int64_t t = a; t <= b; t++) {
                if (t == s) continue;
                int64_t j = codes[t].second;
                float dx = pts[3 * i] - pts[3 * j];
                float dy = pts[3 * i + 1] - pts[3 * j + 1];
                float dz = pts[3 * i + 2] - pts[3 * j + 2];
                float d2 = dx * dx + dy * dy + dz * dz;
                if (d2 < best[0]) {
                    best[2] = best[1]; best[1] = best[0]; best[0] = d2;
                } else if (d2 < best[1]) {
                    best[2] = best[1]; best[1] = d2;
                } else if (d2 < best[2]) {
                    best[2] = d2;
                }
            }
            out[i] = (best[0] + best[1] + best[2]) / 3.0f;
        }
    };
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; t++) {
        int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
        if (lo < hi) threads.emplace_back(work, lo, hi);
    }
    for (auto& t : threads) t.join();
}

}  // extern "C"
