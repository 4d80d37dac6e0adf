// Native host-side batch ops for the data pipeline.
//
// Replaces the per-sample PIL/cv2 python work the reference does inside
// torch DataLoader workers (anakin/datasets/hodata.py:434-450: affine
// warp, blur, color jitter, normalize) with one multithreaded C++ call
// per batch. Exposed via ctypes from artiboost_tpu/native/__init__.py.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, no external deps)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// Bilinear sample of HxWx3 uint8 image at (x, y); returns in [0, 1].
inline void sample_bilinear(const uint8_t* src, int h, int w, float x, float y,
                            float out[3]) {
    if (x < -1.f || y < -1.f || x > (float)w || y > (float)h) {
        out[0] = out[1] = out[2] = 0.f;
        return;
    }
    int x0 = (int)std::floor(x), y0 = (int)std::floor(y);
    float fx = x - x0, fy = y - y0;
    int x1 = x0 + 1, y1 = y0 + 1;
    auto px = [&](int yy, int xx, int c) -> float {
        if (xx < 0 || yy < 0 || xx >= w || yy >= h) return 0.f;
        return (float)src[(yy * w + xx) * 3 + c] * (1.f / 255.f);
    };
    for (int c = 0; c < 3; ++c) {
        float v00 = px(y0, x0, c), v01 = px(y0, x1, c);
        float v10 = px(y1, x0, c), v11 = px(y1, x1, c);
        out[c] = (1 - fy) * ((1 - fx) * v00 + fx * v01) +
                 fy * ((1 - fx) * v10 + fx * v11);
    }
}

struct JitterParams {
    float brightness;  // multiplier
    float contrast;    // multiplier about the mean
    float saturation;  // multiplier about gray
    float blur_sigma;  // gaussian sigma in px (0 = off)
};

// Warp one image: dst(x, y) = src(inv_affine . (x+.5, y+.5)), then color
// jitter + mean-0.5 normalization. inv: row-major 2x3.
void warp_one(const uint8_t* src, int sh, int sw, const float* inv,
              const JitterParams& jp, float* dst, int dh, int dw) {
    std::vector<float> tmp((size_t)dh * dw * 3);
    for (int y = 0; y < dh; ++y) {
        for (int x = 0; x < dw; ++x) {
            // integer-pixel convention, matching cv2.warpAffine / PIL
            float sx = inv[0] * x + inv[1] * y + inv[2];
            float sy = inv[3] * x + inv[4] * y + inv[5];
            sample_bilinear(src, sh, sw, sx, sy,
                            &tmp[((size_t)y * dw + x) * 3]);
        }
    }
    // separable gaussian blur (radius 2), only when sigma is meaningful
    if (jp.blur_sigma > 0.1f) {
        const int R = 2;
        float k[2 * R + 1];
        float s = 0.f;
        for (int i = -R; i <= R; ++i) {
            k[i + R] = std::exp(-0.5f * i * i / (jp.blur_sigma * jp.blur_sigma));
            s += k[i + R];
        }
        for (int i = 0; i < 2 * R + 1; ++i) k[i] /= s;
        std::vector<float> t2((size_t)dh * dw * 3);
        for (int y = 0; y < dh; ++y)
            for (int x = 0; x < dw; ++x)
                for (int c = 0; c < 3; ++c) {
                    float acc = 0.f;
                    for (int i = -R; i <= R; ++i) {
                        int xx = std::min(std::max(x + i, 0), dw - 1);
                        acc += k[i + R] * tmp[((size_t)y * dw + xx) * 3 + c];
                    }
                    t2[((size_t)y * dw + x) * 3 + c] = acc;
                }
        for (int y = 0; y < dh; ++y)
            for (int x = 0; x < dw; ++x)
                for (int c = 0; c < 3; ++c) {
                    float acc = 0.f;
                    for (int i = -R; i <= R; ++i) {
                        int yy = std::min(std::max(y + i, 0), dh - 1);
                        acc += k[i + R] * t2[((size_t)yy * dw + x) * 3 + c];
                    }
                    tmp[((size_t)y * dw + x) * 3 + c] = acc;
                }
    }
    // color jitter: brightness -> contrast (about mean) -> saturation
    float mean = 0.f;
    const size_t n = (size_t)dh * dw * 3;
    for (size_t i = 0; i < n; ++i) {
        tmp[i] *= jp.brightness;
        mean += tmp[i];
    }
    mean /= (float)n;
    for (size_t i = 0; i < n; i += 3) {
        float r = (tmp[i] - mean) * jp.contrast + mean;
        float g = (tmp[i + 1] - mean) * jp.contrast + mean;
        float b = (tmp[i + 2] - mean) * jp.contrast + mean;
        float gray = (r + g + b) * (1.f / 3.f);
        dst[i] = clampf((r - gray) * jp.saturation + gray, 0.f, 1.f) - 0.5f;
        dst[i + 1] = clampf((g - gray) * jp.saturation + gray, 0.f, 1.f) - 0.5f;
        dst[i + 2] = clampf((b - gray) * jp.saturation + gray, 0.f, 1.f) - 0.5f;
    }
}

}  // namespace

extern "C" {

// Batched warp+augment+normalize.
//   src: n contiguous sh x sw x 3 uint8 RGB images
//   inv_affines: n x 6 row-major inverse (crop->raw) affines
//   jitter: n x 4 floats (brightness, contrast, saturation, blur_sigma)
//   dst: n x dh x dw x 3 float32, written normalized to [-0.5, 0.5]
void warp_affine_batch(const uint8_t* src, int n, int sh, int sw,
                       const float* inv_affines, const float* jitter,
                       float* dst, int dh, int dw, int n_threads) {
    if (n_threads <= 0)
        n_threads = (int)std::thread::hardware_concurrency();
    n_threads = std::max(1, std::min(n_threads, n));
    std::atomic<int> next(0);
    auto worker = [&]() {
        int i;
        while ((i = next.fetch_add(1)) < n) {
            JitterParams jp{jitter[i * 4], jitter[i * 4 + 1], jitter[i * 4 + 2],
                            jitter[i * 4 + 3]};
            warp_one(src + (size_t)i * sh * sw * 3, sh, sw, inv_affines + i * 6,
                     jp, dst + (size_t)i * dh * dw * 3, dh, dw);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
}

// Lightweight self-description for the ctypes loader.
int hostops_abi_version() { return 1; }

}  // extern "C"
