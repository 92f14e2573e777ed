// ofd_native: C++ host data-path kernels for opticalflowdiffusion_tpu.
//
// The reference's native code is GPU-side (CuPy CUDA splats, the compiled
// spatial_correlation_sampler) plus torch's C++ DataLoader machinery.  On
// TPU the device-side equivalents are XLA/Pallas programs; this library is
// the native HOST data path: procedural sample synthesis, image resize, .flo
// decoding and box-downsampling, callable via ctypes with a pure-python
// fallback (see opticalflowdiffusion_tpu/data/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC ofd_native.cpp -o libofd_native.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Bilinear resize, HWC float32.
// ---------------------------------------------------------------------------
void bilinear_resize(const float* in, int h, int w, int c,
                     float* out, int oh, int ow) {
    const float sy = (float)h / oh;
    const float sx = (float)w / ow;
    for (int y = 0; y < oh; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        int y0 = (int)floorf(fy);
        float wy = fy - y0;
        int y0c = std::min(std::max(y0, 0), h - 1);
        int y1c = std::min(std::max(y0 + 1, 0), h - 1);
        for (int x = 0; x < ow; ++x) {
            float fx = (x + 0.5f) * sx - 0.5f;
            int x0 = (int)floorf(fx);
            float wx = fx - x0;
            int x0c = std::min(std::max(x0, 0), w - 1);
            int x1c = std::min(std::max(x0 + 1, 0), w - 1);
            const float* p00 = in + (y0c * w + x0c) * c;
            const float* p01 = in + (y0c * w + x1c) * c;
            const float* p10 = in + (y1c * w + x0c) * c;
            const float* p11 = in + (y1c * w + x1c) * c;
            float* o = out + (y * ow + x) * c;
            for (int k = 0; k < c; ++k) {
                float top = p00[k] * (1 - wx) + p01[k] * wx;
                float bot = p10[k] * (1 - wx) + p11[k] * wx;
                o[k] = top * (1 - wy) + bot * wy;
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Non-overlapping box-mean downsample, HWC float32.
// ---------------------------------------------------------------------------
void box_downsample(const float* in, int h, int w, int c, int factor,
                    float* out) {
    int oh = h / factor, ow = w / factor;
    float inv = 1.0f / (factor * factor);
    for (int y = 0; y < oh; ++y) {
        for (int x = 0; x < ow; ++x) {
            float* o = out + (y * ow + x) * c;
            for (int k = 0; k < c; ++k) o[k] = 0.0f;
            for (int dy = 0; dy < factor; ++dy) {
                const float* row = in + ((y * factor + dy) * w + x * factor) * c;
                for (int dx = 0; dx < factor; ++dx) {
                    for (int k = 0; k < c; ++k) o[k] += row[dx * c + k];
                }
            }
            for (int k = 0; k < c; ++k) o[k] *= inv;
        }
    }
}

// ---------------------------------------------------------------------------
// .flo decode (Middlebury): returns 0 on success, fills w/h, writes flow.
// Caller passes buf of the whole file and an out buffer of h*w*2 floats
// obtained from a prior probe call (out == nullptr -> just parse header).
// ---------------------------------------------------------------------------
int decode_flo(const uint8_t* buf, int64_t n, int* out_w, int* out_h,
               float* out) {
    if (n < 12) return -1;
    float magic;
    std::memcpy(&magic, buf, 4);
    if (fabsf(magic - 202021.25f) > 1e-3f) return -2;
    int32_t w, h;
    std::memcpy(&w, buf + 4, 4);
    std::memcpy(&h, buf + 8, 4);
    *out_w = w;
    *out_h = h;
    if (!out) return 0;
    int64_t need = (int64_t)w * h * 2 * 4;
    if (n - 12 < need) return -3;
    std::memcpy(out, buf + 12, need);
    return 0;
}

// ---------------------------------------------------------------------------
// Procedural artificial moving-shapes sample (see data/artificial.py).
// Writes first/second (S*S*3) and flow (S*S*2).
// ---------------------------------------------------------------------------
void artificial_sample(int S, int y0, int x0, int hh, int ww,
                       int fy, int fx, int checkers,
                       float* first, float* second, float* flow) {
    // backgrounds (tiled 2x pattern cropped to S)
    auto bg_at = [&](int y, int x) -> float {
        if (!checkers) return 1.0f;
        int yy = y % S, xx = x % S;
        if (yy % 4 == 0 && xx % 4 == 0) return 0.4f;
        if (yy % 2 == 0 && xx % 2 == 0) return 0.2f;
        return 1.0f;
    };
    for (int y = 0; y < S; ++y) {
        for (int x = 0; x < S; ++x) {
            float b = bg_at(y, x);
            bool in_first = (y >= y0 && y < y0 + hh && x >= x0 && x < x0 + ww);
            bool in_second =
                (y >= y0 + fy && y < y0 + fy + hh && x >= x0 + fx && x < x0 + fx + ww);
            float* f = first + (y * S + x) * 3;
            float* s = second + (y * S + x) * 3;
            float vf = in_first ? 0.0f : b;
            float vs = in_second ? 0.0f : b;
            f[0] = f[1] = f[2] = vf;
            s[0] = s[1] = s[2] = vs;
            float* fl = flow + (y * S + x) * 2;
            fl[0] = in_first ? (float)fx : 0.0f;
            fl[1] = in_first ? (float)fy : 0.0f;
        }
    }
}

}  // extern "C"
