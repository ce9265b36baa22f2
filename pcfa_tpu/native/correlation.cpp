// Native (C++/OpenMP) correlation kernels.
//
// TPU-native equivalents of the reference's CPU/CUDA extension packages
// (SURVEY.md §2.5 #1 and #2): the hot path on TPU is the XLA/Pallas
// implementation in pcfa_tpu/ops; this native build provides
//   * an independent golden oracle for kernel tests (same role as the
//     vendored OpenMP build of `spatial_correlation_sampler` in the
//     reference: Correlation_Module/correlation.cpp),
//   * a fast host-side fallback for environments without accelerators.
//
// Layout: channels-last (B, H, W, C) float32, matching the framework.
// Build: see pcfa_tpu/native/__init__.py (g++ -O3 -fopenmp -shared -fPIC).

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Local (patch) correlation, PWCNet flavor (kernel=1, stride=1):
//   out[b,h,w,(dy+R)*P+(dx+R)] = sum_c f1[b,h,w,c] * f2[b,h+dy,w+dx,c] / C
// with zero padding outside the image.
void local_correlation_f32(const float* f1, const float* f2, float* out,
                           int64_t B, int64_t H, int64_t W, int64_t C,
                           int64_t patch) {
    const int64_t R = (patch - 1) / 2;
    const int64_t PP = patch * patch;
    const float inv_c = 1.0f / static_cast<float>(C);

#pragma omp parallel for collapse(2) schedule(static)
    for (int64_t b = 0; b < B; ++b) {
        for (int64_t h = 0; h < H; ++h) {
            for (int64_t w = 0; w < W; ++w) {
                const float* p1 = f1 + ((b * H + h) * W + w) * C;
                float* po = out + ((b * H + h) * W + w) * PP;
                for (int64_t dy = -R; dy <= R; ++dy) {
                    const int64_t hh = h + dy;
                    for (int64_t dx = -R; dx <= R; ++dx) {
                        const int64_t ww = w + dx;
                        float acc = 0.0f;
                        if (hh >= 0 && hh < H && ww >= 0 && ww < W) {
                            const float* p2 =
                                f2 + ((b * H + hh) * W + ww) * C;
                            for (int64_t c = 0; c < C; ++c)
                                acc += p1[c] * p2[c];
                        }
                        po[(dy + R) * patch + (dx + R)] = acc * inv_c;
                    }
                }
            }
        }
    }
}

// Global correlation, FlowNetC flavor: displacements on a stride2 grid in
// [-max_disp, max_disp]^2, zero padding, /C normalization, dy-major
// channel order (correlation_cuda_kernel.cu:85-135).
void global_correlation_f32(const float* f1, const float* f2, float* out,
                            int64_t B, int64_t H, int64_t W, int64_t C,
                            int64_t max_disp, int64_t stride2) {
    const int64_t D = 2 * (max_disp / stride2) + 1;
    const int64_t DD = D * D;
    const float inv_c = 1.0f / static_cast<float>(C);

#pragma omp parallel for collapse(2) schedule(static)
    for (int64_t b = 0; b < B; ++b) {
        for (int64_t h = 0; h < H; ++h) {
            for (int64_t w = 0; w < W; ++w) {
                const float* p1 = f1 + ((b * H + h) * W + w) * C;
                float* po = out + ((b * H + h) * W + w) * DD;
                int64_t ch = 0;
                for (int64_t dy = -max_disp; dy <= max_disp; dy += stride2) {
                    const int64_t hh = h + dy;
                    for (int64_t dx = -max_disp; dx <= max_disp;
                         dx += stride2, ++ch) {
                        const int64_t ww = w + dx;
                        float acc = 0.0f;
                        if (hh >= 0 && hh < H && ww >= 0 && ww < W) {
                            const float* p2 =
                                f2 + ((b * H + hh) * W + ww) * C;
                            for (int64_t c = 0; c < C; ++c)
                                acc += p1[c] * p2[c];
                        }
                        po[ch] = acc * inv_c;
                    }
                }
            }
        }
    }
}

int native_num_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
