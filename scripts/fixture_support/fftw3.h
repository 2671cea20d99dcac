// Minimal FFTW-compatible substitute: implements the exact r2c/c2r 2-D DFT
// semantics (row-major [n0][n1], Hermitian-reduced last dim, unnormalized
// inverse) with separable naive 1-D DFT passes — O(N^3) overall, exact in
// f64, fast enough up to ~512^2. Used to build the reference binaries as
// test fixtures where real FFTW is absent.
#pragma once
#include <cstdlib>
#include <cmath>
#include <vector>
typedef double fftw_complex[2];
struct fftw_plan_s {
    int kind;          // 0 = r2c, 1 = c2r
    int n0, n1;
    double* rbuf;
    fftw_complex* cbuf;
};
typedef fftw_plan_s* fftw_plan;
#define FFTW_ESTIMATE 0
static inline void* fftw_malloc(size_t n) { return malloc(n); }
static inline void fftw_free(void* p) { free(p); }
static inline fftw_plan fftw_plan_dft_r2c_2d(int n0, int n1, double* in,
                                             fftw_complex* out, unsigned) {
    return new fftw_plan_s{0, n0, n1, in, out};
}
static inline fftw_plan fftw_plan_dft_c2r_2d(int n0, int n1,
                                             fftw_complex* in, double* out,
                                             unsigned) {
    return new fftw_plan_s{1, n0, n1, out, in};
}
static inline void fftw_execute(fftw_plan p) {
    const int n0 = p->n0, n1 = p->n1, nh = n1 / 2 + 1;
    const double TWO_PI = 6.283185307179586476925286766559;
    // tmp[a][j]: row-transformed (forward) / column-inverse (backward)
    std::vector<double> tre(size_t(n0) * nh), tim(size_t(n0) * nh);
    if (p->kind == 0) {
        // rows: 1-D r2c of length n1
        for (int a = 0; a < n0; ++a)
            for (int j = 0; j < nh; ++j) {
                double re = 0, im = 0;
                for (int b = 0; b < n1; ++b) {
                    double ph = -TWO_PI * double(j) * b / n1;
                    re += p->rbuf[a * n1 + b] * cos(ph);
                    im += p->rbuf[a * n1 + b] * sin(ph);
                }
                tre[size_t(a) * nh + j] = re;
                tim[size_t(a) * nh + j] = im;
            }
        // columns: 1-D complex DFT of length n0
        for (int i = 0; i < n0; ++i)
            for (int j = 0; j < nh; ++j) {
                double re = 0, im = 0;
                for (int a = 0; a < n0; ++a) {
                    double ph = -TWO_PI * double(i) * a / n0;
                    double c = cos(ph), s = sin(ph);
                    re += tre[size_t(a) * nh + j] * c
                        - tim[size_t(a) * nh + j] * s;
                    im += tre[size_t(a) * nh + j] * s
                        + tim[size_t(a) * nh + j] * c;
                }
                p->cbuf[i * nh + j][0] = re;
                p->cbuf[i * nh + j][1] = im;
            }
    } else {
        // columns first: tmp[a][j] = sum_i C[i,j] e^{+2*pi*i*a/n0}
        for (int a = 0; a < n0; ++a)
            for (int j = 0; j < nh; ++j) {
                double re = 0, im = 0;
                for (int i = 0; i < n0; ++i) {
                    double ph = TWO_PI * double(i) * a / n0;
                    double c = cos(ph), s = sin(ph);
                    re += p->cbuf[i * nh + j][0] * c
                        - p->cbuf[i * nh + j][1] * s;
                    im += p->cbuf[i * nh + j][0] * s
                        + p->cbuf[i * nh + j][1] * c;
                }
                tre[size_t(a) * nh + j] = re;
                tim[size_t(a) * nh + j] = im;
            }
        // rows: Hermitian extension tmp[a][j>=nh] = conj(tmp[a][n1-j])
        for (int a = 0; a < n0; ++a)
            for (int b = 0; b < n1; ++b) {
                double acc = 0;
                for (int j = 0; j < n1; ++j) {
                    int jj = j < nh ? j : n1 - j;
                    double re = tre[size_t(a) * nh + jj];
                    double im = (j < nh ? 1.0 : -1.0)
                                * tim[size_t(a) * nh + jj];
                    double ph = TWO_PI * double(j) * b / n1;
                    acc += re * cos(ph) - im * sin(ph);
                }
                p->rbuf[a * n1 + b] = acc;
            }
    }
}
static inline void fftw_destroy_plan(fftw_plan p) { delete p; }
