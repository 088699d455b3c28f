// bq_native — C++ twin of the reference's native layer (bq_c.pyx).
//
// The reference implements its closed-form Gaussian-kernel integrals,
// covariance conditioning, and the per-candidate expected-squared-mean loop
// as a Cython extension (bayesian_quadrature/bq_c.pyx). The TPU compute path
// of this framework replaces those with fused XLA/Pallas programs; this C++
// library reproduces the same quantities as a sequential CPU implementation,
// serving two roles:
//   1. an independent oracle for the JAX closed forms (tests/test_native.py)
//      — derived from the math, not from the JAX code;
//   2. the measured "reference-native" baseline for bench.py: the reference's
//      hot loop is per-candidate compiled C called from Python, and this is
//      that loop at its best (no Python dispatch), making the reported TPU
//      speedup conservative.
//
// All routines are 1-D (the reference's regime), float64, extern "C" for
// ctypes. Built by tpubq/utils/native.py with g++ -O3.

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstddef>
#include <cstring>
#include <vector>

namespace {

constexpr double kTwoPi = 6.283185307179586476925286766559;

inline double norm_pdf(double v, double var) {
  return std::exp(-0.5 * v * v / var) / std::sqrt(kTwoPi * var);
}

// Dense lower-Cholesky, in place on row-major a (n x n). Returns 0 on
// success, 1 if a pivot was non-positive.
int cholesky(double* a, std::size_t n) {
  for (std::size_t j = 0; j < n; ++j) {
    double d = a[j * n + j];
    for (std::size_t k = 0; k < j; ++k) d -= a[j * n + k] * a[j * n + k];
    if (d <= 0.0) return 1;
    const double piv = std::sqrt(d);
    a[j * n + j] = piv;
    for (std::size_t i = j + 1; i < n; ++i) {
      double s = a[i * n + j];
      for (std::size_t k = 0; k < j; ++k) s -= a[i * n + k] * a[j * n + k];
      a[i * n + j] = s / piv;
    }
    for (std::size_t k = j + 1; k < n; ++k) a[j * n + k] = 0.0;
  }
  return 0;
}

// Solve L y = b then L^T x = y (x overwrites b).
void cho_solve(const double* L, double* b, std::size_t n) {
  for (std::size_t i = 0; i < n; ++i) {
    double s = b[i];
    for (std::size_t k = 0; k < i; ++k) s -= L[i * n + k] * b[k];
    b[i] = s / L[i * n + i];
  }
  for (std::size_t ii = n; ii-- > 0;) {
    double s = b[ii];
    for (std::size_t k = ii + 1; k < n; ++k) s -= L[k * n + ii] * b[k];
    b[ii] = s / L[ii * n + ii];
  }
}

}  // namespace

extern "C" {

// ∫ k(x', x_i) N(x'|mu, s2) dx'   (bq_c.pyx::int_K)
void bq_int_K(double* out, const double* x, std::size_t n, double h, double w,
              double mu, double s2) {
  const double c = h * h * std::sqrt(kTwoPi) * w;
  const double var = w * w + s2;
  for (std::size_t i = 0; i < n; ++i) out[i] = c * norm_pdf(x[i] - mu, var);
}

// ∫∫ k(x, x') p(x) p(x') dx dx'   (bq_c.pyx::int_int_K)
double bq_int_int_K(double h, double w, double mu, double s2) {
  (void)mu;
  return h * h * w / std::sqrt(w * w + 2.0 * s2);
}

// ∫ k1(x1_i, x) k2(x, x2_j) p(x) dx   (bq_c.pyx::int_K1_K2)
void bq_int_K1_K2(double* out, const double* x1, std::size_t n1,
                  const double* x2, std::size_t n2, double h1, double w1,
                  double h2, double w2, double mu, double s2) {
  const double c1 = h1 * h1 * std::sqrt(kTwoPi) * w1;
  const double c2 = h2 * h2 * std::sqrt(kTwoPi) * w2;
  const double w1s = w1 * w1, w2s = w2 * w2;
  const double C = w1s * w2s / (w1s + w2s);
  for (std::size_t i = 0; i < n1; ++i) {
    for (std::size_t j = 0; j < n2; ++j) {
      const double m = (w2s * x1[i] + w1s * x2[j]) / (w1s + w2s);
      out[i * n2 + j] = c1 * c2 * norm_pdf(x1[i] - x2[j], w1s + w2s) *
                        norm_pdf(m - mu, C + s2);
    }
  }
}

// ∫∫ k1(a, x) k2(x, x') k1(x', b) p(x) p(x') dx dx'  (bq_c.pyx::int_int_K1_K2)
void bq_int_int_K1_K2(double* out, const double* x1, std::size_t n1,
                      const double* x2, std::size_t n2, double h1, double w1,
                      double h2, double w2, double mu, double s2) {
  const double c1 = h1 * h1 * std::sqrt(kTwoPi) * w1;
  const double c2 = h2 * h2 * std::sqrt(kTwoPi) * w2;
  const double w1s = w1 * w1, w2s = w2 * w2;
  const double A = w1s + s2;
  const double S1 = w1s * s2 / A;
  const double dm_scale = s2 / A;
  const double Vm = 2.0 * S1 + w2s;
  std::vector<double> na(n1), nb(n2);
  for (std::size_t i = 0; i < n1; ++i) na[i] = norm_pdf(x1[i] - mu, A);
  for (std::size_t j = 0; j < n2; ++j) nb[j] = norm_pdf(x2[j] - mu, A);
  for (std::size_t i = 0; i < n1; ++i) {
    for (std::size_t j = 0; j < n2; ++j) {
      const double dm = dm_scale * (x1[i] - x2[j]);
      out[i * n2 + j] = c1 * c1 * c2 * na[i] * nb[j] * norm_pdf(dm, Vm);
    }
  }
}

// ∫∫ k1(a, x) k2(x, x') p(x) p(x') dx dx'
void bq_int_K1_int_K2(double* out, const double* x1, std::size_t n1, double h1,
                      double w1, double h2, double w2, double mu, double s2) {
  const double c1 = h1 * h1 * std::sqrt(kTwoPi) * w1;
  const double c2 = h2 * h2 * std::sqrt(kTwoPi) * w2;
  const double w2s = w2 * w2;
  const double S3 = (w2s + s2) * s2 / (w2s + 2.0 * s2);
  const double n0 = norm_pdf(0.0, w2s + 2.0 * s2);
  for (std::size_t i = 0; i < n1; ++i)
    out[i] = c1 * c2 * n0 * norm_pdf(x1[i] - mu, w1 * w1 + S3);
}

// Escalating diagonal jitter until Cholesky succeeds; writes the factor to
// L (row-major lower) and returns the jitter used, or -1 on failure.
// (bq_c.pyx::improve_covariance_conditioning, functional form)
double bq_improve_conditioning(const double* K, double* L, std::size_t n) {
  double trace = 0.0;
  for (std::size_t i = 0; i < n; ++i) trace += K[i * n + i];
  const double scale = trace / static_cast<double>(n);
  const double ladder[7] = {0.0, 1e-12, 1e-10, 1e-8, 1e-6, 1e-4, 1e-2};
  for (double rel : ladder) {
    std::memcpy(L, K, n * n * sizeof(double));
    for (std::size_t i = 0; i < n; ++i) L[i * n + i] += rel * scale;
    if (cholesky(L, n) == 0) return rel * scale;
  }
  return -1.0;
}

// The reference's hot loop (stack C): sequential per-candidate expected
// squared mean. L_l: Cholesky of the linear GP Gram over xsc (nsc x nsc);
// L_tl: over xs (ns x ns). Everything float64, 1-D.
void bq_esm_grid(double* out, const double* grid, std::size_t na,
                 const double* xsc, std::size_t nsc, const double* alpha,
                 const double* L_l, const double* xs, std::size_t ns,
                 const double* alpha_tl, const double* L_tl, double h_l,
                 double w_l, double h_tl, double w_tl, double mu, double s2,
                 double gamma, double thresh) {
  const double c_l = h_l * h_l * std::sqrt(kTwoPi) * w_l;
  const double var_l = w_l * w_l + s2;
  std::vector<double> z(nsc), k(nsc), v(nsc), ktl(ns), vtl(ns);
  for (std::size_t i = 0; i < nsc; ++i) z[i] = c_l * norm_pdf(xsc[i] - mu, var_l);
  double zTa = 0.0;
  for (std::size_t i = 0; i < nsc; ++i) zTa += z[i] * alpha[i];

  for (std::size_t a = 0; a < na; ++a) {
    const double xa = grid[a];
    double dmin = 1e300;
    for (std::size_t i = 0; i < nsc; ++i)
      dmin = std::min(dmin, std::fabs(xsc[i] - xa));
    if (dmin < thresh) {
      out[a] = zTa * zTa;
      continue;
    }
    for (std::size_t i = 0; i < nsc; ++i) {
      const double d = (xsc[i] - xa) / w_l;
      k[i] = h_l * h_l * std::exp(-0.5 * d * d);
      v[i] = k[i];
    }
    cho_solve(L_l, v.data(), nsc);
    double kv = 0.0, zv = 0.0, ka = 0.0;
    for (std::size_t i = 0; i < nsc; ++i) {
      kv += k[i] * v[i];
      zv += z[i] * v[i];
      ka += k[i] * alpha[i];
    }
    const double gam = h_l * h_l - kv;
    if (gam <= 1e-14) {
      out[a] = zTa * zTa;
      continue;
    }
    const double zeta = c_l * norm_pdf(xa - mu, var_l);
    const double B = (zeta - zv) / gam;
    const double A = zTa - B * ka;
    for (std::size_t i = 0; i < ns; ++i) {
      const double d = (xs[i] - xa) / w_tl;
      ktl[i] = h_tl * h_tl * std::exp(-0.5 * d * d);
      vtl[i] = ktl[i];
    }
    cho_solve(L_tl, vtl.data(), ns);
    double m_a = 0.0, kvtl = 0.0;
    for (std::size_t i = 0; i < ns; ++i) {
      m_a += ktl[i] * alpha_tl[i];
      kvtl += ktl[i] * vtl[i];
    }
    const double c_a = std::max(h_tl * h_tl - kvtl, 0.0);
    const double e1 = std::exp(m_a + 0.5 * c_a);
    const double e2 = std::exp(2.0 * m_a + 2.0 * c_a);
    const double E1 = gamma * (e1 - 1.0);
    const double E2 = gamma * gamma * (e2 - 2.0 * e1 + 1.0);
    out[a] = A * A + 2.0 * A * B * E1 + B * B * E2;
  }
}

// ---------------------------------------------------------------------------
// Periodic-kernel measure integrals (Jacobi–Anger; independent oracle for
// tpubq/ops/integrals.py's int_*_periodic — see PARITY.md addendum (m)).
// Bessel terms come from the STANDARD LIBRARY (std::cyl_bessel_i), not a
// Miller recurrence, so the two implementations share no numerical code.
// Valid for z = 1/w² ≲ 700 (I_n(z)·e^{−z} computed by explicit scaling; the
// oracle regime — the JAX side owns extreme scales).
// ---------------------------------------------------------------------------

// ∫ k_per(x', x_i) N(x'|mu, s2) dx',
// k_per(d) = h² exp(−2 sin²(d/(2p))/w²) = h² e^{−z} Σ_n I_n(z) e^{i n d / p}.
void bq_int_K_periodic(double* out, const double* x, std::size_t n, double h,
                       double w, double p, double mu, double s2, int nterms) {
  const double z = 1.0 / (w * w);
  const double om = 1.0 / p;
  const double ez = std::exp(-z);
  std::vector<double> a(nterms + 1);
  for (int k = 0; k <= nterms; ++k) a[k] = ez * std::cyl_bessel_i(k, z);
  for (std::size_t i = 0; i < n; ++i) {
    double acc = a[0];
    for (int k = 1; k <= nterms; ++k) {
      const double t = k * om;
      acc += 2.0 * a[k] * std::exp(-0.5 * t * t * s2) *
             std::cos(t * (x[i] - mu));
    }
    out[i] = h * h * acc;
  }
}

// ∫∫ k1(x1_a, x) k2(x, x') k1(x', x2_b) p(x) p(x') dx dx', all periodic —
// the V[Z] workhorse, as the rank-per-inner-harmonic factorization
// T_ab = Σ_m B_m F_m(a) G_m(b) with φ(t) = e^{itμ − t²σ²/2}.
void bq_int_int_K1_K2_periodic(double* out, const double* x1, std::size_t n1,
                               const double* x2, std::size_t n2, double h1,
                               double w1, double p1, double h2, double w2,
                               double p2, double mu, double s2, int nterms) {
  const double z1 = 1.0 / (w1 * w1), z2 = 1.0 / (w2 * w2);
  const double om1 = 1.0 / p1, om2 = 1.0 / p2;
  const double e1 = std::exp(-z1), e2 = std::exp(-z2);
  const int N = nterms;
  std::vector<double> A(2 * N + 1), B(2 * N + 1);
  for (int k = -N; k <= N; ++k) {
    A[k + N] = h1 * h1 * e1 * std::cyl_bessel_i(std::abs(k), z1);
    B[k + N] = h2 * h2 * e2 * std::cyl_bessel_i(std::abs(k), z2);
  }
  auto phi = [&](double t) {
    return std::polar(std::exp(-0.5 * t * t * s2), t * mu);
  };
  for (std::size_t a = 0; a < n1; ++a) std::memset(out + a * n2, 0, n2 * 8);
  std::vector<std::complex<double>> F(n1), G(n2);
  for (int m = -N; m <= N; ++m) {
    std::fill(F.begin(), F.end(), std::complex<double>(0.0, 0.0));
    std::fill(G.begin(), G.end(), std::complex<double>(0.0, 0.0));
    for (int nn = -N; nn <= N; ++nn) {
      const std::complex<double> pf = phi(m * om2 - nn * om1);
      const std::complex<double> pg = phi(nn * om1 - m * om2);
      for (std::size_t i = 0; i < n1; ++i)
        F[i] += A[nn + N] * pf * std::polar(1.0, nn * om1 * x1[i]);
      for (std::size_t j = 0; j < n2; ++j)
        G[j] += A[nn + N] * pg * std::polar(1.0, -nn * om1 * x2[j]);
    }
    for (std::size_t i = 0; i < n1; ++i)
      for (std::size_t j = 0; j < n2; ++j)
        out[i * n2 + j] += B[m + N] * std::real(F[i] * G[j]);
  }
}

}  // extern "C"
