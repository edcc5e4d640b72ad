// odecore — native host-side ODE solver core.
//
// The reference's only native numerics live in third-party wheels: LSODA
// (Fortran ODEPACK) behind scipy.integrate.odeint, called with a Python RHS
// callback per internal step (/root/reference/ODElib/Framework.py:4,656 —
// SURVEY.md section 2 "native components"). This library is the rebuild's
// own native equivalent for the host side:
//
//  * adaptive Dormand-Prince 5(4) with Hairer dense output on an arbitrary
//    output grid (same algorithm as the TPU/JAX path in
//    odelib_tpu/ops/runge_kutta.py, so the two implementations cross-check
//    each other independently of scipy);
//  * an implicit TR-BDF2-style L-stable stepper with damped Newton for stiff
//    problems;
//  * a mass-action "term table" RHS evaluator: dy[target] += coeff * p[pidx]
//    * prod_s y[s]^pow[s]. Biological/ecological ODEs (all three demo
//    infection models, Lotka-Volterra, logistic, ...) compile to this form,
//    so integration runs with NO Python in the loop — unlike the reference,
//    which crosses the Python<->Fortran boundary every internal LSODA step;
//  * a C callback path for arbitrary RHS via ctypes.
//
// Failure model matches the JAX core: NaN output + ok=0, never an exception.
//
// Build: g++ -O3 -march=native -shared -fPIC odecore.cpp -o libodecore.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

typedef void (*rhs_fn)(double t, const double* y, double* dydt,
                       const double* params, void* user);

// ---------------------------------------------------------------------------
// Mass-action term table
// ---------------------------------------------------------------------------
// term i: dy[target[i]] += coeff[i] * (pidx[i] >= 0 ? params[pidx[i]] : 1)
//                          * prod_s y[s]^pow[i*n_states + s]
struct MassActionSystem {
  int n_states;
  int n_terms;
  std::vector<int> target;
  std::vector<double> coeff;
  std::vector<int> pidx;
  std::vector<int8_t> pow;  // n_terms x n_states exponents
};

void* ma_create(int n_states, int n_terms, const int* target,
                const double* coeff, const int* pidx, const int8_t* pow) {
  MassActionSystem* s = new MassActionSystem();
  s->n_states = n_states;
  s->n_terms = n_terms;
  s->target.assign(target, target + n_terms);
  s->coeff.assign(coeff, coeff + n_terms);
  s->pidx.assign(pidx, pidx + n_terms);
  s->pow.assign(pow, pow + (size_t)n_terms * n_states);
  return s;
}

void ma_destroy(void* sys) { delete static_cast<MassActionSystem*>(sys); }

static inline void ma_eval(const MassActionSystem* s, const double* y,
                           double* dydt, const double* params) {
  const int ns = s->n_states;
  for (int i = 0; i < ns; ++i) dydt[i] = 0.0;
  for (int t = 0; t < s->n_terms; ++t) {
    double v = s->coeff[t];
    if (s->pidx[t] >= 0) v *= params[s->pidx[t]];
    const int8_t* pw = &s->pow[(size_t)t * ns];
    for (int sidx = 0; sidx < ns; ++sidx) {
      int8_t e = pw[sidx];
      if (e == 1) {
        v *= y[sidx];
      } else if (e > 1) {
        v *= std::pow(y[sidx], (double)e);
      }
    }
    dydt[s->target[t]] += v;
  }
}

static void ma_rhs(double t, const double* y, double* dydt,
                   const double* params, void* user) {
  (void)t;
  ma_eval(static_cast<const MassActionSystem*>(user), y, dydt, params);
}

// ---------------------------------------------------------------------------
// Dormand-Prince 5(4) with dense output (Hairer DOPRI5 coefficients)
// ---------------------------------------------------------------------------
namespace dp {
static const double c2 = 1.0 / 5, c3 = 3.0 / 10, c4 = 4.0 / 5, c5 = 8.0 / 9;
static const double a21 = 1.0 / 5;
static const double a31 = 3.0 / 40, a32 = 9.0 / 40;
static const double a41 = 44.0 / 45, a42 = -56.0 / 15, a43 = 32.0 / 9;
static const double a51 = 19372.0 / 6561, a52 = -25360.0 / 2187,
                    a53 = 64448.0 / 6561, a54 = -212.0 / 729;
static const double a61 = 9017.0 / 3168, a62 = -355.0 / 33,
                    a63 = 46732.0 / 5247, a64 = 49.0 / 176,
                    a65 = -5103.0 / 18656;
static const double b1 = 35.0 / 384, b3 = 500.0 / 1113, b4 = 125.0 / 192,
                    b5 = -2187.0 / 6784, b6 = 11.0 / 84;
static const double e1 = 71.0 / 57600, e3 = -71.0 / 16695, e4 = 71.0 / 1920,
                    e5 = -17253.0 / 339200, e6 = 22.0 / 525, e7 = -1.0 / 40;
static const double d1 = -12715105075.0 / 11282082432.0,
                    d3 = 87487479700.0 / 32700410799.0,
                    d4 = -10690763975.0 / 1880347072.0,
                    d5 = 701980252875.0 / 199316789632.0,
                    d6 = -1453857185.0 / 822651844.0,
                    d7 = 69997945.0 / 29380423.0;
}  // namespace dp

struct Work {
  std::vector<double> k1, k2, k3, k4, k5, k6, k7, ytmp, ynew, err;
  std::vector<double> r1, r2, r3, r4, r5;
  explicit Work(int n)
      : k1(n), k2(n), k3(n), k4(n), k5(n), k6(n), k7(n), ytmp(n), ynew(n),
        err(n), r1(n), r2(n), r3(n), r4(n), r5(n) {}
};

static double error_ratio(int n, const double* err, const double* y0,
                          const double* y1, double rtol, double atol) {
  double acc = 0.0;
  for (int i = 0; i < n; ++i) {
    double sc = atol + rtol * std::fmax(std::fabs(y0[i]), std::fabs(y1[i]));
    double r = err[i] / sc;
    acc += r * r;
  }
  return std::sqrt(acc / n);
}

// One dopri5 step; fills work.ynew/k7/err and the dense coefficients.
static void dopri5_step(rhs_fn f, double t, const double* y, const double* k1,
                        double h, const double* params, void* user, int n,
                        Work& w) {
  for (int i = 0; i < n; ++i) w.ytmp[i] = y[i] + h * dp::a21 * k1[i];
  f(t + dp::c2 * h, w.ytmp.data(), w.k2.data(), params, user);
  for (int i = 0; i < n; ++i)
    w.ytmp[i] = y[i] + h * (dp::a31 * k1[i] + dp::a32 * w.k2[i]);
  f(t + dp::c3 * h, w.ytmp.data(), w.k3.data(), params, user);
  for (int i = 0; i < n; ++i)
    w.ytmp[i] =
        y[i] + h * (dp::a41 * k1[i] + dp::a42 * w.k2[i] + dp::a43 * w.k3[i]);
  f(t + dp::c4 * h, w.ytmp.data(), w.k4.data(), params, user);
  for (int i = 0; i < n; ++i)
    w.ytmp[i] = y[i] + h * (dp::a51 * k1[i] + dp::a52 * w.k2[i] +
                            dp::a53 * w.k3[i] + dp::a54 * w.k4[i]);
  f(t + dp::c5 * h, w.ytmp.data(), w.k5.data(), params, user);
  for (int i = 0; i < n; ++i)
    w.ytmp[i] =
        y[i] + h * (dp::a61 * k1[i] + dp::a62 * w.k2[i] + dp::a63 * w.k3[i] +
                    dp::a64 * w.k4[i] + dp::a65 * w.k5[i]);
  f(t + h, w.ytmp.data(), w.k6.data(), params, user);
  for (int i = 0; i < n; ++i)
    w.ynew[i] =
        y[i] + h * (dp::b1 * k1[i] + dp::b3 * w.k3[i] + dp::b4 * w.k4[i] +
                    dp::b5 * w.k5[i] + dp::b6 * w.k6[i]);
  f(t + h, w.ynew.data(), w.k7.data(), params, user);
  for (int i = 0; i < n; ++i)
    w.err[i] = h * (dp::e1 * k1[i] + dp::e3 * w.k3[i] + dp::e4 * w.k4[i] +
                    dp::e5 * w.k5[i] + dp::e6 * w.k6[i] + dp::e7 * w.k7[i]);
  // dense coefficients
  for (int i = 0; i < n; ++i) {
    double delta = w.ynew[i] - y[i];
    w.r1[i] = y[i];
    w.r2[i] = delta;
    w.r3[i] = h * k1[i] - delta;
    w.r4[i] = delta - h * w.k7[i] - w.r3[i];
    w.r5[i] = h * (dp::d1 * k1[i] + dp::d3 * w.k3[i] + dp::d4 * w.k4[i] +
                   dp::d5 * w.k5[i] + dp::d6 * w.k6[i] + dp::d7 * w.k7[i]);
  }
}

static inline double dense_eval(const Work& w, int i, double theta) {
  double th1 = 1.0 - theta;
  return w.r1[i] +
         theta * (w.r2[i] + th1 * (w.r3[i] + theta * (w.r4[i] + th1 * w.r5[i])));
}

// Integrate on a fixed output grid ts[0..T-1] (ts[0] = t0). Returns 1 on
// success, 0 on failure (remaining outputs are NaN). Generic RHS version.
int solve_grid(rhs_fn f, void* user, const double* params, const double* y0,
               int n, const double* ts, int T, double rtol, double atol,
               long max_steps, double* out /* T x n */) {
  Work w(n);
  std::vector<double> y(y0, y0 + n), k1(n);
  double t = ts[0];
  std::memcpy(out, y0, n * sizeof(double));

  f(t, y.data(), k1.data(), params, user);

  // Hairer initial step selection
  double d0 = 0, d1 = 0;
  for (int i = 0; i < n; ++i) {
    double sc = atol + rtol * std::fabs(y[i]);
    d0 += (y[i] / sc) * (y[i] / sc);
    d1 += (k1[i] / sc) * (k1[i] / sc);
  }
  d0 = std::sqrt(d0 / n);
  d1 = std::sqrt(d1 / n);
  double h0 = (d0 < 1e-5 || d1 < 1e-5) ? 1e-6 : 0.01 * d0 / d1;
  std::vector<double> y1(n), f1(n);
  for (int i = 0; i < n; ++i) y1[i] = y[i] + h0 * k1[i];
  f(t + h0, y1.data(), f1.data(), params, user);
  double d2 = 0;
  for (int i = 0; i < n; ++i) {
    double sc = atol + rtol * std::fabs(y[i]);
    double df = (f1[i] - k1[i]) / sc;
    d2 += df * df;
  }
  d2 = std::sqrt(d2 / n) / h0;
  double dmax = std::fmax(d1, d2);
  double h1 = dmax <= 1e-15 ? std::fmax(1e-6, h0 * 1e-3)
                            : std::pow(0.01 / dmax, 0.2);
  double h = std::fmin(100.0 * h0, h1);
  const double tiny = 1.5e-154;  // sqrt(DBL_MIN)-ish
  if (h < tiny) h = tiny;

  long nsteps = 0;
  double t_prev = t, h_prev = 1.0;
  bool have_dense = false;

  for (int oi = 1; oi < T; ++oi) {
    double target = ts[oi];
    while (t < target) {
      if (nsteps >= max_steps || !(h > tiny) || !std::isfinite(h)) {
        for (int r = oi; r < T; ++r)
          for (int i = 0; i < n; ++i) out[(size_t)r * n + i] = NAN;
        return 0;
      }
      dopri5_step(f, t, y.data(), k1.data(), h, params, user, n, w);
      ++nsteps;
      double ratio = error_ratio(n, w.err.data(), y.data(), w.ynew.data(),
                                 rtol, atol);
      bool bad = !std::isfinite(ratio);
      for (int i = 0; i < n && !bad; ++i)
        if (!std::isfinite(w.ynew[i])) bad = true;
      bool accept = !bad && ratio <= 1.0;
      double factor =
          (ratio == 0.0)
              ? 10.0
              : std::fmin(10.0, std::fmax(0.2, 0.9 * std::pow(ratio, -0.2)));
      if (bad) factor = 0.2;
      if (!accept) factor = std::fmin(factor, 1.0);
      if (accept) {
        t_prev = t;
        h_prev = h;
        t += h;
        y = w.ynew;
        k1 = w.k7;  // FSAL
        have_dense = true;
      }
      h *= factor;
    }
    double theta =
        have_dense ? std::fmin(1.0, std::fmax(0.0, (target - t_prev) / h_prev))
                   : 0.0;
    for (int i = 0; i < n; ++i)
      out[(size_t)oi * n + i] = have_dense ? dense_eval(w, i, theta) : y[i];
  }
  return 1;
}

int solve_grid_mass_action(void* sys, const double* params, const double* y0,
                           int n, const double* ts, int T, double rtol,
                           double atol, long max_steps, double* out) {
  return solve_grid(ma_rhs, sys, params, y0, n, ts, T, rtol, atol, max_steps,
                    out);
}

// Batched mass-action driver: N independent parameter sets / inits.
// Returns number of successful solves.
int solve_grid_mass_action_batch(void* sys, const double* params /* N x P */,
                                 int P, const double* y0s /* N x n */, int n,
                                 int N, const double* ts, int T, double rtol,
                                 double atol, long max_steps,
                                 double* out /* N x T x n */, int* ok) {
  int good = 0;
  for (int j = 0; j < N; ++j) {
    ok[j] = solve_grid(ma_rhs, sys, params + (size_t)j * P,
                       y0s + (size_t)j * n, n, ts, T, rtol, atol, max_steps,
                       out + (size_t)j * T * n);
    good += ok[j];
  }
  return good;
}

// ---------------------------------------------------------------------------
// Stiff: TR-BDF2 (trapezoidal + BDF2 composite, L-stable) with damped Newton
// and finite-difference Jacobian. Adequate for small n; error control via
// embedded comparison of the two sub-steps.
// ---------------------------------------------------------------------------
static bool lin_solve(int n, std::vector<double>& A, std::vector<double>& b) {
  // Gaussian elimination with partial pivoting; A is n x n row-major.
  for (int col = 0; col < n; ++col) {
    int piv = col;
    double best = std::fabs(A[(size_t)col * n + col]);
    for (int r = col + 1; r < n; ++r) {
      double v = std::fabs(A[(size_t)r * n + col]);
      if (v > best) {
        best = v;
        piv = r;
      }
    }
    if (best < 1e-300) return false;
    if (piv != col) {
      for (int c = 0; c < n; ++c)
        std::swap(A[(size_t)piv * n + c], A[(size_t)col * n + c]);
      std::swap(b[piv], b[col]);
    }
    double inv = 1.0 / A[(size_t)col * n + col];
    for (int r = col + 1; r < n; ++r) {
      double m = A[(size_t)r * n + col] * inv;
      if (m == 0.0) continue;
      for (int c = col; c < n; ++c)
        A[(size_t)r * n + c] -= m * A[(size_t)col * n + c];
      b[r] -= m * b[col];
    }
  }
  for (int r = n - 1; r >= 0; --r) {
    double s = b[r];
    for (int c = r + 1; c < n; ++c) s -= A[(size_t)r * n + c] * b[c];
    b[r] = s / A[(size_t)r * n + r];
  }
  return true;
}

static void fd_jacobian(rhs_fn f, double t, const double* y, const double* f0,
                        const double* params, void* user, int n,
                        std::vector<double>& J) {
  std::vector<double> yp(y, y + n), fp(n);
  for (int c = 0; c < n; ++c) {
    double eps = 1e-8 * std::fmax(1.0, std::fabs(y[c]));
    yp[c] = y[c] + eps;
    f(t, yp.data(), fp.data(), params, user);
    yp[c] = y[c];
    for (int r = 0; r < n; ++r) J[(size_t)r * n + c] = (fp[r] - f0[r]) / eps;
  }
}

// Newton solve of z = base + hc * f(t, z); returns success.
static bool newton_stage(rhs_fn f, double t, const double* base, double hc,
                         const double* params, void* user, int n,
                         const std::vector<double>& J, std::vector<double>& z,
                         double tol) {
  std::vector<double> fz(n), res(n), A((size_t)n * n);
  for (int it = 0; it < 8; ++it) {
    f(t, z.data(), fz.data(), params, user);
    double rn = 0;
    for (int i = 0; i < n; ++i) {
      res[i] = z[i] - base[i] - hc * fz[i];
      rn += res[i] * res[i];
    }
    if (std::sqrt(rn) < tol) return true;
    // A = I - hc*J
    for (int r = 0; r < n; ++r)
      for (int c = 0; c < n; ++c)
        A[(size_t)r * n + c] = (r == c ? 1.0 : 0.0) - hc * J[(size_t)r * n + c];
    std::vector<double> rhs = res;
    if (!lin_solve(n, A, rhs)) return false;
    for (int i = 0; i < n; ++i) z[i] -= rhs[i];
    if (!std::isfinite(z[0])) return false;
  }
  return true;  // accept after max iterations; error control catches drift
}

int solve_grid_stiff(rhs_fn f, void* user, const double* params,
                     const double* y0, int n, const double* ts, int T,
                     double rtol, double atol, long max_steps, double* out) {
  const double gamma = 2.0 - std::sqrt(2.0);
  std::vector<double> y(y0, y0 + n), f0(n), J((size_t)n * n);
  std::vector<double> z1(n), z2(n), base(n), yb(n);
  double t = ts[0];
  std::memcpy(out, y0, n * sizeof(double));
  double h = (ts[T - 1] - ts[0]) / 100.0;
  const double tiny = 1.5e-154;
  long nsteps = 0;
  double t_prev = t, h_prev = 1.0;
  std::vector<double> ylo(y), yhi(y), flo(n), fhi(n);
  bool have_step = false;

  for (int oi = 1; oi < T; ++oi) {
    double target = ts[oi];
    while (t < target) {
      if (nsteps >= max_steps || !(h > tiny) || !std::isfinite(h)) {
        for (int r = oi; r < T; ++r)
          for (int i = 0; i < n; ++i) out[(size_t)r * n + i] = NAN;
        return 0;
      }
      ++nsteps;
      f(t, y.data(), f0.data(), params, user);
      fd_jacobian(f, t, y.data(), f0.data(), params, user, n, J);
      double tol_newton = 0.1 * atol;
      // TR stage: z1 = y + (gamma*h/2)(f(y) + f(z1))
      double hc = gamma * h / 2.0;
      for (int i = 0; i < n; ++i) base[i] = y[i] + hc * f0[i];
      z1 = y;
      bool ok1 = newton_stage(f, t + gamma * h, base.data(), hc, params, user,
                              n, J, z1, tol_newton);
      // BDF2 stage (Bank et al.): y_new = a*z1 + b*y + hc2*f(y_new),
      // a = 1/(g(2-g)), b = -(1-g)^2/(g(2-g)), a+b = 1 (consistent).
      double a_w = 1.0 / (gamma * (2.0 - gamma));
      double b_w = -((1.0 - gamma) * (1.0 - gamma)) / (gamma * (2.0 - gamma));
      double hc2 = h * (1.0 - gamma) / (2.0 - gamma);
      for (int i = 0; i < n; ++i) base[i] = a_w * z1[i] + b_w * y[i];
      z2 = z1;
      bool ok2 = newton_stage(f, t + h, base.data(), hc2, params, user, n, J,
                              z2, tol_newton);
      // error estimate: compare z2 against one TR step over the whole h
      for (int i = 0; i < n; ++i) yb[i] = y[i] + (h / 2.0) * f0[i];
      std::vector<double> ztr = z2;
      bool ok3 = newton_stage(f, t + h, yb.data(), h / 2.0, params, user, n, J,
                              ztr, tol_newton);
      double ratio = 0.0;
      bool bad = !(ok1 && ok2 && ok3);
      if (!bad) {
        double acc = 0;
        for (int i = 0; i < n; ++i) {
          double sc =
              atol + rtol * std::fmax(std::fabs(y[i]), std::fabs(z2[i]));
          double e = (z2[i] - ztr[i]) / sc;
          acc += e * e;
          if (!std::isfinite(z2[i])) bad = true;
        }
        ratio = std::sqrt(acc / n);
        if (!std::isfinite(ratio)) bad = true;
      }
      bool accept = !bad && ratio <= 1.0;
      double factor =
          bad ? 0.2
              : ((ratio == 0.0) ? 5.0
                                : std::fmin(5.0, std::fmax(
                                                     0.2,
                                                     0.9 * std::pow(
                                                               ratio, -1.0 / 3))));
      if (!accept) factor = std::fmin(factor, 1.0);
      if (accept) {
        t_prev = t;
        h_prev = h;
        ylo = y;
        y = z2;
        yhi = y;
        have_step = true;
        t += h;
      }
      h *= factor;
    }
    // cubic Hermite interpolation on the last accepted step
    if (have_step) {
      double theta = std::fmin(1.0, std::fmax(0.0, (target - t_prev) / h_prev));
      f(t_prev, ylo.data(), flo.data(), params, user);
      f(t_prev + h_prev, yhi.data(), fhi.data(), params, user);
      double t2 = theta * theta, t3 = t2 * theta;
      double h00 = 2 * t3 - 3 * t2 + 1, h10 = t3 - 2 * t2 + theta;
      double h01 = -2 * t3 + 3 * t2, h11 = t3 - t2;
      for (int i = 0; i < n; ++i)
        out[(size_t)oi * n + i] = h00 * ylo[i] + h10 * h_prev * flo[i] +
                                  h01 * yhi[i] + h11 * h_prev * fhi[i];
    } else {
      for (int i = 0; i < n; ++i) out[(size_t)oi * n + i] = y[i];
    }
  }
  return 1;
}

int solve_grid_stiff_mass_action(void* sys, const double* params,
                                 const double* y0, int n, const double* ts,
                                 int T, double rtol, double atol,
                                 long max_steps, double* out) {
  return solve_grid_stiff(ma_rhs, sys, params, y0, n, ts, T, rtol, atol,
                          max_steps, out);
}

}  // extern "C"
