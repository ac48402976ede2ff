// Production box-LCP solver — the toolkit/lcp.{h,cc} equivalent tier.
//
// Solves A x = b + w with lo <= x <= hi and complementarity
// (x_i at lo => w_i >= 0, at hi => w_i <= 0, interior => w_i = 0),
// A symmetric positive definite.
//
// Algorithm: principal pivoting over an index set F of "free" variables
// (interior) with the remaining variables clamped at a bound, like the
// reference's MURTY/COTTLE_DANTZIG modes (toolkit/lcp.h:135-175).  The
// factorization of A[F,F] is a Cholesky factor maintained
// *incrementally*: freeing a variable appends a row to the factor
// (O(f^2)); clamping a variable removes its row and refactors only the
// trailing block (the role of the reference's LinearReducer /
// AddCholeskyRow / SwapCholeskyRows, toolkit/lcp.cc:799-1077).
//
// C ABI for ctypes; no external dependencies.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Chol {
  // Lower-triangular factor of A[F,F] in the order variables were freed.
  int n = 0;                    // full problem size
  std::vector<int> order;       // free variables, factor order
  std::vector<double> L;        // (cap x cap) row-major lower factor
  int cap = 0;
  const double* A = nullptr;    // full matrix (n x n)

  void init(const double* A_, int n_) {
    A = A_;
    n = n_;
    cap = n;
    L.assign((size_t)cap * cap, 0.0);
    order.clear();
  }

  int size() const { return (int)order.size(); }

  double a(int i, int j) const { return A[(size_t)i * n + j]; }

  // Append variable v to the free set; returns false if the pivot is
  // not positive (numerically singular).
  bool add(int v) {
    int f = size();
    // Solve L y = A[order, v] by forward substitution into row f.
    for (int i = 0; i < f; ++i) {
      double s = a(order[i], v);
      for (int k = 0; k < i; ++k) s -= L[(size_t)i * cap + k] * L[(size_t)f * cap + k];
      L[(size_t)f * cap + i] = s / L[(size_t)i * cap + i];
    }
    double d = a(v, v);
    for (int k = 0; k < f; ++k) d -= L[(size_t)f * cap + k] * L[(size_t)f * cap + k];
    if (d <= 1e-300) return false;
    L[(size_t)f * cap + f] = std::sqrt(d);
    order.push_back(v);
    return true;
  }

  // Remove variable v from the free set: drop its factor row and
  // refactor the trailing block (incremental partial refactor).
  void remove(int v) {
    int pos = -1;
    for (int i = 0; i < size(); ++i)
      if (order[i] == v) { pos = i; break; }
    if (pos < 0) return;
    order.erase(order.begin() + pos);
    // shift factor rows up so row r holds the data of old row r+1
    // (columns < pos stay valid; columns >= pos get recomputed below)
    for (int r = pos; r < size(); ++r) {
      std::memcpy(&L[(size_t)r * cap], &L[(size_t)(r + 1) * cap],
                  cap * sizeof(double));
    }
    // re-run the factorization from column `pos` over the shifted rows
    for (int i = pos; i < size(); ++i) {
      int vi = order[i];
      for (int j = pos; j <= i; ++j) {
        // recompute L[i][j] given L rows < i are valid up to col j
        double s = a(vi, order[j]);
        for (int k = 0; k < j; ++k) s -= L[(size_t)i * cap + k] * L[(size_t)j * cap + k];
        if (j == i) {
          L[(size_t)i * cap + i] = std::sqrt(std::max(s, 1e-300));
        } else {
          L[(size_t)i * cap + j] = s / L[(size_t)j * cap + j];
        }
      }
      for (int j = i + 1; j < cap; ++j) L[(size_t)i * cap + j] = 0.0;
    }
  }

  // Solve A[F,F] y = rhs (rhs indexed by factor order).
  void solve(std::vector<double>& rhs) const {
    int f = size();
    for (int i = 0; i < f; ++i) {
      double s = rhs[i];
      for (int k = 0; k < i; ++k) s -= L[(size_t)i * cap + k] * rhs[k];
      rhs[i] = s / L[(size_t)i * cap + i];
    }
    for (int i = f - 1; i >= 0; --i) {
      double s = rhs[i];
      for (int k = i + 1; k < f; ++k) s -= L[(size_t)k * cap + i] * rhs[k];
      rhs[i] = s / L[(size_t)i * cap + i];
    }
  }
};

}  // namespace

namespace {

double clamp0(double lo, double hi) {
  // nearest feasible point to 0 (the reference assumes lo <= 0 <= hi,
  // toolkit/lcp.h:114-132; clamp for safety)
  if (lo > 0) return lo;
  if (hi < 0) return hi;
  return 0.0;
}

// Best-so-far tracking by "goodness" = total KKT violation (the
// reference's sum-of-negative-parts fallback, eggshell/lcp.cc:107-137):
// on iteration exhaustion the best iterate is returned, not the last.
struct BestSoFar {
  double g = 1e300;
  std::vector<double> x;
  std::vector<int> side;
};

double kkt_goodness(int n, int limit, const double* lo, const double* hi,
                    const std::vector<double>& xv,
                    const std::vector<double>& wv, const int* side) {
  double g = 0;
  for (int i = 0; i < limit; ++i) {
    if (side[i] == 0) {
      if (xv[i] < lo[i]) g += lo[i] - xv[i];
      if (xv[i] > hi[i]) g += xv[i] - hi[i];
    } else if (side[i] < 0) {
      if (wv[i] < 0) g += -wv[i];
    } else {
      if (wv[i] > 0) g += wv[i];
    }
  }
  return g;
}

// Core principal-pivot loop over indices [0, limit).  Variables at
// index >= limit are held at their current xv value and never pivoted.
// Returns +1 converged, 0 iteration budget exhausted, and decrements
// *iters_left as it spends iterations.
int pivot_loop(
    Chol& chol, int n, int limit, const double* b,
    const double* lo, const double* hi,
    std::vector<double>& xv, std::vector<double>& wv, int* side,
    int* iters_left, double tol, BestSoFar* best = nullptr) {
  std::vector<double> rhs;
  while ((*iters_left)-- > 0) {
    // Solve for free variables given the clamped/held ones.
    int f = chol.size();
    rhs.assign(f, 0.0);
    for (int i = 0; i < f; ++i) {
      int vi = chol.order[i];
      double s = b[vi];
      for (int j = 0; j < n; ++j) {
        if (side[j] != 0) s -= chol.a(vi, j) * xv[j];
      }
      rhs[i] = s;
    }
    chol.solve(rhs);
    for (int i = 0; i < f; ++i) xv[chol.order[i]] = rhs[i];

    // Residual w = A x - b.
    for (int i = 0; i < n; ++i) {
      double s = -b[i];
      for (int j = 0; j < n; ++j) s += chol.a(i, j) * xv[j];
      wv[i] = s;
    }

    if (best) {
      double g = kkt_goodness(n, limit, lo, hi, xv, wv, side);
      if (g < best->g) {
        best->g = g;
        best->x = xv;
        best->side.assign(side, side + n);
      }
    }

    // First violation in index order (Murty rule, ref lcp.cc pivoting).
    int viol = -1, action = 0;
    for (int i = 0; i < limit; ++i) {
      if (side[i] == 0) {
        if (xv[i] < lo[i] - tol) { viol = i; action = -1; break; }
        if (xv[i] > hi[i] + tol) { viol = i; action = +1; break; }
      } else if (side[i] < 0 && wv[i] < -tol) {
        viol = i; action = 0; break;
      } else if (side[i] > 0 && wv[i] > tol) {
        viol = i; action = 0; break;
      }
    }
    if (viol < 0) return 1;
    if (action == 0) {
      side[viol] = 0;
      if (!chol.add(viol)) {  // singular pivot: clamp back
        side[viol] = (std::fabs(lo[viol]) <= std::fabs(hi[viol])) ? -1 : 1;
        xv[viol] = side[viol] < 0 ? lo[viol] : hi[viol];
      }
    } else {
      chol.remove(viol);
      side[viol] = action;
      xv[viol] = action < 0 ? lo[viol] : hi[viol];
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Returns 1 on success (KKT satisfied), 0 if the iteration limit hit
// (in which case x/w hold the best-so-far iterate by KKT goodness —
// the reference's fallback, eggshell/lcp.cc:107-137, 233-268).
// side: work array (n) — -1 at lo, +1 at hi, 0 free (also returned).
// algorithm: 0 = MURTY (global principal pivoting), 1 = COTTLE_DANTZIG
// (incremental variable introduction: variable k enters only after
// variables [0, k) satisfy their conditions — the reference's second
// mode, toolkit/lcp.h:135-144; the Cholesky factor is warm across the
// incremental stages).
// goodness_out / iters_out (nullable): violation of the returned
// solution (0 when converged) and pivot count spent — the structured
// failure record the reference writes to lcp_debug.log (lcp.cc:257-268).
int egg_solve_box_lcp_stats(
    int n, const double* A, const double* b,
    const double* lo, const double* hi,
    double* x, double* w, int* side,
    int max_iterations, double tol, int algorithm,
    double* goodness_out, int* iters_out) {
  Chol chol;
  chol.init(A, n);

  std::vector<double> xv(n), wv(n);
  BestSoFar best;
  int iters_left = max_iterations;
  int ok = 0;

  // Introduce variable i: clamp to the bound nearer zero, except
  // effectively-unbounded variables (|bound| huge), which start free —
  // they are free at any solution, and snapping to a 1e300 bound would
  // overflow the residual.
  auto introduce = [&](int i) {
    side[i] = (std::fabs(lo[i]) <= std::fabs(hi[i])) ? -1 : 1;
    double bnd = side[i] < 0 ? lo[i] : hi[i];
    if (std::fabs(bnd) > 1e150) {
      xv[i] = 0.0;
      if (chol.add(i)) side[i] = 0;
    } else {
      xv[i] = bnd;
    }
  };

  if (algorithm == 1) {
    // Cottle-Dantzig: hold unprocessed variables at the feasible point
    // nearest zero; introduce one variable per stage, keeping the
    // processed block at a solution throughout.
    for (int i = 0; i < n; ++i) {
      side[i] = (std::fabs(lo[i]) <= std::fabs(hi[i])) ? -1 : 1;
      xv[i] = clamp0(lo[i], hi[i]);
    }
    ok = 1;
    for (int k = 1; k <= n && ok; ++k) {
      introduce(k - 1);
      // stage k: indices [0, k) participate; xv[j >= k] stays at clamp0
      // (best-so-far tracked only at the final, full-size stage — partial
      // stages hold variables that a fallback must not freeze mid-way)
      ok = pivot_loop(chol, n, k, b, lo, hi, xv, wv, side, &iters_left,
                      tol, k == n ? &best : nullptr);
    }
  } else {
    // Murty: start with everything clamped at the nearer-to-zero bound.
    for (int i = 0; i < n; ++i) introduce(i);
    ok = pivot_loop(chol, n, n, b, lo, hi, xv, wv, side, &iters_left, tol,
                    &best);
  }

  double g = 0.0;
  if (!ok && best.g < 1e300) {
    // Fall back to the best-so-far iterate (ref lcp.cc:233-268).
    xv = best.x;
    std::memcpy(side, best.side.data(), n * sizeof(int));
    for (int i = 0; i < n; ++i) {
      double s = -b[i];
      for (int j = 0; j < n; ++j) s += A[(size_t)i * n + j] * xv[j];
      wv[i] = s;
    }
    g = best.g;
  }
  if (goodness_out) *goodness_out = g;
  // iters_left ends at -1 when the budget was exhausted (the while
  // condition decrements once more before failing).
  if (iters_out) *iters_out = max_iterations - iters_left - (ok ? 0 : 1);

  std::memcpy(x, xv.data(), n * sizeof(double));
  for (int i = 0; i < n; ++i) w[i] = (side[i] == 0) ? 0.0 : wv[i];
  return ok;
}

int egg_solve_box_lcp_alg(
    int n, const double* A, const double* b,
    const double* lo, const double* hi,
    double* x, double* w, int* side,
    int max_iterations, double tol, int algorithm) {
  return egg_solve_box_lcp_stats(n, A, b, lo, hi, x, w, side,
                                 max_iterations, tol, algorithm,
                                 nullptr, nullptr);
}

int egg_solve_box_lcp(
    int n, const double* A, const double* b,
    const double* lo, const double* hi,
    double* x, double* w, int* side,
    int max_iterations, double tol) {
  return egg_solve_box_lcp_alg(n, A, b, lo, hi, x, w, side,
                               max_iterations, tol, /*algorithm=*/0);
}

// Schur-complement fast path for unbounded variables (ref
// toolkit/lcp.h:157-159, test SolveLCP_BoxSchur lcp.cc:1078): variables
// with lo <= -big_bound and hi >= +big_bound (equality rows) are
// eliminated exactly; the box LCP runs only on the reduced system
// S = A_bb - A_bu A_uu^-1 A_ub, then x_u back-substitutes.
// Returns 1 on success, 0 on iteration limit, -1 if A_uu is singular.
int egg_solve_box_lcp_schur(
    int n, const double* A, const double* b,
    const double* lo, const double* hi,
    double* x, double* w,
    int max_iterations, double tol, int algorithm, double big_bound) {
  std::vector<int> U, B;
  for (int i = 0; i < n; ++i) {
    if (lo[i] <= -big_bound && hi[i] >= big_bound) U.push_back(i);
    else B.push_back(i);
  }
  int nu = (int)U.size(), nb = (int)B.size();
  if (nu == 0) {
    std::vector<int> side(n);
    return egg_solve_box_lcp_alg(n, A, b, lo, hi, x, w, side.data(),
                                 max_iterations, tol, algorithm);
  }

  // Factor A_uu via the incremental Cholesky.
  Chol chol;
  chol.init(A, n);
  for (int v : U) {
    if (!chol.add(v)) return -1;
  }

  auto solve_uu = [&](std::vector<double>& rhs) { chol.solve(rhs); };

  // Y = A_uu^-1 A_ub  (nu x nb), y0 = A_uu^-1 b_u
  std::vector<double> Y((size_t)nu * nb), y0(nu), col(nu);
  for (int j = 0; j < nb; ++j) {
    for (int i = 0; i < nu; ++i) col[i] = A[(size_t)U[i] * n + B[j]];
    solve_uu(col);
    for (int i = 0; i < nu; ++i) Y[(size_t)i * nb + j] = col[i];
  }
  for (int i = 0; i < nu; ++i) y0[i] = b[U[i]];
  solve_uu(y0);

  // S = A_bb - A_bu Y;  bs = b_b - A_bu y0
  std::vector<double> S((size_t)nb * nb), bs(nb), lob(nb), hib(nb);
  for (int i = 0; i < nb; ++i) {
    for (int j = 0; j < nb; ++j) {
      double s = A[(size_t)B[i] * n + B[j]];
      for (int k = 0; k < nu; ++k)
        s -= A[(size_t)B[i] * n + U[k]] * Y[(size_t)k * nb + j];
      S[(size_t)i * nb + j] = s;
    }
    double r = b[B[i]];
    for (int k = 0; k < nu; ++k) r -= A[(size_t)B[i] * n + U[k]] * y0[k];
    bs[i] = r;
    lob[i] = lo[B[i]];
    hib[i] = hi[B[i]];
  }

  std::vector<double> xb(nb), wb(nb);
  std::vector<int> sideb(nb);
  int ok = egg_solve_box_lcp_alg(nb, S.data(), bs.data(), lob.data(),
                                 hib.data(), xb.data(), wb.data(),
                                 sideb.data(), max_iterations, tol,
                                 algorithm);

  // x_u = A_uu^-1 (b_u - A_ub x_b) = y0 - Y x_b
  for (int i = 0; i < nu; ++i) {
    double s = y0[i];
    for (int j = 0; j < nb; ++j) s -= Y[(size_t)i * nb + j] * xb[j];
    x[U[i]] = s;
    w[U[i]] = 0.0;
  }
  for (int j = 0; j < nb; ++j) {
    x[B[j]] = xb[j];
    w[B[j]] = wb[j];
  }
  return ok;
}

// Batched entry: solve `count` independent problems of size n
// (the host-side analog of the batched device solves).
void egg_solve_box_lcp_batch(
    int count, int n, const double* A, const double* b,
    const double* lo, const double* hi,
    double* x, double* w, int* status,
    int max_iterations, double tol) {
  std::vector<int> side(n);
  for (int k = 0; k < count; ++k) {
    status[k] = egg_solve_box_lcp(
        n, A + (size_t)k * n * n, b + (size_t)k * n,
        lo + (size_t)k * n, hi + (size_t)k * n,
        x + (size_t)k * n, w + (size_t)k * n, side.data(),
        max_iterations, tol);
  }
}

}  // extern "C"
