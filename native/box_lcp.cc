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

extern "C" {

// Returns 1 on success (KKT satisfied), 0 if the iteration limit hit.
// side: work array (n) — -1 at lo, +1 at hi, 0 free (also returned).
int egg_solve_box_lcp(
    int n, const double* A, const double* b,
    const double* lo, const double* hi,
    double* x, double* w, int* side,
    int max_iterations, double tol) {
  Chol chol;
  chol.init(A, n);

  // start with everything clamped at the nearer-to-zero bound
  std::vector<double> xv(n), wv(n);
  for (int i = 0; i < n; ++i) {
    side[i] = (std::fabs(lo[i]) <= std::fabs(hi[i])) ? -1 : 1;
    xv[i] = side[i] < 0 ? lo[i] : hi[i];
  }

  std::vector<double> rhs;
  for (int it = 0; it < max_iterations; ++it) {
    // Solve for free variables given the clamped ones.
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

    // First violation in index order (Murty rule, ref lcp.cc pivoting).
    int viol = -1, action = 0;
    for (int i = 0; i < n; ++i) {
      if (side[i] == 0) {
        if (xv[i] < lo[i] - tol) { viol = i; action = -1; break; }
        if (xv[i] > hi[i] + tol) { viol = i; action = +1; break; }
      } else if (side[i] < 0 && wv[i] < -tol) {
        viol = i; action = 0; break;
      } else if (side[i] > 0 && wv[i] > tol) {
        viol = i; action = 0; break;
      }
    }
    if (viol < 0) {
      std::memcpy(x, xv.data(), n * sizeof(double));
      for (int i = 0; i < n; ++i) w[i] = (side[i] == 0) ? 0.0 : wv[i];
      return 1;
    }
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
  std::memcpy(x, xv.data(), n * sizeof(double));
  for (int i = 0; i < n; ++i) w[i] = (side[i] == 0) ? 0.0 : wv[i];
  return 0;
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
