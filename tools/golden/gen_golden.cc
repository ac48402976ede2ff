// Golden-trajectory generator: links the reference's headless dynamics core
// (/root/reference/eggshell/{ensembles,lcp,collision,body,contact,joints,
// sparse_iterations,sparse_iterations_utils,utils}.cc) and records Chain /
// Cairn trajectories to CSV for the eggshell_tpu parity gate
// (tests/test_golden_parity.py).
//
// Scenario recipes mirror the reference app's own simulation loop:
//   Chain(10, anchor=(2,2,1)), Init(), Step(1e-3, ODE) each frame
//     (/root/reference/eggshell/model.cc:28,100-108)
//   Cairn(4, x,y in [-0.2,0.2], z in [1,8]), Init(), InitStabilize(),
//     Step(5e-3, ODE) each frame (/root/reference/eggshell/model.cc:31,74-83)
//
// Output CSV row: step, body, p(3), q(wxyz), v(3), w_global(3).
//
// Also dumps golden_lcp.csv: solved box-LCP instances from the
// reference's own solvers — the bounded Lcp::MurtyPrincipalPivot
// (/root/reference/eggshell/lcp.cc:157-230; the +-1 box-friction
// semantics the build's DEFAULT path uses, which the trajectory goldens
// above do NOT witness because the reference app's MixedConstraintsSolver
// routes through the bounds-free overload, lcp.cc:298) and the toolkit's
// production lcp::SolveLCP (/root/reference/toolkit/lcp.cc, MURTY and
// COTTLE_DANTZIG, incl. the unbounded-variable Schur path).  Consumed by
// tests/test_golden_lcp.py.
//
// Build + run: tools/golden/build_golden.sh
#include <cmath>
#include <cstdio>
#include <cstring>
#include <limits>
#include <string>

#include "ensembles.h"
#include "lcp.h"   // eggshell's (quoted-include order: -I eggshell first)
#include "random.h"
#ifndef TOOLKIT_LCP_H
#define TOOLKIT_LCP_H "../../toolkit/lcp.h"
#endif
#include TOOLKIT_LCP_H  // toolkit's production box-LCP (same filename)

namespace {

void DumpState(FILE* f, int step, const Ensemble& e,
               const ComponentsList& components) {
  (void)e;
  for (size_t i = 0; i < components.size(); ++i) {
    const Body& b = *components[i];
    const Eigen::Quaterniond q = b.q();
    const Eigen::Vector3d p = b.p(), v = b.v(), w = b.w_g();
    std::fprintf(f,
                 "%d,%zu,%.17g,%.17g,%.17g,%.17g,%.17g,%.17g,%.17g,%.17g,"
                 "%.17g,%.17g,%.17g,%.17g,%.17g\n",
                 step, i, p[0], p[1], p[2], q.w(), q.x(), q.y(), q.z(), v[0],
                 v[1], v[2], w[0], w[1], w[2]);
  }
}

// Expose protected components_ for state dumping.
template <class E>
class Recorder : public E {
 public:
  using E::E;
  const ComponentsList& bodies() const { return this->components_; }
};

void RunChain(const char* path, int n_links, int n_steps, double dt) {
  Recorder<Chain> chain(n_links, Eigen::Vector3d(2, 2, 1));
  chain.Init();
  FILE* f = std::fopen(path, "w");
  DumpState(f, 0, chain, chain.bodies());
  for (int s = 1; s <= n_steps; ++s) {
    chain.Step(dt, Ensemble::Integrator::OPEN_DYNAMICS_ENGINE);
    DumpState(f, s, chain, chain.bodies());
  }
  std::fclose(f);
  std::printf("wrote %s (%d links, %d steps, dt=%g)\n", path, n_links, n_steps,
              dt);
}

void RunCairn(const char* path, int n_rocks, int n_steps, double dt,
              int seed) {
  RandomSeed(seed);
  Recorder<Cairn> cairn(n_rocks, {-0.2, 0.2}, {-0.2, 0.2}, {1, 8});
  cairn.Init();
  cairn.InitStabilize();
  FILE* f = std::fopen(path, "w");
  DumpState(f, 0, cairn, cairn.bodies());
  for (int s = 1; s <= n_steps; ++s) {
    cairn.Step(dt, Ensemble::Integrator::OPEN_DYNAMICS_ENGINE);
    DumpState(f, s, cairn, cairn.bodies());
  }
  std::fclose(f);
  std::printf("wrote %s (%d rocks, %d steps, dt=%g, seed=%d)\n", path, n_rocks,
              n_steps, dt, seed);
}

void DumpVector(FILE* f, const char* tag, const Eigen::VectorXd& v) {
  std::fprintf(f, "%s", tag);
  for (int i = 0; i < v.size(); ++i) std::fprintf(f, ",%.17g", v[i]);
  std::fprintf(f, "\n");
}

void DumpInstance(FILE* f, int id, const char* kind, const Eigen::MatrixXd& A,
                  const Eigen::VectorXd& b, const Eigen::VectorXd& lo,
                  const Eigen::VectorXd& hi, const Eigen::VectorXd& x,
                  const Eigen::VectorXd& w) {
  std::fprintf(f, "instance,%d,%d,%s\n", id, static_cast<int>(b.size()), kind);
  for (int r = 0; r < A.rows(); ++r) {
    std::fprintf(f, "A");
    for (int c = 0; c < A.cols(); ++c) std::fprintf(f, ",%.17g", A(r, c));
    std::fprintf(f, "\n");
  }
  DumpVector(f, "b", b);
  DumpVector(f, "lo", lo);
  DumpVector(f, "hi", hi);
  DumpVector(f, "x", x);
  DumpVector(f, "w", w);
}

// Strict box-LCP KKT check: x in bounds; w = Ax - b with w >= 0 at lo,
// w <= 0 at hi, w ~ 0 in the interior.  Needed because the reference's
// bounded MurtyPrincipalPivot has a latent initialization defect: it
// enters CheckMurtySolution with S = all-true, x = 0, w = -b
// (lcp.cc:176-190), and that check never verifies w(S) == 0 (it assumes
// the loop invariant "w(S) are all 0", lcp.cc:35) — so whenever x = 0
// is strictly INTERIOR (any x_lo < 0, i.e. every box-friction call),
// the trivial non-complementary point x=0, w=-b passes immediately and
// is returned as "success".  The reference's own WithBounds test
// tolerates this: it only checks Ax = b + w and counts the x == 0
// returns as "trivial solutions" (lcp.cc:452-457).  Consequently the
// GENUINE reference witness for +-1 box bounds is the toolkit's
// production lcp::SolveLCP (whose tests assert real complementarity);
// eggshell-Murty instances are dumped only when they happen to be true
// KKT points (its post-first-pivot iterations are sound — only the
// initial state is inconsistent).
bool StrictKkt(const Eigen::MatrixXd& A, const Eigen::VectorXd& b,
               const Eigen::VectorXd& lo, const Eigen::VectorXd& hi,
               const Eigen::VectorXd& x, double tol) {
  const Eigen::VectorXd w = A * x - b;
  for (int i = 0; i < x.size(); ++i) {
    if (x[i] < lo[i] - tol || x[i] > hi[i] + tol) return false;
    const bool at_lo = x[i] <= lo[i] + tol;
    const bool at_hi = x[i] >= hi[i] - tol;
    if (at_lo && w[i] < -tol) return false;
    if (at_hi && !at_lo && w[i] > tol) return false;
    if (!at_lo && !at_hi && std::abs(w[i]) > tol) return false;
  }
  return true;
}

// Solved box-LCP instances from the reference's own solvers: random SPD
// A (the reference's GenerateSPDMatrix, eggshell/utils.cc:203-215 — the
// generator its LCP unit tests use, lcp.cc:413-435), with bound
// patterns per size:
//   toolkit_box    +-1 box bounds (the kBoxFrictionBound semantics,
//                  eggshell/contact.cc:104-113) solved by the
//                  production lcp::SolveLCP — the reference's genuine
//                  bounded-box witness (see StrictKkt above for why
//                  eggshell's bounded Murty cannot be);
//   murty_contact  per-row contact-triple bounds (t1, t2: [-1, 1];
//                  n: [0, inf)) — the exact row pattern Contact::
//                  ComputeJ requests, via the vector-bounds overload
//                  (kept only when the result is a true KKT point);
//   murty_nonneg   [0, inf) — the 2-argument overload the reference
//                  APP effectively runs (lcp.cc:141-147, see
//                  SimConfig.ref_app_bounds);
//   toolkit_*      lcp::SolveLCP MURTY and COTTLE_DANTZIG with a mix
//                  of bounded and UNBOUNDED rows (exercising the Schur
//                  fast path, lcp.h:157-159).
// Every dumped instance passes StrictKkt.
void DumpLcpGolden(const char* path) {
  const double kInf = std::numeric_limits<double>::infinity();
  RandomSeed(987);
  std::srand(987);  // GenerateSPDMatrix uses Eigen's Random (std::rand)
  FILE* f = std::fopen(path, "w");
  int id = 0;
  const int sizes[] = {6, 12, 24, 51};
  const int counts[] = {24, 16, 10, 4};
  for (int si = 0; si < 4; ++si) {
    const int n = sizes[si];
    for (int c = 0; c < counts[si]; ++c) {
      const Eigen::MatrixXd A = GenerateSPDMatrix(n);
      Eigen::VectorXd b(n);
      for (int i = 0; i < n; ++i) b[i] = 2.0 * RandomDouble() - 1.0;
      const double tol = 1e-7;
      Eigen::VectorXd x, w;
      switch (c % 4) {
        case 0: {  // +-1 box bounds via the production toolkit solver
          const Eigen::VectorXd lo = Eigen::VectorXd::Constant(n, -1.0);
          const Eigen::VectorXd hi = Eigen::VectorXd::Constant(n, 1.0);
          lcp::Settings settings;
          Eigen::MatrixXd Acopy = A;  // SolveLCP permutes A in place
          Eigen::VectorXd xs, ws;
          if (lcp::SolveLCP(settings, Acopy, b, lo, hi, &xs, &ws) &&
              StrictKkt(A, b, lo, hi, xs, tol)) {
            DumpInstance(f, id++, "toolkit_box", A, b, lo, hi, xs, ws);
          }
          break;
        }
        case 1: {  // contact-triple bounds (needs n % 3 == 0)
          Eigen::VectorXd lo(n), hi(n);
          for (int i = 0; i < n; ++i) {
            const bool normal_row = (n % 3 == 0) && (i % 3 == 2);
            lo[i] = normal_row ? 0.0 : -1.0;
            hi[i] = normal_row ? kInf : 1.0;
          }
          if (Lcp::MurtyPrincipalPivot(A, b, x, w, lo, hi) &&
              StrictKkt(A, b, lo, hi, x, tol)) {
            DumpInstance(f, id++, "murty_contact", A, b, lo, hi, x, w);
          }
          break;
        }
        case 2: {  // [0, inf) — the app-path overload
          const Eigen::VectorXd lo = Eigen::VectorXd::Zero(n);
          const Eigen::VectorXd hi = Eigen::VectorXd::Constant(n, kInf);
          if (Lcp::MurtyPrincipalPivot(A, b, x, w) &&
              StrictKkt(A, b, lo, hi, x, tol)) {
            DumpInstance(f, id++, "murty_nonneg", A, b, lo, hi, x, w);
          }
          break;
        }
        case 3: {  // toolkit SolveLCP, mixed bounded/unbounded rows
          Eigen::VectorXd lo(n), hi(n);
          for (int i = 0; i < n; ++i) {
            if (i % 4 == 3) {  // unbounded row (Schur fast path)
              lo[i] = -kInf;
              hi[i] = kInf;
            } else if (i % 4 == 2) {
              lo[i] = 0.0;
              hi[i] = kInf;
            } else {
              lo[i] = -1.0;
              hi[i] = 1.0;
            }
          }
          lcp::Settings settings;
          settings.algorithm = (c % 8 < 4) ? lcp::MURTY : lcp::COTTLE_DANTZIG;
          Eigen::MatrixXd Acopy = A;  // SolveLCP permutes A in place
          Eigen::VectorXd xs, ws;
          if (lcp::SolveLCP(settings, Acopy, b, lo, hi, &xs, &ws) &&
              StrictKkt(A, b, lo, hi, xs, tol)) {
            DumpInstance(f,
                         id++,
                         settings.algorithm == lcp::MURTY ? "toolkit_murty"
                                                          : "toolkit_cottle",
                         A, b, lo, hi, xs, ws);
          }
          break;
        }
      }
    }
  }
  std::fclose(f);
  std::printf("wrote %s (%d instances)\n", path, id);
}

}  // namespace

int main(int argc, char** argv) {
  std::string outdir = argc > 1 ? argv[1] : ".";
  RunChain((outdir + "/golden_chain10.csv").c_str(), /*n_links=*/10,
           /*n_steps=*/1000, /*dt=*/1e-3);
  RunCairn((outdir + "/golden_cairn4.csv").c_str(), /*n_rocks=*/4,
           /*n_steps=*/1000, /*dt=*/1e-3, /*seed=*/12345);
  DumpLcpGolden((outdir + "/golden_lcp.csv").c_str());
  return 0;
}
