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
// Build + run: tools/golden/build_golden.sh
#include <cstdio>
#include <cstring>
#include <string>

#include "ensembles.h"
#include "random.h"

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

}  // namespace

int main(int argc, char** argv) {
  std::string outdir = argc > 1 ? argv[1] : ".";
  RunChain((outdir + "/golden_chain10.csv").c_str(), /*n_links=*/10,
           /*n_steps=*/1000, /*dt=*/1e-3);
  RunCairn((outdir + "/golden_cairn4.csv").c_str(), /*n_rocks=*/4,
           /*n_steps=*/1000, /*dt=*/1e-3, /*seed=*/12345);
  return 0;
}
