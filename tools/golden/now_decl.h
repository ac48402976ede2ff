// Injected via -include for every golden-harness TU.
//
// 1. The reference's toolkit/lcp.cc calls a free Now() inside its
//    TEST_FUNCTION timing blocks (the symbol lives in
//    toolkit/optimizer.cc as a static in the reference build and is
//    only needed when tests run, which the golden generator never
//    does).  Declared here, defined (trivially) in stubs.cc.
//
// 2. toolkit/lcp.cc pins Eigen 3.3.8/3.3.9 with an #error because it
//    peeks at Eigen::internal::llt_rank_update_lower.  The bundled
//    Eigen here is 3.5.0 and still ships that internal with the same
//    signature (Eigen/src/Cholesky/LLT.h), so: include Eigen first
//    (real version macros in effect for Eigen's own headers), then
//    spoof the version macros the reference's check reads.
double Now();

#include <Eigen/Dense>
#undef EIGEN_WORLD_VERSION
#undef EIGEN_MAJOR_VERSION
#undef EIGEN_MINOR_VERSION
#define EIGEN_WORLD_VERSION 3
#define EIGEN_MAJOR_VERSION 3
#define EIGEN_MINOR_VERSION 8
