// Headless stubs for the reference's GUI draw hooks (declared in
// /root/reference/eggshell/model.h:16-35) so the dynamics core
// (ensembles.cc, lcp.cc, collision.cc, ...) links without Qt/OpenGL.
// This file is part of the golden-trajectory generation harness only —
// it is NOT part of the eggshell_tpu framework.
#include "model.h"

void DrawSphere(const Eigen::Vector3d &, const Eigen::Matrix3d &, double,
                int) {}
void DrawBox(const Eigen::Vector3d &, const Eigen::Matrix3d &,
             const Eigen::Vector3d &, int) {}
void DrawCapsule(const Eigen::Vector3d &, const Eigen::Matrix3d &, double,
                 double, int) {}
void DrawPoint(const Eigen::Vector3d &, int) {}
void DrawLine(const Eigen::Vector3d &, const Eigen::Vector3d &, int) {}
void EggPlot(const Eigen::VectorXd &, const Eigen::MatrixXd &, const char *) {}

// toolkit/lcp.cc's TEST_FUNCTION timing hook (never exercised: the
// golden generator does not call testing::RunAll).
double Now() { return 0.0; }
