"""Spatially varying mesh size functions (mesh_shape(..., fh=...)) —
the distmesh h(x) feature standing in for the reference mesher's local
refinement (rama/mesh.cc).  Gates: a graded mesh reproduces a uniform
fine mesh's physics at a fraction of the nodes."""

import numpy as np
import pytest

from eggshell_tpu.fem import Rectangle, mesh_shape
from eggshell_tpu.fem.helmholtz import FemConfig, port_beta, solve_driven

C0 = 299792458.0


def freq_for_k(k0):
    return k0 * C0 / (2 * np.pi)


def _port_beta(k2, w=1.0):
    return complex(np.asarray(port_beta(k2, w)))


def _slab_geometry():
    eps2, d = 4.0, 0.35
    wg = Rectangle(0, 0, 2.0, 1.0)
    wg.Port((0, 0), (0, 1), 1).Port((2.0, 0), (2.0, 1), 2)
    wg.Paint(Rectangle(0.9, 0, 0.9 + d, 1.0), epsilon=eps2)
    return wg, eps2, d


def _analytic_r(k0, eps2, d):
    b1 = _port_beta(k0**2)
    b2 = _port_beta(eps2 * k0**2)
    r12 = (b1 - b2) / (b1 + b2)
    ph = np.exp(-2j * b2 * d)
    return r12 * (1 - ph) / (1 - r12**2 * ph)


def test_graded_mesh_structure():
    """fh controls local edge lengths: fine near x=0, coarse at x=2,
    and the node count sits well below the uniform-fine mesh's."""
    fine, coarse = 0.03, 0.12

    def fh(p):
        return np.clip(fine + (coarse - fine) * p[:, 0] / 2.0, fine, coarse)

    box = Rectangle(0, 0, 2.0, 1.0)
    graded = mesh_shape(box, fine, fh=fh, seed=0)
    uniform = mesh_shape(Rectangle(0, 0, 2.0, 1.0), fine, seed=0)
    assert graded.num_points < 0.55 * uniform.num_points

    # local edge lengths track fh: compare mean edge length in the fine
    # and coarse thirds
    pts, tri = graded.points, graded.triangles
    e = np.concatenate([tri[:, [0, 1]], tri[:, [1, 2]], tri[:, [2, 0]]])
    mid = 0.5 * (pts[e[:, 0]] + pts[e[:, 1]])
    L = np.linalg.norm(pts[e[:, 0]] - pts[e[:, 1]], axis=1)
    fine_L = L[mid[:, 0] < 0.5].mean()
    coarse_L = L[mid[:, 0] > 1.5].mean()
    assert coarse_L > 2.0 * fine_L, (fine_L, coarse_L)
    # all triangles positively oriented / nondegenerate
    v1 = pts[tri[:, 1]] - pts[tri[:, 0]]
    v2 = pts[tri[:, 2]] - pts[tri[:, 0]]
    areas = 0.5 * (v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0])
    assert (areas > 1e-8).all()


def test_graded_mesh_equal_answer_fewer_nodes():
    """The dielectric-slab |S11| gate (test_fem.py methodology) passes on
    a graded mesh — fine in the slab + ports, coarse in the empty guide —
    at under half the uniform mesh's nodes."""
    k0 = 4.5
    wg, eps2, d = _slab_geometry()
    uniform = mesh_shape(wg, 0.035, seed=0)

    def fh(p):
        # fine in/near the slab (x in [0.8, 1.35]) and at both ports
        slab = np.maximum(np.abs(p[:, 0] - 1.125) - 0.325, 0.0)
        pleft = p[:, 0]
        pright = 2.0 - p[:, 0]
        dist = np.minimum(slab, np.minimum(pleft, pright))
        return np.clip(0.035 + 0.25 * dist, 0.035, 0.105)

    wg2, _, _ = _slab_geometry()
    graded = mesh_shape(wg2, 0.035, fh=fh, seed=0)
    assert graded.num_points < 0.62 * uniform.num_points, (
        graded.num_points, uniform.num_points
    )

    cfg = FemConfig(type="EZ", frequency=freq_for_k(k0), excited_port=1)
    sol = solve_driven(graded, cfg)
    r_tot = _analytic_r(k0, eps2, d)
    assert abs(abs(sol.s_params[1]) - abs(r_tot)) < 0.02, (
        sol.s_params[1], r_tot, graded.num_points
    )
    assert abs(sol.port_power[1] + sol.port_power[2] - 1.0) < 0.05
