"""P1 FEM Helmholtz solver — the rama solver tier (rama/solver.cc,
toolkit/femsolver.h) rebuilt JAX-native.

Problem types (ScriptConfig analog, ref rama/solver.h:42-126):
  EZ     TM polarisation: (grad^2 + k^2 eps) Ez = 0, PEC walls are
         Dirichlet Ez = 0.
  EXY    TE polarisation: scalar Hz with natural (Neumann) walls.
  ES     electrostatics: Laplace with painted Dirichlet boundaries.
  SCHRODINGER  -grad^2 psi + V psi = E psi eigenproblem.

Boundary conditions on painted segments (ref rama/edge_type.h):
  port   matched waveguide port carrying the fundamental mode
         sin(pi t / a): Robin term j*beta*u with excitation
         2j*beta*u_inc on the excited port.
  abc    first-order absorbing: Robin term j*k*u.
  (default) PEC: Dirichlet (EZ/ES) or natural (EXY).

The assembly is a pure JAX function of the vertex positions, so
`jax.jvp` provides exact forward-mode derivatives of fields/S-parameters
with respect to any smooth geometry parametrisation — the analog of the
reference's jet-propagated derivatives (rama/my_jet.h), without a custom
number type.

Solvers: dense complex LU on CPU/TPU for moderate meshes;
eigenproblems via SciPy ARPACK shift-invert (the very library the
reference wraps, toolkit/eigensolvers.h:54-59) or jax LOBPCG on device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from eggshell_tpu.fem.mesher import Mesh


@dataclasses.dataclass(frozen=True)
class FemConfig:
    """ScriptConfig analog (ref rama/solver.h:42-126; Lua `config` table,
    rama/tests/test_s11.lua:11-33)."""

    type: str = "EZ"                   # EZ | EXY | ES | SCHRODINGER
    frequency: float = 10e9            # Hz (EZ/EXY)
    excited_port: int = 1
    unit: float = 1.0                  # geometry unit in meters
    depth: float = 1.0                 # out-of-plane depth (power scale)

    @property
    def k0(self) -> float:
        c = 299792458.0
        return 2 * np.pi * self.frequency / c * self.unit


# ---------------------------------------------------------------------------
# Element assembly (dense, JAX, differentiable in the vertex positions)


def assemble_matrices(points, triangles, eps_tri, sigma_xx=None, sigma_yy=None,
                      sigma_xy=None):
    """Global stiffness K (with anisotropic weights incl. the sigma_xy
    cross term, ref rama/shape.h:64-90) and eps-weighted mass M for P1
    triangles, dense (N, N).  All jnp ops — differentiable and jit-able.
    (ref toolkit/femsolver.h triplet assembly :255-310.)"""
    pts = points
    tri = triangles
    p0 = pts[tri[:, 0]]
    p1 = pts[tri[:, 1]]
    p2 = pts[tri[:, 2]]
    # edge vectors / area
    d1 = p1 - p0
    d2 = p2 - p0
    det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    area = 0.5 * jnp.abs(det)
    # P1 gradient coefficients: grad phi_i = (b_i, c_i) / (2A)
    b = jnp.stack([p1[:, 1] - p2[:, 1], p2[:, 1] - p0[:, 1], p0[:, 1] - p1[:, 1]], 1)
    c = jnp.stack([p2[:, 0] - p1[:, 0], p0[:, 0] - p2[:, 0], p1[:, 0] - p0[:, 0]], 1)
    sx = jnp.ones_like(area) if sigma_xx is None else sigma_xx
    sy = jnp.ones_like(area) if sigma_yy is None else sigma_yy
    Ke = (
        sx[:, None, None] * b[:, :, None] * b[:, None, :]
        + sy[:, None, None] * c[:, :, None] * c[:, None, :]
    ) / (4.0 * area)[:, None, None]
    if sigma_xy is not None:
        Ke = Ke + sigma_xy[:, None, None] * (
            b[:, :, None] * c[:, None, :] + c[:, :, None] * b[:, None, :]
        ) / (4.0 * area)[:, None, None]
    Me = (
        (jnp.ones((3, 3)) + jnp.eye(3))[None, :, :]
        * (area / 12.0)[:, None, None]
        * eps_tri[:, None, None]
    )

    N = pts.shape[0]
    # scatter-add into dense matrices via one-hot (small meshes) — for
    # large meshes swap for BCOO; tests run a few hundred nodes.
    rows = tri[:, :, None].repeat(3, 2).reshape(-1)
    cols = tri[:, None, :].repeat(3, 1).reshape(-1)
    K = jnp.zeros((N, N), Ke.dtype).at[rows, cols].add(Ke.reshape(-1))
    M = jnp.zeros((N, N), Me.dtype).at[rows, cols].add(Me.reshape(-1))
    return K, M


def _boundary_mass(points, edges, N, dtype=jnp.complex64):
    """Line-element mass matrix sum over the given boundary edges:
    integral over each edge of u v (P1): len/6 * [[2,1],[1,2]]."""
    if len(edges) == 0:
        return jnp.zeros((N, N), dtype)
    e = jnp.asarray(edges)
    L = jnp.linalg.norm(points[e[:, 1]] - points[e[:, 0]], axis=1)
    Be = (
        (jnp.asarray([[2.0, 1.0], [1.0, 2.0]]))[None, :, :]
        * (L / 6.0)[:, None, None]
    ).astype(dtype)
    rows = e[:, :, None].repeat(2, 2).reshape(-1)
    cols = e[:, None, :].repeat(2, 1).reshape(-1)
    return jnp.zeros((N, N), dtype).at[rows, cols].add(Be.reshape(-1))


# ---------------------------------------------------------------------------
# Port geometry / modes


def port_frame(mesh: Mesh, port: int):
    """Port endpoints, width, and the tangential coordinate of each mesh
    point on the port (for the fundamental sin mode)."""
    pe = mesh.port_edges(port)
    nodes = np.unique(pe)
    pts = mesh.points[nodes]
    # order along the dominant direction
    e0 = pts.max(axis=0) - pts.min(axis=0)
    axis = np.argmax(np.abs(e0))
    order = np.argsort(pts[:, axis])
    nodes = nodes[order]
    pts = pts[order]
    start, end = pts[0], pts[-1]
    width = np.linalg.norm(end - start)
    t = np.linalg.norm(pts - start[None, :], axis=1)
    return nodes, t, width, (start, end)


def port_beta(k2, width, mode: int = 1):
    """Propagation constant of mode m on a PEC-walled port of width a:
    beta = sqrt(k^2 eps - (m pi / a)^2) (evanescent -> -j|.|)."""
    kc = mode * np.pi / width
    val = k2 - kc**2
    return jnp.where(
        val >= 0,
        jnp.sqrt(jnp.maximum(val, 0.0)) + 0j,
        -1j * jnp.sqrt(jnp.maximum(-val, 0.0)),
    )


# ---------------------------------------------------------------------------
# Driven solve


@dataclasses.dataclass
class DrivenSolution:
    field: jnp.ndarray            # (N,) complex nodal field
    s_params: Dict[int, complex]  # port -> S_{port, excited}
    port_power: Dict[int, float]  # |S|^2 outgoing power fraction
    k0: float


def solve_driven(
    mesh: Mesh, config: FemConfig, point_source=None
) -> DrivenSolution:
    """Single-frequency driven solve with matched ports
    (ref Solver::Solve electrodynamic path, rama/solver.cc:1382-1422).

    `point_source` = (x, y): unit excitation at the nearest mesh node
    (line-current analog) — used for radiation/antenna problems."""
    dtype = jnp.complex64
    pts = jnp.asarray(mesh.points)
    tri = jnp.asarray(mesh.triangles)
    N = mesh.num_points
    k0 = config.k0
    eps = jnp.asarray(mesh.epsilon, dtype)

    if config.type == "EXY":
        # TE polarisation (scalar Hz): div((1/eps) grad Hz) + k^2 Hz = 0 —
        # the permittivity weights the STIFFNESS, mass is unweighted
        # (ref rama/solver.cc Exy problem assembly).
        inv_eps = 1.0 / eps
        K, M = assemble_matrices(
            pts, tri, jnp.ones_like(eps),
            jnp.asarray(mesh.sigma_xx) * inv_eps,
            jnp.asarray(mesh.sigma_yy) * inv_eps,
            jnp.asarray(mesh.sigma_xy) * inv_eps,
        )
    else:
        K, M = assemble_matrices(
            pts, tri, eps, jnp.asarray(mesh.sigma_xx),
            jnp.asarray(mesh.sigma_yy), jnp.asarray(mesh.sigma_xy),
        )
    if config.type == "ES":
        A = K.astype(dtype)        # Laplace: no wave term
    else:
        A = K.astype(dtype) - (k0**2) * M.astype(dtype)
    rhs = jnp.zeros((N,), dtype)

    # volume excitation (painted source density, ref Material excitation
    # rama/shape.h:64-90): \int s phi per triangle = s * area / 3 per node
    exc = np.asarray(mesh.excitation)
    if np.any(exc != 0):
        p0n, p1n, p2n = (np.asarray(mesh.points)[mesh.triangles[:, i]]
                         for i in range(3))
        area_np = 0.5 * np.abs(
            (p1n[:, 0] - p0n[:, 0]) * (p2n[:, 1] - p0n[:, 1])
            - (p1n[:, 1] - p0n[:, 1]) * (p2n[:, 0] - p0n[:, 0])
        )
        contrib = (exc * area_np / 3.0)[:, None].repeat(3, 1).reshape(-1)
        rhs = rhs.at[jnp.asarray(mesh.triangles.reshape(-1))].add(
            jnp.asarray(contrib, dtype)
        )

    ports = sorted(set(int(p) for p in mesh.edge_port[mesh.edge_kind == 1]))
    port_info = {}
    # Port modes: EZ carries the TM1 sin mode on PEC-walled ports; EXY
    # carries the TE0/TEM uniform mode (cos with m=0), beta = k
    # (ref rama/solver.cc port handling for the two polarisations).
    mode_m = 0 if config.type == "EXY" else 1
    for p in ports:
        nodes, t, width, _ = port_frame(mesh, p)
        if mode_m == 0:
            beta = jnp.asarray(k0 + 0j)
            mode = np.ones_like(t)
        else:
            beta = port_beta(k0**2, width)   # vacuum at ports (matched)
            mode = np.sin(np.pi * t / width)
        pe = mesh.port_edges(p)
        B = _boundary_mass(pts, pe, N, dtype)
        A = A + 1j * beta * B
        if p == config.excited_port:
            minc = jnp.zeros((N,), dtype).at[jnp.asarray(nodes)].set(
                jnp.asarray(mode, dtype)
            )
            rhs = rhs + 2j * beta * (B @ minc)
        port_info[p] = (nodes, t, width, beta, mode)

    # ABC edges
    abc_edges = mesh.boundary_edges[mesh.edge_kind == 2]
    if len(abc_edges):
        A = A + 1j * k0 * _boundary_mass(pts, abc_edges, N, dtype)

    if point_source is not None:
        node = int(
            np.argmin(
                np.linalg.norm(mesh.points - np.asarray(point_source), axis=1)
            )
        )
        rhs = rhs.at[node].add(1.0)

    # Dirichlet on PEC boundary (EZ / ES); EXY leaves walls natural.
    # Fixed-potential conductors (edge_kind 3, ES problems: ref
    # ELECTROSTATICS type + capacitor example) are inhomogeneous
    # Dirichlet: lift with rhs -= A g.
    if config.type in ("EZ", "ES"):
        pec_nodes = np.unique(mesh.boundary_edges[mesh.edge_kind == 0])
        mask = jnp.zeros((N,), bool).at[jnp.asarray(pec_nodes)].set(True)
        g = np.zeros(N)
        pot = mesh.edge_kind == 3
        if pot.any():
            for e, v in zip(mesh.boundary_edges[pot], mesh.edge_value[pot]):
                g[e[0]] = v
                g[e[1]] = v
            pot_nodes = np.unique(mesh.boundary_edges[pot])
            mask = mask.at[jnp.asarray(pot_nodes)].set(True)
        gj = jnp.asarray(g, dtype)
        rhs = rhs - A @ gj
        A = jnp.where(mask[:, None] | mask[None, :], 0.0, A)
        A = A + jnp.diag(jnp.where(mask, 1.0, 0.0).astype(dtype))
        rhs = jnp.where(mask, gj, rhs)

    u = jnp.linalg.solve(A, rhs)

    # S-parameters: project the outgoing field onto the port mode
    # (ref ComputePortOutgoingField1/2, rama/solver.h:185-197).
    s_params = {}
    power = {}
    for p, (nodes, t, width, beta, mode) in port_info.items():
        up = u[jnp.asarray(nodes)]
        m = jnp.asarray(mode, dtype)
        w = _trapezoid_weights(t)
        amp = jnp.sum(w * up * m) / jnp.sum(w * m * m)
        if p == config.excited_port:
            amp = amp - 1.0  # subtract the incident wave
        s_params[p] = complex(np.asarray(amp))
        power[p] = float(np.abs(np.asarray(amp)) ** 2)
    return DrivenSolution(field=u, s_params=s_params, port_power=power, k0=k0)


def _trapezoid_weights(t: np.ndarray) -> jnp.ndarray:
    dt = np.diff(t)
    w = np.zeros_like(t)
    w[:-1] += dt / 2
    w[1:] += dt / 2
    return jnp.asarray(w)


# ---------------------------------------------------------------------------
# Eigenmodes


def solve_modes(
    mesh: Mesh,
    num_modes: int = 6,
    sigma: Optional[float] = None,
    dirichlet: bool = True,
    potential: Optional[np.ndarray] = None,
    use_lobpcg: bool = False,
):
    """Generalized eigenproblem K psi = lambda M psi (cavity cutoffs /
    Schrodinger levels).  Default path is SciPy ARPACK shift-invert —
    the same solver the reference drives (toolkit/eigensolvers.h:66-150);
    `use_lobpcg` switches to jax's on-device LOBPCG.
    Returns (eigenvalues (m,), eigenvectors (N, m))."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    pts = jnp.asarray(mesh.points)
    tri = jnp.asarray(mesh.triangles)
    N = mesh.num_points
    K, M = assemble_matrices(pts, tri, jnp.ones(mesh.num_triangles))
    K = np.asarray(K, dtype=float)
    M = np.asarray(M, dtype=float)
    if potential is not None:
        # add \int V u v via eps-weighted mass with eps = V per triangle
        _, MV = assemble_matrices(pts, tri, jnp.asarray(potential))
        K = K + np.asarray(MV, dtype=float)

    if dirichlet:
        keep = np.ones(N, bool)
        keep[np.unique(mesh.boundary_edges)] = False
        idx = np.flatnonzero(keep)
        Kr = K[np.ix_(idx, idx)]
        Mr = M[np.ix_(idx, idx)]
    else:
        idx = np.arange(N)
        Kr, Mr = K, M

    if use_lobpcg:
        from jax.experimental.sparse.linalg import lobpcg_standard

        # standard form via M^-1/2 (dense transform for moderate meshes);
        # jax lobpcg_standard returns the LARGEST eigenpairs, so run it on
        # the inverse operator (shift-invert with sigma=0, the reference's
        # ARPACK mode, toolkit/eigensolvers.h shift-invert) and invert.
        w, V = np.linalg.eigh(Mr)
        Mi = V @ np.diag(1 / np.sqrt(w)) @ V.T
        Astd = Mi @ Kr @ Mi
        Ainv = jnp.asarray(np.linalg.inv(Astd), jnp.float32)
        X0 = jnp.asarray(
            np.random.default_rng(0).normal(size=(len(idx), num_modes)),
            jnp.float32,
        )
        theta, U, _ = lobpcg_standard(lambda x: Ainv @ x, X0, m=200)
        vals = 1.0 / np.asarray(theta)
        vecs = Mi @ np.asarray(U)
        order = np.argsort(vals)
        vals, vecs = vals[order], vecs[:, order]
    else:
        Ks = sp.csc_matrix(Kr)
        Ms = sp.csc_matrix(Mr)
        if sigma is None:
            sigma = 1e-6
        vals, vecs = spla.eigsh(Ks, k=num_modes, M=Ms, sigma=sigma, which="LM")
        order = np.argsort(vals)
        vals, vecs = vals[order], vecs[:, order]

    full = np.zeros((N, vals.shape[0]))
    full[idx] = vecs
    return vals, full
