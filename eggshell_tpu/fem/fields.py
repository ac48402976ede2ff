"""Field probing and derived quantities — the rama on-demand solution
tier (`_GetField`, `Mesh::FindTriangle`, spatial gradient,
`_GetFieldPoynting`, mode cutoff frequencies, wideband sweeps, matlab
export; ref rama/solver.h:185-243, rama/mesh.h:21-80,
rama/cavity_qt.cc:70-96).

The probe path is host-side NumPy (it serves plotting / test
assertions); the multi-frequency sweep is a single `vmap`-ed complex
solve on device — the TPU-native replacement for the reference's
thread-per-frequency `Solvers::Solve` (rama/solver.h:351-355).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from eggshell_tpu.fem.mesher import Mesh


# ---------------------------------------------------------------------------
# Spatial index / point location (ref Mesh::FindTriangle, rama/mesh.h:21-80)


class TriangleIndex:
    """Uniform-grid spatial index over mesh triangles.  Build once,
    query many — the reference builds an analogous index for its
    dielectric callbacks and field probes."""

    def __init__(self, mesh: Mesh, cells_per_axis: Optional[int] = None):
        self.mesh = mesh
        pts = mesh.points
        tri = mesh.triangles
        self.tri_pts = pts[tri]                      # (T, 3, 2)
        lo = pts.min(axis=0)
        hi = pts.max(axis=0)
        pad = 1e-9 + 1e-6 * np.max(hi - lo)
        self.lo = lo - pad
        self.hi = hi + pad
        n = cells_per_axis or max(4, int(np.sqrt(len(tri))))
        self.n = n
        self.cell = (self.hi - self.lo) / n
        # bucket triangles by the cells their bbox overlaps
        tmin = self.tri_pts.min(axis=1)
        tmax = self.tri_pts.max(axis=1)
        cmin = np.clip(((tmin - self.lo) / self.cell).astype(int), 0, n - 1)
        cmax = np.clip(((tmax - self.lo) / self.cell).astype(int), 0, n - 1)
        buckets: Dict[Tuple[int, int], list] = {}
        for t in range(len(tri)):
            for i in range(cmin[t, 0], cmax[t, 0] + 1):
                for j in range(cmin[t, 1], cmax[t, 1] + 1):
                    buckets.setdefault((i, j), []).append(t)
        self.buckets = {k: np.asarray(v) for k, v in buckets.items()}

    def _bary(self, t: int, p: np.ndarray) -> np.ndarray:
        a, b, c = self.tri_pts[t]
        m = np.stack([b - a, c - a], axis=1)
        try:
            uv = np.linalg.solve(m, p - a)
        except np.linalg.LinAlgError:
            return np.array([-1.0, -1.0, -1.0])
        return np.array([1.0 - uv[0] - uv[1], uv[0], uv[1]])

    def find(self, p, tol: float = 1e-9) -> Tuple[int, np.ndarray]:
        """Triangle containing point p and its barycentric coordinates;
        (-1, zeros) if outside the mesh."""
        p = np.asarray(p, float)
        ij = np.clip(((p - self.lo) / self.cell).astype(int), 0, self.n - 1)
        cand = self.buckets.get((int(ij[0]), int(ij[1])))
        best_t, best_lam, best_min = -1, np.zeros(3), -np.inf
        if cand is not None:
            for t in cand:
                lam = self._bary(int(t), p)
                m = lam.min()
                if m >= -tol:
                    return int(t), lam
                if m > best_min:
                    best_min, best_t, best_lam = m, int(t), lam
        # nearly-on-an-edge fallback for points within one cell of the hull
        if best_t >= 0 and best_min > -1e-3:
            return best_t, np.clip(best_lam, 0, None) / max(
                np.clip(best_lam, 0, None).sum(), 1e-300
            )
        return -1, np.zeros(3)


def get_field(mesh: Mesh, field, points, index: Optional[TriangleIndex] = None):
    """P1-interpolated field values at arbitrary points (ref `_GetField`,
    rama/cavity_qt.cc:70-96).  Points outside the mesh give NaN."""
    idx = index or TriangleIndex(mesh)
    f = np.asarray(field)
    pts = np.atleast_2d(np.asarray(points, float))
    out = np.full(len(pts), np.nan, dtype=f.dtype if np.iscomplexobj(f) else float)
    if np.iscomplexobj(f):
        out = out.astype(complex)
    for i, p in enumerate(pts):
        t, lam = idx.find(p)
        if t >= 0:
            out[i] = np.sum(f[mesh.triangles[t]] * lam)
    return out


# ---------------------------------------------------------------------------
# Gradients and Poynting flux


def triangle_gradients(mesh: Mesh, field) -> np.ndarray:
    """Per-triangle (constant) P1 gradient of the nodal field
    (ref spatial-gradient accessor, rama/solver.h:272-277)."""
    pts = mesh.points
    tri = mesh.triangles
    f = np.asarray(field)
    p0, p1, p2 = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]
    area2 = (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1]) - (
        p1[:, 1] - p0[:, 1]
    ) * (p2[:, 0] - p0[:, 0])
    b = np.stack(
        [p1[:, 1] - p2[:, 1], p2[:, 1] - p0[:, 1], p0[:, 1] - p1[:, 1]], axis=1
    )
    c = np.stack(
        [p2[:, 0] - p1[:, 0], p0[:, 0] - p2[:, 0], p1[:, 0] - p0[:, 0]], axis=1
    )
    ft = f[tri]
    gx = np.sum(ft * b, axis=1) / area2
    gy = np.sum(ft * c, axis=1) / area2
    return np.stack([gx, gy], axis=1)


def get_field_gradient(
    mesh: Mesh, field, points, index: Optional[TriangleIndex] = None
):
    """Field gradient at arbitrary points (piecewise constant per triangle)."""
    idx = index or TriangleIndex(mesh)
    grads = triangle_gradients(mesh, field)
    pts = np.atleast_2d(np.asarray(points, float))
    out = np.full((len(pts), 2), np.nan, dtype=grads.dtype)
    for i, p in enumerate(pts):
        t, _ = idx.find(p)
        if t >= 0:
            out[i] = grads[t]
    return out


def poynting(mesh: Mesh, field, k0: float) -> np.ndarray:
    """Time-averaged in-plane Poynting flux per triangle for a TM (Ez)
    field, up to a constant impedance factor:  S = Im(u grad u*) / k0
    (ref `_GetFieldPoynting`, rama/cavity_qt.cc:70-96).  Returns (T, 2).

    Sign follows the solver's engineering exp(+j w t) convention
    (outgoing port Robin terms are +j beta, helmholtz.solve_driven):
    a +x-travelling wave is u = exp(-j k x) and gives S = +x-hat."""
    f = np.asarray(field)
    g = triangle_gradients(mesh, f)
    tri = mesh.triangles
    u_mid = f[tri].mean(axis=1)
    return np.imag(u_mid[:, None] * np.conj(g)) / k0


# ---------------------------------------------------------------------------
# Mode cutoff frequencies (ref ComputeModeCutoffFrequencies,
# rama/solver.h:240-243)


def mode_cutoff_frequencies(eigenvalues, unit: float = 1.0) -> np.ndarray:
    """Convert generalized eigenvalues lambda = k_c^2 (in mesh units) to
    cutoff frequencies in Hz: f_c = c k_c / (2 pi unit)."""
    c = 299792458.0
    lam = np.maximum(np.asarray(eigenvalues, float), 0.0)
    return c * np.sqrt(lam) / (2 * np.pi * unit)


# ---------------------------------------------------------------------------
# Wideband sweep — the Solvers tier (ref rama/solver.h:315-366), vmapped


def solve_sweep(mesh: Mesh, config, frequencies: Sequence[float]):
    """Driven solves at many frequencies in ONE batched device solve.

    The reference runs one thread per frequency (rama/solver.h:351-355);
    here the (N, N) complex systems are assembled and LU-solved under
    `vmap` — frequencies ride the batch dimension on the MXU.

    Returns (fields (F, N) complex, s_params {port: (F,) complex}).
    """
    from eggshell_tpu.fem.helmholtz import (
        FemConfig,
        _boundary_mass,
        _trapezoid_weights,
        assemble_matrices,
        port_beta,
        port_frame,
    )

    dtype = jnp.complex64
    pts = jnp.asarray(mesh.points)
    tri = jnp.asarray(mesh.triangles)
    N = mesh.num_points
    eps = jnp.asarray(mesh.epsilon, dtype)
    if config.type == "EXY":
        inv_eps = 1.0 / eps     # TE: eps weights the stiffness
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
    K = K.astype(dtype)
    M = M.astype(dtype)
    mode_m = 0 if config.type == "EXY" else 1

    c = 299792458.0
    k0s = jnp.asarray(
        [2 * np.pi * f / c * config.unit for f in frequencies], jnp.float32
    )

    ports = sorted(set(int(p) for p in mesh.edge_port[mesh.edge_kind == 1]))
    port_static = {}
    for p in ports:
        nodes, t, width, _ = port_frame(mesh, p)
        mode = np.ones_like(t) if mode_m == 0 else np.sin(np.pi * t / width)
        B = _boundary_mass(pts, mesh.port_edges(p), N, dtype)
        minc = (
            jnp.zeros((N,), dtype)
            .at[jnp.asarray(nodes)]
            .set(jnp.asarray(mode, dtype))
        )
        w = _trapezoid_weights(t)
        port_static[p] = (jnp.asarray(nodes), w, width, B, minc,
                          jnp.asarray(mode, dtype))

    abc_edges = mesh.boundary_edges[mesh.edge_kind == 2]
    B_abc = (
        _boundary_mass(pts, abc_edges, N, dtype) if len(abc_edges) else None
    )

    pec_mask = None
    if config.type in ("EZ", "ES"):
        pec_nodes = np.unique(mesh.boundary_edges[mesh.edge_kind == 0])
        pec_mask = jnp.zeros((N,), bool).at[jnp.asarray(pec_nodes)].set(True)

    def one(k0):
        A = K - (k0**2) * M
        rhs = jnp.zeros((N,), dtype)
        for p, (nodes, w, width, B, minc, mode) in port_static.items():
            beta = (k0 + 0j) if mode_m == 0 else port_beta(k0**2, width)
            A = A + 1j * beta * B
            if p == config.excited_port:
                rhs = rhs + 2j * beta * (B @ minc)
        if B_abc is not None:
            A = A + 1j * k0 * B_abc
        if pec_mask is not None:
            A = jnp.where(pec_mask[:, None] | pec_mask[None, :], 0.0, A)
            A = A + jnp.diag(jnp.where(pec_mask, 1.0, 0.0).astype(dtype))
            rhs = jnp.where(pec_mask, 0.0, rhs)
        u = jnp.linalg.solve(A, rhs)
        amps = []
        for p, (nodes, w, width, B, minc, mode) in port_static.items():
            up = u[nodes]
            amp = jnp.sum(w * up * mode) / jnp.sum(w * mode * mode)
            amp = jnp.where(p == config.excited_port, amp - 1.0, amp)
            amps.append(amp)
        return u, jnp.stack(amps) if amps else jnp.zeros((0,), dtype)

    fields, amps = jax.jit(jax.vmap(one))(k0s)
    s_params = {p: np.asarray(amps[:, i]) for i, p in enumerate(ports)}
    return np.asarray(fields), s_params


# ---------------------------------------------------------------------------
# Matlab export (ref matlab export of mesh+solution, rama/solver.h:228-231)


def export_solution(path: str, mesh: Mesh, field=None, **extra) -> None:
    """Write mesh (+ optional nodal field and extras) as a MATLAB v7
    .mat file via the toolkit MatFile equivalent."""
    from eggshell_tpu.utils.mat_file import MatFile

    with MatFile(path) as mf:
        mf.write("p", mesh.points.T)                       # 2 x N, matlab style
        mf.write("t", (mesh.triangles + 1).T)              # 3 x T, 1-based
        mf.write("boundary_edges", (mesh.boundary_edges + 1).T)
        mf.write("edge_kind", mesh.edge_kind)
        mf.write("edge_port", mesh.edge_port)
        mf.write("epsilon", mesh.epsilon)
        if field is not None:
            mf.write("field", np.asarray(field))
        for k, v in extra.items():
            mf.write(k, np.asarray(v))


def wideband_pulse(fields, frequencies, times, spectrum=None):
    """Combine per-frequency solutions into time-domain field frames —
    the Solvers wideband field combination (ref rama/solver.h:315-366).

    fields (F, N) complex phasors (engineering exp(+j w t) convention),
    frequencies (F,) Hz, times (T,) seconds; `spectrum` (F,) optional
    weights (default: Hann window over the band, a smooth pulse).
    Returns real frames (T, N): u(t) = Re sum_f s_f field_f exp(j w_f t).
    """
    fields = np.asarray(fields)
    f = np.asarray(frequencies, float)
    t = np.asarray(times, float)
    if spectrum is None:
        x = np.linspace(0, np.pi, len(f))
        spectrum = np.sin(x) ** 2 if len(f) > 1 else np.ones(1)
    s = np.asarray(spectrum, complex)
    phase = np.exp(2j * np.pi * f[None, :] * t[:, None])     # (T, F)
    return np.real(np.einsum("tf,f,fn->tn", phase, s, fields))
