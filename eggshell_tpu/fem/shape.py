"""2D CSG geometry — the rama Shape equivalent (rama/shape.h:26-90).

The reference builds polygon sets with Clipper boolean ops and carries
per-edge EdgeInfo (port numbers / absorbing boundaries) and per-piece
Material (complex epsilon).  This build represents a Shape as a signed-
distance CSG tree (exact SDFs for primitives, min/max combinators),
which the distmesh-style mesher consumes directly; boundary conditions
are painted onto boundary *segments* (Port/ABC) and materials onto
region predicates (Paint), then resolved per mesh edge / triangle.

API nouns follow the reference's Lua surface (rama/shape.h:31-44,
rama/user_script_util.lua:124-292): Rectangle, Circle, Polygon,
`a + b` (union), `a - b` (difference), `a & b` (intersection),
`shape.Port(p1, p2, n)`, `shape.ABC(p1, p2)`, `shape.Paint(region,
epsilon)`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

Array = np.ndarray


# ---------------------------------------------------------------------------
# Signed distance primitives (negative inside)


class _SDF:
    def __call__(self, pts: Array) -> Array:
        raise NotImplementedError


@dataclasses.dataclass
class _RectSDF(_SDF):
    xmin: float
    ymin: float
    xmax: float
    ymax: float

    def __call__(self, pts):
        # exact box SDF
        cx = (self.xmin + self.xmax) / 2
        cy = (self.ymin + self.ymax) / 2
        hx = (self.xmax - self.xmin) / 2
        hy = (self.ymax - self.ymin) / 2
        qx = np.abs(pts[:, 0] - cx) - hx
        qy = np.abs(pts[:, 1] - cy) - hy
        outside = np.hypot(np.maximum(qx, 0), np.maximum(qy, 0))
        inside = np.minimum(np.maximum(qx, qy), 0)
        return outside + inside


@dataclasses.dataclass
class _CircleSDF(_SDF):
    cx: float
    cy: float
    r: float

    def __call__(self, pts):
        return np.hypot(pts[:, 0] - self.cx, pts[:, 1] - self.cy) - self.r


@dataclasses.dataclass
class _PolySDF(_SDF):
    verts: Array  # (n, 2) CCW

    def __call__(self, pts):
        v = self.verts
        n = len(v)
        d = np.full(len(pts), np.inf)
        sign = np.ones(len(pts))
        px, py = pts[:, 0], pts[:, 1]
        inside = np.zeros(len(pts), dtype=bool)
        for i in range(n):
            a = v[i]
            b = v[(i + 1) % n]
            e = b - a
            w = pts - a[None, :]
            t = np.clip((w @ e) / (e @ e), 0.0, 1.0)
            proj = a[None, :] + t[:, None] * e[None, :]
            d = np.minimum(d, np.hypot(px - proj[:, 0], py - proj[:, 1]))
            # even-odd crossing
            cond = (a[1] <= py) != (b[1] <= py)
            xi = a[0] + (py - a[1]) / (b[1] - a[1] + 1e-300) * (b[0] - a[0])
            inside ^= cond & (px < xi)
        return np.where(inside, -d, d)


@dataclasses.dataclass
class _UnionSDF(_SDF):
    a: _SDF
    b: _SDF

    def __call__(self, pts):
        return np.minimum(self.a(pts), self.b(pts))


@dataclasses.dataclass
class _IntersectSDF(_SDF):
    a: _SDF
    b: _SDF

    def __call__(self, pts):
        return np.maximum(self.a(pts), self.b(pts))


@dataclasses.dataclass
class _DiffSDF(_SDF):
    a: _SDF
    b: _SDF

    def __call__(self, pts):
        return np.maximum(self.a(pts), -self.b(pts))


# ---------------------------------------------------------------------------
# Boundary painting + materials


@dataclasses.dataclass
class BoundarySegment:
    """A painted boundary segment: mesh boundary edges whose midpoints lie
    within `tol` of the segment get this attribute
    (EdgeInfo analog, ref rama/edge_type.h)."""

    p1: Tuple[float, float]
    p2: Tuple[float, float]
    kind: str   # "port" | "abc" | "potential" | "robin" | "pec" (default)
    port_number: int = 0
    tol: float = 1e-6
    value: float = 0.0   # fixed potential for kind == "potential"
    alpha: complex = 0.0  # Robin coefficient for kind == "robin"
                          # (dimensionless; the solver multiplies by the
                          # local k — ref rama/solver.cc:155-158)


@dataclasses.dataclass
class MaterialRegion:
    """Painted material: triangles whose centroid is inside `region` get
    this (complex) epsilon (Material analog, ref rama/shape.h:64-90)."""

    region: "Shape"
    epsilon: complex = 1.0
    sigma_xx: float = 1.0   # anisotropic weights for TE/TM-style problems
    sigma_yy: float = 1.0
    sigma_xy: float = 0.0   # cross term (ref rama/shape.h:64-90 sigma_xy)
    excitation: complex = 0.0  # volume source density (ref Material excitation)


class Shape:
    """CSG shape with painted boundaries and materials."""

    def __init__(self, sdf: _SDF, fixed_points: Sequence = (),
                 bbox: Optional[Tuple[float, float, float, float]] = None):
        self.sdf = sdf
        self.fixed_points: List[Tuple[float, float]] = list(fixed_points)
        self.bbox = bbox  # (xmin, ymin, xmax, ymax)
        self.boundaries: List[BoundarySegment] = []
        self.materials: List[MaterialRegion] = []

    # ---- CSG (ref rama/shape.h operator+/-/& via Clipper) ----
    def __add__(self, other: "Shape") -> "Shape":
        s = Shape(
            _UnionSDF(self.sdf, other.sdf),
            self.fixed_points + other.fixed_points,
            _bbox_union(self.bbox, other.bbox),
        )
        s.boundaries = self.boundaries + other.boundaries
        s.materials = self.materials + other.materials
        return s

    def __sub__(self, other: "Shape") -> "Shape":
        s = Shape(
            _DiffSDF(self.sdf, other.sdf),
            self.fixed_points + other.fixed_points,
            self.bbox,
        )
        s.boundaries = self.boundaries + other.boundaries
        s.materials = self.materials
        return s

    def __and__(self, other: "Shape") -> "Shape":
        s = Shape(
            _IntersectSDF(self.sdf, other.sdf),
            self.fixed_points + other.fixed_points,
            _bbox_intersect(self.bbox, other.bbox),
        )
        s.boundaries = self.boundaries + other.boundaries
        s.materials = self.materials + other.materials
        return s

    # ---- painting ----
    def Port(self, p1, p2, port_number: int, tol: float = 1e-6) -> "Shape":
        """Mark the boundary segment p1-p2 as port `port_number`
        (ref rama/shape.h Port, user_script_util.lua:232-292)."""
        self.boundaries.append(
            BoundarySegment(tuple(p1), tuple(p2), "port", port_number, tol)
        )
        self.fixed_points += [tuple(p1), tuple(p2)]
        return self

    def ABC(self, p1, p2, tol: float = 1e-6) -> "Shape":
        """Absorbing (first-order Robin) boundary segment."""
        self.boundaries.append(
            BoundarySegment(tuple(p1), tuple(p2), "abc", 0, tol)
        )
        self.fixed_points += [tuple(p1), tuple(p2)]
        return self

    def Robin(self, p1, p2, alpha: complex, tol: float = 1e-6) -> "Shape":
        """Custom Robin boundary on the segment p1-p2:
        du/dn + alpha * k_local * u = 0 with complex dimensionless
        `alpha` (the reference's port-callback boundary parameters,
        rama/solver.cc:155-158) — lossy conductor walls via
        fem.metal.metal_wall_alpha."""
        self.boundaries.append(
            BoundarySegment(tuple(p1), tuple(p2), "robin", 0, tol,
                            alpha=complex(alpha))
        )
        self.fixed_points += [tuple(p1), tuple(p2)]
        return self

    def Potential(self, p1, p2, value: float, tol: float = 1e-6) -> "Shape":
        """Fix the boundary segment p1-p2 at a given electrostatic
        potential (conductor at `value` volts — the ES problem type's
        boundary condition, ref rama/solver.h ELECTROSTATICS +
        capacitor_electrostatics.lua example)."""
        self.boundaries.append(
            BoundarySegment(tuple(p1), tuple(p2), "potential", 0, tol,
                            value=value)
        )
        self.fixed_points += [tuple(p1), tuple(p2)]
        return self

    def Paint(self, region: "Shape", epsilon: complex = 1.0,
              sigma_xx: float = 1.0, sigma_yy: float = 1.0,
              sigma_xy: float = 0.0, excitation: complex = 0.0) -> "Shape":
        """Paint a material onto a sub-region (ref __Paint__,
        rama/user_script_util.lua:124-230)."""
        self.materials.append(
            MaterialRegion(region, epsilon, sigma_xx, sigma_yy, sigma_xy,
                           excitation)
        )
        return self

    # ---- queries ----
    def distance(self, pts: Array) -> Array:
        return self.sdf(np.atleast_2d(np.asarray(pts, float)))

    def contains(self, pts: Array) -> Array:
        return self.distance(pts) < 0


def _bbox_union(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def _bbox_intersect(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return (max(a[0], b[0]), max(a[1], b[1]), min(a[2], b[2]), min(a[3], b[3]))


def Rectangle(xmin: float, ymin: float, xmax: float, ymax: float) -> Shape:
    """Axis-aligned rectangle (ref Rectangle(),
    rama/user_script_util.lua / shape.cc)."""
    fixed = [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)]
    return Shape(
        _RectSDF(xmin, ymin, xmax, ymax), fixed, (xmin, ymin, xmax, ymax)
    )


def Circle(cx: float, cy: float, r: float, npoints: int = 0) -> Shape:
    """Circle; npoints is accepted for reference-API compatibility (the
    SDF is exact — the mesher resolves the boundary)."""
    return Shape(
        _CircleSDF(cx, cy, r), [], (cx - r, cy - r, cx + r, cy + r)
    )


def Polygon(vertices) -> Shape:
    v = np.asarray(vertices, float)
    bbox = (v[:, 0].min(), v[:, 1].min(), v[:, 0].max(), v[:, 1].max())
    return Shape(_PolySDF(v), [tuple(p) for p in v], bbox)
