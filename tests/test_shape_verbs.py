"""Shape-tier verbs: Offset, Select, polygon extraction, DXF export —
the reference's remaining Clipper-backed surface (rama/shape.h:26-44
Offset/Select; polygon sets are Clipper paths natively)."""

import os

import numpy as np

from eggshell_tpu.fem.helmholtz import FemConfig, solve_driven
from eggshell_tpu.fem.mesher import mesh_structured
from eggshell_tpu.fem.shape import (
    Circle,
    EdgeSelection,
    Polygon,
    Rectangle,
    extract_polygons,
    shape_to_dxf,
)


# ---------------------------------------------------------------------------
# Offset


def test_offset_circle_exact():
    c = Circle(0, 0, 2.0).Offset(0.5)
    # grown circle: SDF zero at r = 2.5, inside at 2.2, outside at 2.7
    assert abs(c.distance([[2.5, 0.0]])[0]) < 1e-12
    assert c.contains([[2.2, 0.0]])[0]
    assert not c.contains([[2.7, 0.0]])[0]


def test_offset_rectangle_shrink_grow():
    r = Rectangle(0, 0, 10, 4)
    grown = r.Offset(1.0)
    shrunk = r.Offset(-1.0)
    assert grown.contains([[-0.5, 2.0]])[0]          # outside r, inside grown
    assert not grown.contains([[-1.5, 2.0]])[0]
    assert not shrunk.contains([[0.5, 2.0]])[0]      # inside r, outside shrunk
    assert shrunk.contains([[1.5, 2.0]])[0]
    # grown rectangle has rounded corners (Minkowski semantics): the
    # point at diagonal distance sqrt(2) > 1 from the corner is outside
    assert not grown.contains([[-0.8, -0.8]])[0]
    assert grown.contains([[-0.6, -0.6]])[0]


def test_offset_bbox_inflated_and_meshable():
    r = Rectangle(0, 0, 4, 2).Offset(0.5)
    xmin, ymin, xmax, ymax = r.bbox
    assert xmin <= -0.5 and ymax >= 2.5
    from eggshell_tpu.fem.mesher import mesh_shape

    m = mesh_shape(r, 0.3)
    assert m.num_points > 50
    # meshed area ~ offset-rectangle area (8 + perimeter/2 + pi/4)
    pts = m.points[m.triangles]
    area = 0.5 * np.abs(
        (pts[:, 1, 0] - pts[:, 0, 0]) * (pts[:, 2, 1] - pts[:, 0, 1])
        - (pts[:, 1, 1] - pts[:, 0, 1]) * (pts[:, 2, 0] - pts[:, 0, 0])
    ).sum()
    expect = 8 + 12 * 0.5 + np.pi * 0.25
    assert abs(area - expect) < 0.2


# ---------------------------------------------------------------------------
# Polygon extraction


def test_extract_rectangle_four_corners():
    polys = Rectangle(0, 0, 10, 4).polygons()
    assert len(polys) == 1
    p = polys[0]
    assert len(p) == 4
    corners = np.asarray([[0, 0], [10, 0], [10, 4], [0, 4]], float)
    for c in corners:
        assert np.min(np.hypot(p[:, 0] - c[0], p[:, 1] - c[1])) < 0.05


def test_extract_ring_two_loops():
    ring = Rectangle(0, 0, 10, 10) - Rectangle(3, 3, 7, 7)
    polys = ring.polygons(512)
    assert len(polys) == 2
    sizes = sorted(
        (np.ptp(p[:, 0]) for p in polys)
    )
    assert abs(sizes[0] - 4.0) < 0.1      # hole
    assert abs(sizes[1] - 10.0) < 0.1     # outer


def test_extract_circle_stays_within_tolerance():
    pc = Circle(0, 0, 2.0).polygons(512)
    assert len(pc) == 1
    r = np.hypot(pc[0][:, 0], pc[0][:, 1])
    assert np.max(np.abs(r - 2.0)) < 0.01
    assert len(pc[0]) > 20                # curves keep their vertices


def test_extract_polygon_roundtrip():
    verts = np.asarray([(0, 0), (6, 0), (6, 3), (3, 5), (0, 3)], float)
    polys = Polygon(verts).polygons(512)
    assert len(polys) == 1
    p = polys[0]
    # every true corner recovered; no spurious far-from-boundary vertices
    # (corners may carry a sub-cell chamfer pair, so <= 2 verts/corner)
    assert 5 <= len(p) <= 10
    for v in verts:
        assert np.min(np.hypot(p[:, 0] - v[0], p[:, 1] - v[1])) < 0.05
    dist = np.abs(Polygon(verts).distance(p))
    assert dist.max() < 0.03


# ---------------------------------------------------------------------------
# Select


def test_select_returns_full_side():
    r = Rectangle(0, 0, 10, 4)
    sel = r.Select(0, 2)                  # middle of the west side
    assert isinstance(sel, EdgeSelection)
    ends = sorted([sel.p1, sel.p2], key=lambda p: p[1])
    assert abs(ends[0][0]) < 0.05 and abs(ends[0][1]) < 0.05
    assert abs(ends[1][0]) < 0.05 and abs(ends[1][1] - 4) < 0.05


def test_select_feeds_port_painting():
    """Port(Select(x, y), n) paints the same mesh edges as explicit
    endpoints (the reference's idiomatic cd:Port(cd:Select(...), n))."""
    a, L = 22.86, 30.0

    def build(use_select):
        cd = Rectangle(0, 0, L, a)
        if use_select:
            cd.Port(cd.Select(0, a / 2), 1)
            cd.Port(cd.Select(L, a / 2), 2)
        else:
            cd.Port((0, 0), (0, a), 1)
            cd.Port((L, 0), (L, a), 2)
        return mesh_structured(cd, (0, 0), (L, 0), (0, a), 1.5)

    m_sel = build(True)
    m_exp = build(False)
    # identical structured meshes -> identical edge paint
    np.testing.assert_array_equal(m_sel.edge_kind, m_exp.edge_kind)
    np.testing.assert_array_equal(m_sel.edge_port, m_exp.edge_port)
    cfg = FemConfig(type="EZ", frequency=10e9, unit=1e-3, excited_port=1)
    s_sel = solve_driven(m_sel, cfg).s_params
    s_exp = solve_driven(m_exp, cfg).s_params
    assert abs(s_sel[2] - s_exp[2]) < 1e-12


def test_select_island_side():
    """Select on the ring/island geometry picks the island's west side
    (the reference regression test addresses port 2 this way,
    rama/tests/test_regressions.lua:37)."""
    ring = (Rectangle(-5, -5, 15, 15)
            - (Rectangle(0, 0, 10, 10) - Rectangle(3, 3, 7, 7)))
    sel = ring.Select(3, 4, resolution=512)
    ends = sorted([sel.p1, sel.p2], key=lambda p: p[1])
    assert abs(ends[0][0] - 3) < 0.06 and abs(ends[0][1] - 3) < 0.06
    assert abs(ends[1][0] - 3) < 0.06 and abs(ends[1][1] - 7) < 0.06


# ---------------------------------------------------------------------------
# DXF export


def test_shape_to_dxf(tmp_path):
    ring = Rectangle(0, 0, 10, 10) - Rectangle(3, 3, 7, 7)
    path = os.path.join(tmp_path, "ring.dxf")
    n = shape_to_dxf(ring, path)
    assert n == 2
    text = open(path).read()
    assert "POLYLINE" in text and "SEQEND" in text
    assert text.count("VERTEX") >= 8
