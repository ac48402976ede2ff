"""STEP parser, DXF writer, 2D geometry tests."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from eggshell_tpu.ops import geometry2d as g2
from eggshell_tpu.utils import dxf
from eggshell_tpu.utils.step_parser import Enum, Ref, StepError, parse_step

STEP_SAMPLE = """ISO-10303-21;
HEADER;
FILE_DESCRIPTION(('test part'),'2;1');
FILE_NAME('box.step','2026-01-01',('author'),(''),'proc','sys','');
ENDSEC;
DATA;
#1=CARTESIAN_POINT('origin',(0.,0.,0.));
#2=CARTESIAN_POINT('p',(1.,2.5,-3.E-1));
#3=DIRECTION('z',(0.,0.,1.));
#4=AXIS2_PLACEMENT_3D('',#1,#3,$);
#5=ADVANCED_FACE('',(),#4,.T.);
ENDSEC;
END-ISO-10303-21;
"""


def test_step_parse_basics():
    sf = parse_step(STEP_SAMPLE)
    assert sf.header[0][0] == "FILE_DESCRIPTION"
    assert len(sf.entities) == 5
    name, args = sf.entities[2]
    assert name == "CARTESIAN_POINT"
    assert args[0] == "p"
    np.testing.assert_allclose(args[1], [1.0, 2.5, -0.3])
    name4, args4 = sf.entities[4]
    assert args4[1] == Ref(1) and args4[2] == Ref(3) and args4[3] is None
    assert sf.entities[5][1][3] == Enum("T")
    pts = sf.of_type("cartesian_point")
    assert set(pts) == {1, 2}


def test_step_errors():
    with pytest.raises(StepError):
        parse_step("NOT-A-STEP;")
    with pytest.raises(StepError):
        parse_step("ISO-10303-21;\nDATA;\n#1=FOO(;\n")


def test_dxf_roundtrip_structure(tmp_path):
    w = dxf.DxfWriter()
    w.add_line((0, 0), (1, 0))
    w.add_circle((0.5, 0.5), 0.25)
    w.add_polyline([(0, 0), (1, 0), (1, 1)], closed=True)
    s = w.tostring()
    assert "ENTITIES" in s and "LINE" in s and "CIRCLE" in s
    assert s.strip().endswith("EOF")
    p = tmp_path / "out.dxf"
    w.save(str(p))
    assert p.read_text().startswith("0\nSECTION")


def test_arc_fitting():
    t = np.linspace(0.3, 2.2, 40)
    pts = np.stack([2 + 1.5 * np.cos(t), -1 + 1.5 * np.sin(t)], 1)
    c, r, resid = dxf.fit_arc(pts)
    np.testing.assert_allclose(c, [2, -1], atol=1e-9)
    np.testing.assert_allclose(r, 1.5, atol=1e-9)
    assert resid < 1e-9
    segs = dxf.fit_polyline(pts, tol=1e-6)
    kinds = {s[0] for s in segs}
    assert "arc" in kinds and len(segs) <= 3
    # straight data stays lines
    line = np.stack([np.linspace(0, 1, 10), np.zeros(10)], 1)
    segs = dxf.fit_polyline(line, tol=1e-9)
    assert all(s[0] == "line" for s in segs)


def test_geometry2d():
    p = jnp.asarray([0.5, 1.0])
    a = jnp.asarray([0.0, 0.0])
    b = jnp.asarray([1.0, 0.0])
    np.testing.assert_allclose(
        float(g2.point_segment_distance(p, a, b)), 1.0, atol=1e-12
    )
    assert bool(
        g2.segments_intersect(
            jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 1.0]),
            jnp.asarray([0.0, 1.0]), jnp.asarray([1.0, 0.0]),
        )
    )
    sq = jnp.asarray([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    np.testing.assert_allclose(float(g2.polygon_area(sq)), 1.0)
    np.testing.assert_allclose(
        np.asarray(g2.polygon_centroid(sq)), [0.5, 0.5], atol=1e-12
    )
    pts = jnp.asarray([[0.5, 0.5], [1.5, 0.5]])
    got = np.asarray(g2.point_in_polygon(pts, sq))
    assert got.tolist() == [True, False]
