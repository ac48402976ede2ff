"""Camera + geometric picking tests (ref toolkit/camera.h:16-28,
toolkit/color_based_selection.h:18-24 — the viewer's orbit/pan/zoom
camera and object-under-cursor selection)."""

import numpy as np
import pytest

from eggshell_tpu.viz.camera import Camera, pick_body, ray_obb_distances


def _identity_rots(n):
    return np.broadcast_to(np.eye(3), (n, 3, 3)).copy()


class TestCamera:
    def test_eye_orbits_target(self):
        cam = Camera(distance=4.0, azim=0.0, elev=0.0)
        assert np.allclose(cam.eye(), [4.0, 0.0, 0.0])
        cam.orbit(90.0, 0.0)
        assert np.allclose(cam.eye(), [0.0, 4.0, 0.0], atol=1e-12)
        cam.orbit(0.0, 45.0)
        # eye climbs, same distance
        assert cam.eye()[2] > 0
        assert np.isclose(np.linalg.norm(cam.eye() - cam.target), 4.0)

    def test_orbit_clamps_pitch(self):
        cam = Camera()
        cam.orbit(0.0, 500.0)
        assert cam.elev <= 89.0
        cam.orbit(0.0, -500.0)
        assert cam.elev >= -89.0

    def test_pan_moves_target_in_view_plane(self):
        cam = Camera(distance=5.0, azim=0.0, elev=0.0)
        f0 = cam.forward()
        cam.pan(1.0, 2.0)
        # pan is perpendicular to the view axis
        assert abs(float(cam.target @ f0)) < 1e-12
        assert np.isclose(np.linalg.norm(cam.target), np.sqrt(5.0))

    def test_zoom_scales_distance_with_floor(self):
        cam = Camera(distance=2.0)
        cam.zoom(0.5)
        assert np.isclose(cam.distance, 1.0)
        cam.zoom(1e-9)
        assert cam.distance >= 1e-3

    def test_project_unproject_roundtrip_perspective(self):
        cam = Camera(distance=6.0, azim=-45.0, elev=25.0)
        w, h = 640, 480
        pt = np.array([0.3, -0.2, 0.5])
        px = cam.project(pt, w, h)[0]
        assert np.all(np.isfinite(px))
        o, d = cam.pixel_to_ray(px[0], px[1], w, h)
        # the ray through the projected pixel passes through the point
        t = (pt - o) @ d
        assert t > 0
        assert np.linalg.norm(o + t * d - pt) < 1e-9

    def test_project_unproject_roundtrip_ortho(self):
        cam = Camera(distance=6.0, azim=30.0, elev=-10.0, ortho=True)
        w, h = 400, 400
        pt = np.array([-0.4, 0.1, 0.2])
        px = cam.project(pt, w, h)[0]
        o, d = cam.pixel_to_ray(px[0], px[1], w, h)
        t = (pt - o) @ d
        assert np.linalg.norm(o + t * d - pt) < 1e-9

    def test_point_behind_eye_is_nan(self):
        cam = Camera(distance=2.0, azim=0.0, elev=0.0)
        behind = cam.eye() - 3.0 * cam.forward()
        px = cam.project(behind, 100, 100)[0]
        assert np.all(np.isnan(px))

    def test_center_pixel_hits_target(self):
        cam = Camera(target=np.array([1.0, 2.0, 3.0]), distance=7.0,
                     azim=33.0, elev=12.0)
        px = cam.project(cam.target, 640, 480)[0]
        assert np.allclose(px, [320.0, 240.0], atol=1e-6)


class TestRayObb:
    def test_axis_aligned_hit_and_miss(self):
        p = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 5.0]])
        h = np.full((2, 3), 0.5)
        t = ray_obb_distances(
            np.array([-3.0, 0.0, 0.0]), np.array([1.0, 0.0, 0.0]),
            p, _identity_rots(2), h)
        assert np.isclose(t[0], 2.5)        # entry at x=-0.5
        assert np.isinf(t[1])

    def test_ray_behind_box_misses(self):
        t = ray_obb_distances(
            np.array([3.0, 0.0, 0.0]), np.array([1.0, 0.0, 0.0]),
            np.zeros((1, 3)), _identity_rots(1), np.full((1, 3), 0.5))
        assert np.isinf(t[0])

    def test_origin_inside_hits_at_zero(self):
        t = ray_obb_distances(
            np.zeros(3), np.array([0.0, 0.0, 1.0]),
            np.zeros((1, 3)), _identity_rots(1), np.full((1, 3), 0.5))
        assert t[0] == 0.0

    def test_parallel_ray_inside_slab(self):
        # ray along +x at y=0.2,z=0: parallel to the y/z slabs, inside
        t = ray_obb_distances(
            np.array([-2.0, 0.2, 0.0]), np.array([1.0, 0.0, 0.0]),
            np.zeros((1, 3)), _identity_rots(1), np.full((1, 3), 0.5))
        assert np.isclose(t[0], 1.5)
        # outside the slab: miss even though x-slabs intersect
        t = ray_obb_distances(
            np.array([-2.0, 0.8, 0.0]), np.array([1.0, 0.0, 0.0]),
            np.zeros((1, 3)), _identity_rots(1), np.full((1, 3), 0.5))
        assert np.isinf(t[0])

    def test_rotated_box(self):
        # box rotated 45 deg about z: its corner reaches sqrt(2)*0.5
        # along x, so a ray at y=0.6 that would miss the AABB still
        # misses, but one at y=0.0 hits at x=-sqrt(2)/2
        c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
        R = np.array([[[c, -s, 0], [s, c, 0], [0, 0, 1.0]]])
        t = ray_obb_distances(
            np.array([-3.0, 0.0, 0.0]), np.array([1.0, 0.0, 0.0]),
            np.zeros((1, 3)), R, np.full((1, 3), 0.5))
        assert np.isclose(t[0], 3.0 - np.sqrt(2) / 2, atol=1e-12)


class TestPicking:
    def test_pick_nearest_of_stacked_bodies(self):
        # two boxes along the view axis: picking must return the nearer
        cam = Camera(distance=10.0, azim=0.0, elev=0.0)
        p = np.array([[2.0, 0.0, 0.0], [-2.0, 0.0, 0.0]])
        h = np.full((2, 3), 0.5)
        i = pick_body(cam, 320, 240, 640, 480, p, _identity_rots(2), h)
        assert i == 0                       # eye is at +x, box 0 nearer

    def test_pick_miss_returns_minus_one(self):
        cam = Camera(distance=10.0, azim=0.0, elev=0.0)
        p = np.array([[0.0, 0.0, 0.0]])
        i = pick_body(cam, 0, 0, 640, 480, p, _identity_rots(1),
                      np.full((1, 3), 0.1))
        assert i == -1

    def test_pick_through_projected_center(self):
        # project each body center, pick at that pixel, expect that body
        cam = Camera(distance=8.0, azim=-50.0, elev=30.0)
        p = np.array([[1.5, 0.0, 0.0], [-1.5, 0.5, 0.3]])
        h = np.full((2, 3), 0.3)
        w, hh = 640, 480
        for i in range(2):
            px = cam.project(p[i], w, hh)[0]
            got = pick_body(cam, px[0], px[1], w, hh, p,
                            _identity_rots(2), h)
            assert got == i


def test_viewer_pick_and_camera_integration(tmp_path):
    """Viewer-level selection: click the rendered center of a box-drop
    scene -> the falling box is selected + highlighted; clicking a
    corner deselects (ref viewer.h mouse bindings + color_based_
    selection).  Headless (Agg)."""
    import matplotlib

    matplotlib.use("Agg")
    from eggshell_tpu.physics import scenes
    from eggshell_tpu.utils.config import SimConfig, SolverKind
    from eggshell_tpu.viz import InteractiveViewer

    cfg = SimConfig(solver=SolverKind.PGS, solver_iters=20,
                    conditional_cfm=False, cfm_always=0.01,
                    contact_capacity=16)
    spec, state = scenes.box_drop(height=0.5)
    v = InteractiveViewer(spec, state, cfg)
    v.render_frame()

    # click exactly on the box's rendered center (body_pixel = the
    # project half of the project/unproject pair)
    w, h = 480, 480
    px = v.body_pixel(0, w, h)
    i = v.pick(px[0], px[1], w, h)
    assert i == 0
    assert v.selected == 0
    ax = v.render_frame()
    assert "sel=body0" in ax.get_title()

    # a far corner misses
    i = v.pick(1, 1, w, h)
    assert i == -1
    assert v.selected == -1

    # camera verbs move the view without crashing the render
    v.camera.orbit(30, 10)
    v.camera.zoom(0.8)
    v.camera.pan(0.1, 0.0)
    v.render_frame()
