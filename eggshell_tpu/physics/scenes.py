"""Canonical scenarios — the reference's scenes plus the benchmark configs.

Chain / Cairn mirror eggshell/ensembles.cc:668-728; box_drop / box_stack
are BASELINE.md configs #1/#3; living_room imports the MuJoCo scene
(mujoco_scratchpad/living_room.xml) as boxes.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from eggshell_tpu.ops import quaternion as quat
from eggshell_tpu.physics.scene import SceneSpec, State, make_scene


def chain(
    num_links: int = 10,
    anchor_position=(2.0, 2.0, 1.0),
    dtype=jnp.float64,
    collide: bool = False,
) -> Tuple[SceneSpec, State]:
    """Hanging chain of unit boxes linked corner-to-corner by ball joints,
    anchored to the world at link 0's center (ref ensembles.cc:668-707).

    Links start collinear along x at spacing sqrt(3)*0.3 with orientation
    R = Rz(0.9553166) Rx(pi/4) — the diagonal-aligned pose in which the
    corner offsets +-0.15 touch (ref :679-689).

    `collide=True` enables ground + link-link contacts exactly like the
    reference's UpdateContacts (ensembles.cc:445-474 runs ground and
    all-pairs narrowphase on every ensemble, chain included) — required
    for golden-trajectory parity; the default False keeps the historical
    joints-only benchmark scene."""
    anchor = np.asarray(anchor_position, float)
    # q = AngleAxis(0.95531661812451, z) * AngleAxis(pi/4, x)
    qz = np.array(
        [math.cos(0.95531661812451 / 2), 0, 0, math.sin(0.95531661812451 / 2)]
    )
    qx = np.array([math.cos(math.pi / 8), math.sin(math.pi / 8), 0, 0])
    q0 = np.asarray(
        quat.quat_mul(jnp.asarray(qz), jnp.asarray(qx))
    )
    positions = [
        anchor + np.array([math.sqrt(3.0) * 0.3 * i, 0, 0])
        for i in range(num_links)
    ]
    c1 = np.array([0.15, -0.15, 0.15])
    c2 = np.array([-0.15, 0.15, -0.15])
    joints = [(i, i + 1, c1, c2) for i in range(num_links - 1)]
    # world anchor at link 0's initial position (ref SetAnchor :702-707)
    joints.append((0, -1, np.zeros(3), positions[0].copy()))
    return make_scene(
        positions,
        quats=np.tile(q0, (num_links, 1)),
        joints=joints,
        ground=collide,
        pairs=None if collide else [],
        dtype=dtype,
    )


def cairn(
    num_rocks: int = 4,
    x_bound=(-0.2, 0.2),
    y_bound=(-0.2, 0.2),
    z_bound=(1.0, 8.0),
    seed: int = 0,
    max_init_v: float = 1.0,
    max_init_w: float = 1.0,
    dtype=jnp.float64,
) -> Tuple[SceneSpec, State]:
    """Random falling boxes with I = 0.1 I3 (ref ensembles.cc:709-728)."""
    rng = np.random.default_rng(seed)
    lo = np.array([x_bound[0], y_bound[0], z_bound[0]])
    hi = np.array([x_bound[1], y_bound[1], z_bound[1]])
    p = rng.uniform(0, 1, (num_rocks, 3)) * (hi - lo) + lo
    q = rng.normal(size=(num_rocks, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    v = rng.uniform(-1, 1, (num_rocks, 3)) * max_init_v
    w = rng.uniform(-1, 1, (num_rocks, 3)) * max_init_w
    I = np.tile(0.1 * np.eye(3), (num_rocks, 1, 1))
    return make_scene(
        p, quats=q, velocities=v, angular_velocities=w, inertias=I,
        ground=True, dtype=dtype,
    )


def box_drop(height: float = 0.5, dtype=jnp.float64) -> Tuple[SceneSpec, State]:
    """BASELINE config #1: one box dropped on the ground plane — a
    4-contact LCP per resting step."""
    return make_scene([[0.0, 0.0, height]], ground=True, dtype=dtype)


def box_stack(
    num_boxes: int = 8, jitter: float = 0.0, seed: int = 0, dtype=jnp.float64
) -> Tuple[SceneSpec, State]:
    """BASELINE config #3: a vertical stack of boxes (frictional contact
    PGS + stabilization)."""
    rng = np.random.default_rng(seed)
    side = 0.3
    p = np.zeros((num_boxes, 3))
    p[:, 2] = side / 2 + side * np.arange(num_boxes)
    if jitter:
        p[:, :2] += rng.uniform(-jitter, jitter, (num_boxes, 2))
    return make_scene(p, ground=True, dtype=dtype)


def pendulum_chain(num_links: int = 6, dtype=jnp.float64):
    """BASELINE config #2: 6-link pendulum chain (joints only)."""
    return chain(num_links, anchor_position=(0.0, 0.0, 2.0), dtype=dtype)


def living_room(dtype=jnp.float64) -> Tuple[SceneSpec, State]:
    """BASELINE config #4: the mujoco_scratchpad/living_room.xml clutter
    scene, box-ified: 4+1 static furniture boxes (infinite mass) and 3
    free boxes dropped into the room (ref living_room.xml:24-64).

    Geometry (pos, size = half extents, yaw degrees) transcribed from the
    MJCF; the Tall/Short bookcases carry 90-degree yaws."""
    def yaw_quat(deg):
        a = math.radians(deg)
        return [math.cos(a / 2), 0.0, 0.0, math.sin(a / 2)]

    # name, pos, half extents, yaw, static
    geoms = [
        ("coffee_table", (0.0, 2.0, 0.3), (1.5, 0.8, 0.3), 0.0, True),
        ("dining_table", (0.0, -3.0, 0.8), (2.5, 1.5, 0.8), 0.0, True),
        ("tall_bookcase", (-4.0, 0.0, 2.0), (0.8, 0.4, 2.0), 90.0, True),
        ("short_bookcase", (4.0, 0.0, 1.2), (0.8, 0.4, 1.2), -90.0, True),
        ("plush_armchair", (-3.0, 3.0, 2.5), (1.0, 0.8, 0.8), 45.0, False),
        ("elegant_armchair", (2.5, 2.5, 1.2), (1.0, 0.8, 0.8), -45.0, False),
        ("table_lamp", (0.0, -3.0, 1.4), (0.3, 0.3, 0.6), 0.0, False),
    ]
    positions = [g[1] for g in geoms]
    half = [g[2] for g in geoms]
    quats = [yaw_quat(g[3]) for g in geoms]
    static = [g[4] for g in geoms]
    # Only pairs with at least one free body need narrowphase.
    n = len(geoms)
    pairs = [
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if not (static[i] and static[j])
    ]
    spec, state = make_scene(
        positions, quats=quats, half_extents=half, static=static,
        ground=True, pairs=pairs, dtype=dtype,
    )
    # Static furniture should not generate ground contacts.
    spec = spec._replace(
        ground_enabled=jnp.asarray([not s for s in static])
    )
    return spec, state


def box_pile(
    num_boxes: int = 216,
    side: float = 0.3,
    spacing: float = 1.15,
    seed: int = 0,
    jitter: float = 0.02,
    dtype=jnp.float64,
) -> Tuple[SceneSpec, State]:
    """LARGE single scene: a cubic lattice of boxes dropped onto the
    ground, collapsing into a pile — the scaling tier the reference built
    its matrix-free machinery for (sparse_iterations_utils.cc:624-695;
    the reference never ships a scene this big, its scenarios top out at
    Chain(10)/Cairn(4), model.cc:28-31).

    Use with SolverKind.MATRIX_FREE + cfg.pair_capacity: memory O(K),
    the dense (3K)^2 system matrix is never formed.  num_boxes should be
    a cube (6^3 = 216 default)."""
    rng = np.random.default_rng(seed)
    m = round(num_boxes ** (1 / 3))
    assert m**3 == num_boxes, "num_boxes must be a perfect cube"
    g = np.arange(m) - (m - 1) / 2
    xx, yy, zz = np.meshgrid(g, g, np.arange(m), indexing="ij")
    p = np.stack(
        [xx.ravel() * side * spacing, yy.ravel() * side * spacing,
         side / 2 + zz.ravel() * side * spacing], -1
    )
    p[:, :2] += rng.uniform(-jitter, jitter, (num_boxes, 2))
    return make_scene(p, ground=True, dtype=dtype)


def mjcf_boxes(path: str, dtype=jnp.float64) -> Tuple[SceneSpec, State]:
    """Minimal MJCF importer: reads box geoms from a MuJoCo XML file;
    bodies with a <freejoint/> are dynamic, others static
    (covers mujoco_scratchpad/living_room.xml-style scenes)."""
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    positions, half, quats, static = [], [], [], []
    for body in root.iter("body"):
        free = body.find("freejoint") is not None
        for geom in body.findall("geom"):
            if geom.get("type") != "box":
                continue
            pos = [float(x) for x in geom.get("pos", "0 0 0").split()]
            size = [float(x) for x in geom.get("size", "0.1 0.1 0.1").split()]
            euler = [float(x) for x in geom.get("euler", "0 0 0").split()]
            rx = quat.quat_from_scaled_axis(
                jnp.asarray([math.radians(euler[0]), 0.0, 0.0])
            )
            ry = quat.quat_from_scaled_axis(
                jnp.asarray([0.0, math.radians(euler[1]), 0.0])
            )
            rz = quat.quat_from_scaled_axis(
                jnp.asarray([0.0, 0.0, math.radians(euler[2])])
            )
            qq = np.asarray(quat.quat_mul(rz, quat.quat_mul(ry, rx)))
            positions.append(pos)
            half.append(size)
            quats.append(qq)
            static.append(not free)
    n = len(positions)
    pairs = [
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if not (static[i] and static[j])
    ]
    spec, state = make_scene(
        positions, quats=quats, half_extents=half, static=static,
        ground=True, pairs=pairs, dtype=dtype,
    )
    spec = spec._replace(ground_enabled=jnp.asarray([not s for s in static]))
    return spec, state
