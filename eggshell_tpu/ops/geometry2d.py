"""2D geometry inlines — toolkit/geometry.h equivalent (vectorized)."""

from __future__ import annotations

import jax.numpy as jnp


def point_segment_distance(p, a, b):
    """Distance from point(s) p to segment ab (broadcasts)."""
    ab = b - a
    t = jnp.clip(
        jnp.sum((p - a) * ab, -1) / jnp.maximum(jnp.sum(ab * ab, -1), 1e-300),
        0.0, 1.0,
    )
    proj = a + t[..., None] * ab
    return jnp.linalg.norm(p - proj, axis=-1)


def segments_intersect(p1, p2, p3, p4, eps=0.0):
    """True when segments p1p2 and p3p4 properly intersect."""
    def cross(o, a, b):
        return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
            a[..., 1] - o[..., 1]
        ) * (b[..., 0] - o[..., 0])

    d1 = cross(p3, p4, p1)
    d2 = cross(p3, p4, p2)
    d3 = cross(p1, p2, p3)
    d4 = cross(p1, p2, p4)
    return (d1 * d2 < -eps) & (d3 * d4 < -eps)


def polygon_area(verts):
    """Signed area (CCW positive), shoelace.  verts (..., n, 2)."""
    x = verts[..., 0]
    y = verts[..., 1]
    return 0.5 * jnp.sum(
        x * jnp.roll(y, -1, -1) - jnp.roll(x, -1, -1) * y, axis=-1
    )


def polygon_centroid(verts):
    x = verts[..., 0]
    y = verts[..., 1]
    cr = x * jnp.roll(y, -1, -1) - jnp.roll(x, -1, -1) * y
    A = 0.5 * jnp.sum(cr, -1)
    cx = jnp.sum((x + jnp.roll(x, -1, -1)) * cr, -1) / (6 * A)
    cy = jnp.sum((y + jnp.roll(y, -1, -1)) * cr, -1) / (6 * A)
    return jnp.stack([cx, cy], -1)


def point_in_polygon(p, verts):
    """Even-odd test; p (..., 2), verts (n, 2)."""
    x, y = p[..., 0], p[..., 1]
    vx, vy = verts[:, 0], verts[:, 1]
    vx2 = jnp.roll(vx, -1)
    vy2 = jnp.roll(vy, -1)
    cond = (vy[:, None] <= y[None]) != (vy2[:, None] <= y[None])
    xi = vx[:, None] + (y[None] - vy[:, None]) / (
        vy2[:, None] - vy[:, None] + 1e-300
    ) * (vx2[:, None] - vx[:, None])
    hits = cond & (x[None] < xi)
    return jnp.sum(hits, axis=0) % 2 == 1
