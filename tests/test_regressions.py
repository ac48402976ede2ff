"""Mesher topology regressions — the reference's
rama/tests/test_regressions.lua test 1 ("no wave path from ring to
island") rebuilt on the SDF-CSG mesher.

B - A where A = Rectangle(0,0,10,10) - Rectangle(3,3,7,7) and
B = Rectangle(-5,-5,15,15) must produce TWO disconnected components: an
outer ring and the 3..7 island (the hole of A).  Exciting port 1 on the
ring must return all power (|S11-ish| ~ 1 by the reference's
total-outgoing-RMS metric) and leave the island field identically zero.
"""

import numpy as np
import scipy.sparse as sp

from eggshell_tpu.fem.helmholtz import (
    FemConfig,
    port_outgoing_rms,
    solve_driven,
)
from eggshell_tpu.fem.mesher import mesh_shape
from eggshell_tpu.fem.shape import Rectangle


def _ring_island_mesh(h=0.4):
    A = Rectangle(0, 0, 10, 10) - Rectangle(3, 3, 7, 7)
    B = Rectangle(-5, -5, 15, 15)
    cd = B - A
    cd.Port((-5, -5), (-5, 15), 1)      # ref Select(-5, 0)
    cd.Port((3, 3), (3, 7), 2)          # ref Select(3, 4): island west side
    return cd, mesh_shape(cd, h)


def test_ring_island_topology():
    """The CSG difference yields exactly two connected mesh components,
    and the island's triangles cover the hole region."""
    _, m = _ring_island_mesh()
    tri = m.triangles
    rows = np.concatenate([tri[:, 0], tri[:, 1], tri[:, 2]])
    cols = np.concatenate([tri[:, 1], tri[:, 2], tri[:, 0]])
    g = sp.csr_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(m.num_points,) * 2
    )
    ncomp, labels = sp.csgraph.connected_components(g, directed=False)
    assert ncomp == 2
    cent = m.points[tri].mean(axis=1)
    island = (
        (cent[:, 0] > 3) & (cent[:, 0] < 7)
        & (cent[:, 1] > 3) & (cent[:, 1] < 7)
    )
    assert island.sum() > 50                       # island actually meshed
    # island and ring triangles belong to different components
    lab_tri = labels[tri[:, 0]]
    assert set(lab_tri[island]) != set(lab_tri[~island])


def test_no_wave_path_from_ring_to_island():
    """ref test 1 assert: port_power[1] within 1e-3 of 1 (all power
    reflects off the lossless ring; nothing reaches the island)."""
    cd, m = _ring_island_mesh()
    cfg = FemConfig(type="EXY", frequency=60e9, unit=1e-3, excited_port=1)
    sol = solve_driven(m, cfg)
    power = port_outgoing_rms(m, cfg, sol.field)
    assert abs(power[1] - 1.0) < 1e-3, power
    # mode-projected S21 and the island field are exactly zero
    assert abs(sol.s_params[2]) == 0.0
    cent = m.points[m.triangles].mean(axis=1)
    island = (
        (cent[:, 0] > 3) & (cent[:, 0] < 7)
        & (cent[:, 1] > 3) & (cent[:, 1] < 7)
    )
    f = np.asarray(sol.field)
    assert np.abs(f[m.triangles[island]]).max() == 0.0
    assert np.abs(f).max() > 0.5                   # ring is excited
