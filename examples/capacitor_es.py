"""Parallel-plate capacitor electrostatics — the rama
capacitor_electrostatics.lua example, Python.

Two conductor segments held at +/-0.5 V inside a grounded box; solves
the Laplace problem (config.type ES, ref rama/solver.h ELECTROSTATICS)
and checks the mid-gap field against the ideal-capacitor value E = V/d.

Usage: python examples/capacitor_es.py [out_dir]
"""

import sys

import numpy as np

from eggshell_tpu.fem import Rectangle, mesh_shape
from eggshell_tpu.fem.fields import get_field_gradient
from eggshell_tpu.fem.helmholtz import FemConfig, solve_driven
from eggshell_tpu.viz import draw_field


def main(out_dir="."):
    # grounded 2x2 box; plates at y = 0.8 and y = 1.2 spanning x in [0.5, 1.5]
    box = Rectangle(0, 0, 2, 2)
    box.Potential((0.5, 0.8), (1.5, 0.8), -0.5)
    box.Potential((0.5, 1.2), (1.5, 1.2), +0.5)
    # slit the domain so the plates are actual boundaries
    box = box - Rectangle(0.5, 0.795, 1.5, 0.805)
    box = box - Rectangle(0.5, 1.195, 1.5, 1.205)
    mesh = mesh_shape(box, 0.06)

    sol = solve_driven(mesh, FemConfig(type="ES"))
    phi = np.real(np.asarray(sol.field))

    # mid-gap field: plates d = 0.39 apart (inner faces), V = 1
    E = -get_field_gradient(mesh, phi, [[1.0, 1.0]])[0]
    print(f"mid-gap E = {E}, ideal |Ey| = {1.0 / 0.39:.3f}")
    draw_field(mesh, phi, f"{out_dir}/capacitor_potential.png")
    print(f"wrote {out_dir}/capacitor_potential.png")


if __name__ == "__main__":
    main(*sys.argv[1:])
