"""Cross-language certification of the box-LCP solvers against the
COMPILED reference's own solutions.

tests/data/golden_lcp.csv is produced by tools/golden/ (build_golden.sh)
running the reference's bounded `Lcp::MurtyPrincipalPivot`
(/root/reference/eggshell/lcp.cc:157-230) and the toolkit's production
`lcp::SolveLCP` (/root/reference/toolkit/lcp.cc, MURTY +
COTTLE_DANTZIG incl. the unbounded-row Schur path) on random SPD
systems from the reference's own generator (eggshell/utils.cc:203-215).

This closes the witness gap the trajectory goldens leave open: the
reference APP routes contacts through the bounds-free Murty overload
(lcp.cc:298), so golden_chain/golden_cairn never exercise the +-1
box-friction bounds that are the build's DEFAULT semantics (round-3
VERDICT missing #4).  Here the build's direct pivot solver
(ops/lcp_direct) and the projected-iteration path (ops/lcp) must
reproduce the compiled reference's x on every bound pattern.

SPD A => the box-LCP solution is unique, so x-agreement is the whole
story; KKT checks guard against a degenerate dumped instance.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from eggshell_tpu.ops import lcp, lcp_direct

DATA = os.path.join(os.path.dirname(__file__), "data", "golden_lcp.csv")


def _load_instances():
    instances = []
    cur = None
    with open(DATA) as f:
        for line in f:
            parts = line.strip().split(",")
            tag = parts[0]
            if tag == "instance":
                if cur is not None:
                    instances.append(cur)
                cur = {
                    "id": int(parts[1]),
                    "n": int(parts[2]),
                    "kind": parts[3],
                    "A": [],
                }
            elif tag == "A":
                cur["A"].append([float(v) for v in parts[1:]])
            else:
                cur[tag] = np.asarray([float(v) for v in parts[1:]])
    if cur is not None:
        instances.append(cur)
    for inst in instances:
        inst["A"] = np.asarray(inst["A"])
    return instances

_INSTANCES = _load_instances() if os.path.exists(DATA) else []


def _kkt_ok(A, b, lo, hi, x, tol):
    """Box-LCP KKT: x in [lo, hi]; w = A x - b with w >= 0 at lo,
    w <= 0 at hi, w = 0 in the interior."""
    w = A @ x - b
    assert np.all(x >= lo - tol) and np.all(x <= hi + tol)
    at_lo = x <= lo + tol
    at_hi = x >= hi - tol
    interior = ~(at_lo | at_hi)
    assert np.all(w[at_lo] >= -tol)
    assert np.all(w[at_hi] <= tol)
    assert np.all(np.abs(w[interior]) <= tol)


def test_golden_file_present_and_covers_all_kinds():
    assert _INSTANCES, (
        "tests/data/golden_lcp.csv missing — regenerate with "
        "tools/golden/build_golden.sh"
    )
    kinds = {i["kind"] for i in _INSTANCES}
    assert {"toolkit_box", "murty_contact", "murty_nonneg",
            "toolkit_murty", "toolkit_cottle"} <= kinds, kinds
    assert len(_INSTANCES) >= 30
    # reference solutions are themselves KKT-consistent (sanity on the
    # dump itself)
    for inst in _INSTANCES:
        _kkt_ok(inst["A"], inst["b"], inst["lo"], inst["hi"], inst["x"],
                tol=1e-7 * max(1.0, np.abs(inst["b"]).max()))


@pytest.mark.parametrize(
    "kind",
    ["toolkit_box", "murty_contact", "murty_nonneg", "toolkit_murty",
     "toolkit_cottle"],
)
def test_direct_pivot_matches_compiled_reference(kind):
    """ops/lcp_direct.murty_principal_pivot reproduces the compiled
    reference's solution on every dumped instance of this bound
    pattern (unique solution: SPD A)."""
    insts = [i for i in _INSTANCES if i["kind"] == kind]
    assert insts, f"no {kind} instances in golden_lcp.csv"
    for inst in insts:
        A = jnp.asarray(inst["A"])
        b = jnp.asarray(inst["b"])
        lo = jnp.asarray(inst["lo"])
        hi = jnp.asarray(inst["hi"])
        x, w, info = lcp_direct.murty_principal_pivot(
            A, b, lo, hi, max_iterations=1024, return_info=True
        )
        scale = max(1.0, float(np.abs(inst["x"]).max()))
        np.testing.assert_allclose(
            np.asarray(x), inst["x"], atol=1e-7 * scale,
            err_msg=f"instance {inst['id']} ({kind}, n={inst['n']})",
        )


@pytest.mark.parametrize("kind", ["toolkit_box", "murty_contact"])
def test_projected_iterations_match_compiled_reference(kind):
    """The PGS path (the solver family behind the TPU kernels) converges
    to the compiled reference's solution on the box-friction bound
    patterns (ref sparse_iterations.cc solves the same systems against
    its own Murty in its tests, :515-748)."""
    insts = [i for i in _INSTANCES if i["kind"] == kind]
    assert insts
    for inst in insts:
        A = jnp.asarray(inst["A"])
        b = jnp.asarray(inst["b"])
        lo = jnp.asarray(inst["lo"])
        hi = jnp.asarray(inst["hi"])
        is_eq = jnp.zeros(inst["n"], bool)
        iters = 600 if inst["n"] <= 24 else 1500
        x = lcp.solve_lcp(A, b, is_eq, lo, hi, iters=iters, method="pgs")
        resid = float(lcp.residual_error(A, b, x, is_eq, lo, hi))
        scale = max(1.0, float(np.abs(inst["x"]).max()))
        # residual is in b-units: scale by the matrix norm (a 1e-8 x
        # error on a ||A|| ~ 1e2 system reads as a ~1e-6 residual)
        a_scale = max(1.0, float(np.abs(inst["A"]).sum(axis=1).max()))
        assert resid < 1e-7 * scale * a_scale, (
            f"instance {inst['id']}: PGS residual {resid}"
        )
        np.testing.assert_allclose(
            np.asarray(x), inst["x"], atol=1e-5 * scale,
            err_msg=f"instance {inst['id']} ({kind}, n={inst['n']})",
        )
