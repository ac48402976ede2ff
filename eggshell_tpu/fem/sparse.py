"""Sparse linear algebra for the FEM tier — the scalable-solve analog of
the reference's triplet assembly + SimplicialLLT/SparseLU factorization
(toolkit/femsolver.h:134-135, 255-310; rama/solver.cc HelmholtzFEMProblem
Factorizer = Eigen::SparseLU<SparseMatrix<complex>, COLAMD>).

Design: the sparsity STRUCTURE (rows/cols) is host-side static metadata;
the VALUES are a traced jnp array, so assembly stays a pure, jit-able,
differentiable function of the mesh geometry and materials.  The solve
is `lax.custom_linear_solve` around a host scipy SuperLU factorization
(`jax.pure_callback`) — XLA sees an opaque linear solve with exact
forward- and reverse-mode derivatives via the implicit function theorem
(solve / transpose-solve of the same factorized system), no
differentiation through the factorization itself.

For moderate systems, `coo_to_dense` + `jnp.linalg.solve` keeps the
whole pipeline on-device (the MXU path); `sparse_solve` takes over when
N makes the dense (N, N) factor infeasible.  `coo_matvec` supports
on-device iterative solves (jax.scipy BiCGStab/GMRES) where host
round-trips are unwanted.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def coo_matvec(rows, cols, vals, x, num_rows: int):
    """y = A x for COO (rows, cols, vals); duplicate entries accumulate
    (triplet semantics, like Eigen setFromTriplets)."""
    contrib = vals * x[cols]
    return jax.ops.segment_sum(contrib, rows, num_segments=num_rows)


def coo_to_dense(rows, cols, vals, num_rows: int):
    """Densify the triplets (duplicates accumulate)."""
    A = jnp.zeros((num_rows, num_rows), vals.dtype)
    return A.at[rows, cols].add(vals)


def _host_splu_solve(rows, cols, n):
    """Host factor+solve: scipy SuperLU (the very algorithm family the
    reference's Eigen::SparseLU implements).  rows/cols are captured as
    static numpy metadata; only (vals, b) cross the callback."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    rows = np.asarray(rows)
    cols = np.asarray(cols)

    def solve(vals, b):
        vals = np.asarray(vals)
        b = np.asarray(b)
        # factor in f64/c128 regardless of the traced dtype
        hdtype = np.complex128 if np.iscomplexobj(vals) else np.float64
        A = sp.csc_matrix(
            (vals.astype(hdtype), (rows, cols)), shape=(n, n)
        )
        lu = spla.splu(A)
        return lu.solve(b.astype(hdtype)).astype(b.dtype)

    return solve


def sparse_solve(rows, cols, vals, b, num_rows: int, symmetric: bool = True):
    """Solve A x = b with A given as COO triplets (duplicates accumulate).

    Differentiable in `vals` and `b` (forward and reverse) through
    `lax.custom_linear_solve`: tangents/cotangents re-use solves of the
    same system — the TPU-native analog of the reference propagating jets
    through its sparse solve (rama/solver.h:272-277).

    `symmetric=True` (our FEM matrices: K, M, and boundary-mass terms are
    all symmetric, even with the sigma_xy cross term) lets the transpose
    solve reuse the forward factorization path.
    """
    return sparse_solve_structured(
        vals, b, SparseStructure(rows, cols, num_rows), symmetric
    )


class SparseStructure:
    """Pre-hashed COO structure so repeated solves with the same sparsity
    don't re-tuple-ify the index arrays (jit cache key = object id via
    static hashing of the tuples is expensive for 100k+ nnz)."""

    def __init__(self, rows, cols, num_rows: int):
        self.rows = np.ascontiguousarray(np.asarray(rows, np.int32))
        self.cols = np.ascontiguousarray(np.asarray(cols, np.int32))
        self.num_rows = int(num_rows)
        self._key = hash(
            (self.rows.tobytes(), self.cols.tobytes(), self.num_rows)
        )

    def __hash__(self):
        return self._key

    def __eq__(self, other):
        return (
            isinstance(other, SparseStructure)
            and self.num_rows == other.num_rows
            and np.array_equal(self.rows, other.rows)
            and np.array_equal(self.cols, other.cols)
        )


@functools.partial(jax.jit, static_argnames=("structure", "symmetric"))
def sparse_solve_structured(vals, b, structure: SparseStructure,
                            symmetric: bool = True):
    """`sparse_solve` keyed on a SparseStructure (fast jit cache hits for
    repeated solves on the same mesh — the sweep/optimize loop)."""
    host_solve = _host_splu_solve(
        structure.rows, structure.cols, structure.num_rows
    )
    host_solve_t = _host_splu_solve(
        structure.cols, structure.rows, structure.num_rows
    )
    rows_j = jnp.asarray(structure.rows)
    cols_j = jnp.asarray(structure.cols)
    n = structure.num_rows

    def matvec(x):
        return coo_matvec(rows_j, cols_j, vals, x, n)

    out_spec = jax.ShapeDtypeStruct(b.shape, b.dtype)

    def solve(_mv, rhs):
        return jax.pure_callback(
            host_solve, out_spec, vals, rhs, vmap_method="sequential"
        )

    def solve_t(_mv, rhs):
        return jax.pure_callback(
            host_solve_t, out_spec, vals, rhs, vmap_method="sequential"
        )

    return jax.lax.custom_linear_solve(
        matvec, b, solve,
        transpose_solve=solve if symmetric else solve_t,
        symmetric=symmetric,
    )


def bicgstab_solve(rows, cols, vals, b, num_rows: int, tol=1e-8,
                   maxiter=2000):
    """Fully on-device iterative solve (Jacobi-preconditioned BiCGStab)
    for deployments where host callbacks are unavailable; complements the
    factorized path (first-order ABC/port losses keep the Helmholtz
    matrices non-Hermitian but reasonably conditioned at moderate k h)."""
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    diag = jax.ops.segment_sum(
        jnp.where(rows == cols, vals, 0.0), rows, num_segments=num_rows
    )
    diag = jnp.where(jnp.abs(diag) > 0, diag, 1.0)

    def matvec(x):
        return coo_matvec(rows, cols, vals, x, num_rows)

    x, _ = jax.scipy.sparse.linalg.bicgstab(
        matvec, b, M=lambda x: x / diag, tol=tol, maxiter=maxiter
    )
    return x
