"""Pallas TPU kernel forming the contact system matrix A = J M^-1 J^T.

Fifth kernel of the hot path.  The XLA formation (one-hot expansion of
compact J blocks to body columns + two batched matmuls + masked diag
fix + relayout into the LCP kernel's tiling) costs ~1.3 ms/step at 4096
scenarios — more than the LCP solve itself.  This kernel computes A
directly from the COMPACT per-contact blocks:

  A[3i+r, 3j+c] = sum over slot pairs (si, sj) with matching bodies of
                  (Jc_i[r, si] M^-1_b) . Jc_j[c, sj]

in the jassembly packed layout ((8, 128) = 1024 scenarios per tile),
emitting A in 4-row slabs padded to mp = 64 rows/cols so the packed LCP
kernel (ops/pgs_kernel.solve_lcp_jacobi_packed) can consume it with NO
XLA relayout in between.  Diagonal policy matches the XLA path where it
matters: active rows get +cfm, inactive/padding rows decouple with a
unit diagonal (any positive value works — their rhs is 0).

M^-1 enters via its block structure [m^-1 I3; (R I_b R^T)^-1]: the
linear half multiplies by the scalar inverse mass, the angular half by
the 3x3 inverse world inertia (inputs `invm` (n,), `inv_ig` (n, 3, 3)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE = SUB * LANE
ROWS_PER_SLAB = 4


def _amat_kernel(
    jc_ref, b0_ref, b1_ref, act_ref, invm_ref, invig_ref,
    a_ref, diag_ref,
    *, K, n, mp, cfm,
):
    # refs: jc (K*36, 8, 128); b0/b1/act (K, 8, 128); invm (n, 8, 128);
    # invig (9n, 8, 128).  Output block: (ROWS_PER_SLAB * mp, 8, 128) —
    # rows 4p..4p+3 of A, each row mp columns, row-major.
    p = pl.program_id(1)
    zero = 0.0 * act_ref[0]

    def jrow(row, s, c):
        # Jc[row, 6s + c] lane array
        return jc_ref[row * 12 + 6 * s + c]

    for rr in range(ROWS_PER_SLAB):
        # global row = p*4 + rr (p is a traced scalar); contact k =
        # row // 3.  Rows >= 3K are lane padding: clamp the read indices
        # into range and mask the values with `pad_row`.
        row = p * ROWS_PER_SLAB + rr
        pad_row = row >= 3 * K
        row_c = jnp.minimum(row, 3 * K - 1)
        k = row_c // 3

        # This row's Jc slot entries: Jc row index = row * 12 + ... .
        def jr(s, c):
            return jc_ref[pl.ds(row_c * 12 + 6 * s + c, 1)][0]

        b0k = _dyn1(b0_ref, k)
        b1k = _dyn1(b1_ref, k)
        actk = _dyn1(act_ref, k)

        # X_s = row Jc (1x6) times M^-1 of the slot body: lin scaled by
        # invm_b, ang by inv_ig_b (3x3).
        X = []  # X[s][c], c in 0..5
        for s, bsel in ((0, b0k), (1, b1k)):
            im = zero
            ig = [zero] * 9
            for bb in range(n):
                m = jnp.where(bsel == float(bb), 1.0, 0.0)
                im = im + m * invm_ref[bb]
                for e in range(9):
                    ig[e] = ig[e] + m * invig_ref[9 * bb + e]
            lin = [jr(s, c) * im for c in range(3)]
            ang = []
            for c in range(3):
                acc = zero
                for d in range(3):
                    acc = acc + jr(s, 3 + d) * ig[3 * d + c]
                ang.append(acc)
            X.append(lin + ang)

        # Columns: all contacts j, 3 cols each, then padding cols = 0.
        # dacc accumulates this row's diagonal entry (col == row picks
        # exactly one column) — emitted as a separate (mp,) output so
        # the LCP kernel never gathers diag(A) from the 67 MB A array
        # (the XLA-side jnp.take read ALL of A: ~92 us/step).
        dacc = zero
        for j in range(K):
            b0j = b0_ref[j]
            b1j = b1_ref[j]
            d = [
                jnp.where(b0k == b0j, 1.0, 0.0),
                jnp.where(b0k == b1j, 1.0, 0.0),
                jnp.where(b1k == b0j, 1.0, 0.0),
                jnp.where(b1k == b1j, 1.0, 0.0),
            ]
            for c in range(3):
                val = zero
                for t, (si, sj) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                    dot = zero
                    for e in range(6):
                        dot = dot + X[si][e] * jrow(3 * j + c, sj, e)
                    val = val + d[t] * dot
                col = 3 * j + c
                is_diag = col == row
                # active rows: +cfm on the diagonal; inactive/pad rows
                # decouple with a unit diagonal (entries are zero since
                # the Jc rows are zeroed; rhs is zero there too)
                diag_fix = jnp.where(
                    is_diag,
                    jnp.where((actk > 0.5) & ~pad_row, cfm, 1.0),
                    0.0,
                )
                val = jnp.where(pad_row, 0.0, val)
                full = val + diag_fix
                a_ref[:, rr * mp + col, :] = full
                dacc = dacc + jnp.where(is_diag, full, 0.0)
        for col in range(3 * K, mp):
            v = jnp.where(col == row, 1.0, 0.0) + zero
            a_ref[:, rr * mp + col, :] = v
            dacc = dacc + jnp.where(col == row, v, 0.0)
        # diag block is the FULL (8, mp, 128) plane (a 4-row slab block
        # would violate Mosaic's 8-divisible sublane rule), revisited
        # across slabs; row = p*4 + rr is dynamic.
        diag_ref[:, pl.ds(row, 1), :] = dacc[:, None, :]


def _dyn1(ref, idx):
    return ref[pl.ds(idx, 1)][0]


@functools.partial(jax.jit, static_argnames=("K", "n", "cfm", "interpret"))
def contact_system_matrix_packed(
    jc_packed, b0_packed, b1_packed, act_packed, invm_packed, invig_packed,
    K: int, n: int, cfm: float, interpret: bool = False,
):
    """A in packed slab layout from packed compact J blocks.

    All inputs are (nt, rows, 8, 128) tiles (jassembly layout).  Returns
    (A_packed, diag_packed): A_packed (nt, 8, mp*mp, 128) with mp = 3K
    rounded up to 8: entry A[row, col] of scenario (t, sub, lane) at
    [t, sub, row*mp + col, lane] — sublane-major so the packed LCP
    kernel can block one sublane stripe per program (Mosaic requires
    the last two block dims to be (8k, 128)-aligned or full);
    diag_packed (nt, 8, mp, 128) = diag(A), emitted here so downstream
    never re-reads A to extract it."""
    nt = jc_packed.shape[0]
    dtype = jc_packed.dtype
    m = 3 * K
    mp = ((m + 7) // 8) * 8
    nslabs = mp // ROWS_PER_SLAB

    kernel = functools.partial(_amat_kernel, K=K, n=n, mp=mp, cfm=cfm)

    def inspec(c):
        return pl.BlockSpec(
            (None, c, SUB, LANE), lambda t, p: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    a, diag = pl.pallas_call(
        kernel,
        grid=(nt, nslabs),
        in_specs=[inspec(K * 36), inspec(K), inspec(K), inspec(K),
                  inspec(n), inspec(9 * n)],
        out_specs=(
            pl.BlockSpec(
                (None, SUB, ROWS_PER_SLAB * mp, LANE),
                lambda t, p: (t, 0, p, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, SUB, mp, LANE),
                lambda t, p: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt, SUB, mp * mp, LANE), dtype),
            jax.ShapeDtypeStruct((nt, SUB, mp, LANE), dtype),
        ),
        interpret=interpret,
    )(jc_packed, b0_packed, b1_packed, act_packed, invm_packed, invig_packed)
    return a, diag
