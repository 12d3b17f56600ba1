"""Elliptic pressure solvers: Jacobi, red-black SOR, and CG.

The reference solves its pressure-Poisson systems two ways:
  - direct_fd: fixed-count Jacobi sweeps (direct_fd/simulate.py:68-88) —
    already data-parallel, implemented in ns_tpu/solvers/direct_fd.py.
  - chorin_fd: sequential Gauss-Seidel SOR with a per-cell python double
    loop and convergence gate tol=5e-6 / `nit` cap (chorin_fd/simulate.py:
    169-202). The lexicographic GS dependency does not map onto a
    data-parallel device, so the TPU-native form is **red-black SOR**: two
    half-sweeps per iteration, each fully vectorized on the VPU. It
    converges to the same fixed point of the same linear system (the
    boundary rows/cols are held fixed during the solve, as in the
    reference), so parity is defined at convergence, not per sweep
    (SURVEY.md §7 "hard parts").

All solvers are shape-static and jit/scan/shard_map-safe; the convergence
gate uses lax.while_loop with the iteration cap as in the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _checkerboard(nx: int, ny: int, dtype=jnp.bool_) -> Tuple[Array, Array]:
    ii = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 1)
    interior = (ii > 0) & (ii < nx - 1) & (jj > 0) & (jj < ny - 1)
    red = ((ii + jj) % 2 == 0) & interior
    black = ((ii + jj) % 2 == 1) & interior
    return red, black


def sor_redblack(
    p: Array,
    rhs_c: Array,
    dx: float,
    dy: float,
    beta: float,
    tol: float,
    max_iter: int,
) -> Array:
    """Red-black SOR for the chorin_fd pressure system.

    Solves the same discrete equations as the reference SOR sweep
    (chorin_fd/simulate.py:191-196):

        p[i,j] = beta * (dy^2 (p[i+1,j]+p[i-1,j]) + dx^2 (p[i,j+1]+p[i,j-1])
                 - rhs_c[i,j]) / (2 dx^2 + 2 dy^2) + (1-beta) p[i,j]

    with the boundary values of `p` held fixed, the convergence criterion
    max|p - p_prev_sweep| < tol, and the same iteration cap semantics
    (err=1, it=1; loop while err > tol and it < max_iter; ref :183,190).
    """
    nx, ny = p.shape
    red, black = _checkerboard(nx, ny)
    dx2, dy2 = dx * dx, dy * dy
    denom = 2.0 * (dx2 + dy2)
    beta = jnp.asarray(beta, p.dtype)

    def gs_update(p):
        up = jnp.roll(p, -1, axis=0)    # p[i+1, j]
        down = jnp.roll(p, 1, axis=0)   # p[i-1, j]
        right = jnp.roll(p, -1, axis=1)  # p[i, j+1]
        left = jnp.roll(p, 1, axis=1)   # p[i, j-1]
        return beta * (dy2 * (up + down) + dx2 * (right + left) - rhs_c) / denom \
            + (1.0 - beta) * p

    def sweep(p):
        p = jnp.where(red, gs_update(p), p)
        p = jnp.where(black, gs_update(p), p)
        return p

    def cond(carry):
        _, err, it = carry
        return (err > tol) & (it < max_iter)

    def body(carry):
        p, _, it = carry
        p_new = sweep(p)
        err = jnp.max(jnp.abs(p_new - p))
        return p_new, err, it + 1

    p, _, _ = jax.lax.while_loop(
        cond, body, (p, jnp.asarray(1.0, p.dtype), jnp.asarray(1, jnp.int32))
    )
    return p


def sor_wavefront(
    p: Array,
    rhs_c: Array,
    dx: float,
    dy: float,
    beta: float,
    tol: float,
    max_iter: int,
) -> Array:
    """Exact-parity sequential SOR via anti-diagonal wavefronts.

    The reference's lexicographic Gauss-Seidel sweep (chorin_fd/simulate.py:
    191-196) updates p[i,j] from already-updated p[i-1,j], p[i,j-1] and old
    p[i+1,j], p[i,j+1]. For the 5-point stencil, updating in order of
    increasing i+j is *exactly equivalent* to lexicographic order — cells on
    one anti-diagonal are independent — so the sequential sweep becomes
    2N-3 vectorized wavefront stages, reproducing the reference iterate
    sequence to float roundoff. Used for golden-parity runs; `sor_redblack`
    is the fast path.
    """
    nx, ny = p.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 1)
    interior = (ii > 0) & (ii < nx - 1) & (jj > 0) & (jj < ny - 1)
    diag = ii + jj
    dx2, dy2 = dx * dx, dy * dy
    denom = 2.0 * (dx2 + dy2)
    beta = jnp.asarray(beta, p.dtype)

    def gs_update(p):
        up = jnp.roll(p, -1, axis=0)
        down = jnp.roll(p, 1, axis=0)
        right = jnp.roll(p, -1, axis=1)
        left = jnp.roll(p, 1, axis=1)
        return beta * (dy2 * (up + down) + dx2 * (right + left) - rhs_c) / denom \
            + (1.0 - beta) * p

    def sweep(p):
        def stage(d, p):
            mask = interior & (diag == d)
            return jnp.where(mask, gs_update(p), p)
        return jax.lax.fori_loop(2, nx + ny - 3, stage, p)

    def cond(carry):
        _, err, it = carry
        return (err > tol) & (it < max_iter)

    def body(carry):
        p, _, it = carry
        p_new = sweep(p)
        err = jnp.max(jnp.abs(p_new - p))
        return p_new, err, it + 1

    p, _, _ = jax.lax.while_loop(
        cond, body, (p, jnp.asarray(1.0, p.dtype), jnp.asarray(1, jnp.int32))
    )
    return p


def jacobi(p: Array, rhs: Array, dx: float, dy: float, n_iter: int,
           bc_fn=None) -> Array:
    """Plain Jacobi sweeps for laplace(p) = rhs with optional per-sweep BC
    re-application (the direct_fd pattern, ref direct_fd/simulate.py:68-88)."""
    dx2, dy2 = dx * dx, dy * dy
    denom = 2.0 * (dx2 + dy2)

    def sweep(_, p):
        pn = p
        interior = (
            ((pn[1:-1, 2:] + pn[1:-1, :-2]) * dy2
             + (pn[2:, 1:-1] + pn[:-2, 1:-1]) * dx2) / denom
            - dx2 * dy2 / denom * rhs[1:-1, 1:-1]
        )
        p = pn.at[1:-1, 1:-1].set(interior)
        if bc_fn is not None:
            p = bc_fn(p)
        return p

    return jax.lax.fori_loop(0, n_iter, sweep, p)


def cg_poisson(p0: Array, rhs: Array, dx: float, dy: float,
               tol: float = 1e-8, max_iter: int = 500) -> Array:
    """Conjugate-gradient alternative for the interior Dirichlet-frame
    Poisson problem (boundary of p0 held fixed). Offered as the fast-path
    solver when SOR-parity with the reference is not required."""
    nx, ny = p0.shape
    dx2, dy2 = dx * dx, dy * dy

    boundary = jnp.zeros_like(p0, dtype=bool).at[0, :].set(True) \
        .at[-1, :].set(True).at[:, 0].set(True).at[:, -1].set(True)

    def laplace(x):
        lap = ((jnp.roll(x, -1, 0) - 2 * x + jnp.roll(x, 1, 0)) / dx2
               + (jnp.roll(x, -1, 1) - 2 * x + jnp.roll(x, 1, 1)) / dy2)
        return jnp.where(boundary, 0.0, lap)

    # Solve for the interior correction e with homogeneous boundary:
    #   laplace(p0 + e) = rhs  ->  A e = r0
    r0 = jnp.where(boundary, 0.0, rhs - laplace_full(p0, dx2, dy2))

    def body(carry):
        e, r, d, rs, it = carry
        Ad = laplace(d)
        alpha = rs / jnp.vdot(d, Ad)
        e = e + alpha * d
        r = r - alpha * Ad
        rs_new = jnp.vdot(r, r)
        d = r + (rs_new / rs) * d
        return e, r, d, rs_new, it + 1

    def cond(carry):
        _, _, _, rs, it = carry
        return (jnp.sqrt(jnp.abs(rs)) > tol) & (it < max_iter)

    e0 = jnp.zeros_like(p0)
    e, *_ = jax.lax.while_loop(
        cond, body, (e0, r0, r0, jnp.vdot(r0, r0), jnp.asarray(0, jnp.int32)))
    return p0 + e


def laplace_full(x: Array, dx2: float, dy2: float) -> Array:
    """5-point Laplacian including boundary wrap cells (callers mask)."""
    return ((jnp.roll(x, -1, 0) - 2 * x + jnp.roll(x, 1, 0)) / dx2
            + (jnp.roll(x, -1, 1) - 2 * x + jnp.roll(x, 1, 1)) / dy2)
