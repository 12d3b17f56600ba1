"""Geometric multigrid Poisson solver (V-cycles, red-black smoothing).

Paper-inspired addition (PAPERS.md: accelerated pressure projection): the
FD pressure solves are the reference's bottleneck; SOR needs O(N) sweeps
per digit at N^2 resolution while multigrid converges in O(1) V-cycles.
Solves

    laplace(p) = f   on the interior, boundary values of p held fixed

(the Dirichlet-frame problem of the chorin_fd correction) on vertex-centered
grids of size 2^k + 1 per axis. Everything is shape-static jnp: smoothing is
red-black Gauss-Seidel, restriction is full-weighting, prolongation is
bilinear — each level's operators build at trace time, so a whole V-cycle
jits into one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ns_tpu.ops.poisson import _checkerboard

Array = jnp.ndarray


def _is_pow2_plus1(n: int) -> bool:
    return n >= 3 and ((n - 1) & (n - 2)) == 0


def _smooth(p: Array, f: Array, hx2: float, hy2: float, n_sweeps: int) -> Array:
    """Red-black Gauss-Seidel sweeps for laplace(p) = f."""
    nx, ny = p.shape
    red, black = _checkerboard(nx, ny)
    denom = 2.0 / hx2 + 2.0 / hy2

    def gs(p):
        nbr = ((jnp.roll(p, -1, 0) + jnp.roll(p, 1, 0)) / hx2
               + (jnp.roll(p, -1, 1) + jnp.roll(p, 1, 1)) / hy2)
        return (nbr - f) / denom

    def sweep(_, p):
        p = jnp.where(red, gs(p), p)
        p = jnp.where(black, gs(p), p)
        return p

    return jax.lax.fori_loop(0, n_sweeps, sweep, p)


def _residual(p: Array, f: Array, hx2: float, hy2: float) -> Array:
    from ns_tpu.ops.poisson import laplace_full
    nx, ny = p.shape
    r = f - laplace_full(p, hx2, hy2)
    red, black = _checkerboard(nx, ny)
    return jnp.where(red | black, r, 0.0)  # zero on the boundary ring


def _restrict(r: Array) -> Array:
    """Full-weighting restriction to the (n+1)//2 vertex grid."""
    # 3x3 stencil [1 2 1; 2 4 2; 1 2 1]/16 applied at even fine vertices
    w = (4.0 * r
         + 2.0 * (jnp.roll(r, 1, 0) + jnp.roll(r, -1, 0)
                  + jnp.roll(r, 1, 1) + jnp.roll(r, -1, 1))
         + (jnp.roll(jnp.roll(r, 1, 0), 1, 1)
            + jnp.roll(jnp.roll(r, 1, 0), -1, 1)
            + jnp.roll(jnp.roll(r, -1, 0), 1, 1)
            + jnp.roll(jnp.roll(r, -1, 0), -1, 1))) / 16.0
    return w[::2, ::2]


def _prolong(e: Array, nx: int, ny: int) -> Array:
    """Bilinear prolongation from the coarse vertex grid to (nx, ny)."""
    out = jnp.zeros((nx, ny), e.dtype)
    out = out.at[::2, ::2].set(e)
    # odd rows, even cols
    out = out.at[1::2, ::2].set(0.5 * (e[:-1, :] + e[1:, :]))
    # even rows, odd cols
    out = out.at[::2, 1::2].set(0.5 * (e[:, :-1] + e[:, 1:]))
    # odd rows, odd cols
    out = out.at[1::2, 1::2].set(
        0.25 * (e[:-1, :-1] + e[1:, :-1] + e[:-1, 1:] + e[1:, 1:]))
    return out


def _vcycle(p: Array, f: Array, hx: float, hy: float,
            pre: int, post: int, min_n: int) -> Array:
    nx, ny = p.shape
    hx2, hy2 = hx * hx, hy * hy
    if min(nx, ny) <= min_n:
        return _smooth(p, f, hx2, hy2, 50)  # coarsest: smooth to death
    p = _smooth(p, f, hx2, hy2, pre)
    r = _residual(p, f, hx2, hy2)
    r_c = _restrict(r)
    e_c = jnp.zeros_like(r_c)
    e_c = _vcycle(e_c, r_c, 2 * hx, 2 * hy, pre, post, min_n)
    # correction is zero on the boundary (error of a fixed-boundary problem)
    e = _prolong(e_c, nx, ny)
    red, black = _checkerboard(nx, ny)
    p = p + jnp.where(red | black, e, 0.0)
    return _smooth(p, f, hx2, hy2, post)


def poisson_multigrid(p0: Array, f: Array, dx: float, dy: float,
                      n_cycles: int = 8, pre: int = 2, post: int = 2,
                      min_n: int = 3) -> Array:
    """Solve laplace(p) = f with the boundary of p0 held fixed.

    Requires nx, ny = 2^k + 1 (vertex-centered coarsening). n_cycles
    V(pre, post) cycles; each cycle reduces the error by ~0.1x, so 8 cycles
    reach ~f32 floor.
    """
    nx, ny = p0.shape
    if not (_is_pow2_plus1(nx) and _is_pow2_plus1(ny)):
        raise ValueError(
            f"multigrid needs 2^k+1 grid sizes, got {nx}x{ny}")

    def cycle(_, p):
        return _vcycle(p, f, dx, dy, pre, post, min_n)

    return jax.lax.fori_loop(0, n_cycles, cycle, p0)
