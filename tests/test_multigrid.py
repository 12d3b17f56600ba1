"""Multigrid Poisson solver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.ops.multigrid import poisson_multigrid


def manufactured(nx, ny):
    """p = sin(pi x) sin(pi y) on [0,1]^2, f = -2 pi^2 p, p=0 boundary."""
    x = np.linspace(0, 1, nx)
    y = np.linspace(0, 1, ny)
    X, Y = np.meshgrid(x, y, indexing="ij")
    p_exact = np.sin(np.pi * X) * np.sin(np.pi * Y)
    f = -2 * np.pi**2 * p_exact
    return p_exact, f, x[1] - x[0], y[1] - y[0]


@pytest.mark.slow
@pytest.mark.parametrize("n", [65, 129])
def test_multigrid_manufactured_solution(n):
    p_exact, f, dx, dy = manufactured(n, n)
    p = poisson_multigrid(jnp.zeros((n, n), jnp.float64), jnp.asarray(f),
                          dx, dy, n_cycles=10)
    # discretization error O(h^2): ~2.4e-4 at 65, ~6e-5 at 129
    err = np.abs(np.asarray(p) - p_exact).max()
    assert err < 4.0 / (n - 1) ** 2, err


def test_multigrid_vs_direct_residual():
    n = 65
    rng = np.random.default_rng(0)
    f = rng.normal(size=(n, n))
    f[0, :] = f[-1, :] = f[:, 0] = f[:, -1] = 0.0
    dx = dy = 1.0 / (n - 1)
    p = np.asarray(poisson_multigrid(jnp.zeros((n, n), jnp.float64),
                                     jnp.asarray(f), dx, dy, n_cycles=12))
    lap = ((p[2:, 1:-1] - 2 * p[1:-1, 1:-1] + p[:-2, 1:-1]) / dx**2
           + (p[1:-1, 2:] - 2 * p[1:-1, 1:-1] + p[1:-1, :-2]) / dy**2)
    resid = np.abs(lap - f[1:-1, 1:-1]).max()
    assert resid < 1e-6 * np.abs(f).max(), resid


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(51, 51), (50, 50), (51, 40)])
def test_multigrid_masked_arbitrary_sizes(shape):
    """Non-2^k+1 grids run on the padded grid with a masked interior and
    reach the same discrete solution (incl. the reference's own 51^2)."""
    nx, ny = shape
    p_exact, f, dx, dy = manufactured(nx, ny)
    p = poisson_multigrid(jnp.zeros((nx, ny), jnp.float64), jnp.asarray(f),
                          dx, dy, n_cycles=14)
    pn = np.asarray(p)
    # boundary untouched
    assert np.abs(pn[0, :]).max() == 0.0 and np.abs(pn[:, -1]).max() == 0.0
    # interior residual at the f scale
    lap = ((pn[2:, 1:-1] - 2 * pn[1:-1, 1:-1] + pn[:-2, 1:-1]) / dx**2
           + (pn[1:-1, 2:] - 2 * pn[1:-1, 1:-1] + pn[1:-1, :-2]) / dy**2)
    resid = np.abs(lap - f[1:-1, 1:-1]).max()
    assert resid < 1e-6 * np.abs(f).max(), resid
    err = np.abs(pn - p_exact).max()
    assert err < 6.0 / (min(nx, ny) - 1) ** 2, err


@pytest.mark.slow
def test_multigrid_masked_convergence_rate():
    """Each masked V-cycle contracts the error (the padding does not stall
    convergence)."""
    n = 51
    rng = np.random.default_rng(1)
    f = rng.normal(size=(n, n))
    f[0, :] = f[-1, :] = f[:, 0] = f[:, -1] = 0.0
    dx = dy = 1.0 / (n - 1)
    resids = []
    for cycles in (2, 4, 6):
        p = np.asarray(poisson_multigrid(jnp.zeros((n, n), jnp.float64),
                                         jnp.asarray(f), dx, dy,
                                         n_cycles=cycles))
        lap = ((p[2:, 1:-1] - 2 * p[1:-1, 1:-1] + p[:-2, 1:-1]) / dx**2
               + (p[1:-1, 2:] - 2 * p[1:-1, 1:-1] + p[1:-1, :-2]) / dy**2)
        resids.append(np.abs(lap - f[1:-1, 1:-1]).max())
    # >= ~3x contraction per 2 cycles
    assert resids[1] < resids[0] / 3
    assert resids[2] < resids[1] / 3


def test_restrict_matches_strided_slicing():
    """`_restrict`'s reshape-based even-vertex selection is bitwise equal
    to the literal strided form w[::2, ::2] (the reshape trick exists only
    because strided slices lower to pathological TPU gathers)."""
    from ns_tpu.ops.multigrid import _restrict

    rng = np.random.default_rng(7)
    for n in (5, 9, 51, 65):
        r = jnp.asarray(rng.normal(size=(n, n)))
        w = (4 * r
             + 2 * (jnp.roll(r, 1, 0) + jnp.roll(r, -1, 0)
                    + jnp.roll(r, 1, 1) + jnp.roll(r, -1, 1))
             + (jnp.roll(jnp.roll(r, 1, 0), 1, 1)
                + jnp.roll(jnp.roll(r, 1, 0), -1, 1)
                + jnp.roll(jnp.roll(r, -1, 0), 1, 1)
                + jnp.roll(jnp.roll(r, -1, 0), -1, 1))) / 16.0
        np.testing.assert_array_equal(np.asarray(_restrict(r)),
                                      np.asarray(w)[::2, ::2])


@pytest.mark.slow
def test_prolong_matches_scatter_form():
    """`_prolong`'s interleave form equals the literal .at[::2].set /
    .at[1::2].set scatter construction: bitwise on the even lattice and
    odd rows/cols; 1-ULP on odd-odd points, where the interleave form
    averages the two row-averages (0.5*(0.5*(a+b)+0.5*(c+d))) instead of
    summing all four corners at once."""
    from ns_tpu.ops.multigrid import _prolong

    rng = np.random.default_rng(8)
    for n in (5, 9, 51, 65):
        nc = (n + 1) // 2
        e = jnp.asarray(rng.normal(size=(nc, nc)))
        out = jnp.zeros((n, n), e.dtype)
        out = out.at[::2, ::2].set(e)
        out = out.at[1::2, ::2].set(0.5 * (e[:-1, :] + e[1:, :]))
        out = out.at[::2, 1::2].set(0.5 * (e[:, :-1] + e[:, 1:]))
        out = out.at[1::2, 1::2].set(
            0.25 * (e[:-1, :-1] + e[1:, :-1] + e[:-1, 1:] + e[1:, 1:]))
        got, want = np.asarray(_prolong(e, n, n)), np.asarray(out)
        # even lattice + odd rows/cols: exact; odd-odd: 1 ULP
        np.testing.assert_array_equal(got[::2, :], want[::2, :])
        np.testing.assert_array_equal(got[:, ::2], want[:, ::2])
        assert np.max(np.abs(got - want)) <= 4 * np.finfo(np.float64).eps
