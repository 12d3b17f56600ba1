"""Generate golden oracle rollouts by running the *reference* solvers.

Runs the read-only reference repo (/root/reference) at its default physics
configs but shortened horizons, and saves the rollouts as npz under
tests/golden/. These files are committed as data; ns_tpu's golden tests gate
the JAX solvers on field-error tolerances against them (SURVEY.md §4).

Also times the reference runs to fill the measured-oracle rows of BASELINE.md.

Usage:  python tools/make_goldens.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "..", "tests", "golden")
os.makedirs(GOLDEN, exist_ok=True)

timings = {}


def cavity_bcs(boundary_mod, dx, dy):
    D = boundary_mod.DirichletBoundaryCondition
    N = boundary_mod.NeumannBoundaryCondition
    u_bc = [D(0, "left", dx, dy), D(1, "right", dx, dy),
            D(0, "top", dx, dy), D(0, "bottom", dx, dy)]
    v_bc = [D(0, "left", dx, dy), D(0, "right", dx, dy),
            D(0, "top", dx, dy), D(0, "bottom", dx, dy)]
    p_bc = [D(0, "top", dx, dy), N(0, "bottom", dx, dy),
            N(0, "left", dx, dy), N(0, "right", dx, dy)]
    return u_bc, v_bc, p_bc


def run_direct_fd(nt):
    from src import boundary
    from src.direct_fd.simulate import NavierStokesSystem

    nx = ny = 50
    dx = dy = 2.0 / (nx - 1.0)
    u_bc, v_bc, p_bc = cavity_bcs(boundary, dx, dy)
    sys_ = NavierStokesSystem(
        np.zeros((nx, ny)), np.zeros((nx, ny)), np.zeros((nx, ny)),
        u_bc, v_bc, p_bc, nt=nt, nit=50, nx=nx, ny=ny, dt=0.001, rho=1, nu=0.1)
    t0 = time.perf_counter()
    u, v, p = sys_.simulate()
    el = time.perf_counter() - t0
    timings["direct_fd"] = dict(nt=nt, nx=nx, seconds=el, steps_per_sec=nt / el,
                                cell_updates_per_sec=nt * nx * ny / el)
    np.savez(os.path.join(GOLDEN, f"direct_fd_nt{nt}.npz"), u=u, v=v, p=p)


class _RaggedNPShim:
    """numpy proxy whose `array` tolerates ragged lists (numpy<1.24 behavior
    the reference relies on at chorin_fd/simulate.py:106-121)."""

    def __getattr__(self, name):
        return getattr(np, name)

    @staticmethod
    def array(obj, *args, **kwargs):
        try:
            return np.array(obj, *args, **kwargs)
        except ValueError:
            return np.array(obj, *args, dtype=object, **kwargs)


def run_chorin_fd(nt, method):
    from src import boundary
    import src.chorin_fd.simulate as ref_mod
    ref_mod.np = _RaggedNPShim()
    NavierStokesSystem = ref_mod.NavierStokesSystem

    nx = ny = 51
    dx = dy = 2.0 / (nx - 1.0)
    u_bc, v_bc, p_bc = cavity_bcs(boundary, dx, dy)
    sys_ = NavierStokesSystem(
        np.zeros((nx, ny)), np.zeros((nx, ny)), np.zeros((nx, ny)),
        u_bc, v_bc, p_bc, nt=nt, nit=200, nx=nx, ny=ny, dt=0.001,
        rho=1, nu=0.1, beta=1.25, method=method)
    t0 = time.perf_counter()
    u, v, p = sys_.simulate()
    el = time.perf_counter() - t0
    timings[f"chorin_fd_{method}"] = dict(
        nt=nt, nx=nx, seconds=el, steps_per_sec=nt / el,
        cell_updates_per_sec=nt * nx * ny / el)
    np.savez(os.path.join(GOLDEN, f"chorin_fd_{method}_nt{nt}.npz"), u=u, v=v, p=p)


def run_chorin_spectral(nt):
    # chorin_fd's module-level filterwarnings('error') (simulate.py:1-3) is
    # global; relax it so chorin_spectral's docstring SyntaxWarnings don't
    # abort the import (the module re-arms 'error' itself at exec time).
    import warnings
    warnings.resetwarnings()
    warnings.simplefilter("ignore")
    from src import boundary
    from src.chorin_spectral.simulate import NavierStokesSystem

    nx = ny = 51
    dx = dy = 2.0 / (nx - 1.0)
    u_bc, v_bc, _ = cavity_bcs(boundary, dx, dy)
    sys_ = NavierStokesSystem(
        np.zeros((nx, ny)), np.zeros((nx, ny)), np.zeros((nx, ny)),
        u_bc, v_bc, nt=nt, nit=200, nx=nx, ny=ny, dt=0.001,
        rho=1, nu=0.1, beta=1.25)
    t0 = time.perf_counter()
    u, v, p = sys_.simulate()
    el = time.perf_counter() - t0
    timings["chorin_spectral"] = dict(
        nt=nt, nx=nx, seconds=el, steps_per_sec=nt / el,
        cell_updates_per_sec=nt * nx * ny / el)
    np.savez(os.path.join(GOLDEN, f"chorin_spectral_nt{nt}.npz"), u=u, v=v, p=p)
    # save the setup operators too: cheb identity tests compare against these
    np.savez(os.path.join(GOLDEN, "chorin_spectral_ops.npz"),
             Tx=sys_.Tx, Tx_inv=sys_.Tx_inv, Dx=sys_.Dx, Dx_sqr=sys_.Dx_sqr,
             DPx=sys_.DPx, DxDPx=sys_.DxDPx)


class _DeflatingDenom(np.ndarray):
    """ndarray tag: any `X / denom` with this as the denominator zeroes the
    quotient where |denom| <= 1e-8 * max|denom| — i.e. pressure-nullspace
    deflation, applied at the exact division site of the reference's Uzawa
    solve. For well-conditioned denominators (the Helmholtz divides) every
    entry passes the keep mask and the division is unchanged."""

    __array_priority__ = 100.0

    def __rtruediv__(self, num):
        d = np.asarray(self)
        keep = np.abs(d) > 1e-8 * np.abs(d).max()
        return np.where(keep, np.asarray(num) / np.where(keep, d, 1.0), 0.0)


def run_chorin_spectral_deflated(nt):
    """Golden for the conditioning-safe quirked workload: the reference
    algorithm verbatim EXCEPT the Uzawa division is nullspace-deflated
    (both sides of the parity test apply the identical projection — ns_tpu
    side: ChorinSpectralConfig(quirk_compat=True,
    deflate_pressure_nullspace=True)). Without deflation the scheme divides
    by a ~0 eigenvalue, Q blows up to ~1e16 and the outputs are 13-digit
    cancellation residue — not reproducible across BLAS backends; with it,
    multi-step elementwise parity is well-posed."""
    import warnings
    warnings.resetwarnings()
    warnings.simplefilter("ignore")
    from src import boundary
    import src.chorin_spectral.simulate as ref_mod

    orig_dup_row = ref_mod.dup_vector_by_row
    ref_mod.dup_vector_by_row = (
        lambda *a, **k: np.asarray(orig_dup_row(*a, **k)).view(_DeflatingDenom))
    try:
        nx = ny = 51
        dx = dy = 2.0 / (nx - 1.0)
        u_bc, v_bc, _ = cavity_bcs(boundary, dx, dy)
        sys_ = ref_mod.NavierStokesSystem(
            np.zeros((nx, ny)), np.zeros((nx, ny)), np.zeros((nx, ny)),
            u_bc, v_bc, nt=nt, nit=200, nx=nx, ny=ny, dt=0.001,
            rho=1, nu=0.1, beta=1.25)
        u, v, p = sys_.simulate()
    finally:
        ref_mod.dup_vector_by_row = orig_dup_row
    np.savez(os.path.join(GOLDEN, f"chorin_spectral_deflated_nt{nt}.npz"),
             u=u, v=v, p=p)


FULL_HORIZON_FRAMES = (0, 24, 49, 99, 149, 199)


def run_direct_fd_snapshots(nt=200, keep=FULL_HORIZON_FRAMES):
    """Full reference horizon (direct_fd/simulate.py:151-157 runs nt=200);
    only `keep` frames are committed (the full stack is ~12 MB)."""
    from src import boundary
    from src.direct_fd.simulate import NavierStokesSystem

    nx = ny = 50
    dx = dy = 2.0 / (nx - 1.0)
    u_bc, v_bc, p_bc = cavity_bcs(boundary, dx, dy)
    sys_ = NavierStokesSystem(
        np.zeros((nx, ny)), np.zeros((nx, ny)), np.zeros((nx, ny)),
        u_bc, v_bc, p_bc, nt=nt, nit=50, nx=nx, ny=ny, dt=0.001, rho=1,
        nu=0.1)
    u, v, p = sys_.simulate()
    idx = np.asarray(keep)
    np.savez(os.path.join(GOLDEN, f"direct_fd_nt{nt}_snapshots.npz"),
             frames=idx, u=u[idx], v=v[idx], p=p[idx])


def run_chorin_fd_snapshots(nt=200, method="semi_implicit",
                            keep=FULL_HORIZON_FRAMES):
    """Full reference horizon (chorin_fd/simulate.py:278-287 runs nt=200
    nit=200 semi_implicit); committed as probe frames only."""
    from src import boundary
    import src.chorin_fd.simulate as ref_mod
    ref_mod.np = _RaggedNPShim()

    nx = ny = 51
    dx = dy = 2.0 / (nx - 1.0)
    u_bc, v_bc, p_bc = cavity_bcs(boundary, dx, dy)
    sys_ = ref_mod.NavierStokesSystem(
        np.zeros((nx, ny)), np.zeros((nx, ny)), np.zeros((nx, ny)),
        u_bc, v_bc, p_bc, nt=nt, nit=200, nx=nx, ny=ny, dt=0.001,
        rho=1, nu=0.1, beta=1.25, method=method)
    u, v, p = sys_.simulate()
    idx = np.asarray(keep)
    np.savez(os.path.join(GOLDEN,
                          f"chorin_fd_{method}_nt{nt}_snapshots.npz"),
             frames=idx, u=u[idx], v=v[idx], p=p[idx])


if __name__ == "__main__":
    run_direct_fd(nt=20)
    run_chorin_fd(nt=12, method="semi_implicit")
    run_chorin_fd(nt=12, method="explicit")
    run_chorin_spectral(nt=3)
    run_chorin_spectral_deflated(nt=8)
    run_direct_fd_snapshots(nt=200)
    run_chorin_fd_snapshots(nt=200, method="semi_implicit")
    run_chorin_fd_snapshots(nt=200, method="explicit")
    with open(os.path.join(GOLDEN, "timings.json"), "w") as f:
        json.dump(timings, f, indent=2)
    print(json.dumps(timings, indent=2))
