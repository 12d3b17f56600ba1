"""Pallas kernels vs the pure-XLA implementations (interpret mode on CPU —
SURVEY.md §4e property tests: kernels tolerance-compared against the jnp
reference paths)."""

import jax.numpy as jnp
import numpy as np

from ns_tpu.core.bc import dirichlet, neumann
from ns_tpu.ops import poisson
from ns_tpu.ops.pallas import (jacobi_fused_pallas, sor_redblack_fused_pallas,
                               vmem_fits)
from ns_tpu.core.bc import apply_bcs


def p_bcs(dx, dy):
    return [dirichlet(0, "top"), neumann(0, "bottom", dx, dy),
            neumann(0, "left", dx, dy), neumann(0, "right", dx, dy)]


def test_jacobi_fused_matches_jnp():
    nx = ny = 32
    dx = dy = 2.0 / (nx - 1)
    rng = np.random.default_rng(0)
    p0 = jnp.asarray(rng.normal(size=(nx, ny)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(nx, ny)), jnp.float32)
    bcs = p_bcs(dx, dy)

    want = poisson.jacobi(p0, b, dx, dy, 25, bc_fn=lambda p: apply_bcs(p, bcs))
    got = jacobi_fused_pallas(p0, b, dx, dy, 25, bcs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


def test_sor_fused_matches_jnp():
    nx = ny = 33
    dx = dy = 2.0 / (nx - 1)
    rng = np.random.default_rng(1)
    p0 = jnp.asarray(rng.normal(size=(nx, ny)), jnp.float32)
    c = jnp.asarray(0.1 * rng.normal(size=(nx, ny)), jnp.float32)

    want = poisson.sor_redblack(p0, c, dx, dy, beta=1.25, tol=5e-6,
                                max_iter=300)
    got = sor_redblack_fused_pallas(p0, c, dx, dy, beta=1.25, tol=5e-6,
                                    max_iter=300, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-4)


def test_vmem_guard():
    assert vmem_fits(51, 51)
    assert vmem_fits(512, 512)
    assert not vmem_fits(4096, 4096)


def test_tiled_sor_matches_xla_fixed_iterations():
    """Overlapped-strip tiled SOR == the XLA red-black solver after the
    same sweep count (tol=0 forces the iteration cap; N*k+1 cap = N*k
    sweeps on both sides given the reference's it-starts-at-1 semantics)."""
    import numpy as np
    from ns_tpu.ops.pallas.poisson_kernels import sor_redblack_tiled_pallas
    from ns_tpu.ops.poisson import sor_redblack

    nx = ny = 128
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.normal(size=(nx, ny)))
    p0 = jnp.zeros((nx, ny))
    dx = dy = 2.0 / (nx - 1)
    for n_launches, k, tm in ((8, 4, 64), (4, 8, 32)):
        cap = n_launches * k + 1
        ref = sor_redblack(p0, rhs, dx, dy, 1.25, 0.0, cap)
        tiled = sor_redblack_tiled_pallas(p0, rhs, dx, dy, 1.25, 0.0, cap,
                                          k_per_launch=k, tile_rows=tm,
                                          interpret=True)
        assert float(jnp.abs(ref - tiled).max()) < 1e-9


def test_tiled_sor_validates_geometry():
    import numpy as np
    import pytest
    from ns_tpu.ops.pallas.poisson_kernels import sor_redblack_tiled_pallas
    p = jnp.zeros((100, 100))
    with pytest.raises(ValueError, match="tile_rows"):
        sor_redblack_tiled_pallas(p, p, 0.1, 0.1, 1.25, 0.0, 10,
                                  k_per_launch=4, tile_rows=64,
                                  interpret=True)


def test_packed_tiled_sor_matches_xla():
    """Packed color planes reproduce the masked red-black iterates
    bit-for-bit (pack/unpack roundtrip + fixed-sweep-count parity)."""
    import numpy as np
    from ns_tpu.ops.pallas.poisson_kernels import (
        pack_redblack, sor_redblack_packed_tiled_pallas, unpack_redblack)
    from ns_tpu.ops.poisson import sor_redblack

    nx, ny = 128, 256
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(nx, ny)))
    R, B = pack_redblack(p)
    np.testing.assert_allclose(np.asarray(unpack_redblack(R, B)),
                               np.asarray(p))
    rhs = jnp.asarray(rng.normal(size=(nx, ny)))
    p0 = jnp.zeros((nx, ny))
    dx = dy = 2.0 / (nx - 1)
    cap = 8 * 4 + 1
    ref = sor_redblack(p0, rhs, dx, dy, 1.25, 0.0, cap)
    packed = sor_redblack_packed_tiled_pallas(
        p0, rhs, dx, dy, 1.25, 0.0, cap, k_per_launch=4, tile_rows=64,
        interpret=True)
    assert float(jnp.abs(ref - packed).max()) < 1e-9


def test_chorin_pallas_dispatch_falls_back_on_bad_geometry():
    """use_pallas on a non-TPU backend degrades to the XLA path (Mosaic
    kernels need a TPU; odd geometries on TPU now go through the
    pad-and-mask tiled kernel — see test_sor_tiled_any_odd_grid)."""
    import numpy as np
    from ns_tpu.core.bc import dirichlet, neumann
    from ns_tpu.solvers import chorin_fd

    nx = 600  # past the f64 VMEM guard, and 128 does not divide it
    from ns_tpu.ops.pallas import vmem_fits
    assert not vmem_fits(nx, nx, bytes_per=8)
    assert nx % 128 != 0
    dx = dy = 2.0 / (nx - 1)
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dy),
            neumann(0, "left", dx, dy), neumann(0, "right", dx, dy)]
    z = np.zeros((nx, nx))
    s = chorin_fd.NavierStokesSystem(
        z, z, z, u_bc, v_bc, p_bc, nt=1, nit=5, nx=nx, ny=nx, dt=1e-4,
        rho=1, nu=0.01, use_pallas=True, dtype=jnp.float64)
    u, v, p = s.simulate()
    assert np.isfinite(np.asarray(u)).all()


# ---------------------------------------------------------------------------
# Fused explicit-momentum kernel (SURVEY §7 item 5)
# ---------------------------------------------------------------------------

def _cavity_uv_bcs():
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    return u_bc, v_bc


def _momentum_twin(cfg, un, vn, un1, vn1, u_bc, v_bc):
    from ns_tpu.solvers.chorin_fd import _explicit_predictor
    ui, vi = _explicit_predictor(cfg, un, vn, un1, vn1)
    return apply_bcs(ui, u_bc), apply_bcs(vi, v_bc)


def test_momentum_fused_matches_xla_twin():
    """Fused advection+diffusion+BC kernel vs _explicit_predictor +
    apply_bcs, elementwise, both quirk and corrected stencils, across
    strip boundaries (interpret mode)."""
    import jax
    from ns_tpu.ops.pallas.momentum_kernels import (
        momentum_explicit_fused_pallas)
    from ns_tpu.solvers.chorin_fd import ChorinFDConfig

    nx = ny = 128
    rng = np.random.default_rng(0)
    un, vn, un1, vn1 = (jnp.asarray(rng.normal(size=(nx, ny)))
                        for _ in range(4))
    u_bc, v_bc = _cavity_uv_bcs()
    for quirk in (True, False):
        cfg = ChorinFDConfig(nx=nx, ny=ny, dt=1e-3, nu=0.1,
                             method="explicit", quirk_compat=quirk)
        ui_ref, vi_ref = _momentum_twin(cfg, un, vn, un1, vn1, u_bc, v_bc)
        ui, vi = momentum_explicit_fused_pallas(
            un, vn, un1, vn1, cfg.dt, cfg.dx, cfg.dy, cfg.nu, u_bc, v_bc,
            quirk_compat=quirk, tile_rows=32, interpret=True)
        np.testing.assert_allclose(np.asarray(ui), np.asarray(ui_ref),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(vi), np.asarray(vi_ref),
                                   atol=1e-12)


def test_momentum_fused_neumann_bcs():
    """Neumann velocity BCs (roll-based neighbor pulls) match apply_bcs
    across every edge, including edge rows adjacent to strip seams."""
    from ns_tpu.ops.pallas.momentum_kernels import (
        momentum_explicit_fused_pallas)
    from ns_tpu.solvers.chorin_fd import ChorinFDConfig

    nx = ny = 64
    dx = dy = 2.0 / (nx - 1)
    rng = np.random.default_rng(1)
    un, vn, un1, vn1 = (jnp.asarray(rng.normal(size=(nx, ny)))
                        for _ in range(4))
    u_bc = [neumann(0.5, "left", dx, dy), dirichlet(1, "right"),
            neumann(-0.25, "top", dx, dy), dirichlet(0, "bottom")]
    v_bc = [neumann(0, "bottom", dx, dy), neumann(0, "top", dx, dy),
            dirichlet(0, "left"), dirichlet(0, "right")]
    cfg = ChorinFDConfig(nx=nx, ny=ny, dt=1e-3, nu=0.1, method="explicit")
    ui_ref, vi_ref = _momentum_twin(cfg, un, vn, un1, vn1, u_bc, v_bc)
    ui, vi = momentum_explicit_fused_pallas(
        un, vn, un1, vn1, cfg.dt, cfg.dx, cfg.dy, cfg.nu, u_bc, v_bc,
        tile_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(ui), np.asarray(ui_ref),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(vi), np.asarray(vi_ref),
                               atol=1e-12)


def test_chorin_explicit_pallas_momentum_rollout_matches():
    """A full explicit rollout with use_pallas_momentum matches the XLA
    path elementwise (the flag swaps only the predictor phase)."""
    import numpy as np
    from ns_tpu.solvers import chorin_fd

    nx = 128
    dx = dy = 2.0 / (nx - 1)
    u_bc, v_bc = _cavity_uv_bcs()
    p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dy),
            neumann(0, "left", dx, dy), neumann(0, "right", dx, dy)]
    z = np.zeros((nx, nx))
    kw = dict(nt=3, nit=20, nx=nx, ny=nx, dt=1e-4, rho=1, nu=0.01,
              method="explicit", pressure_mode="dst", dtype=jnp.float64)
    ref = chorin_fd.NavierStokesSystem(z, z, z, u_bc, v_bc, p_bc, **kw)
    u_r, v_r, p_r = ref.simulate()

    import jax
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = chorin_fd.NavierStokesSystem(z, z, z, u_bc, v_bc, p_bc,
                                           use_pallas_momentum=True, **kw)
        u_g, v_g, p_g = got.simulate()
    np.testing.assert_allclose(np.asarray(u_g), np.asarray(u_r), atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_g), np.asarray(v_r), atol=1e-12)
    np.testing.assert_allclose(np.asarray(p_g), np.asarray(p_r), atol=1e-11)


def test_sor_tiled_any_odd_grid():
    """Pad-and-mask tiled SOR on an odd (non-128-multiple) grid matches
    the XLA red-black iterate sequence exactly (interpret mode) — lifts
    the `128 | nx` geometry constraint (VERDICT r2 #4)."""
    from ns_tpu.ops.pallas import sor_redblack_tiled_any

    nx, ny = 70, 90  # neither a tile_rows nor a lane multiple
    rng = np.random.default_rng(3)
    p0 = jnp.asarray(rng.normal(size=(nx, ny)))
    rhs = jnp.asarray(rng.normal(size=(nx, ny)))
    dx, dy = 2.0 / (nx - 1), 2.0 / (ny - 1)
    cap = 9  # multiple of k_per_launch+1 so both gates stop at one point
    ref = poisson.sor_redblack(p0, rhs, dx, dy, 1.25, 0.0, cap)
    got = sor_redblack_tiled_any(p0, rhs, dx, dy, 1.25, 0.0, cap,
                                 k_per_launch=4, tile_rows=32,
                                 interpret=True)
    assert got.shape == (nx, ny)
    assert float(jnp.abs(ref - got).max()) < 1e-9


def test_momentum_fused_any_odd_grid():
    """Pad-and-mask momentum entry on odd grids matches the XLA twin,
    including Neumann edges adjacent to the pad region."""
    from ns_tpu.ops.pallas.momentum_kernels import (
        momentum_explicit_fused_any)
    from ns_tpu.solvers.chorin_fd import ChorinFDConfig

    nx, ny = 51, 51  # the reference's own grid: no alignment anywhere
    dx = dy = 2.0 / (nx - 1)
    rng = np.random.default_rng(2)
    un, vn, un1, vn1 = (jnp.asarray(rng.normal(size=(nx, ny)))
                        for _ in range(4))
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            neumann(0.5, "top", dx, dy), dirichlet(0, "bottom")]
    v_bc = [neumann(0, "bottom", dx, dy), dirichlet(0, "top"),
            dirichlet(0, "left"), neumann(-1.0, "right", dx, dy)]
    cfg = ChorinFDConfig(nx=nx, ny=ny, dt=1e-3, nu=0.1, method="explicit")
    ui_ref, vi_ref = _momentum_twin(cfg, un, vn, un1, vn1, u_bc, v_bc)
    ui, vi = momentum_explicit_fused_any(
        un, vn, un1, vn1, cfg.dt, cfg.dx, cfg.dy, cfg.nu, u_bc, v_bc,
        tile_rows=16, interpret=True)
    assert ui.shape == (nx, ny)
    np.testing.assert_allclose(np.asarray(ui), np.asarray(ui_ref),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(vi), np.asarray(vi_ref),
                               atol=1e-12)


def test_momentum_flag_requires_explicit_method():
    """use_pallas_momentum with a non-explicit method must error, not
    silently run the XLA predictor labeled as pallas."""
    import pytest as _pytest
    from ns_tpu.solvers.chorin_fd import ChorinFDConfig

    with _pytest.raises(ValueError, match="use_pallas_momentum"):
        ChorinFDConfig(nt=1, nit=1, nx=16, ny=16, dt=1e-4, rho=1.0,
                       nu=0.01, method="semi_implicit",
                       use_pallas_momentum=True)


def test_momentum_tile_rows_budget():
    """Auto strip sizing: full 128 rows at narrow grids, shrinking
    multiples of 8 as ny grows, never below the halo block."""
    from ns_tpu.ops.pallas.momentum_kernels import momentum_tile_rows

    assert momentum_tile_rows(1024) == 128
    wide = momentum_tile_rows(8192)
    assert 8 <= wide < 128 and wide % 8 == 0
    assert momentum_tile_rows(1 << 20) == 8  # pathological width clamps
