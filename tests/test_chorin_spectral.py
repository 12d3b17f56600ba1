"""Golden parity + operator identity tests for the Chebyshev Chorin family.

The reference scheme is numerically unstable at its own default config
(fields grow ~1e5x/step, NaN by step ~6 — measured while generating
goldens), so parity is asserted per-step on the first 3 steps with relative
tolerances that tighten at step 0 and loosen with the growth.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.core.bc import dirichlet
from ns_tpu.ops import cheb
from ns_tpu.solvers import chorin_spectral
from tests.conftest import load_golden


def cavity_u_v_bcs():
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    return u_bc, v_bc


def test_cheb_operators_match_reference():
    g = load_golden("chorin_spectral_ops.npz")
    N = 51
    np.testing.assert_array_equal(cheb.t_matrix(N), g["Tx"])
    np.testing.assert_array_equal(cheb.inv_t_matrix(N), g["Tx_inv"])
    np.testing.assert_array_equal(cheb.d_matrix(N), g["Dx"])
    np.testing.assert_array_equal(cheb.d_sqr_matrix(N), g["Dx_sqr"])
    np.testing.assert_array_equal(cheb.d_matrix_pn_minus_2(N), g["DPx"])
    np.testing.assert_allclose(
        cheb.d_matrix(N)[1:-1, 1:-1] @ cheb.d_matrix_pn_minus_2(N),
        g["DxDPx"], rtol=0, atol=0)


def test_transform_round_trip():
    """T @ (T^-1 @ U) ~= U — the reference's sanity.py check (:31-46)."""
    N = 33
    T = cheb.t_matrix(N)
    T_inv = cheb.inv_t_matrix(N)
    x = cheb.gauss_lobatto(N)
    X, Y = np.meshgrid(x, x, indexing="ij")
    U = np.exp(-(X**2 + Y**2))
    U_recon = T @ (T_inv @ U)
    # the reference transform pair normalizes by N rather than N-1 and its
    # bar_c never applies the factor 2 at the last point (cheb.bar_c quirk),
    # so the round trip is only approximate even for smooth fields —
    # sanity.py just prints the norm for a human. Measured: ~0.10 relative
    # for a smooth Gaussian at N=33. Assert that known behavior.
    rel = np.linalg.norm(U - U_recon) / np.linalg.norm(U)
    assert rel < 0.15


def test_corrected_d_matrix_differentiates_polynomials():
    """The corrected D (quirk_compat=False) is spectrally accurate; the
    reference's quirked D is not (uses N instead of N-1 in the stable-form
    denominators — measured ~0.67 max error on the same cubic)."""
    N = 41
    x = cheb.gauss_lobatto(N)
    f = x**3 - 2 * x
    df = 3 * x**2 - 2
    D = cheb.d_matrix(N, quirk_compat=False)
    assert np.abs(D @ f - df).max() < 1e-9
    Dq = cheb.d_matrix(N, quirk_compat=True)
    assert np.abs(Dq @ f - df).max() > 0.1  # document the quirk's magnitude


def test_corrected_transform_is_exact_inverse():
    N = 33
    T = cheb.t_matrix(N)
    T_inv = cheb.inv_t_matrix(N, quirk_compat=False)
    np.testing.assert_allclose(T @ T_inv, np.eye(N), atol=1e-10)


def test_corrected_d_sqr_is_d_at_d():
    N = 21
    D = cheb.d_matrix(N, quirk_compat=False)
    np.testing.assert_allclose(cheb.d_sqr_matrix(N, quirk_compat=False), D @ D)


def test_rollout_matches_reference_golden_3_steps():
    """Parity with the reference algorithm, stated with its conditioning.

    The reference's Uzawa solve divides by a ~0 eigenvalue sum (pressure
    nullspace), inflating Q ~ 1e16; its velocity update then cancels ~13
    digits. p (dominated by the near-null mode) reproduces to ~1e-14
    relative; u, v are differences of 1e16-scale quantities, so their error
    is bounded relative to the cancellation magnitude dt * |p|, not |u| —
    the reference's own u, v are not reproducible across BLAS backends.
    Measured: p rel ~8e-15; u, v ~5e-10 of dt*|p| at step 0.
    """
    nx = ny = 51
    u_bc, v_bc = cavity_u_v_bcs()
    z = np.zeros((nx, ny))
    sys_ = chorin_spectral.NavierStokesSystem(
        z, z, z, u_bc, v_bc, nt=3, nit=200, nx=nx, ny=ny,
        dt=0.001, rho=1, nu=0.1, beta=1.25, dtype=jnp.float64)
    u, v, p = sys_.simulate()
    g = load_golden("chorin_spectral_nt3.npz")
    dt = 0.001
    # Step 0 is the only mathematically meaningful comparison: the step-0
    # velocity output is already 13-digit cancellation residue, and the
    # scheme then amplifies that backend-dependent noise ~1e5x per step —
    # by step 1 even two reference runs with different BLAS would disagree
    # completely (measured: step-1 p rel err 3.9 vs step-0 8e-15).
    p_scale = np.abs(g["p"][0]).max()
    rel_p = np.abs(np.asarray(p[0]) - g["p"][0]).max() / p_scale
    assert rel_p < 1e-11, f"p step 0: rel err {rel_p:.3e}"
    cancel = dt * p_scale  # magnitude of the cancelling velocity update
    for mine, ref, name in ((u, g["u"], "u"), (v, g["v"], "v")):
        rel = np.abs(np.asarray(mine[0]) - ref[0]).max() / cancel
        assert rel < 1e-7, f"{name} step 0: cancellation-rel err {rel:.3e}"
    # later steps: same growth envelope (the instability is reproduced)
    for t in (1, 2):
        assert 0.1 < np.abs(np.asarray(u[t])).max() / np.abs(g["u"][t]).max() < 10.0


def test_rollout_matches_deflated_golden_6_steps():
    """Multi-step elementwise parity on the conditioning-safe quirked
    workload: both sides run the reference algorithm verbatim EXCEPT the
    Uzawa division is nullspace-deflated (ours via
    deflate_pressure_nullspace=True; the golden via the division-site
    deflation shim in tools/make_goldens.py::run_chorin_spectral_deflated).
    Without deflation the ~0 eigenvalue inflates Q to ~1e16 and the outputs
    are 13-digit cancellation residue (step-0-only parity above); with it
    the outputs are O(1e3)-scaled and parity is well-posed for all 6 steps
    even though the quirked operators still blow the fields up ~1e140 by
    step 5 (measured agreement: <=4e-12 relative at every step)."""
    nx = ny = 51
    u_bc, v_bc = cavity_u_v_bcs()
    z = np.zeros((nx, ny))
    sys_ = chorin_spectral.NavierStokesSystem(
        z, z, z, u_bc, v_bc, nt=6, nit=200, nx=nx, ny=ny,
        dt=0.001, rho=1, nu=0.1, beta=1.25, dtype=jnp.float64,
        quirk_compat=True, deflate_pressure_nullspace=True)
    u, v, p = sys_.simulate()
    g = load_golden("chorin_spectral_deflated_nt6.npz")
    for t in range(6):
        for mine, ref, name in ((u, g["u"], "u"), (v, g["v"], "v"),
                                (p, g["p"], "p")):
            scale = np.abs(ref[t]).max()
            rel = np.abs(np.asarray(mine[t]) - ref[t]).max() / scale
            assert rel < 5e-11, f"{name} step {t}: rel err {rel:.3e}"


def test_corrected_mode_is_stable_and_divergence_free():
    """quirk_compat=False fixes the reference's operator bugs (D scaling,
    D@D.T, non-derivative DPx, Laplacian-instead-of-gradient projection,
    missing boundary lifting) and yields a stable, physically-correct
    solver: a smooth dipole decays viscously and stays divergence-free."""
    nx = ny = 51
    bc0 = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    x = cheb.gauss_lobatto(nx)
    X, Y = np.meshgrid(x, x, indexing="ij")
    u0 = 2 * (1 - X**2) ** 2 * (1 - Y**2) * (-2 * Y)
    v0 = -2 * (1 - X**2) * (-2 * X) * (1 - Y**2) ** 2
    sys_ = chorin_spectral.NavierStokesSystem(
        u0, v0, np.zeros((nx, ny)), bc0, bc0, nt=100, nx=nx, ny=ny,
        dt=0.001, rho=1, nu=0.1, dtype=jnp.float64, quirk_compat=False)
    u, v, p = sys_.simulate()
    assert np.isfinite(np.asarray(u)).all()
    # viscous decay, no growth
    assert np.abs(np.asarray(u[-1])).max() < np.abs(u0).max()
    assert np.abs(np.asarray(u[-1])).max() > 0.01
    # divergence-free in the spectral sense
    D = cheb.d_matrix(nx, quirk_compat=False)
    uu, vv = np.asarray(u[-1]), np.asarray(v[-1])
    div = D[1:-1, :] @ uu[:, 1:-1] + vv[1:-1, :] @ D[1:-1, :].T
    assert np.abs(div).max() < 1e-10


def test_make_step_bakes_matmul_precision():
    """cfg.matmul_precision must reach EVERY consumer of make_step, not
    just the wrapper: the round-2 benchmark harnesses called make_step
    directly and silently ran at the jnp default (bf16-class) while the
    user-facing wrapper ran 'highest' — a 3.5x speed / 7%-fidelity gap
    between what was measured and what users get (RESULTS.md). Assert
    structurally on the lowered StableHLO (precision has no numeric
    effect on CPU, so a value test can't catch this)."""
    import jax as _jax

    nx = 16
    bc0 = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    z = np.zeros((nx, nx), np.float32)

    def lowered(prec):
        cfg = chorin_spectral.ChorinSpectralConfig(
            nt=2, nx=nx, ny=nx, dt=1e-3, rho=1, nu=0.1,
            quirk_compat=False, matmul_precision=prec,
            deflate_pressure_nullspace=True)
        step = chorin_spectral.make_step(cfg, bc0, bc0, dtype=jnp.float32)
        s0 = chorin_spectral.init_state(cfg, z, z, z, bc0, bc0,
                                        dtype=jnp.float32)
        return _jax.jit(step).lower(s0).as_text()

    assert "HIGHEST" in lowered("highest")
    assert "HIGHEST" not in lowered("default")


def test_corrected_dp_matrix_differentiates():
    N = 21
    xi = cheb.gauss_lobatto(N)[1:-1]
    DP = cheb.d_matrix_pn_minus_2(N, quirk_compat=False)
    for deg in (1, 2, 3, 5):
        err = np.abs(DP @ xi**deg - deg * xi ** (deg - 1)).max()
        assert err < 1e-10


def test_missing_side_raises():
    u_bc, v_bc = cavity_u_v_bcs()
    with pytest.raises(ValueError):
        chorin_spectral._process_bcs(u_bc[:3])


def test_neumann_raises_like_reference():
    from ns_tpu.core.bc import neumann
    u_bc, _ = cavity_u_v_bcs()
    bcs = [neumann(0, "left", 0.1, 0.1)] + u_bc[1:]
    with pytest.raises(NotImplementedError):
        chorin_spectral._process_bcs(bcs)


def test_quirk_even_grid_fails_fast_with_guidance():
    """Even-N quirk grids can never construct (complex pressure spectrum);
    make_step must say so actionably instead of the bare eig_real raise."""
    u_bc, v_bc = cavity_u_v_bcs()
    cfg = chorin_spectral.ChorinSpectralConfig(
        nt=2, nx=24, ny=24, quirk_compat=True)
    with pytest.raises(ValueError, match="ODD grid sizes"):
        chorin_spectral.make_step(cfg, u_bc, v_bc)


@pytest.mark.slow
def test_cached_step_rollout_matches_plain_step():
    """The AB-derivative carry (make_step's step.cached/step.seed) reuses
    this step's h_dx/h_dy as next step's h1 derivatives — the identical
    GEMM on the identical operand, so a cached rollout must be BITWISE
    equal to scanning the plain step. Covers both corrected engines and
    quirk mode (where the cache is None end to end)."""
    import jax

    u_bc, v_bc = cavity_u_v_bcs()
    # quirk mode needs an ODD grid (its defective pressure operator has a
    # complex spectrum at every even N — see make_step's fail-fast)
    for quirk, parity, n in ((False, False, 24), (False, True, 24),
                             (True, False, 25)):
        z = np.zeros((n, n))
        cfg = chorin_spectral.ChorinSpectralConfig(
            nt=5, nx=n, ny=n, dt=1e-4, rho=1, nu=0.1,
            quirk_compat=quirk, parity_split=parity or None,
            deflate_pressure_nullspace=not quirk)
        step = chorin_spectral.make_step(cfg, u_bc, v_bc)
        s0 = chorin_spectral.init_state(cfg, z, z, z, u_bc, v_bc)

        @jax.jit
        def plain(s):
            def body(s, _):
                return step(s), None
            return jax.lax.scan(body, s, None, length=5)[0]

        @jax.jit
        def cached(s):
            def body(c, _):
                return step.cached(*c), None
            return jax.lax.scan(body, (s, step.seed(s)), None,
                                length=5)[0][0]

        a, b = plain(s0), cached(s0)
        for f in ("u", "v", "p"):
            np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                          np.asarray(getattr(b, f)),
                                          err_msg=f"{f} quirk={quirk} "
                                                  f"parity={parity}")
