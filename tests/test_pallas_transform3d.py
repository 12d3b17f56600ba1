"""VMEM-fused 3D transform kernels vs the pure-XLA einsum twin
(ops/pallas/transform3d_kernels.py; repo convention: every Pallas kernel
keeps a pure-XLA twin and an interpret-mode parity test)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.solvers import spectral3d as s3


def _cfgs(n=16):
    base = s3.Spectral3DConfig(nx=n, ny=n, nz=n, dtype="float32",
                               transform="matmul",
                               matmul_precision="highest")
    fused = dataclasses.replace(base, use_pallas_transform=True,
                                pallas_interpret=True)
    return base, fused


def test_fused_transform_matches_einsum_roundtrip():
    base, fused = _cfgs()
    f_b, i_b = s3.make_compact_transforms(base)
    f_p, i_p = s3.make_compact_transforms(fused)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((2, 16, 16, 16)), jnp.float32)
    zb = jax.jit(f_b)(w)
    zp = jax.jit(f_p)(w)
    # atol scales with the spectrum magnitude (O(100) here): the banded
    # kernel sums in a different association than the einsum chain, so
    # the comparison is relative-to-scale, not absolute.
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zb), rtol=1e-5,
                               atol=1e-6 * float(np.abs(zb).max()))
    wb = jax.jit(i_b)(zb)
    wp = jax.jit(i_p)(zb)
    np.testing.assert_allclose(np.asarray(wp), np.asarray(wb), rtol=1e-5,
                               atol=1e-6 * float(np.abs(np.asarray(wb)).max()))


@pytest.mark.slow
def test_fused_step_matches_dense_step():
    """A full IF-AB2 solver step through the fused engine equals the
    einsum engine (the kernels slot under make_transforms unchanged)."""
    base, fused = _cfgs()
    u0 = s3.random_solenoidal_velocity(base, seed=1, k_peak=3.0)
    outs = {}
    for name, cfg in (("base", base), ("fused", fused)):
        carry = s3.init_from_velocity(cfg, u0)
        step, _ = s3.make_step(cfg)
        c1 = jax.jit(lambda c, s=step: s(c)[0])(carry)
        outs[name] = np.asarray(jax.jit(
            lambda ch, cfg=cfg: s3.fields_from_hat(cfg, ch))(c1[0]))
    assert np.isfinite(outs["fused"]).all()
    np.testing.assert_allclose(outs["fused"], outs["base"],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("block_x", [1, 2, 4, 8])
def test_fused_lamb_matches_einsum_nonlinear(block_x):
    """fused_lamb (yz-inverse + cross product + zy-forward in one
    program) equals the einsum nonlinear path at every x-slab blocking
    (the banding/unbanding invariants differ per bx)."""
    from ns_tpu.ops.pallas.transform3d_kernels import fused_lamb

    base, _ = _cfgs()
    ops = s3.make_ops(base)
    fwd, inv = s3.make_compact_transforms(base)
    u0 = s3.random_solenoidal_velocity(base, seed=3, k_peak=3.0)
    u_hat = jax.jit(fwd)(jnp.asarray(u0))
    w_hat = jax.jit(lambda u: s3.vorticity_from_velocity_hat(ops, u))(u_hat)
    z6 = jnp.concatenate([u_hat, w_hat])

    # einsum twin: inverse all six, cross product, forward
    def twin(z6):
        f = inv(z6)
        u1, u2, u3, w1, w2, w3 = f
        return fwd(jnp.stack([u2 * w3 - u3 * w2, u3 * w1 - u1 * w3,
                              u1 * w2 - u2 * w1]))

    want = np.asarray(jax.jit(twin)(z6))

    M = s3._dft_constants_np(base)

    def run(z6):
        ein = lambda s, a, b: jnp.einsum(s, a, b, precision="highest")
        fxi = jax.lax.complex(
            jnp.asarray(M["Fxi_t"].real, jnp.float32),
            jnp.asarray(M["Fxi_t"].imag, jnp.float32))
        fx = jax.lax.complex(jnp.asarray(M["Fx_t"].real, jnp.float32),
                             jnp.asarray(M["Fx_t"].imag, jnp.float32))
        a6 = ein("fabk,xa->fxbk", z6, fxi)
        out = fused_lamb(a6, M["Fyi_t"], M["Bz"], M["Fz_t"], M["Fy_t"],
                         base.nz, precision="highest", interpret=True,
                         block_x=block_x)
        return ein("fxbk,ax->fabk", out, fx)

    got = np.asarray(jax.jit(run)(z6))
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * float(np.abs(want).max()))


def test_fused_step_contains_one_lamb_launch():
    """The fused step's nonlinear term lowers to exactly ONE Pallas
    launch (the whole physical leg — no separate fwd/inv kernel calls
    and no full-grid physical intermediates in HBM)."""
    base, fused = _cfgs()
    carry = s3.init_from_velocity(base, s3.random_solenoidal_velocity(
        base, seed=1, k_peak=3.0))
    step, _ = s3.make_step(fused)
    jaxpr = jax.make_jaxpr(lambda c: step(c)[0])(carry)
    n = str(jaxpr).count("pallas_call")
    assert n == 1, f"expected ONE fused lamb launch per step, found {n}"


def test_vmem_gate_and_block_validation():
    """Grids whose fused lamb kernel cannot fit VMEM even one x-slab at
    a time (512^3) resolve 'auto' OFF and reject explicit True at config
    time; fused_lamb rejects a block_x that does not divide nx (a
    truncating grid would leave tail output slabs uninitialized)."""
    from ns_tpu.ops.pallas.transform3d_kernels import (fused_lamb,
                                                       lamb_block_x)

    big = s3.Spectral3DConfig(nx=512, ny=512, nz=512, transform="matmul",
                              matmul_precision="default",
                              use_pallas_transform="auto")
    assert big.use_pallas_transform is False
    assert lamb_block_x(512, 512, 512, 341, 86) is None
    # XLA:TPU stack-promotes the custom call's output tuple into scoped
    # vmem when each component fits under the ~16 MB scoped limit; at
    # 128^3 f32 that reservation (10.7 MiB for both (3, nx, Ry, Kzc)
    # components) caps the block at 2 — bx=8's ~9 MiB estimate compiled
    # fine at 256^3 (outputs too big to promote) but died in the Mosaic
    # compiler at 128^3 with "19.75M > 16.00M" (measured on the v5e).
    assert lamb_block_x(128, 128, 128, 85, 43) == 2
    out_bytes = 2 * 3 * 128 * 85 * 43 * 4
    assert out_bytes < 16 * 2**20  # the 128^3 outputs ARE promotable
    assert lamb_block_x(256, 256, 256, 171, 87) == 2  # not promotable
    with pytest.raises(ValueError, match="VMEM"):
        s3.Spectral3DConfig(nx=512, ny=512, nz=512, transform="matmul",
                            use_pallas_transform=True)
    base, _ = _cfgs()
    M = s3._dft_constants_np(base)
    _, rows_y, kzc = s3._compact_meta(base)
    a6 = jnp.zeros((6, base.nx, len(rows_y), kzc), jnp.complex64)
    with pytest.raises(ValueError, match="block_x"):
        fused_lamb(a6, M["Fyi_t"], M["Bz"], M["Fz_t"], M["Fy_t"],
                   base.nz, interpret=True, block_x=3)


@pytest.mark.slow
def test_extraction_paths_never_vmap_pallas():
    """fields_from_hat / pressure_from_hat always lower to the einsum
    chain even under a fused config: callers vmap them per saved frame
    (NavierStokesSystem3D._fields), and a Mosaic kernel batched under
    vmap compiles pathologically on the TPU (a 5-frame 64^3 CLI export
    hung >9 min, measured live). Pin: no pallas call in the vmapped
    extraction HLO, values equal the einsum config's."""
    base, fused = _cfgs()
    u0 = s3.random_solenoidal_velocity(base, seed=2, k_peak=3.0)
    u_hats = jax.jit(lambda c: s3.simulate_hat(
        dataclasses.replace(fused, nt=2), c))(
            s3.init_from_velocity(fused, u0))
    from functools import partial
    for fn in (s3.fields_from_hat, s3.pressure_from_hat):
        vm_fused = jax.vmap(partial(fn, fused))
        txt = jax.jit(vm_fused).lower(u_hats).as_text()
        assert "tpu_custom_call" not in txt and "pallas" not in txt.lower()
        np.testing.assert_allclose(
            np.asarray(jax.jit(vm_fused)(u_hats)),
            np.asarray(jax.jit(jax.vmap(partial(fn, base)))(u_hats)),
            rtol=1e-5, atol=1e-6)


def test_pallas_transform_config_validation():
    with pytest.raises(ValueError, match="use_pallas_transform"):
        s3.Spectral3DConfig(nx=16, ny=16, nz=16, transform="fft",
                            use_pallas_transform=True)
    with pytest.raises(ValueError, match="use_pallas_transform"):
        s3.Spectral3DConfig(nx=16, ny=16, nz=16, transform="matmul",
                            dtype="float64", use_pallas_transform=True)
    with pytest.raises(ValueError, match="use_pallas_transform"):
        s3.Spectral3DConfig(nx=16, ny=16, nz=16, transform="matmul",
                            use_pallas_transform="yes")


def test_pallas_transform_auto_policy():
    """'auto' fuses exactly in the measured win region (RESULTS.md): the
    compact matmul engine at f32/'default' precision on grids >= the
    crossover; everywhere else it resolves off (and never errors)."""
    win = s3.Spectral3DConfig(nx=256, ny=256, nz=256, transform="matmul",
                              matmul_precision="default",
                              use_pallas_transform="auto")
    assert win.use_pallas_transform is True
    aniso = s3.Spectral3DConfig(nx=512, ny=256, nz=128, transform="matmul",
                                matmul_precision="default",
                                use_pallas_transform="auto")
    assert aniso.use_pallas_transform is True  # same volume as 256^3
    for kw in (dict(nx=128, ny=128, nz=128, matmul_precision="default"),
               # one long axis does NOT put a small volume in the win
               # region (the gate is the working-set volume)
               dict(nx=256, ny=16, nz=16, matmul_precision="default"),
               dict(nx=256, ny=256, nz=256, matmul_precision="high"),
               dict(nx=256, ny=256, nz=256, matmul_precision="default",
                    transform="fft", dealias=False)):
        kw.setdefault("transform", "matmul")
        cfg = s3.Spectral3DConfig(use_pallas_transform="auto", **kw)
        assert cfg.use_pallas_transform is False, kw
