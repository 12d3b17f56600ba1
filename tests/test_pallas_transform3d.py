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
