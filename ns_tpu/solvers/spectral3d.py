"""3D periodic Fourier pseudospectral Navier-Stokes — the production-scale
family.

NEW capability with no reference counterpart (the reference,
mhw32/neural-navier-stokes, is 2D-only throughout — every solver family in
/root/reference/src simulates (nx, ny) grids). 3D homogeneous turbulence is
the canonical production DNS workload the north star's scale targets imply,
and it is where the multi-chip layer stops being optional: a 1024^3 state
does not fit one chip's HBM. This module is the single-chip engine; the
pencil-sharded path lives in ns_tpu/parallel/spectral3d_sharded.py.

Formulation: incompressible NSE on [0, 2*pi)^3 in velocity form with the
rotational (Lamb-vector) nonlinearity and exact Leray projection:

    du/dt = P[u x omega] - nu k^2 u (+ f),   P(k) = I - k k^T / k^2

The gradient half of u.grad(u) = omega x u + grad(|u|^2/2) is annihilated
by P, so the Bernoulli pressure never needs to be formed; divergence-free
is exact by construction (the 3D analogue of the 2D family's
streamfunction form, spectral_periodic.py:9-18). Pressure is recovered on
demand for diagnostics from p_hat = -rho k_i k_j T_ij / k^2, T = u u.

Time integration: integrating-factor exp(-nu k^2 dt) for the viscous term
+ Adams-Bashforth-2 for the projected nonlinear term — the exact scheme of
the 2D family (spectral_periodic.py make_step docstring), which makes the
2D-embedding equivalence testable: a z-independent (u(x,y), v(x,y), 0)
initial state evolves bitwise-parallel to the 2D vorticity solver
(curl of the 3D update == the 2D update; tests/test_spectral3d.py).

State: the velocity spectrum (3, nx, ny, nz//2+1) in rfftn layout — or the
dealias-truncated compact layout (3, Rx, Ry, Kzc) under the matmul engine.
Per step: 6 inverse transforms (u, omega — one batched GEMM chain), the
physical cross product, 3 forward transforms, projection, IF-AB2 update.

TPU design notes (same hazards/conventions as spectral_periodic.py):
  - only REAL constants cross host->device (axon cannot move complex
    buffers); i*k multiplies use jax.lax.complex via _ik_mul.
  - the matmul engine expresses every transform as per-axis DFT GEMMs on
    the 2/3-truncated spectrum — MXU work instead of XLA's emulated FFT,
    and the truncation IS the dealias rule (no masks in the hot loop).
  - everything complex stays inside jitted programs; physical-space
    exports go through ns_tpu/utils/host.py::to_host.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.solvers.spectral_periodic import _ik_mul

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Spectral3DConfig:
    nt: int = 100
    nx: int = 64
    ny: int = 64
    nz: int = 64
    dt: float = 1e-3
    nu: float = 6.25e-4  # 1/1600: the canonical TGV Reynolds number
    rho: float = 1.0
    dealias: bool = True
    dtype: str = "float32"  # 'float32' | 'float64'
    # 'fft': XLA rfftn. 'matmul': per-axis DFT GEMMs on the compact
    # dealias-truncated spectrum (MXU path; requires dealias=True).
    # 'auto': matmul while the grid is under the measured crossover
    # (RESULTS.md 3D engine table), fft beyond / when undealiased.
    transform: str = "fft"
    matmul_precision: str = "high"  # 'default' (bf16) | 'high' | 'highest'
    # Constant-in-time body forcing (velocity space):
    #   'none'        unforced decaying turbulence
    #   'kolmogorov'  f = (amp*sin(k*y), 0, 0); laminar fixed point
    #                 u_s = amp/(nu k^2) * sin(k*y) x_hat
    forcing: str = "none"
    forcing_k: int = 4
    forcing_amp: float = 0.1

    # VMEM-fused z+y transform stages (ops/pallas/transform3d_kernels.py):
    # the inter-stage pencil stays on-chip instead of a full-grid complex
    # HBM round trip. matmul engine + float32 only (Mosaic has no f64).
    # 'auto' applies the measured win region (RESULTS.md "VMEM-fused
    # Pallas 3D transform": 1.18x at 256^3 'default'; XLA already sits at
    # ~96% of the bandwidth roofline at <=128^3, and the kernel's
    # 'high'->HIGHEST promotion loses everywhere), i.e. fuse iff
    # max dim >= PALLAS_FUSE_CROSSOVER and matmul_precision == 'default'.
    # pallas_interpret runs the kernels in interpreter mode (CPU parity
    # tests).
    use_pallas_transform: bool | str = False
    pallas_interpret: bool = False

    # measured on v5e (RESULTS.md "3D spectral engines"): the compact
    # matmul-DFT beats XLA's emulated FFT at every size that fits one
    # chip; the crossover is kept as a config so 'auto' stays honest if
    # remeasured hardware moves it.
    AUTO_FFT_CROSSOVER = 2048

    # measured win region for the VMEM-fused transform (v5e, RESULTS.md
    # "VMEM-fused Pallas 3D transform"): below a ~256^3-cell VOLUME the
    # plain einsum chain is already bandwidth-roofline-bound and fusion
    # only adds pad-GEMM flops.
    PALLAS_FUSE_CROSSOVER = 256

    def __post_init__(self):
        if self.forcing not in ("none", "kolmogorov"):
            raise ValueError(
                f"forcing must be 'none'|'kolmogorov', got {self.forcing!r}")
        if self.forcing != "none" and self.forcing_k < 1:
            raise ValueError(f"forcing_k must be >= 1, got {self.forcing_k}")
        if self.transform == "auto":
            if (max(self.nx, self.ny, self.nz) < self.AUTO_FFT_CROSSOVER
                    and self.dealias):
                object.__setattr__(self, "transform", "matmul")
            else:
                object.__setattr__(self, "transform", "fft")
        if self.transform not in ("fft", "matmul"):
            raise ValueError(f"transform must be 'fft'|'matmul'|'auto', "
                             f"got {self.transform!r}")
        if self.transform == "matmul" and not self.dealias:
            raise ValueError("transform='matmul' carries the dealias-"
                             "truncated compact spectrum and needs "
                             "dealias=True")
        if self.use_pallas_transform == "auto":
            # volume-gated: the win region is set by the full-grid complex
            # working set blowing past on-chip caches (~256^3 cells), not
            # by any single axis — an anisotropic 256x64x64 grid is in the
            # regime measured slower. AND VMEM-gated: a grid whose fused
            # lamb kernel cannot fit on-chip even one x-slab at a time
            # (512^3) keeps the einsum path instead of failing at compile.
            on = (self.transform == "matmul" and self.dtype == "float32"
                  and self.matmul_precision == "default"
                  and self.nx * self.ny * self.nz
                  >= self.PALLAS_FUSE_CROSSOVER**3
                  and self._lamb_fits_vmem())
            object.__setattr__(self, "use_pallas_transform", on)
        elif not isinstance(self.use_pallas_transform, bool):
            raise ValueError(
                "use_pallas_transform must be a bool or 'auto'; got "
                f"{self.use_pallas_transform!r}")
        if self.use_pallas_transform and (self.transform != "matmul"
                                          or self.dtype != "float32"):
            raise ValueError(
                "use_pallas_transform fuses the compact matmul engine's "
                "z+y stages and needs transform='matmul' + "
                "dtype='float32' (Mosaic has no f64)")
        if self.use_pallas_transform and not self._lamb_fits_vmem():
            raise ValueError(
                f"use_pallas_transform=True at ({self.nx}, {self.ny}, "
                f"{self.nz}): the fused nonlinear-term kernel exceeds "
                "the VMEM budget even one x-slab at a time "
                "(transform3d_kernels.lamb_block_x); use the einsum "
                "engine (use_pallas_transform=False)")

    def _lamb_fits_vmem(self) -> bool:
        """Whether the fused lamb kernel fits VMEM at some x-slab block."""
        from ns_tpu.ops.pallas.transform3d_kernels import lamb_block_x
        _, rows_y, kzc = _compact_meta(self)
        return lamb_block_x(self.nx, self.ny, self.nz,
                            len(rows_y), kzc) is not None

    @property
    def real_dtype(self):
        return jnp.float64 if self.dtype == "float64" else jnp.float32

    @property
    def complex_dtype(self):
        return jnp.complex128 if self.dtype == "float64" else jnp.complex64

    @property
    def compact(self) -> bool:
        """The matmul engine always carries the compact spectrum."""
        return self.transform == "matmul"


# ---------------------------------------------------------------------------
# Layout metadata (host-side numpy)
# ---------------------------------------------------------------------------

def _axis_freqs(n: int, half: bool) -> np.ndarray:
    return (np.fft.rfftfreq if half else np.fft.fftfreq)(n, d=1.0 / n)


def _kept_rows(n: int, half: bool) -> np.ndarray:
    """Indices kept by the 2/3 rule along one axis (full-FFT axes keep a
    positive block + a negative tail; the rfft axis keeps a leading block)."""
    k = _axis_freqs(n, half)
    keep = np.abs(k) < n / 3.0
    return np.nonzero(keep)[0]


def _compact_meta(cfg: Spectral3DConfig):
    """(rows_x, rows_y, kzc) of the truncated compact layout."""
    rows_x = _kept_rows(cfg.nx, half=False)
    rows_y = _kept_rows(cfg.ny, half=False)
    kzc = len(_kept_rows(cfg.nz, half=True))
    return rows_x, rows_y, kzc


def _wavenumbers_np(cfg: Spectral3DConfig):
    """kx (nx,1,1), ky (1,ny,1), kz (1,1,nzh) for the full rfftn layout,
    truncated to the kept rows under the compact (matmul) layout."""
    kx = _axis_freqs(cfg.nx, half=False)
    ky = _axis_freqs(cfg.ny, half=False)
    kz = _axis_freqs(cfg.nz, half=True)
    if cfg.compact:
        rows_x, rows_y, kzc = _compact_meta(cfg)
        kx, ky, kz = kx[rows_x], ky[rows_y], kz[:kzc]
    return kx[:, None, None], ky[None, :, None], kz[None, None, :]


def _dealias_mask_np(cfg: Spectral3DConfig):
    """2/3-rule mask in the full rfftn layout (fft engine only; the compact
    layout's truncation plays this role structurally)."""
    mx = np.abs(_axis_freqs(cfg.nx, False)) < cfg.nx / 3.0
    my = np.abs(_axis_freqs(cfg.ny, False)) < cfg.ny / 3.0
    mz = np.abs(_axis_freqs(cfg.nz, True)) < cfg.nz / 3.0
    return mx[:, None, None] & my[None, :, None] & mz[None, None, :]


def forcing_velocity_np(cfg: Spectral3DConfig):
    """Host-side physical forcing field (3, nx, ny, nz) or None."""
    if cfg.forcing == "none":
        return None
    y = 2.0 * np.pi * np.arange(cfg.ny) / cfg.ny
    f = np.zeros((3, cfg.nx, cfg.ny, cfg.nz))
    f[0] = (cfg.forcing_amp * np.sin(cfg.forcing_k * y))[None, :, None]
    return f


def _forcing_hat_np(cfg: Spectral3DConfig):
    """Forcing spectrum (3, ...) in the active layout (complex128 host
    numpy), dealias-masked, mean pinned to zero; None when unforced.
    The Kolmogorov force is already solenoidal (div f = 0), so no
    projection is needed."""
    f = forcing_velocity_np(cfg)
    if f is None:
        return None
    f_hat = np.fft.rfftn(f, axes=(1, 2, 3))
    if cfg.dealias:
        f_hat = np.where(_dealias_mask_np(cfg)[None], f_hat, 0.0)
    f_hat[:, 0, 0, 0] = 0.0
    if cfg.compact:
        rows_x, rows_y, kzc = _compact_meta(cfg)
        f_hat = f_hat[:, rows_x][:, :, rows_y][:, :, :, :kzc]
    return f_hat


def make_ops(cfg: Spectral3DConfig):
    """Device-resident spectral constants for the active layout. Only real
    arrays cross host->device (axon complex-transfer hazard)."""
    kx, ky, kz = _wavenumbers_np(cfg)
    k2 = kx * kx + ky * ky + kz * kz
    inv_k2 = np.where(k2 == 0.0, 0.0, 1.0 / np.where(k2 == 0.0, 1.0, k2))
    visc = np.exp(-cfg.nu * k2 * cfg.dt)
    rdt = cfg.real_dtype
    ops = dict(kx=jnp.asarray(kx, rdt), ky=jnp.asarray(ky, rdt),
               kz=jnp.asarray(kz, rdt), k2=jnp.asarray(k2, rdt),
               inv_k2=jnp.asarray(inv_k2, rdt), visc=jnp.asarray(visc, rdt))
    if not cfg.compact:
        mask = _dealias_mask_np(cfg) if cfg.dealias else np.ones(
            k2.shape[-3:], bool)
        ops["mask"] = jnp.asarray(mask)
    f_hat = _forcing_hat_np(cfg)
    if f_hat is not None:
        ops["f_re"] = jnp.asarray(f_hat.real, rdt)
        ops["f_im"] = jnp.asarray(f_hat.imag, rdt)
    return ops


# ---------------------------------------------------------------------------
# Transforms: XLA rfftn or per-axis DFT GEMMs (MXU path, compact layout)
# ---------------------------------------------------------------------------

def _dft_constants_np(cfg: Spectral3DConfig):
    """Per-axis DFT matrices of the compact layout, host numpy complex128:

      forward:  z = Fx_t .x (Fy_t .y (w .z Fz_t^T))      (Rx, Ry, Kzc)
      inverse:  w = Re[(Fxi_t .x z) .y Fyi_t .z Bz]      (nx, ny, nz)

    with Bz the half-spectrum unfolding row basis (c_k/nz e^{+2pi i kj/nz},
    c_0 = 1, c_k = 2 — the truncation never keeps the Nyquist row), exactly
    the 2D family's construction (spectral_periodic.py _dft_constants)."""
    rows_x, rows_y, kzc = _compact_meta(cfg)

    def full(n):
        i = np.arange(n)
        return np.exp(-2j * np.pi * np.outer(i, i) / n)

    Fx = full(cfg.nx)
    Fy = full(cfg.ny)
    k = np.arange(kzc)
    j = np.arange(cfg.nz)
    Fz_t = np.exp(-2j * np.pi * np.outer(k, j) / cfg.nz)      # (kzc, nz)
    c = np.full(kzc, 2.0)
    c[0] = 1.0
    if kzc - 1 == cfg.nz // 2:  # unreached under 2/3 truncation; kept exact
        c[-1] = 1.0
    Bz = (c[:, None] / cfg.nz) * np.exp(
        2j * np.pi * np.outer(k, j) / cfg.nz)                 # (kzc, nz)
    return dict(
        Fx_t=Fx[rows_x, :],                                   # (Rx, nx)
        Fxi_t=(np.conj(Fx) / cfg.nx)[:, rows_x],              # (nx, Rx)
        Fy_t=Fy[rows_y, :],                                   # (Ry, ny)
        Fyi_t=(np.conj(Fy) / cfg.ny)[:, rows_y],              # (ny, Ry)
        Fz_t=Fz_t, Bz=Bz,
    )


def make_compact_transforms(cfg: Spectral3DConfig):
    """(fwd, inv) between physical (..., nx, ny, nz) real fields and the
    compact spectrum (..., Rx, Ry, Kzc) — six GEMMs per round trip, batched
    over leading dims (the step batches 6 fields through one chain)."""
    M = _dft_constants_np(cfg)
    f32 = np.float32 if cfg.dtype == "float32" else np.float64
    # constants stay REAL (re, im) pairs; complex is formed only inside
    # the traced functions. Eagerly-built complex device arrays get
    # embedded as MLIR constants when a jit closes over them, and that
    # embedding reads them back to host — which the axon tunnel cannot do
    # for complex buffers (discovered live: the serve chunk program).
    dev = {k: (jnp.asarray(v.real.astype(f32)),
               jnp.asarray(v.imag.astype(f32))) for k, v in M.items()}
    prec = cfg.matmul_precision
    ein = lambda s, a, b: jnp.einsum(s, a, b, precision=prec)
    cplx = lambda k: jax.lax.complex(*dev[k])

    if cfg.use_pallas_transform:
        # VMEM-fused z+y stages (ops/pallas/transform3d_kernels.py): the
        # inter-stage pencil never round-trips HBM; the x-stage (which
        # contracts across x-rows) stays the einsum on the truncated
        # tensor. Same math as the einsum chain below to fp reassociation
        # (interpret-mode parity test, repo convention).
        from ns_tpu.ops.pallas.transform3d_kernels import (fused_yz_inverse,
                                                           fused_zy_forward)

        def fwd(w):
            t = fused_zy_forward(w, M["Fz_t"], M["Fy_t"], precision=prec,
                                 interpret=cfg.pallas_interpret)
            return ein("...xbk,ax->...abk", t, cplx("Fx_t"))

        def inv(z):
            a = ein("...abk,xa->...xbk", z, cplx("Fxi_t"))
            return fused_yz_inverse(a, M["Fyi_t"], M["Bz"], cfg.nz,
                                    precision=prec,
                                    interpret=cfg.pallas_interpret)

        return fwd, inv

    def fwd(w):
        # contract the axis that shrinks most first (z: nz -> Kzc)
        t = ein("...xyz,kz->...xyk", w.astype(cfg.complex_dtype), cplx("Fz_t"))
        t = ein("...xyk,by->...xbk", t, cplx("Fy_t"))
        return ein("...xbk,ax->...abk", t, cplx("Fx_t"))

    def inv(z):
        a = ein("...abk,xa->...xbk", z, cplx("Fxi_t"))
        a = ein("...xbk,yb->...xyk", a, cplx("Fyi_t"))
        return ein("...xyk,kz->...xyz", a, cplx("Bz")).real

    return fwd, inv


def make_transforms(cfg: Spectral3DConfig):
    """(fwd, inv) for the active engine. fft: full rfftn layout. matmul:
    compact truncated layout (the caller's spectra are compact)."""
    if cfg.transform == "fft":
        s = (cfg.nx, cfg.ny, cfg.nz)
        return (lambda w: jnp.fft.rfftn(w, axes=(-3, -2, -1)),
                lambda z: jnp.fft.irfftn(z, s=s, axes=(-3, -2, -1)))
    return make_compact_transforms(cfg)


def expand_compact(cfg: Spectral3DConfig, z: Array) -> Array:
    """Compact (..., Rx, Ry, Kzc) -> full rfftn layout (..., nx, ny, nzh)."""
    rows_x, rows_y, kzc = _compact_meta(cfg)
    nzh = cfg.nz // 2 + 1
    out = jnp.zeros(z.shape[:-3] + (cfg.nx, cfg.ny, nzh), z.dtype)
    return out.at[..., rows_x[:, None], rows_y[None, :], :kzc].set(z)


def gather_compact(cfg: Spectral3DConfig, z: Array) -> Array:
    """Full rfftn layout -> compact (kept modes; truncation drops the rest)."""
    rows_x, rows_y, kzc = _compact_meta(cfg)
    return z[..., rows_x[:, None], rows_y[None, :], :kzc]


# ---------------------------------------------------------------------------
# Physics: vorticity, Lamb vector, Leray projection, IF-AB2 step
# ---------------------------------------------------------------------------

def vorticity_from_velocity_hat(ops, u_hat: Array) -> Array:
    """omega_hat = i k x u_hat, stacked (3, ...)."""
    ux, uy, uz = u_hat[0], u_hat[1], u_hat[2]
    wx = _ik_mul(ops["ky"], uz) - _ik_mul(ops["kz"], uy)
    wy = _ik_mul(ops["kz"], ux) - _ik_mul(ops["kx"], uz)
    wz = _ik_mul(ops["kx"], uy) - _ik_mul(ops["ky"], ux)
    return jnp.stack([wx, wy, wz])


def leray_project(ops, v_hat: Array) -> Array:
    """P(k) v = v - k (k . v) / k^2 — exact divergence removal. The k = 0
    mode passes through untouched (inv_k2[0] = 0): the mean flow is a
    conserved momentum, not a constraint violation."""
    kdot = (ops["kx"] * v_hat[0] + ops["ky"] * v_hat[1]
            + ops["kz"] * v_hat[2])
    corr = kdot * ops["inv_k2"]
    return jnp.stack([v_hat[0] - ops["kx"] * corr,
                      v_hat[1] - ops["ky"] * corr,
                      v_hat[2] - ops["kz"] * corr])


@lru_cache(maxsize=16)
def _fused_lamb_op(cfg: Spectral3DConfig):
    """Fully-fused physical leg of the nonlinear term (one closure per
    config): x-inverse einsum -> Pallas yz-inverse + cross product +
    zy-forward (ops/pallas/transform3d_kernels.py::fused_lamb — the six
    physical fields and three products never touch HBM) -> x-forward
    einsum. Same math as the einsum path in nonlinear_term to fp
    reassociation (interpret-mode parity: tests/test_pallas_transform3d.py)."""
    from ns_tpu.ops.pallas.transform3d_kernels import fused_lamb

    M = _dft_constants_np(cfg)
    f32 = np.float32 if cfg.dtype == "float32" else np.float64
    # host NumPy only in the closure: the op is lru-cached across traces,
    # so any device array created here would leak a tracer/constant from
    # whichever trace first built it. jnp.asarray inside lamb_hat embeds
    # fresh per-trace constants (same rule as make_compact_transforms).
    fxi_re = M["Fxi_t"].real.astype(f32)
    fxi_im = M["Fxi_t"].imag.astype(f32)
    fx_re = M["Fx_t"].real.astype(f32)
    fx_im = M["Fx_t"].imag.astype(f32)
    prec = cfg.matmul_precision
    ein = lambda s, a, b: jnp.einsum(s, a, b, precision=prec)

    def lamb_hat(z6):
        fxi = jax.lax.complex(jnp.asarray(fxi_re), jnp.asarray(fxi_im))
        fx = jax.lax.complex(jnp.asarray(fx_re), jnp.asarray(fx_im))
        a6 = ein("...abk,xa->...xbk", z6, fxi)
        out = fused_lamb(a6, M["Fyi_t"], M["Bz"], M["Fz_t"], M["Fy_t"],
                         cfg.nz, precision=prec,
                         interpret=cfg.pallas_interpret)
        return ein("...xbk,ax->...abk", out, fx)

    return lamb_hat


def nonlinear_term(cfg: Spectral3DConfig, ops, transforms,
                   u_hat: Array) -> Array:
    """N_hat = P[FFT(u x omega)] (+ f_hat), dealiased. The 6 inverse
    transforms ride one batched GEMM chain / FFT call; <u x omega> = 0
    analytically in a periodic box, so the mean mode is pinned to zero
    (fp hygiene — a drifting mean flow is a conservation-law violation)."""
    fwd, inv = transforms
    w_hat = vorticity_from_velocity_hat(ops, u_hat)
    if cfg.use_pallas_transform:
        # the whole physical leg in one fused launch (_fused_lamb_op)
        N = _fused_lamb_op(cfg)(jnp.concatenate([u_hat, w_hat]))
    else:
        fields = inv(jnp.concatenate([u_hat, w_hat]))  # (6, nx, ny, nz)
        u1, u2, u3, w1, w2, w3 = fields
        lamb = jnp.stack([u2 * w3 - u3 * w2,
                          u3 * w1 - u1 * w3,
                          u1 * w2 - u2 * w1])
        N = fwd(lamb)
    if not cfg.compact and cfg.dealias:
        N = jnp.where(ops["mask"], N, 0.0)
    N = leray_project(ops, N)
    N = N.at[:, 0, 0, 0].set(0.0)
    if "f_re" in ops:  # constant body forcing rides the projected RHS
        N = N + jax.lax.complex(ops["f_re"], ops["f_im"])
    return N


def make_step(cfg: Spectral3DConfig):
    """One IF-AB2 step on (u_hat, N_prev_hat) — the 2D family's scheme
    (spectral_periodic.py make_step) on the 3-component velocity spectrum:

      u^{n+1} = E u^n + dt (3/2 E N^n - 1/2 E^2 N^{n-1}),  E = e^{-nu k^2 dt}
    """
    ops = make_ops(cfg)
    transforms = make_transforms(cfg)
    E = ops["visc"]

    def step(carry):
        u_hat, N_prev = carry
        N = nonlinear_term(cfg, ops, transforms, u_hat)
        u_new = E * u_hat + cfg.dt * (1.5 * E * N - 0.5 * (E * E) * N_prev)
        return (u_new, N), u_new

    return step, ops


# ---------------------------------------------------------------------------
# Init / rollouts
# ---------------------------------------------------------------------------

def carry_from_velocity(cfg: Spectral3DConfig, u0: Array):
    """TRACEABLE carry builder from a physical (3, nx, ny, nz) velocity:
    transform, dealias, Leray-project the IC (guards imperfectly solenoidal
    inputs), self-start the AB2 history with the first nonlinear eval."""
    ops = make_ops(cfg)
    transforms = make_transforms(cfg)
    u_hat = transforms[0](u0.astype(cfg.real_dtype))
    if not cfg.compact and cfg.dealias:
        u_hat = jnp.where(ops["mask"], u_hat, 0.0)
    u_hat = leray_project(ops, u_hat)
    return u_hat, nonlinear_term(cfg, ops, transforms, u_hat)


@lru_cache(maxsize=16)
def _carry_builder(cfg: Spectral3DConfig):
    """One jitted carry builder per config (cross-call program reuse with a
    bounded footprint — see spectral_periodic._carry_builder)."""
    return jax.jit(partial(carry_from_velocity, cfg))


def init_from_velocity(cfg: Spectral3DConfig, u0: Array):
    """Eager-facing jitted carry builder (one program; no eager complex
    dispatch — axon hazard)."""
    return _carry_builder(cfg)(jnp.asarray(u0, cfg.real_dtype))


def rollout_final(cfg: Spectral3DConfig, carry0):
    """Rollout returning only the final carry (bench path — no O(nt) HBM)."""
    step, _ = make_step(cfg)

    def body(carry, _):
        new_carry, _ = step(carry)
        return new_carry, None

    final, _ = jax.lax.scan(body, carry0, None, length=cfg.nt)
    return final


def simulate_hat(cfg: Spectral3DConfig, carry0):
    """Rollout returning stacked velocity spectra (nt, 3, ...) — O(nt)
    HBM; meant for small validation grids. Production extraction goes
    through simulate_strided."""
    step, _ = make_step(cfg)
    _, u_hats = jax.lax.scan(lambda c, _: step(c), carry0, None,
                             length=cfg.nt)
    return u_hats


def _extract_cfg(cfg: Spectral3DConfig) -> Spectral3DConfig:
    """Extraction/diagnostic twin: same engine and layout, fused Pallas
    stages OFF. The fused kernels earn their keep inside the step loop;
    extraction runs once per saved frame, and callers wrap it in jax.vmap
    (NavierStokesSystem3D._fields) — batching a Mosaic kernel under vmap
    adds a grid dim Mosaic compiles pathologically (measured live: a
    5-frame 64^3 CLI export hung >9 min), while the einsum chain vmaps
    for free."""
    if not cfg.use_pallas_transform:
        return cfg
    import dataclasses
    return dataclasses.replace(cfg, use_pallas_transform=False)


def fields_from_hat(cfg: Spectral3DConfig, u_hat: Array) -> Array:
    """Physical (3, nx, ny, nz) velocity from a spectrum in the active
    layout (traceable; always the einsum chain — see _extract_cfg)."""
    _, inv = make_transforms(_extract_cfg(cfg))
    return inv(u_hat)


def pressure_from_hat(cfg: Spectral3DConfig, u_hat: Array) -> Array:
    """Diagnostic pressure: Lap(p) = -rho d_i d_j (u_i u_j), solved by the
    diagonal spectral inverse Laplacian — p_hat = -rho k_i k_j T_ij_hat
    / k^2 (the periodic analogue of the reference families' pressure
    solves; cf. spectral_periodic.pressure_from_hat for the 2D form).
    Always the einsum transform chain (_extract_cfg): diagnostic-path,
    vmapped by callers."""
    ops = make_ops(cfg)
    fwd, inv = make_transforms(_extract_cfg(cfg))
    u = inv(u_hat)  # (3, nx, ny, nz)
    prods = jnp.stack([u[0] * u[0], u[1] * u[1], u[2] * u[2],
                       u[0] * u[1], u[0] * u[2], u[1] * u[2]])
    T = fwd(prods)
    kk = (ops["kx"] ** 2 * T[0] + ops["ky"] ** 2 * T[1]
          + ops["kz"] ** 2 * T[2]
          + 2.0 * (ops["kx"] * ops["ky"] * T[3]
                   + ops["kx"] * ops["kz"] * T[4]
                   + ops["ky"] * ops["kz"] * T[5]))
    p_hat = -cfg.rho * kk * ops["inv_k2"]
    return inv(p_hat[None])[0]


def simulate_strided(cfg: Spectral3DConfig, u0: Array, n_frames: int,
                     stride: int = 1, spinup: int = 0):
    """TRACEABLE strided rollout from a physical (3, nx, ny, nz) velocity:
    (u, v, w, p) stacked (n_frames, nx, ny, nz), materializing ONLY the
    saved frames. Frame i is the state after 1 + spinup + i*stride steps —
    identical frame semantics to the 2D family
    (spectral_periodic.simulate_strided)."""
    step, _ = make_step(cfg)

    def emit(c):
        u = fields_from_hat(cfg, c[0])
        return u[0], u[1], u[2], pressure_from_hat(cfg, c[0])

    def advance(c, n):
        c, _ = jax.lax.scan(lambda cc, _: (step(cc)[0], None), c, None,
                            length=n)
        return c

    carry = carry_from_velocity(cfg, jnp.asarray(u0, cfg.real_dtype))
    carry = advance(carry, 1 + spinup)
    first = emit(carry)

    def outer(c, _):
        c = advance(c, stride)
        return c, emit(c)

    _, rest = jax.lax.scan(outer, carry, None, length=n_frames - 1)
    return tuple(jnp.concatenate([f[None], r])
                 for f, r in zip(first, rest))


# ---------------------------------------------------------------------------
# Initial conditions (host-side numpy: seeded, reproducible, off-device —
# same rationale as spectral_periodic.decaying_turbulence_vorticity)
# ---------------------------------------------------------------------------

def taylor_green_velocity(cfg: Spectral3DConfig, k: int = 1) -> Array:
    """The canonical 3D Taylor-Green vortex (Brachet et al. 1983):
    u = sin(kx)cos(ky)cos(kz), v = -cos(kx)sin(ky)cos(kz), w = 0.
    Solenoidal by construction; the standard transition-to-turbulence DNS
    benchmark at nu = 1/1600."""
    x = 2.0 * np.pi * np.arange(cfg.nx) / cfg.nx
    y = 2.0 * np.pi * np.arange(cfg.ny) / cfg.ny
    z = 2.0 * np.pi * np.arange(cfg.nz) / cfg.nz
    X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
    u = np.stack([np.sin(k * X) * np.cos(k * Y) * np.cos(k * Z),
                  -np.cos(k * X) * np.sin(k * Y) * np.cos(k * Z),
                  np.zeros_like(X)])
    return jnp.asarray(u, cfg.real_dtype)


def random_solenoidal_velocity(cfg: Spectral3DConfig, seed: int = 0,
                               k_peak: float = 4.0) -> Array:
    """Random isotropic solenoidal velocity with energy peaked near k_peak:
    u = curl(A) of a random vector potential with a k^2 exp(-(k/kp)^2)
    amplitude spectrum — divergence-free exactly. Normalized to unit max
    speed. Host-side float64 numpy."""
    rng = np.random.default_rng(seed)
    kx = np.fft.fftfreq(cfg.nx, d=1.0 / cfg.nx)[:, None, None]
    ky = np.fft.fftfreq(cfg.ny, d=1.0 / cfg.ny)[None, :, None]
    kz = np.fft.rfftfreq(cfg.nz, d=1.0 / cfg.nz)[None, None, :]
    kmag = np.sqrt(kx**2 + ky**2 + kz**2)
    amp = kmag**2 * np.exp(-0.5 * (kmag / k_peak) ** 2)
    shape = amp.shape
    A_hat = amp * np.exp(1j * rng.uniform(0, 2 * np.pi, (3,) + shape))
    # u = curl A in spectral space
    u_hat = np.stack([1j * (ky * A_hat[2] - kz * A_hat[1]),
                      1j * (kz * A_hat[0] - kx * A_hat[2]),
                      1j * (kx * A_hat[1] - ky * A_hat[0])])
    u = np.fft.irfftn(u_hat, s=(cfg.nx, cfg.ny, cfg.nz), axes=(1, 2, 3))
    u = u / np.abs(u).max()
    return jnp.asarray(u, cfg.real_dtype)


def kolmogorov_fixed_point_velocity(cfg: Spectral3DConfig) -> Array:
    """The laminar Kolmogorov-flow fixed point u = amp/(nu k^2) sin(ky) x_hat
    of the forced equations (forcing='kolmogorov') — validation IC."""
    if cfg.forcing != "kolmogorov":
        raise ValueError("fixed point is defined for forcing='kolmogorov'")
    y = 2.0 * np.pi * np.arange(cfg.ny) / cfg.ny
    k = cfg.forcing_k
    u = np.zeros((3, cfg.nx, cfg.ny, cfg.nz))
    u[0] = (cfg.forcing_amp / (cfg.nu * k * k)
            * np.sin(k * y))[None, :, None]
    return jnp.asarray(u, cfg.real_dtype)


# ---------------------------------------------------------------------------
# Diagnostics
# ---------------------------------------------------------------------------

def _hermitian_weights_np(cfg: Spectral3DConfig) -> np.ndarray:
    """Conjugate-pair weights of the rfft z-half-spectrum in the active
    layout: interior kz modes represent two full-spectrum modes."""
    nzh = cfg.nz // 2 + 1
    w = np.full(nzh, 2.0)
    w[0] = 1.0
    if cfg.nz % 2 == 0:
        w[-1] = 1.0
    if cfg.compact:
        w = w[:_compact_meta(cfg)[2]]
    return w[None, None, :]


def energy(cfg: Spectral3DConfig, u_hat: Array) -> Array:
    """Total kinetic energy (1/2) <|u|^2> from the spectrum (Parseval)."""
    w = jnp.asarray(_hermitian_weights_np(cfg), cfg.real_dtype)
    norm = float(cfg.nx * cfg.ny * cfg.nz) ** 2  # python float: int32-safe
    return 0.5 * jnp.sum((u_hat.real**2 + u_hat.imag**2) * w) / norm


def enstrophy(cfg: Spectral3DConfig, u_hat: Array) -> Array:
    """(1/2) <|omega|^2>; the dissipation rate is eps = 2 nu Z."""
    ops = make_ops(cfg)
    w_hat = vorticity_from_velocity_hat(ops, u_hat)
    w = jnp.asarray(_hermitian_weights_np(cfg), cfg.real_dtype)
    norm = float(cfg.nx * cfg.ny * cfg.nz) ** 2  # python float: int32-safe
    return 0.5 * jnp.sum((w_hat.real**2 + w_hat.imag**2) * w) / norm


def divergence_max(cfg: Spectral3DConfig, u_hat: Array) -> Array:
    """Max |div u| in physical space — ~0 by construction (Leray form);
    the rollout-fidelity gate, as in the 2D family."""
    ops = make_ops(cfg)
    _, inv = make_transforms(cfg)
    div_hat = (_ik_mul(ops["kx"], u_hat[0]) + _ik_mul(ops["ky"], u_hat[1])
               + _ik_mul(ops["kz"], u_hat[2]))
    return jnp.max(jnp.abs(inv(div_hat[None])[0]))


def energy_spectrum(cfg: Spectral3DConfig, u_hat: Array):
    """Shell-binned isotropic kinetic-energy spectrum E(k) — the fidelity
    observable the north star gates on, in its 3D form."""
    ops = make_ops(cfg)
    w = jnp.asarray(_hermitian_weights_np(cfg), cfg.real_dtype)
    norm = float(cfg.nx * cfg.ny * cfg.nz) ** 2  # python float: int32-safe
    e_density = 0.5 * jnp.sum(
        (u_hat.real**2 + u_hat.imag**2), axis=0) * w / norm
    k_mag = jnp.sqrt(ops["kx"]**2 + ops["ky"]**2 + ops["kz"]**2)
    nbins = min(cfg.nx, cfg.ny, cfg.nz) // 2 + 1
    k_idx = jnp.clip(jnp.round(k_mag).astype(jnp.int32), 0, nbins - 1)
    spec = jnp.zeros(nbins, cfg.real_dtype).at[k_idx.ravel()].add(
        e_density.ravel())
    return jnp.arange(nbins), spec


# ---------------------------------------------------------------------------
# Family-standard API wrapper
# ---------------------------------------------------------------------------

class NavierStokesSystem3D:
    """API wrapper matching the other families: simulate() -> (u, v, w, p)
    stacked (nt, nx, ny, nz) rollouts. For production horizons use
    simulate_strided (saved-frames-only memory)."""

    def __init__(self, u_ic: Array, nt=100, nx=64, ny=64, nz=64, dt=1e-3,
                 nu=6.25e-4, rho=1.0, dealias=True, dtype="float32",
                 transform="fft", matmul_precision="high",
                 forcing="none", forcing_k=4, forcing_amp=0.1,
                 use_pallas_transform=False):
        self.cfg = Spectral3DConfig(
            nt=nt, nx=nx, ny=ny, nz=nz, dt=dt, nu=nu, rho=rho,
            dealias=dealias, dtype=dtype, transform=transform,
            matmul_precision=matmul_precision, forcing=forcing,
            forcing_k=forcing_k, forcing_amp=forcing_amp,
            use_pallas_transform=use_pallas_transform)
        self._u_ic = jnp.asarray(u_ic, self.cfg.real_dtype)
        self.carry0 = init_from_velocity(self.cfg, self._u_ic)
        cfg = self.cfg
        self._simulate_hat = jax.jit(partial(simulate_hat, cfg))
        self._final = jax.jit(partial(rollout_final, cfg))
        self._strided = jax.jit(partial(simulate_strided, cfg),
                                static_argnames=("n_frames", "stride",
                                                 "spinup"))
        self._fields = jax.jit(jax.vmap(partial(fields_from_hat, cfg)))
        self._pressure = jax.jit(jax.vmap(partial(pressure_from_hat, cfg)))

    def simulate(self):
        u_hats = self._simulate_hat(self.carry0)
        vel = self._fields(u_hats)  # (nt, 3, nx, ny, nz)
        p = self._pressure(u_hats)
        return vel[:, 0], vel[:, 1], vel[:, 2], p

    def simulate_strided(self, n_frames, stride=1, spinup=0, u_ic=None):
        u = self._u_ic if u_ic is None else jnp.asarray(
            u_ic, self.cfg.real_dtype)
        return self._strided(u, n_frames=n_frames, stride=stride,
                             spinup=spinup)

    def final_state(self):
        return self._final(self.carry0)
