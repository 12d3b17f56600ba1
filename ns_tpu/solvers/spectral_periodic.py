"""Periodic Fourier pseudospectral Navier-Stokes — the TPU showcase solver.

This family is NEW capability mandated by the north-star configs
(BASELINE.json: "chorin_spectral: periodic decaying turbulence /
Taylor-Green 256^2, FFT Poisson"; scale target 1024^2 at >1e9
cell-updates/sec/chip). The reference has no periodic solver; this is the
TPU-native completion of its Chorin-spectral family for the periodic case.

Formulation: 2D incompressible NSE in vorticity-streamfunction form on
[0, 2*pi)^2:

    d(omega)/dt + u . grad(omega) = nu * Lap(omega)
    Lap(psi) = -omega,  u = d(psi)/dy,  v = -d(psi)/dx

The FFT *is* the Chorin projection here: velocities derived from psi are
exactly divergence-free, and the "pressure solve" is the diagonal inverse
Laplacian 1/k^2 — one elementwise multiply instead of the reference's SOR /
Uzawa iteration (the FFT-inverse-Laplacian path named in the north star).

Time integration: integrating-factor for the viscous term (exact:
exp(-nu k^2 dt)) + Adams-Bashforth-2 for advection — unconditionally stable
in diffusion, one nonlinear evaluation per step. The nonlinear term is
computed pseudospectrally with 2/3-rule dealiasing.

TPU design notes:
  - everything is real-to-complex rfft2 work: ~6 transforms/step, all
    MXU/VPU-friendly XLA ops; a full rollout jits to one program with the
    step under lax.scan.
  - state is the vorticity spectrum (rfft layout), so the scan carry is
    minimal (nx * (ny/2+1) complex).
  - float32 by default (TPU-native); float64 available for validation.
  - leading batch axes broadcast: the same step runs ensembles under vmap /
    shard_map (ns_tpu/parallel) without modification.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SpectralPeriodicConfig:
    nt: int = 200
    nx: int = 256
    ny: int = 256
    dt: float = 0.001
    nu: float = 1e-3
    rho: float = 1.0  # kept for API symmetry with the other families
    dealias: bool = True
    dtype: str = "float32"  # 'float32' | 'float64'
    # 'fft': XLA FFT (default). 'matmul': DFT as MXU matmuls in the same
    # rfft2 half-spectrum layout — on TPU v5e the systolic array beats
    # XLA's FFT at every size measured (1024^2 rollouts: 1.30 Gcups fft vs
    # 3.23 bf16 / 1.61 bf16x3 / 0.93 f32 matmul). 'auto': pick the engine
    # from the measured crossover (RESULTS.md "Steady-state throughput"):
    # matmul + compact carry while the grid is under the ~8k^2 extrapolated
    # FFT crossover (the O(N^3) DFT work still beats the O(N^2 log N) FFT
    # 4x at 2048^2), FFT beyond; resolved at construction so downstream
    # code only ever sees a concrete engine.
    transform: str = "fft"
    # matmul-DFT precision: 'default' (bf16, ~5e-3 rel), 'high' (bf16x3,
    # ~3e-5 rel — the recommended speed/fidelity point), 'highest' (f32).
    # Divergence-free-ness is exact in all modes (streamfunction form).
    matmul_precision: str = "high"
    # Carry the dealias-truncated spectrum compactly through the rollout
    # (matmul+dealias only): drops the per-transform pad/scatter and
    # shrinks every elementwise op ~4.5x. The scan carry is then
    # (Rx, kyc) instead of (nx, ny//2+1); expand_compact() restores the
    # rfft2 layout for diagnostics.
    compact_spectrum: bool = False
    # Real-GEMM engine (compact_spectrum only): spectra carried as stacked
    # (2, Rx, kyc) real/imag arrays and every transform expressed as ONE
    # real block-matrix GEMM. An XLA complex matmul lowers to 4 real
    # matmuls; the forward transform's input is real (imag = 0), so the
    # complex formulation wastes half of stage 1 and the real-part-only
    # inverse wastes half of its stage 2 — the block form does
    # fwd: (nx,ny)@(ny,2kyc) then (2Rx,2nx)@(2nx,kyc)
    # inv: (2nx,2Rx)@(2Rx,kyc) then (nx,2kyc)@(2kyc,ny)
    # = 2/3 the MACs of the complex path, as larger single GEMMs, with no
    # complex dtype anywhere in the hot loop. Numerically identical modulo
    # summation order (validated elementwise in f64 in tests).
    real_gemm: bool = False

    # Constant-in-time body forcing, vorticity form — turns the decaying
    # configs into statistically-stationary turbulence (the reference has
    # no forced runs; this is the standard sustained-turbulence benchmark
    # setting). The forcing spectrum is a precomputed device constant
    # added to the advective RHS, so a forced step costs the same as an
    # unforced one.
    #   'none'        unforced (default; reference behavior)
    #   'kolmogorov'  body force (amp*sin(k*y), 0) -> vorticity forcing
    #                 f_w = -amp*k*cos(k*y); laminar fixed point
    #                 w_s = f_w/(nu*k^2) (classical Kolmogorov flow)
    #   'fno'         f_w = amp*(sin(k*(x+y)) + cos(k*(x+y))) — the
    #                 forcing of the standard FNO Navier-Stokes benchmark
    #                 (Li et al. 2021), directly in vorticity space
    forcing: str = "none"
    forcing_k: int = 4
    forcing_amp: float = 0.1

    # grid size at which the matmul-DFT's O(N^3) transform work crosses
    # the FFT's O(N^2 log N) on TPU (measured 4x matmul advantage at
    # 2048^2 extrapolates to parity near 8k^2 — RESULTS.md)
    AUTO_FFT_CROSSOVER = 8192

    def __post_init__(self):
        if self.forcing not in ("none", "kolmogorov", "fno"):
            raise ValueError(f"forcing must be 'none'|'kolmogorov'|'fno', "
                             f"got {self.forcing!r}")
        if self.forcing != "none" and self.forcing_k < 1:
            raise ValueError(f"forcing_k must be >= 1, got {self.forcing_k}")
        if self.transform == "auto":
            if (max(self.nx, self.ny) < self.AUTO_FFT_CROSSOVER
                    and self.dealias):
                object.__setattr__(self, "transform", "matmul")
                object.__setattr__(self, "compact_spectrum", True)
            else:
                # FFT wins past the crossover; without dealiasing the
                # compact truncated layout doesn't exist either
                object.__setattr__(self, "transform", "fft")
                object.__setattr__(self, "compact_spectrum", False)
        if self.transform not in ("fft", "matmul"):
            raise ValueError(f"transform must be 'fft'|'matmul'|'auto', "
                             f"got {self.transform!r}")

    @property
    def real_dtype(self):
        return jnp.float64 if self.dtype == "float64" else jnp.float32

    @property
    def complex_dtype(self):
        return jnp.complex128 if self.dtype == "float64" else jnp.complex64


def _wavenumbers_np(cfg: SpectralPeriodicConfig):
    """kx (nx,1), ky (1, ny//2+1) integer wavenumbers for rfft2 layout,
    host-side numpy (device puts happen once in make_ops — device->host
    readbacks are avoided entirely; the axon transfer path does not support
    them for all layouts)."""
    kx = np.fft.fftfreq(cfg.nx, d=1.0 / cfg.nx)[:, None]
    ky = np.fft.rfftfreq(cfg.ny, d=1.0 / cfg.ny)[None, :]
    return kx, ky


def _dealias_mask(cfg: SpectralPeriodicConfig):
    """2/3-rule mask in the rfft2 layout."""
    kx = np.fft.fftfreq(cfg.nx, d=1.0 / cfg.nx)
    ky = np.fft.rfftfreq(cfg.ny, d=1.0 / cfg.ny)
    mx = np.abs(kx) < cfg.nx / 3.0
    my = np.abs(ky) < cfg.ny / 3.0
    return mx[:, None] & my[None, :]


def forcing_vorticity_np(cfg: SpectralPeriodicConfig):
    """Host-side (float64 numpy) vorticity-space forcing field f_w(x, y)
    on the 2*pi-periodic grid, or None when cfg.forcing == 'none'."""
    if cfg.forcing == "none":
        return None
    x = 2.0 * np.pi * np.arange(cfg.nx)[:, None] / cfg.nx
    y = 2.0 * np.pi * np.arange(cfg.ny)[None, :] / cfg.ny
    k, amp = cfg.forcing_k, cfg.forcing_amp
    if cfg.forcing == "kolmogorov":
        # curl of the body force (amp*sin(k*y), 0)
        return -amp * k * np.cos(k * y) + 0.0 * x
    return amp * (np.sin(k * (x + y)) + np.cos(k * (x + y)))


def _forcing_hat_np(cfg: SpectralPeriodicConfig):
    """Forcing spectrum in the full rfft2 layout (complex128 host numpy),
    dealias-masked, mean mode exactly zero; None when unforced."""
    f = forcing_vorticity_np(cfg)
    if f is None:
        return None
    f_hat = np.fft.rfft2(f)
    if cfg.dealias:
        f_hat = np.where(_dealias_mask(cfg), f_hat, 0.0)
    f_hat[0, 0] = 0.0  # never force the mean (zero analytically; pin fp)
    return f_hat


def make_ops(cfg: SpectralPeriodicConfig):
    """Precompute spectral constants: wavenumbers, 1/k^2, viscous factor,
    dealias mask (and the forcing spectrum when forced). All tiny
    device-resident arrays."""
    kx, ky = _wavenumbers_np(cfg)
    k2 = kx * kx + ky * ky
    with np.errstate(divide="ignore"):
        inv_k2 = np.where(k2 == 0.0, 0.0, 1.0 / np.where(k2 == 0.0, 1.0, k2))
    visc = np.exp(-cfg.nu * k2 * cfg.dt)
    mask = _dealias_mask(cfg) if cfg.dealias else np.ones(k2.shape, bool)
    rdt = cfg.real_dtype
    # only REAL constants cross host->device: the axon transfer layer does
    # not support complex buffers (i*k multiplies are done in real/imag
    # arithmetic inside compiled code — see _ik_mul)
    ops = dict(
        kx=jnp.asarray(kx, rdt), ky=jnp.asarray(ky, rdt),
        k2=jnp.asarray(k2, rdt), inv_k2=jnp.asarray(inv_k2, rdt),
        visc=jnp.asarray(visc, rdt), mask=jnp.asarray(mask),
    )
    f_hat = _forcing_hat_np(cfg)
    if f_hat is not None:
        ops["f_re"] = jnp.asarray(f_hat.real, rdt)
        ops["f_im"] = jnp.asarray(f_hat.imag, rdt)
    return ops


def _ik_mul(k: Array, z: Array) -> Array:
    """i * k * z for real k and complex z, with no complex constants:
    i*(a+bi)*k = -k*b + i*k*a."""
    return jax.lax.complex(-k * z.imag, k * z.real)


# ---------------------------------------------------------------------------
# Transforms: XLA FFT or DFT-by-matmul (MXU path)
# ---------------------------------------------------------------------------

def _dft_constants(cfg: SpectralPeriodicConfig):
    """Host-side (numpy, real/imag split — the axon tunnel cannot move
    complex buffers) DFT matrices reproducing the rfft2 layout:

      forward:  w_hat = Fx @ (w @ Fy_half^T)
      inverse:  w     = Re[(conj(Fx)/nx @ z) @ B],  B[k,j] = c_k/ny e^{+2pi i kj/ny}

    with c_0 = c_{ny/2} = 1 and 2 otherwise (half-spectrum unfolding)."""
    nx, ny = cfg.nx, cfg.ny
    nyh = ny // 2 + 1
    i = np.arange(nx)
    Fx = np.exp(-2j * np.pi * np.outer(i, i) / nx)
    Fx_inv = np.conj(Fx) / nx
    k = np.arange(nyh)
    j = np.arange(ny)
    Fy = np.exp(-2j * np.pi * np.outer(k, j) / ny)        # (nyh, ny)
    c = np.full(nyh, 2.0)
    c[0] = 1.0
    if ny % 2 == 0:
        c[-1] = 1.0
    B = (c[:, None] / ny) * np.exp(2j * np.pi * np.outer(k, j) / ny)
    f32 = np.float32 if cfg.dtype == "float32" else np.float64
    split = lambda M: (M.real.astype(f32), M.imag.astype(f32))
    return dict(Fx=split(Fx), Fx_inv=split(Fx_inv), Fy=split(Fy), B=split(B))


def make_transforms(cfg: SpectralPeriodicConfig):
    """(rfft2_fn, irfft2_fn) per cfg.transform, both in the standard rfft2
    half-spectrum layout."""
    if cfg.transform == "fft":
        shape = (cfg.nx, cfg.ny)
        return (lambda w: jnp.fft.rfft2(w),
                lambda z: jnp.fft.irfft2(z, s=shape))
    if cfg.transform != "matmul":
        raise ValueError(f"transform must be fft|matmul, got {cfg.transform!r}")
    M = _dft_constants(cfg)
    prec = cfg.matmul_precision
    cplx = lambda pair: jax.lax.complex(jnp.asarray(pair[0]), jnp.asarray(pair[1]))
    mm = lambda a, b: jnp.matmul(a, b, precision=prec)
    nx, ny = cfg.nx, cfg.ny
    nyh = ny // 2 + 1

    if not cfg.dealias:
        def fwd(w):
            Fy = cplx(M["Fy"])
            Fx = cplx(M["Fx"])
            t = mm(w.astype(Fy.dtype), Fy.T)
            return mm(Fx, t)

        def inv(z):
            Fx_inv = cplx(M["Fx_inv"])
            B = cplx(M["B"])
            a = mm(mm(Fx_inv, z), B)
            return a.real

        return fwd, inv

    # Dealiased truncation: the 2/3 mask zeroes every |k| >= N/3 mode, so
    # the DFT matmuls only need the kept rows/cols (~1.8x fewer flops).
    # The padded-layout transforms are expressed in terms of the compact
    # ones (single source of truth for the truncation):
    # NOTE: fwd() returns mask * rfft2(w) — initial vorticity content above
    # the 2/3 cutoff is band-limited away at init (physically consistent
    # for a dealiased run; the FFT path carries those modes passively
    # under pure viscous decay).
    cfwd, cinv = make_compact_transforms(cfg)

    def fwd(w):
        return expand_compact(cfg, cfwd(w))

    def inv(z):
        return cinv(gather_compact(cfg, z))

    return fwd, inv


def _compact_meta(cfg: SpectralPeriodicConfig):
    """(rows, kxc, n_neg, kyc) of the dealias-truncated compact layout."""
    kxs = np.fft.fftfreq(cfg.nx, d=1.0 / cfg.nx)
    keep_x = np.abs(kxs) < cfg.nx / 3.0
    kxc = int(keep_x[:cfg.nx // 2].sum())
    n_neg = int(keep_x.sum()) - kxc
    kyc = int((np.abs(np.fft.rfftfreq(cfg.ny, d=1.0 / cfg.ny))
               < cfg.ny / 3.0).sum())
    rows = np.concatenate([np.arange(kxc), np.arange(cfg.nx - n_neg, cfg.nx)])
    return rows, kxc, n_neg, kyc


def make_compact_ops(cfg: SpectralPeriodicConfig):
    """Spectral constants on the compact truncated layout (Rx, kyc); the
    rectangular truncation IS the dealias mask, so no masks remain."""
    rows, kxc, n_neg, kyc = _compact_meta(cfg)
    kx = np.fft.fftfreq(cfg.nx, d=1.0 / cfg.nx)[rows][:, None]
    ky = np.fft.rfftfreq(cfg.ny, d=1.0 / cfg.ny)[:kyc][None, :]
    k2 = kx * kx + ky * ky
    with np.errstate(divide="ignore"):
        inv_k2 = np.where(k2 == 0.0, 0.0, 1.0 / np.where(k2 == 0.0, 1.0, k2))
    visc = np.exp(-cfg.nu * k2 * cfg.dt)
    rdt = cfg.real_dtype
    ops = dict(kx=jnp.asarray(kx, rdt), ky=jnp.asarray(ky, rdt),
               inv_k2=jnp.asarray(inv_k2, rdt), visc=jnp.asarray(visc, rdt))
    f_hat = _forcing_hat_np(cfg)
    if f_hat is not None:
        # compact layout: keep the truncation rows / leading ky block
        f_c = np.concatenate([f_hat[:kxc, :kyc],
                              f_hat[cfg.nx - n_neg:, :kyc]], axis=0)
        ops["f_re"] = jnp.asarray(f_c.real, rdt)
        ops["f_im"] = jnp.asarray(f_c.imag, rdt)
    return ops


def make_compact_transforms(cfg: SpectralPeriodicConfig):
    """(fwd, inv) between physical (nx, ny) and the compact spectrum
    (Rx, kyc) — pure matmuls, no pad/scatter."""
    M = _dft_constants(cfg)
    rows, kxc, n_neg, kyc = _compact_meta(cfg)
    prec = cfg.matmul_precision
    mm = lambda a, b: jnp.matmul(a, b, precision=prec)
    f32 = np.float32 if cfg.dtype == "float32" else np.float64
    split = lambda Mt: (jnp.asarray(Mt.real.astype(f32)),
                        jnp.asarray(Mt.imag.astype(f32)))
    Fx = M["Fx"][0] + 1j * M["Fx"][1]
    Fx_inv = M["Fx_inv"][0] + 1j * M["Fx_inv"][1]
    Fy = M["Fy"][0] + 1j * M["Fy"][1]
    B = M["B"][0] + 1j * M["B"][1]
    Fx_t = split(Fx[rows, :])
    Fxi_t = split(Fx_inv[:, rows])
    Fy_t = split(Fy[:kyc, :])
    B_t = split(B[:kyc, :])

    def fwd(w):
        t = mm(w.astype(cfg.complex_dtype), jax.lax.complex(*Fy_t).T)
        return mm(jax.lax.complex(*Fx_t), t)        # (..., Rx, kyc)

    def inv(z):
        a = mm(jax.lax.complex(*Fxi_t), z)          # (..., nx, kyc)
        return mm(a, jax.lax.complex(*B_t)).real    # (..., nx, ny)

    return fwd, inv


# ---------------------------------------------------------------------------
# Real-GEMM engine: the compact path with every complex matmul re-expressed
# as one real block-matrix GEMM (see SpectralPeriodicConfig.real_gemm)
# ---------------------------------------------------------------------------

def _real_gemm_matrices(cfg: SpectralPeriodicConfig):
    """Block matrices of the stacked real/imag formulation (host numpy):

      fwd:  t2 = w @ FyT_cat             (nx, 2kyc)   [t_re | t_im]
            z2 = FX2 @ [t_re; t_im]      (2Rx, kyc)   [z_re; z_im]
      inv:  a2 = FXI2 @ [z_re; z_im]     (2nx, kyc)   [a_re; a_im]
            w  = [a_re | a_im] @ Bcat    (nx, ny)     Re(a @ B)
    """
    M = _dft_constants(cfg)
    rows, kxc, n_neg, kyc = _compact_meta(cfg)
    Fx = (M["Fx"][0] + 1j * M["Fx"][1])[rows, :]
    Fx_inv = (M["Fx_inv"][0] + 1j * M["Fx_inv"][1])[:, rows]
    Fy = (M["Fy"][0] + 1j * M["Fy"][1])[:kyc, :]
    B = (M["B"][0] + 1j * M["B"][1])[:kyc, :]
    f = np.float32 if cfg.dtype == "float32" else np.float64
    FyT_cat = np.concatenate([Fy.real.T, Fy.imag.T], axis=1)       # (ny,2kyc)
    FX2 = np.block([[Fx.real, -Fx.imag],
                    [Fx.imag, Fx.real]])                           # (2Rx,2nx)
    FXI2 = np.block([[Fx_inv.real, -Fx_inv.imag],
                     [Fx_inv.imag, Fx_inv.real]])                  # (2nx,2Rx)
    Bcat = np.concatenate([B.real, -B.imag], axis=0)               # (2kyc,ny)
    to_dev = lambda a: jnp.asarray(a.astype(f))
    return (to_dev(FyT_cat), to_dev(FX2), to_dev(FXI2), to_dev(Bcat),
            len(rows), kyc)


def make_real_gemm_transforms(cfg: SpectralPeriodicConfig):
    """(fwd, inv) between physical (..., nx, ny) real fields and stacked
    (..., 2, Rx, kyc) real/imag compact spectra — four real GEMMs per
    round trip, batched over leading dims."""
    FyT_cat, FX2, FXI2, Bcat, Rx, kyc = _real_gemm_matrices(cfg)
    prec = cfg.matmul_precision
    mm = lambda a, b: jnp.matmul(a, b, precision=prec)
    nx = cfg.nx

    def fwd(w):
        t2 = mm(w.astype(FyT_cat.dtype), FyT_cat)      # (..., nx, 2kyc)
        tstack = jnp.concatenate(
            [t2[..., :, :kyc], t2[..., :, kyc:]], axis=-2)  # (..., 2nx, kyc)
        z2 = mm(FX2, tstack)                           # (..., 2Rx, kyc)
        return z2.reshape(z2.shape[:-2] + (2, Rx, kyc))

    def inv(z2):
        z = z2.reshape(z2.shape[:-3] + (2 * Rx, kyc))
        a2 = mm(FXI2, z)                               # (..., 2nx, kyc)
        acat = jnp.concatenate(
            [a2[..., :nx, :], a2[..., nx:, :]], axis=-1)    # (..., nx, 2kyc)
        return mm(acat, Bcat)                          # (..., nx, ny)

    return fwd, inv


def _ik_mul2(k: Array, z2: Array) -> Array:
    """i * k * z on the stacked (..., 2, Rx, kyc) layout:
    (re, im) -> (-k*im, k*re). Pure real arithmetic."""
    return jnp.stack([-k * z2[..., 1, :, :], k * z2[..., 0, :, :]], axis=-3)


def compact_real_to_complex(z2: Array) -> Array:
    """Stacked (..., 2, Rx, kyc) real pair -> compact complex spectrum."""
    return jax.lax.complex(z2[..., 0, :, :], z2[..., 1, :, :])


def make_step_compact_real(cfg: SpectralPeriodicConfig):
    """IF-AB2 step on the stacked real compact carry (real_gemm engine).
    Same scheme as make_step_compact; the four inverse transforms of the
    nonlinear term ride one batched GEMM pair."""
    if not (cfg.transform == "matmul" and cfg.dealias
            and cfg.compact_spectrum):
        raise ValueError("real_gemm needs transform='matmul', dealias=True "
                         "and compact_spectrum=True")
    ops = make_compact_ops(cfg)
    fwd, inv = make_real_gemm_transforms(cfg)
    E = ops["visc"]

    def nonlinear(w2):
        return _nonlinear_real(ops, fwd, inv, w2)

    def step(carry):
        w2, N_prev = carry
        N = nonlinear(w2)
        w_new = E * w2 + cfg.dt * (1.5 * E * N - 0.5 * (E * E) * N_prev)
        return (w_new, N), w_new

    return step, ops


def init_from_vorticity_real(cfg: SpectralPeriodicConfig, w0: Array):
    """Thin jitted wrapper over the single carry builder
    (carry_from_vorticity); kept for API stability."""
    if not cfg.real_gemm:
        cfg = dataclasses.replace(cfg, compact_spectrum=True, real_gemm=True)
    return _carry_builder(cfg)(jnp.asarray(w0, cfg.real_dtype))


def expand_compact(cfg: SpectralPeriodicConfig, z: Array) -> Array:
    """Compact (…, Rx, kyc) spectrum -> full rfft2 layout (…, nx, ny//2+1)."""
    rows, kxc, n_neg, kyc = _compact_meta(cfg)
    nyh = cfg.ny // 2 + 1
    out = jnp.zeros(z.shape[:-2] + (cfg.nx, nyh), z.dtype)
    out = out.at[..., :kxc, :kyc].set(z[..., :kxc, :])
    return out.at[..., cfg.nx - n_neg:, :kyc].set(z[..., kxc:, :])


def gather_compact(cfg: SpectralPeriodicConfig, z: Array) -> Array:
    """Full rfft2 layout -> compact (…, Rx, kyc) (inverse of expand_compact
    on the kept modes; off-truncation content is dropped)."""
    rows, kxc, n_neg, kyc = _compact_meta(cfg)
    return jnp.concatenate(
        [z[..., :kxc, :kyc], z[..., cfg.nx - n_neg:, :kyc]], axis=-2)


def _nonlinear_compact(ops, fwd, inv, w_hat):
    """-FFT[u.grad(w)] on the compact complex layout; the four inverse
    transforms ride ONE batched matmul pair (bigger GEMMs, fewer
    dispatches: +5% at 1024^2). Shared by the step and the carry builder."""
    psi = w_hat * ops["inv_k2"]
    stack = jnp.stack([_ik_mul(ops["ky"], psi), -_ik_mul(ops["kx"], psi),
                       _ik_mul(ops["kx"], w_hat), _ik_mul(ops["ky"], w_hat)])
    u, v, wx, wy = inv(stack)
    N = -fwd(u * wx + v * wy)
    if "f_re" in ops:  # constant body forcing rides the advective RHS
        N = N + jax.lax.complex(ops["f_re"], ops["f_im"])
    return N


def _nonlinear_real(ops, fwd, inv, w2):
    """Stacked real/imag (real_gemm) counterpart of _nonlinear_compact."""
    psi = w2 * ops["inv_k2"]
    stack = jnp.stack([_ik_mul2(ops["ky"], psi), _ik_mul2(-ops["kx"], psi),
                       _ik_mul2(ops["kx"], w2), _ik_mul2(ops["ky"], w2)])
    u, v, wx, wy = inv(stack)
    N = -fwd(u * wx + v * wy)
    if "f_re" in ops:  # constant body forcing rides the advective RHS
        N = N + jnp.stack([ops["f_re"], ops["f_im"]], axis=-3)
    return N


def make_step_compact(cfg: SpectralPeriodicConfig):
    """IF-AB2 step on the compact spectrum carry (matmul+dealias only)."""
    if cfg.transform != "matmul" or not cfg.dealias:
        raise ValueError("compact_spectrum needs transform='matmul' and dealias")
    ops = make_compact_ops(cfg)
    fwd, inv = make_compact_transforms(cfg)
    E = ops["visc"]

    def nonlinear(w_hat):
        return _nonlinear_compact(ops, fwd, inv, w_hat)

    def step(carry):
        w_hat, N_prev = carry
        N = nonlinear(w_hat)
        w_new = E * w_hat + cfg.dt * (1.5 * E * N - 0.5 * (E * E) * N_prev)
        return (w_new, N), w_new

    return step, ops


def init_from_vorticity_compact(cfg: SpectralPeriodicConfig, w0: Array):
    """Thin jitted wrapper over the single carry builder
    (carry_from_vorticity); kept for API stability."""
    if not cfg.compact_spectrum or cfg.real_gemm:
        cfg = dataclasses.replace(cfg, compact_spectrum=True, real_gemm=False)
    return _carry_builder(cfg)(jnp.asarray(w0, cfg.real_dtype))


def rollout_final_compact(cfg: SpectralPeriodicConfig, carry0):
    step, _ = make_step_compact(cfg)

    def body(carry, _):
        new_carry, _ = step(carry)
        return new_carry, None

    final, _ = jax.lax.scan(body, carry0, None, length=cfg.nt)
    return final


def velocity_from_vorticity_hat(w_hat: Array, ops) -> Tuple[Array, Array]:
    """u = d(psi)/dy, v = -d(psi)/dx with psi_hat = w_hat / k^2."""
    psi_hat = w_hat * ops["inv_k2"]
    u_hat = _ik_mul(ops["ky"], psi_hat)
    v_hat = -_ik_mul(ops["kx"], psi_hat)
    return u_hat, v_hat


def nonlinear_term(w_hat: Array, ops, cfg, transforms=None) -> Array:
    """N_hat = -FFT[u dw/dx + v dw/dy], dealiased (pseudospectral)."""
    fwd, inv = transforms if transforms is not None else make_transforms(cfg)
    w_hat = jnp.where(ops["mask"], w_hat, 0.0)
    u_hat, v_hat = velocity_from_vorticity_hat(w_hat, ops)
    wx_hat = _ik_mul(ops["kx"], w_hat)
    wy_hat = _ik_mul(ops["ky"], w_hat)
    u = inv(u_hat)
    v = inv(v_hat)
    wx = inv(wx_hat)
    wy = inv(wy_hat)
    adv = u * wx + v * wy
    N_hat = -fwd(adv)
    if "f_re" in ops:  # constant body forcing rides the advective RHS
        N_hat = N_hat + jax.lax.complex(ops["f_re"], ops["f_im"])
    return jnp.where(ops["mask"], N_hat, 0.0)


def make_step(cfg: SpectralPeriodicConfig):
    """One IF-AB2 step on (w_hat, N_prev_hat).

    w_hat^{n+1} = E * (w_hat^n + dt * (3/2 N^n - 1/2 E_flip N^{n-1}))
    with E = exp(-nu k^2 dt); the N^{n-1} term carries one extra E factor so
    both RHS samples live at the same exponential scaling (standard IF-AB2).
    """
    if cfg.real_gemm:
        return make_step_compact_real(cfg)
    if cfg.compact_spectrum:
        return make_step_compact(cfg)

    ops = make_ops(cfg)
    transforms = make_transforms(cfg)
    E = ops["visc"]

    def step(carry):
        w_hat, N_prev = carry
        N = nonlinear_term(w_hat, ops, cfg, transforms)
        w_new = E * w_hat + cfg.dt * (1.5 * E * N - 0.5 * (E * E) * N_prev)
        return (w_new, N), w_new

    return step, ops


def carry_from_vorticity(cfg: SpectralPeriodicConfig, w0: Array):
    """TRACEABLE carry builder for any engine (fft / matmul / compact /
    real_gemm) — used inside larger jitted programs (serving engines,
    exports); init_from_vorticity is the eager-facing jitted wrapper."""
    if cfg.real_gemm:
        fwd, inv = make_real_gemm_transforms(cfg)
        ops = make_compact_ops(cfg)
        w2 = fwd(w0.astype(cfg.real_dtype))
        return w2, _nonlinear_real(ops, fwd, inv, w2)
    if cfg.compact_spectrum:
        fwd, inv = make_compact_transforms(cfg)
        ops = make_compact_ops(cfg)
        w_hat = fwd(w0.astype(cfg.real_dtype))
        return w_hat, _nonlinear_compact(ops, fwd, inv, w_hat)
    ops = make_ops(cfg)
    transforms = make_transforms(cfg)
    w_hat = transforms[0](w0.astype(cfg.real_dtype))
    return w_hat, nonlinear_term(w_hat, ops, cfg, transforms)


@lru_cache(maxsize=16)
def _carry_builder(cfg: SpectralPeriodicConfig):
    """One jitted carry builder per config. A fresh `jax.jit(partial(...))`
    per call would recompile the init program (forward transform +
    nonlinear eval) for EVERY trajectory of a multi-seed run and leave a
    dead cache entry behind each time; keying on the frozen config gives
    cross-call program reuse with a bounded footprint."""
    return jax.jit(partial(carry_from_vorticity, cfg))


def physical_from_carry(cfg: SpectralPeriodicConfig, w_spec: Array) -> Array:
    """Traceable spectrum -> physical vorticity for any engine's carry."""
    if cfg.real_gemm:
        _, inv = make_real_gemm_transforms(cfg)
        return inv(w_spec)
    if cfg.compact_spectrum:
        _, inv = make_compact_transforms(cfg)
        return inv(w_spec)
    return jnp.fft.irfft2(w_spec, s=(cfg.nx, cfg.ny))


def init_from_vorticity(cfg: SpectralPeriodicConfig, w0: Array):
    """Build the scan carry from a physical-space vorticity field; the AB2
    history seeds with the first nonlinear evaluation (self-start).
    Jitted as one program — eager complex dispatch is avoided throughout
    this module (axon TPU reliability). With cfg.compact_spectrum the
    carry is the compact truncated spectrum (see expand_compact)."""
    return _carry_builder(cfg)(jnp.asarray(w0, cfg.real_dtype))


def simulate_hat(cfg: SpectralPeriodicConfig, carry0):
    """Rollout returning the stacked vorticity spectra (nt, nx, ny//2+1)."""
    step, _ = make_step(cfg)

    def body(carry, _):
        return step(carry)

    _, w_hats = jax.lax.scan(body, carry0, None, length=cfg.nt)
    return w_hats


def rollout_final(cfg: SpectralPeriodicConfig, carry0):
    """Rollout returning only the final carry (bench path — no O(nt) HBM)."""
    step, _ = make_step(cfg)

    def body(carry, _):
        new_carry, _ = step(carry)
        return new_carry, None

    final, _ = jax.lax.scan(body, carry0, None, length=cfg.nt)
    return final


def simulate_strided(cfg: SpectralPeriodicConfig, w0: Array,
                     n_frames: int, stride: int = 1, spinup: int = 0):
    """TRACEABLE strided rollout from a physical vorticity field:
    (u, v, p) stacked (n_frames, nx, ny), materializing ONLY the saved
    frames — a full simulate() stack of n_frames*stride frames hits the
    HBM ceiling long before compute does. Frame i is the state after
    1 + spinup + i*stride solver steps, so stride=1, spinup=0 reproduces
    simulate()'s frame selection exactly. `spinup` discards an initial
    transient (forced runs: about one viscous equilibration time,
    1/(nu*k^2*dt) steps — docs/tutorial.md); `stride` sets the saved
    cadence (surrogate training wants frames the flow actually moves
    between, RESULTS.md 'Round-3 recalibration'). Works on every engine
    (fft / compact / real_gemm)."""
    step, _ = make_step(cfg)

    def to_full(z):
        if cfg.real_gemm:
            z = compact_real_to_complex(z)
        if cfg.compact_spectrum:
            z = expand_compact(cfg, z)
        return z

    def emit(c):
        w_spec = to_full(c[0])
        u, v, _w = fields_from_hat(cfg, w_spec)
        return u, v, pressure_from_hat(cfg, w_spec)

    def advance(c, n):
        c, _ = jax.lax.scan(lambda cc, _: (step(cc)[0], None), c, None,
                            length=n)
        return c

    carry = carry_from_vorticity(cfg, jnp.asarray(w0, cfg.real_dtype))
    carry = advance(carry, 1 + spinup)
    first = emit(carry)

    def outer(c, _):
        c = advance(c, stride)
        return c, emit(c)

    _, rest = jax.lax.scan(outer, carry, None, length=n_frames - 1)
    return tuple(jnp.concatenate([f[None], r])
                 for f, r in zip(first, rest))


def fields_from_hat(cfg: SpectralPeriodicConfig, w_hat: Array):
    """(u, v, omega) physical fields from a vorticity spectrum."""
    ops = make_ops(cfg)
    shape = (cfg.nx, cfg.ny)
    u_hat, v_hat = velocity_from_vorticity_hat(w_hat, ops)
    return (jnp.fft.irfft2(u_hat, s=shape),
            jnp.fft.irfft2(v_hat, s=shape),
            jnp.fft.irfft2(w_hat, s=shape))


def pressure_from_hat(cfg: SpectralPeriodicConfig, w_hat: Array) -> Array:
    """Recover pressure from the velocity field: Lap(p) = -rho * div(u.grad u)
    — the periodic analogue of the reference's pressure-Poisson solve, done
    with the diagonal FFT inverse Laplacian."""
    ops = make_ops(cfg)
    shape = (cfg.nx, cfg.ny)
    u_hat, v_hat = velocity_from_vorticity_hat(w_hat, ops)
    u = jnp.fft.irfft2(u_hat, s=shape)
    v = jnp.fft.irfft2(v_hat, s=shape)
    ux = jnp.fft.irfft2(_ik_mul(ops["kx"], u_hat), s=shape)
    uy = jnp.fft.irfft2(_ik_mul(ops["ky"], u_hat), s=shape)
    vx = jnp.fft.irfft2(_ik_mul(ops["kx"], v_hat), s=shape)
    vy = jnp.fft.irfft2(_ik_mul(ops["ky"], v_hat), s=shape)
    rhs = -cfg.rho * (ux * ux + 2.0 * uy * vx + vy * vy)
    rhs_hat = jnp.fft.rfft2(rhs)
    p_hat = -rhs_hat * ops["inv_k2"]
    return jnp.fft.irfft2(p_hat, s=shape)


# ---------------------------------------------------------------------------
# Initial conditions
# ---------------------------------------------------------------------------

def taylor_green_vorticity(cfg: SpectralPeriodicConfig, k: int = 1) -> Array:
    """Taylor-Green vortex: u = sin(kx)cos(ky), v = -cos(kx)sin(ky)
    -> omega = 2k sin(kx) sin(ky). Analytic decay exp(-2 nu k^2 t)."""
    x = np.arange(cfg.nx) * 2.0 * np.pi / cfg.nx
    y = np.arange(cfg.ny) * 2.0 * np.pi / cfg.ny
    X, Y = np.meshgrid(x, y, indexing="ij")
    return jnp.asarray(2.0 * k * np.sin(k * X) * np.sin(k * Y), cfg.real_dtype)


def decaying_turbulence_vorticity(cfg: SpectralPeriodicConfig, seed: int = 0,
                                  k_peak: float = 10.0) -> Array:
    """Random isotropic vorticity with energy peaked near k_peak — the
    standard 2D decaying-turbulence initial condition.

    Built entirely host-side in NumPy (seeded, reproducible): IC generation
    is setup, and keeping it off-device avoids eager complex dispatch, which
    the axon TPU path handles unreliably."""
    rng = np.random.default_rng(seed)
    kx = np.fft.fftfreq(cfg.nx, d=1.0 / cfg.nx)
    ky = np.fft.rfftfreq(cfg.ny, d=1.0 / cfg.ny)
    k = np.sqrt(kx[:, None] ** 2 + ky[None, :] ** 2)
    amp = k**3 * np.exp(-0.5 * (k / k_peak) ** 2)
    phase = rng.uniform(0.0, 2 * np.pi, size=amp.shape)
    w_hat = amp * np.exp(1j * phase)
    w = np.fft.irfft2(w_hat, s=(cfg.nx, cfg.ny))
    w = w / np.abs(w).max()  # normalize to unit max vorticity
    return jnp.asarray(w, cfg.real_dtype)


# ---------------------------------------------------------------------------
# Diagnostics
# ---------------------------------------------------------------------------

def hermitian_weights(ny: int) -> np.ndarray:
    """Conjugate-pair weights of the rfft half-spectrum: interior ky modes
    represent two full-spectrum modes and count twice."""
    weights = np.full(ny // 2 + 1, 2.0)
    weights[0] = 1.0
    if ny % 2 == 0:
        weights[-1] = 1.0
    return weights[None, :]


def energy_spectrum(cfg: SpectralPeriodicConfig, w_hat: Array):
    """Isotropic kinetic-energy spectrum E(k) — the fidelity observable the
    north star gates on (BASELINE.json: vorticity spectra tracking)."""
    ops = make_ops(cfg)
    u_hat, v_hat = velocity_from_vorticity_hat(w_hat, ops)
    w = jnp.asarray(hermitian_weights(cfg.ny), cfg.real_dtype)
    e_density = 0.5 * (jnp.abs(u_hat) ** 2 + jnp.abs(v_hat) ** 2) * w
    k_mag = jnp.sqrt(ops["kx"] ** 2 + ops["ky"] ** 2)
    k_bins = jnp.arange(0, cfg.nx // 2 + 1)
    k_idx = jnp.clip(jnp.round(k_mag).astype(jnp.int32), 0, cfg.nx // 2)
    spec = jnp.zeros(cfg.nx // 2 + 1, cfg.real_dtype).at[k_idx.ravel()].add(
        e_density.ravel().real)
    return k_bins, spec / (cfg.nx * cfg.ny) ** 2


def divergence_max(cfg: SpectralPeriodicConfig, w_hat: Array) -> Array:
    """Max |div u| — identically ~0 by construction (streamfunction form);
    reported as the rollout-fidelity gate."""
    ops = make_ops(cfg)
    u_hat, v_hat = velocity_from_vorticity_hat(w_hat, ops)
    div_hat = _ik_mul(ops["kx"], u_hat) + _ik_mul(ops["ky"], v_hat)
    return jnp.max(jnp.abs(jnp.fft.irfft2(div_hat, s=(cfg.nx, cfg.ny))))


class NavierStokesSystem:
    """API wrapper matching the other families: simulate() -> (u, v, p)
    stacked (nt, nx, ny) rollouts."""

    def __init__(self, w_ic: Array, nt=200, nx=256, ny=256, dt=0.001,
                 nu=1e-3, rho=1.0, dealias=True, dtype="float32",
                 transform="fft", matmul_precision="high",
                 compact_spectrum=False, real_gemm=False,
                 forcing="none", forcing_k=4, forcing_amp=0.1):
        self.cfg = SpectralPeriodicConfig(
            nt=nt, nx=nx, ny=ny, dt=dt, nu=nu, rho=rho, dealias=dealias,
            dtype=dtype, transform=transform,
            matmul_precision=matmul_precision,
            compact_spectrum=compact_spectrum or real_gemm,
            real_gemm=real_gemm, forcing=forcing, forcing_k=forcing_k,
            forcing_amp=forcing_amp)
        self._w_ic = jnp.asarray(w_ic, self.cfg.real_dtype)
        self.carry0 = init_from_vorticity(self.cfg, w_ic)
        self._strided = jax.jit(partial(simulate_strided, self.cfg),
                                static_argnames=("n_frames", "stride",
                                                 "spinup"))
        self._simulate_hat = jax.jit(partial(simulate_hat, self.cfg))
        self._final = jax.jit(partial(rollout_final, self.cfg))
        # jitted once here: a fresh jit(partial(...)) per call would key the
        # jit cache on the new partial object and recompile every invocation
        cfg = self.cfg

        @jax.jit
        def expand(z):
            if cfg.real_gemm:
                z = compact_real_to_complex(z)
            return expand_compact(cfg, z)

        self._expand = expand
        # jitted here, NOT vmapped eagerly in simulate(): un-jitted vmap
        # dispatches the complex FFT ops one by one, which the axon TPU
        # transfer layer handles unreliably (see module docstring hazards)
        self._fields = jax.jit(jax.vmap(partial(fields_from_hat, cfg)))
        self._pressure = jax.jit(jax.vmap(partial(pressure_from_hat, cfg)))
        self._w_phys = jax.jit(jax.vmap(
            lambda h: jnp.fft.irfft2(h, s=(cfg.nx, cfg.ny))))

    def simulate(self):
        return self.simulate_from_carry(self.carry0)

    def simulate_from(self, w_ic: Array):
        """simulate() from a different initial vorticity, reusing this
        instance's compiled programs — a fresh instance per initial
        condition would re-jit the whole rollout (the jit cache keys on
        the per-instance partial objects, see __init__)."""
        return self.simulate_from_carry(init_from_vorticity(self.cfg, w_ic))

    def simulate_from_carry(self, carry0):
        w_hats = self._simulate_hat(carry0)
        if self.cfg.compact_spectrum:
            w_hats = self._expand(w_hats)
        u, v, w = self._fields(w_hats)
        p = self._pressure(w_hats)
        return u, v, p

    def simulate_strided(self, n_frames, stride=1, spinup=0, w_ic=None):
        """Strided/spun-up (u, v, p) rollout reusing this instance's
        compiled program across initial conditions (one executable per
        (n_frames, stride, spinup) combination) — see the module-level
        simulate_strided for frame semantics."""
        w = self._w_ic if w_ic is None else jnp.asarray(
            w_ic, self.cfg.real_dtype)
        return self._strided(w, n_frames=n_frames, stride=stride,
                             spinup=spinup)

    def simulate_vorticity(self):
        w_hats = self._simulate_hat(self.carry0)
        if self.cfg.compact_spectrum:
            w_hats = self._expand(w_hats)
        return self._w_phys(w_hats)

    def final_state(self):
        return self._final(self.carry0)
