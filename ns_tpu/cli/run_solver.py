"""Run a classical solver rollout and save the reference-format npz.

Named presets reproduce the reference drivers' exact default physics
(SURVEY.md §5 config system: "preserving these exact defaults as named
presets"):

  direct_fd        — direct_fd/simulate.py:151-185 (nt=200 nit=50 50x50
                     cavity)
  chorin_fd        — chorin_fd/simulate.py:278-315 (nt=200 nit=200 51x51,
                     semi_implicit; --method explicit for the other mode)
  chorin_spectral  — chorin_spectral/simulate.py:584-612 (51x51 Dirichlet
                     cavity; add --corrected for the stable operator mode)
  taylor_green     — periodic Fourier showcase (BASELINE.json config)
  decaying_turbulence — periodic 2D turbulence at --nx resolution
  taylor_green_3d  — 3D Taylor-Green vortex (the canonical DNS benchmark;
                     nu defaults to 1/1600). npz carries u/v/w/p.
  decaying_turbulence_3d — 3D isotropic decaying turbulence

Examples:
  python -m ns_tpu.cli.run_solver direct_fd --out data.npz
  python -m ns_tpu.cli.run_solver chorin_fd --method semi_implicit
  python -m ns_tpu.cli.run_solver taylor_green --nx 256 --nt 500
  python -m ns_tpu.cli.run_solver taylor_green_3d --nx 128 --nt 100
"""

import argparse
import time

import numpy as np

from ns_tpu.core.bc import dirichlet, neumann
from ns_tpu.io.npz import save_rollout
from ns_tpu.utils import to_host


def cavity_bcs(dx, dy):
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dy),
            neumann(0, "left", dx, dy), neumann(0, "right", dx, dy)]
    return u_bc, v_bc, p_bc


def _run_cavity(sys_, args):
    """Run a cavity-family wrapper's rollout, optionally streamed to disk
    (--stream-dir: memmapped per-field .npy, horizons larger than device
    memory), under the divergence guard (utils/guard.py: freeze at last
    good state, report the first bad step instead of poisoning the
    rollout), or with a per-chunk progress bar (--progress: the
    reference-tqdm analogue, utils/progress.py)."""
    if args.progress and args.guard and not args.stream_dir:
        print("note: --progress is ignored under --guard (the guarded "
              "rollout runs as one fused scan)")
    if args.progress and not (args.stream_dir or args.guard):
        if hasattr(sys_, "state0"):
            from ns_tpu.utils.progress import chunked_simulate
            outs, _ = chunked_simulate(
                sys_._step, sys_.state0, args.nt,
                lambda s: {"u": s.u, "v": s.v, "p": s.p},
                chunk=args.chunk, desc=args.family)
            return outs["u"], outs["v"], outs["p"]
        print("progress: periodic wrapper exposes no FlowState; use "
              "--stream-dir for chunked periodic rollouts")
    if args.stream_dir and hasattr(sys_, "state0"):
        if args.guard:
            print("note: --guard is ignored when streaming (the guard "
                  "needs the scan carry; stream chunks run unguarded)")
        from ns_tpu.io.streaming import stream_rollout
        stream_rollout(sys_._step, sys_.state0, args.nt,
                       lambda s: {"u": s.u, "v": s.v, "p": s.p},
                       args.stream_dir)
        return None, None, None
    if not args.guard:
        return sys_.simulate()
    if not hasattr(sys_, "state0"):
        # periodic spectral wrapper carries a spectral state, not a
        # FlowState; its corrected scheme is unconditionally stable and
        # ungated here
        print("guard: not supported for the periodic families; running "
              "unguarded")
        return sys_.simulate()
    import jax
    from ns_tpu.utils.guard import guarded_rollout
    final, states = jax.jit(lambda s0: guarded_rollout(
        sys_._step, s0, args.nt, max_abs=args.guard_max_abs))(sys_.state0)
    if bool(to_host(final.bad)):
        print(f"guard: divergence at step {int(to_host(final.first_bad_step))}"
              " — state frozen at the last good value")
    return states.u, states.v, states.p


def _run_distributed(args):
    """Multi-process periodic rollout: global row-sharded mesh, per-host
    feeding via global arrays, per-host shard output, optional coordinator
    reassembly into the reference npz format.

    Launch (single host, N processes):
      python -m ns_tpu.launch --nprocs 2 --devices-per-proc 2 -- \\
          python -m ns_tpu.cli.run_solver decaying_turbulence --dist \\
          --nx 256 --nt 100 --compact --transform matmul
    On a TPU pod: run one copy per host (no launcher env needed —
    jax.distributed auto-detects)."""
    import jax

    from ns_tpu.parallel import distributed as dist

    dist.initialize_from_env()
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from ns_tpu.solvers import spectral_periodic as sp

    pid, nproc = dist.process_index(), dist.process_count()
    n_dev = len(jax.devices())
    nx = args.nx or 256
    cfg = sp.SpectralPeriodicConfig(nt=args.nt, nx=nx, ny=nx, dt=args.dt,
                                    nu=args.nu, rho=args.rho,
                                    dtype=args.dtype,
                                    transform=args.transform,
                                    matmul_precision=args.precision,
                                    compact_spectrum=args.compact,
                                    forcing=args.forcing,
                                    forcing_k=args.forcing_k,
                                    forcing_amp=args.forcing_amp)
    w0 = np.asarray(sp.taylor_green_vorticity(cfg)
                    if args.family == "taylor_green"
                    else sp.decaying_turbulence_vorticity(cfg,
                                                          seed=args.seed))

    mesh = dist.make_global_mesh({"x": n_dev})
    if cfg.transform == "matmul" and cfg.compact_spectrum:
        from ns_tpu.parallel.spectral_sharded import (
            make_sharded_compact_simulate)
        sim, sharding = make_sharded_compact_simulate(cfg, mesh,
                                                      fields="uvp")
        names = ("u", "v", "p")
    else:
        from ns_tpu.parallel.spectral_sharded import make_sharded_simulate
        sim, sharding = make_sharded_simulate(cfg, mesh)
        names = ("w",)

    lo, hi = dist.process_local_rows(cfg.nx, mesh, "x")
    w0_g = dist.global_array(sharding, w0[lo:hi])
    t0 = time.perf_counter()
    out = sim(w0_g)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    if len(names) == 1:
        out = (out,)

    # --stream-dir with --dist is rejected up front in main()
    out_dir = (args.out or f"{args.family}_dist.npz") + ".shards"
    for name, arr in zip(names, out):
        dist.save_array_shards(out_dir, name, arr)
    dist.barrier("rollout_io")
    print(f"p{pid}/{nproc}: {args.family} nt={args.nt} grid={nx}x{nx} on "
          f"{n_dev} devices in {elapsed:.2f}s "
          f"({args.nt / elapsed:.1f} steps/s) -> {out_dir}")

    if dist.is_coordinator() and not args.no_assemble:
        fields = {n: dist.assemble_shards(out_dir, n) for n in names}
        out = args.out or f"{args.family}.npz"
        if names == ("u", "v", "p"):
            save_rollout(out, fields["u"], fields["v"], fields["p"])
        else:
            np.savez(out, **fields)
        print(f"p0: assembled {'/'.join(names)} -> {out}")
    dist.barrier("done")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("family", choices=["direct_fd", "chorin_fd",
                                      "chorin_spectral", "taylor_green",
                                      "decaying_turbulence",
                                      "taylor_green_3d",
                                      "decaying_turbulence_3d"])
    p.add_argument("--nt", type=int, default=200)
    p.add_argument("--nit", type=int, default=None)
    p.add_argument("--nx", type=int, default=None)
    p.add_argument("--dt", type=float, default=0.001)
    p.add_argument("--rho", type=float, default=1.0)
    p.add_argument("--nu", type=float, default=None,
                   help="viscosity (default: 0.1 for the 2D families, "
                        "1/1600 — the canonical TGV Reynolds number — "
                        "for the 3D ones)")
    p.add_argument("--beta", type=float, default=1.25)
    p.add_argument("--method", default="semi_implicit",
                   choices=["semi_implicit", "explicit", "helmholtz"])
    p.add_argument("--corrected", action="store_true",
                   help="chorin_spectral: stable corrected-operator mode")
    p.add_argument("--pressure-mode", default="redblack",
                   choices=["redblack", "gauss_seidel", "multigrid", "cg",
                            "dst", "jacobi", "exact"],
                   help="pressure solver: chorin_fd takes "
                        "redblack|gauss_seidel|multigrid|cg|dst; direct_fd "
                        "takes jacobi|exact (exact = direct mixed-BC solve)")
    p.add_argument("--transform", default="auto",
                   choices=["auto", "fft", "matmul"],
                   help="periodic families: auto picks the measured-fastest "
                        "engine for the grid (matmul-DFT + compact carry "
                        "under the ~8k^2 FFT crossover, FFT beyond — "
                        "RESULTS.md); fft/matmul force an engine")
    p.add_argument("--precision", default="high",
                   choices=["default", "high", "highest"],
                   help="matmul-DFT precision (default=bf16 ~5e-3, "
                        "high=bf16x3 ~3e-5, highest=f32)")
    p.add_argument("--gemm-precision", default=None,
                   choices=["default", "high", "highest"],
                   help="chorin_fd: precision of the ADI/dst/helmholtz "
                        "GEMMs (default: per-path policy — dst/helmholtz "
                        "eigenbasis GEMMs run HIGHEST, ADI sweep matmuls "
                        "keep the jnp default); chorin_spectral: "
                        "precision of every per-step operator GEMM "
                        "(default HIGHEST = true f32; 'default' is ~3.5x "
                        "faster at 512^2 at ~7%% field error — RESULTS.md "
                        "precision menus)")
    p.add_argument("--pallas-transform", default="auto",
                   choices=["auto", "on", "off"],
                   help="3D periodic families: VMEM-fused z+y transform "
                        "stages (Pallas). 'auto' applies the measured win "
                        "region (matmul engine, f32, --precision default, "
                        "grid >= 256^3 — 1.18x there, RESULTS.md); "
                        "on/off force it")
    p.add_argument("--pallas-momentum", action="store_true",
                   help="chorin_fd --method explicit: run the fused "
                        "advection+diffusion+BC predictor as one Pallas "
                        "launch (1.4-1.8x the XLA stencils at 1024-2048^2, "
                        "RESULTS.md; TPU only)")
    p.add_argument("--forcing", default="none",
                   choices=["none", "kolmogorov", "fno"],
                   help="periodic families: constant body forcing "
                        "(vorticity space) for statistically-stationary "
                        "turbulence — 'kolmogorov' = -amp*k*cos(k*y), "
                        "'fno' = the standard FNO-benchmark forcing")
    p.add_argument("--forcing-k", type=int, default=4,
                   help="forcing wavenumber (default 4)")
    p.add_argument("--forcing-amp", type=float, default=0.1,
                   help="forcing amplitude (default 0.1)")
    p.add_argument("--frame-stride", type=int, default=1,
                   help="periodic families: solver steps per SAVED frame "
                        "(--nt then counts saved frames); surrogate "
                        "training wants frames the flow actually moves "
                        "between")
    p.add_argument("--spinup", type=int, default=0,
                   help="periodic families: solver steps discarded "
                        "before the first saved frame (forced runs: "
                        "~1/(nu*k^2*dt) steps reaches stationarity)")
    p.add_argument("--compact", action="store_true",
                   help="periodic families: compact dealias-truncated "
                        "spectrum carry (the flagship throughput path)")
    p.add_argument("--stream-dir", type=str, default=None,
                   help="stream frames to memmapped .npy files in this "
                        "directory instead of materializing the stacked "
                        "rollout (horizons larger than device memory): "
                        "u/v/p for the cavity families, u/v/p/w for the "
                        "periodic ones)")
    p.add_argument("--guard", action="store_true",
                   help="cavity families: run under the divergence guard "
                        "(utils/guard.py) — on NaN/blow-up the state "
                        "freezes at the last good step and the first bad "
                        "step index is reported instead of poisoning the "
                        "whole rollout")
    p.add_argument("--guard-max-abs", type=float, default=1e6,
                   help="guard trip threshold on any field magnitude")
    p.add_argument("--progress", action="store_true",
                   help="per-chunk tqdm progress bar for long rollouts "
                        "(the reference's per-step tqdm analogue; runs "
                        "the rollout in --chunk-step jitted scan chunks)")
    p.add_argument("--chunk", type=int, default=25,
                   help="steps per jitted chunk for --progress")
    p.add_argument("--dist", action="store_true",
                   help="periodic families: multi-process mode. Bootstrap "
                        "jax.distributed from the NS_TPU_* env (set by "
                        "`python -m ns_tpu.launch`, or TPU-pod "
                        "auto-detection), shard the rollout row-wise over "
                        "the GLOBAL device mesh, and write per-host shard "
                        "files (no host ever holds the full rollout). The "
                        "coordinator reassembles the standard npz at --out "
                        "unless --no-assemble")
    p.add_argument("--no-assemble", action="store_true",
                   help="--dist: skip the coordinator's npz reassembly "
                        "(leave only the per-host shard files)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float64"])
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-traj", type=int, default=1,
                   help="decaying_turbulence only: generate N "
                        "independently-seeded trajectories (seeds "
                        "seed..seed+N-1) stacked as (N, nt, nx, ny) — a "
                        "multi-trajectory training dataset for the "
                        "operator families (cli.train fno/fno_w/rnn)")
    args = p.parse_args(argv)

    periodic_2d = args.family in ("taylor_green", "decaying_turbulence")
    periodic_3d = args.family in ("taylor_green_3d",
                                  "decaying_turbulence_3d")
    if args.nu is None:
        args.nu = 6.25e-4 if periodic_3d else 0.1

    # mis-scoped flag combinations fail BEFORE any compute (a pod-scale
    # rollout must not run for minutes and then hit argument validation)
    if args.pallas_momentum and args.family != "chorin_fd":
        p.error("--pallas-momentum applies to chorin_fd only")
    if args.forcing != "none" and not (periodic_2d or periodic_3d):
        p.error("--forcing applies to the periodic families only")
    if periodic_3d and args.forcing == "fno":
        p.error("the 3D family supports --forcing kolmogorov only")
    if periodic_3d and (args.dist or args.stream_dir or args.progress
                        or args.guard or args.n_traj > 1 or args.compact):
        p.error("--dist/--stream-dir/--progress/--guard/--n-traj/--compact "
                "are not supported for the 3D families (the matmul engine "
                "is always compact; sharded 3D runs use "
                "ns_tpu/parallel/spectral3d_sharded.py directly)")
    if args.frame_stride < 1:
        p.error(f"--frame-stride must be >= 1, got {args.frame_stride}")
    if args.spinup < 0:
        p.error(f"--spinup must be >= 0, got {args.spinup}")
    if args.frame_stride > 1 or args.spinup:
        if not (periodic_2d or periodic_3d):
            p.error("--frame-stride/--spinup apply to the periodic "
                    "families only")
        if args.dist or args.stream_dir or args.progress or args.guard:
            p.error("--frame-stride/--spinup are incompatible with "
                    "--dist/--stream-dir/--progress/--guard")
    if args.n_traj < 1:
        p.error(f"--n-traj must be >= 1, got {args.n_traj}")
    if args.n_traj > 1:
        if args.family != "decaying_turbulence":
            p.error("--n-traj needs random initial conditions "
                    "(decaying_turbulence)")
        if args.dist:
            p.error("--n-traj is not supported with --dist")
        if args.stream_dir or args.progress or args.guard:
            p.error("--n-traj is incompatible with "
                    "--stream-dir/--progress/--guard")
    if args.dist:
        if args.family not in ("taylor_green", "decaying_turbulence"):
            p.error("--dist currently supports the periodic families "
                    "(taylor_green|decaying_turbulence); the cavity "
                    "families' multi-process path is the sharded APIs in "
                    "ns_tpu/parallel/ directly")
        if args.stream_dir:
            p.error("--stream-dir is not supported with --dist; shard "
                    "files go to <--out>.shards")
        return _run_distributed(args)

    import jax
    import jax.numpy as jnp
    if args.dtype == "float64":
        # same wiring as the --dist path: without x64 JAX silently
        # truncates every f64 array to f32 (a UserWarning at most)
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32

    t0 = time.perf_counter()
    if args.family == "direct_fd":
        from ns_tpu.solvers.direct_fd import NavierStokesSystem
        nx = args.nx or 50
        nit = args.nit or 50
        dx = dy = 2.0 / (nx - 1)
        u_bc, v_bc, p_bc = cavity_bcs(dx, dy)
        z = np.zeros((nx, nx))
        if args.pressure_mode not in ("jacobi", "exact", "redblack"):
            # 'redblack' is the flag default, i.e. "not specified"
            p.error(f"direct_fd supports --pressure-mode jacobi|exact, "
                    f"got {args.pressure_mode!r}")
        sys_ = NavierStokesSystem(z, z, z, u_bc, v_bc, p_bc, nt=args.nt,
                                  nit=nit, nx=nx, ny=nx, dt=args.dt,
                                  rho=args.rho, nu=args.nu, dtype=dtype,
                                  pressure_mode=("exact" if
                                                 args.pressure_mode == "exact"
                                                 else "jacobi"))
        u, v, pr = _run_cavity(sys_, args)
        default_out = "data.npz"
    elif args.family == "chorin_fd":
        from ns_tpu.solvers.chorin_fd import NavierStokesSystem
        if args.pressure_mode in ("jacobi", "exact"):
            p.error("chorin_fd supports --pressure-mode redblack|"
                    f"gauss_seidel|multigrid|cg|dst, got {args.pressure_mode!r}")
        if args.pallas_momentum and args.method != "explicit":
            p.error("--pallas-momentum requires --method explicit")
        nx = args.nx or 51
        nit = args.nit or 200
        dx = dy = 2.0 / (nx - 1)
        u_bc, v_bc, p_bc = cavity_bcs(dx, dy)
        z = np.zeros((nx, nx))
        sys_ = NavierStokesSystem(z, z, z, u_bc, v_bc, p_bc, nt=args.nt,
                                  nit=nit, nx=nx, ny=nx, dt=args.dt,
                                  rho=args.rho, nu=args.nu, beta=args.beta,
                                  method=args.method, dtype=dtype,
                                  pressure_mode=args.pressure_mode,
                                  gemm_precision=args.gemm_precision,
                                  use_pallas_momentum=args.pallas_momentum)
        u, v, pr = _run_cavity(sys_, args)
        default_out = f"data_{args.method}.npz"
    elif args.family == "chorin_spectral":
        from ns_tpu.solvers.chorin_spectral import NavierStokesSystem
        nx = args.nx or 51
        dx = dy = 2.0 / (nx - 1)
        u_bc, v_bc, _ = cavity_bcs(dx, dy)
        z = np.zeros((nx, nx))
        sys_ = NavierStokesSystem(z, z, z, u_bc, v_bc, nt=args.nt,
                                  nit=args.nit or 200, nx=nx, ny=nx,
                                  dt=args.dt, rho=args.rho, nu=args.nu,
                                  beta=args.beta, dtype=dtype,
                                  quirk_compat=not args.corrected,
                                  matmul_precision=(args.gemm_precision
                                                    or "highest"))
        u, v, pr = _run_cavity(sys_, args)
        default_out = "data.npz"
    elif periodic_3d:
        from ns_tpu.solvers import spectral3d as s3
        nx = args.nx or 64
        fuse = {"auto": "auto", "on": True, "off": False}[
            args.pallas_transform]
        cfg = s3.Spectral3DConfig(
            nt=args.nt, nx=nx, ny=nx, nz=nx, dt=args.dt, nu=args.nu,
            rho=args.rho, dtype=args.dtype, transform=args.transform,
            matmul_precision=args.precision, forcing=args.forcing,
            forcing_k=args.forcing_k, forcing_amp=args.forcing_amp,
            use_pallas_transform=fuse)
        if args.family == "taylor_green_3d":
            u0 = s3.taylor_green_velocity(cfg)
        else:
            u0 = s3.random_solenoidal_velocity(cfg, seed=args.seed)
        sys_ = s3.NavierStokesSystem3D(
            u0, nt=args.nt, nx=nx, ny=nx, nz=nx, dt=args.dt, nu=args.nu,
            rho=args.rho, dtype=args.dtype, transform=args.transform,
            matmul_precision=args.precision, forcing=args.forcing,
            forcing_k=args.forcing_k, forcing_amp=args.forcing_amp,
            use_pallas_transform=fuse)
        if args.frame_stride > 1 or args.spinup > 0:
            fields = sys_.simulate_strided(args.nt, stride=args.frame_stride,
                                           spinup=args.spinup)
        else:
            fields = sys_.simulate()
        u3, v3, w3, p3 = to_host(fields)
        elapsed = time.perf_counter() - t0
        out = args.out or f"{args.family}.npz"
        np.savez(out, u=np.asarray(u3), v=np.asarray(v3),
                 w=np.asarray(w3), p=np.asarray(p3))
        print(f"{args.family}: nt={args.nt} (stride {args.frame_stride}, "
              f"spinup {args.spinup}) grid={nx}^3 in {elapsed:.2f}s "
              f"({args.nt / elapsed:.1f} frames/s) -> {out}")
        return
    else:
        from ns_tpu.solvers import spectral_periodic as sp
        nx = args.nx or 256
        cfg_kwargs = dict(nt=args.nt, nx=nx, ny=nx, dt=args.dt, nu=args.nu,
                          rho=args.rho, dtype=args.dtype,
                          transform=args.transform,
                          matmul_precision=args.precision,
                          compact_spectrum=args.compact,
                          forcing=args.forcing,
                          forcing_k=args.forcing_k,
                          forcing_amp=args.forcing_amp)
        cfg = sp.SpectralPeriodicConfig(**cfg_kwargs)
        if args.family == "taylor_green":
            w0 = sp.taylor_green_vorticity(cfg)
        else:
            w0 = sp.decaying_turbulence_vorticity(cfg, seed=args.seed)
        strided = args.frame_stride > 1 or args.spinup > 0
        if args.n_traj > 1:  # flag combinations validated in main()
            # ONE wrapper instance: simulate_from/simulate_strided reuse
            # its compiled rollout across seeds (a fresh instance per
            # seed re-jits)
            sys_ = sp.NavierStokesSystem(w0, **cfg_kwargs)
            us, vs, ps = [], [], []
            for s in range(args.seed, args.seed + args.n_traj):
                w0s = sp.decaying_turbulence_vorticity(cfg, seed=s)
                u_t, v_t, p_t = to_host(
                    sys_.simulate_strided(args.nt, stride=args.frame_stride,
                                          spinup=args.spinup, w_ic=w0s)
                    if strided else sys_.simulate_from(w0s))
                us.append(u_t)
                vs.append(v_t)
                ps.append(p_t)
            elapsed = time.perf_counter() - t0
            out = args.out or f"{args.family}_x{args.n_traj}.npz"
            save_rollout(out, np.stack(us), np.stack(vs), np.stack(ps))
            print(f"{args.family}: {args.n_traj} trajectories x nt="
                  f"{args.nt} grid={nx}x{nx} in {elapsed:.2f}s -> {out}")
            return
        if strided:
            sys_ = sp.NavierStokesSystem(w0, **cfg_kwargs)
            u, v, pr = to_host(
                sys_.simulate_strided(args.nt, stride=args.frame_stride,
                                      spinup=args.spinup))
            elapsed = time.perf_counter() - t0
            out = args.out or f"{args.family}.npz"
            save_rollout(out, np.asarray(u), np.asarray(v), np.asarray(pr))
            print(f"{args.family}: {args.nt} frames (stride "
                  f"{args.frame_stride}, spinup {args.spinup}) grid="
                  f"{nx}x{nx} in {elapsed:.2f}s -> {out}")
            return
        if args.stream_dir or args.progress:
            if args.guard:
                print("note: --guard is ignored for periodic "
                      "--stream-dir/--progress runs (unsupported for the "
                      "periodic families in general)")
            carry0 = sp.init_from_vorticity(cfg, w0)
            step, _ = sp.make_step(cfg)
            step_fn = lambda c: step(c)[0]

            def extract(c):
                # reference simulate() contract (u, v, p) plus vorticity;
                # compact/real-GEMM carries expand to the rfft2 layout for
                # the field/pressure recovery
                w_spec = c[0]
                if cfg.real_gemm:
                    w_spec = sp.compact_real_to_complex(w_spec)
                if cfg.compact_spectrum:
                    w_spec = sp.expand_compact(cfg, w_spec)
                u, v, w = sp.fields_from_hat(cfg, w_spec)
                p = sp.pressure_from_hat(cfg, w_spec)
                return {"u": u, "v": v, "p": p, "w": w}

        if args.stream_dir:
            from ns_tpu.io.streaming import stream_rollout
            stream_rollout(step_fn, carry0, cfg.nt, extract,
                           args.stream_dir)
            elapsed = time.perf_counter() - t0
            print(f"{args.family}: nt={args.nt} grid={nx}x{nx} streamed "
                  f"u/v/p/w to {args.stream_dir} in {elapsed:.2f}s "
                  f"({args.nt / elapsed:.1f} steps/s)")
            return
        if args.progress:
            from ns_tpu.utils.progress import chunked_simulate
            outs, _ = chunked_simulate(step_fn, carry0, cfg.nt, extract,
                                       chunk=args.chunk, desc=args.family)
            u, v, pr = outs["u"], outs["v"], outs["p"]
        else:
            sys_ = sp.NavierStokesSystem(w0, **cfg_kwargs)
            u, v, pr = _run_cavity(sys_, args)
        default_out = f"{args.family}.npz"

    if u is None:  # streamed FD rollout: frames already on disk
        elapsed = time.perf_counter() - t0
        print(f"{args.family}: nt={args.nt} streamed u/v/p to "
              f"{args.stream_dir} in {elapsed:.2f}s "
              f"({args.nt / elapsed:.1f} steps/s)")
        return
    u, v, pr = to_host((u, v, pr))
    elapsed = time.perf_counter() - t0
    out = args.out or default_out
    save_rollout(out, u, v, pr)
    print(f"{args.family}: nt={args.nt} grid={u.shape[1]}x{u.shape[2]} "
          f"in {elapsed:.2f}s ({args.nt / elapsed:.1f} steps/s) -> {out}")


if __name__ == "__main__":
    main()
