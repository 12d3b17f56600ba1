"""Slope-based phase profiler for the compact matmul-DFT spectral step.

Runs each phase as a lax.scan of n1=100 and n2=500 iterations inside one
jit and reports the slope (t2-t1)/(n2-n1): the fixed per-execution
dispatch overhead (~30 ms through the tunnel transport) cancels, leaving
the true marginal cost per iteration. Feeds docs/roofline.md.

Run on the real TPU: python tools/profile_spectral_step.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time
import jax, jax.numpy as jnp
from ns_tpu.solvers import spectral_periodic as sp
from ns_tpu.utils.host import sync

cfg = sp.SpectralPeriodicConfig(nt=200, nx=1024, ny=1024, dt=5e-4, nu=1e-4,
                                dtype="float32", transform="matmul",
                                matmul_precision="default", compact_spectrum=True)
ops = sp.make_compact_ops(cfg)
fwd, inv = sp.make_compact_transforms(cfg)
w0 = sp.decaying_turbulence_vorticity(cfg, seed=0, k_peak=30.0)
carry0 = sp.init_from_vorticity_compact(cfg, w0)
w_hat0 = carry0[0]

def slope_time(fn, arg, n1=100, n2=500):
    def mk(n):
        f = jax.jit(lambda x: jax.lax.scan(lambda c, _: (fn(c), None), x, None,
                                           length=n)[0])
        sync(f(arg))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); jax.block_until_ready(f(arg))
            best = min(best, time.perf_counter() - t0)
        return best
    t1, t2 = mk(n1), mk(n2)
    return (t2 - t1) / (n2 - n1), t1

step, _ = sp.make_step_compact(cfg)
rows = []
rows.append(("full step", *slope_time(lambda c: step(c)[0], carry0)))

def transforms_only(w_hat):
    stack = jnp.stack([w_hat, w_hat * 2, w_hat * 3, w_hat * 4])
    u, v, wx, wy = inv(stack)
    return fwd(u + v + wx + wy) * 1e-3
rows.append(("inv4+sum+fwd (GEMMs, no prod)", *slope_time(transforms_only, w_hat0)))

def nl_only(w_hat):
    stack = jnp.stack([w_hat, 2 * w_hat, 3 * w_hat, 4 * w_hat])
    u, v, wx, wy = inv(stack)
    return fwd(u * wx + v * wy) * 1e-3
rows.append(("inv4+prod+fwd", *slope_time(nl_only, w_hat0)))

def pointwise_only(carry):
    w_hat, N_prev = carry
    psi = w_hat * ops["inv_k2"]
    stack = jnp.stack([sp._ik_mul(ops["ky"], psi), -sp._ik_mul(ops["kx"], psi),
                       sp._ik_mul(ops["kx"], w_hat), sp._ik_mul(ops["ky"], w_hat)])
    N = -jnp.sum(stack, axis=0) * 1e-3
    E = ops["visc"]
    w_new = E * w_hat + cfg.dt * (1.5 * E * N - 0.5 * (E * E) * N_prev)
    return (w_new, N)
rows.append(("spectral pointwise", *slope_time(pointwise_only, carry0)))

fields0 = inv(jnp.stack([w_hat0, 2 * w_hat0, 3 * w_hat0, 4 * w_hat0]))
def prod_only(fields):
    u, v, wx, wy = fields
    adv = u * wx + v * wy
    return jnp.stack([adv * 1e-3, u, v, wx])
rows.append(("physical product", *slope_time(prod_only, fields0)))

# isolate the four GEMMs: inv stage1, inv stage2, fwd s1, fwd s2
# (complex math must stay inside jit on axon; constants must be real)
import numpy as np
M = sp._dft_constants(cfg)
rws, kxc, n_neg, kyc = sp._compact_meta(cfg)
prec = cfg.matmul_precision
mm = lambda a, b: jnp.matmul(a, b, precision=prec)
Fx_re, Fx_im = (jnp.asarray(M["Fx"][i][rws, :]) for i in (0, 1))
Fxi_re, Fxi_im = (jnp.asarray(M["Fx_inv"][i][:, rws]) for i in (0, 1))
Fy_re, Fy_im = (jnp.asarray(M["Fy"][i][:kyc, :]) for i in (0, 1))
B_re, B_im = (jnp.asarray(M["B"][i][:kyc, :]) for i in (0, 1))
C = jax.lax.complex

z40 = jax.jit(lambda w: jnp.stack([w, 2 * w, 3 * w, 4 * w]))(w_hat0)
rows.append(("inv s1 (4x (nx,Rx)@(Rx,kyc))", *slope_time(
    lambda z: z * (1e-3 + 0j) + 1e-30 * jnp.mean(jnp.abs(mm(C(Fxi_re, Fxi_im), z))),
    z40)))
a40 = jax.jit(lambda z: mm(C(Fxi_re, Fxi_im), z))(z40)
rows.append(("inv s2 (4x (nx,kyc)@(kyc,ny), .real)", *slope_time(
    lambda a: a * (1e-3 + 0j) + 1e-30 * jnp.mean(jnp.abs(mm(a, C(B_re, B_im)).real)),
    a40)))
w_r = fields0[0]
rows.append(("fwd s1 ((nx,ny)@(ny,kyc))", *slope_time(
    lambda w: w * 1e-3 + 1e-30 * jnp.mean(jnp.abs(mm(w.astype(jnp.complex64),
                                                     C(Fy_re, Fy_im).T))),
    w_r)))
t0f = jax.jit(lambda w: mm(w.astype(jnp.complex64), C(Fy_re, Fy_im).T))(w_r)
rows.append(("fwd s2 ((Rx,nx)@(nx,kyc))", *slope_time(
    lambda t: t * (1e-3 + 0j) + 1e-30 * jnp.mean(jnp.abs(mm(C(Fx_re, Fx_im), t))),
    t0f)))

for name, sl, t1 in rows:
    print(f"{name:38s}: {sl*1e6:8.1f} us/iter   (t100={t1*1e3:.1f} ms)")
