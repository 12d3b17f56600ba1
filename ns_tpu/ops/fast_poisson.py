"""Direct (non-iterative) Dirichlet-frame Poisson solver via matmul DST.

The chorin_fd pressure system (ref chorin_fd/simulate.py:169-202, via its
SOR fixed point — see ns_tpu/ops/poisson.py::sor_redblack) is

    (Dxx p)_ij + (Dyy p)_ij = f_ij   on the interior,
    boundary ring of p held fixed,

i.e. an inhomogeneous-Dirichlet 5-point Poisson problem. The interior
operator separates as  Lx P + P Ly^T  with Lx = tridiag(1,-2,1)/dx^2 of
size m = nx-2 (zero-Dirichlet), and Lx diagonalizes EXACTLY in the DST-I
basis:

    Sx[a,b] = sqrt(2/(m+1)) sin(pi (a+1)(b+1) / (m+1))     (orthonormal,
    lam_x[b] = -(4/dx^2) sin^2(pi (b+1) / (2(m+1)))         symmetric)

so the solve is  P = Sx ((Sx F' Sy) / (lam_x + lam_y)) Sy  — four square
GEMMs and one elementwise divide, where F' is the interior RHS with the
fixed boundary values lifted onto it. This is the TPU-native endgame for
the pressure solve: one MXU-shaped direct solve, exact to working
precision, replacing an O(N)-sweep iteration (SOR) or an O(1)-cycle but
bandwidth-bound iteration (multigrid). Measured numbers in RESULTS.md
("Pressure-solver shoot-out").

Setup (transform matrices + eigenvalues) runs in float64 NumPy on host
(repo convention, CLAUDE.md); only real constants transfer to device.

Note on compile time: the first HIGHEST-precision GEMM compile in a
process triggers XLA GEMM autotuning, which costs tens of seconds over
the axon tunnel (per-candidate dispatch latency) at 512^2+. It is a
one-time per-process cost — subsequent jits of any dst program reuse the
autotune cache. HIGHEST is kept as the default because it is ~10x more
accurate than HIGH here (3.1e-6 vs 2.7e-5 rel err at 512^2) at identical
steady-state throughput.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _dst_basis(m: int, h: float) -> tuple[np.ndarray, np.ndarray]:
    """Orthonormal DST-I matrix (symmetric) and second-difference
    eigenvalues for the size-m zero-Dirichlet 1D Laplacian with grid
    spacing h, in float64."""
    a = np.arange(1, m + 1, dtype=np.float64)
    S = np.sqrt(2.0 / (m + 1)) * np.sin(np.pi * np.outer(a, a) / (m + 1))
    lam = -(4.0 / (h * h)) * np.sin(np.pi * a / (2.0 * (m + 1))) ** 2
    return S, lam


def _parity_split_ops(S_h: np.ndarray, dtype, precision):
    """Half-flop application of a symmetric reversal-parity transform.

    The DST-I matrix satisfies  S[m-1-a, b] = (-1)^b S[a, b]  (and, being
    symmetric, the same with the roles of a and b swapped): its columns
    split into a symmetric (even-index) and an antisymmetric (odd-index)
    family under index reversal. Splitting the operand into its symmetric
    and antisymmetric halves therefore turns every m x m GEMM into two
    (m/2) x (m/2) GEMMs — exactly half the MACs — at the cost of one
    add/subtract pass and contiguous flips/concats (no strided interleave:
    eigen-space stays in even-first PERMUTED order between the forward and
    inverse transforms, and the inverse reconstructs natural order from
    mirrored halves, so only `lax.rev` + `concatenate` touch the layout).

    Returns (fwd_l, fwd_r, inv_l, inv_r, perm):
      fwd_l(X) = S @ X   with rows in even-first permuted order
      fwd_r(X) = X @ S   with columns in even-first permuted order
      inv_l(G) = S @ G   taking permuted-row G back to natural order
      inv_r(G) = G @ S   taking permuted-column G back to natural order
      perm     = the even-first index permutation (for eigenvalue tables)
    Exact up to fp reassociation vs. the full GEMMs (locked by tests).
    """
    m = S_h.shape[0]
    q, ce = m // 2, (m + 1) // 2  # pair count, even-family size
    odd = (m % 2 == 1)
    E_h = np.ascontiguousarray(S_h[0::2, :ce])  # (ce, ce)
    O_h = np.ascontiguousarray(S_h[1::2, :q])   # (q, q)
    E = jnp.asarray(E_h, dtype)
    O = jnp.asarray(O_h, dtype)
    Et = jnp.asarray(E_h.T.copy(), dtype)
    Ot = jnp.asarray(O_h.T.copy(), dtype)
    mm = partial(jnp.matmul, precision=precision)

    def fwd_l(X: Array) -> Array:
        s = X[:q] + X[m - q:][::-1]
        d = X[:q] - X[m - q:][::-1]
        if odd:  # middle row pairs with itself; feeds the even family only
            s = jnp.concatenate([s, X[q:q + 1]], axis=0)
        return jnp.concatenate([mm(E, s), mm(O, d)], axis=0)

    def fwd_r(X: Array) -> Array:
        s = X[:, :q] + X[:, m - q:][:, ::-1]
        d = X[:, :q] - X[:, m - q:][:, ::-1]
        if odd:
            s = jnp.concatenate([s, X[:, q:q + 1]], axis=1)
        return jnp.concatenate([mm(s, Et), mm(d, Ot)], axis=1)

    def inv_l(G: Array) -> Array:
        A = mm(Et, G[:ce])   # symmetric-family contribution (mirror-even)
        B = mm(Ot, G[ce:])   # antisymmetric contribution (mirror-odd)
        return jnp.concatenate(
            [A[:q] + B, A[q:ce], (A[:q] - B)[::-1]], axis=0)

    def inv_r(G: Array) -> Array:
        A = mm(G[:, :ce], E)
        B = mm(G[:, ce:], O)
        return jnp.concatenate(
            [A[:, :q] + B, A[:, q:ce], (A[:, :q] - B)[:, ::-1]], axis=1)

    perm = np.concatenate([np.arange(0, m, 2), np.arange(1, m, 2)])
    return fwd_l, fwd_r, inv_l, inv_r, perm


# grids below this interior size keep the plain 4-GEMM path: at small m the
# half-size GEMMs stop being MXU-fat and the extra add/flip/concat passes
# dominate the halved MACs (measured crossover on v5e is between 128^2 and
# 256^2 full grids — RESULTS.md "Parity-split DST")
_PARITY_MIN_DIM = 192


def _resolve_parity(parity_split, m: int, k: int) -> bool:
    if parity_split is None:
        return min(m, k) >= _PARITY_MIN_DIM
    return bool(parity_split)


def make_dst_poisson(nx: int, ny: int, dx: float, dy: float,
                     dtype=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST,
                     parity_split: bool | None = None):
    """Build `solve(p, f) -> p` replacing p's interior with the exact
    solution of  laplace(p) = f  (5-point), keeping p's boundary ring
    fixed (the same system every `pressure_mode` iterates on; this one is
    direct). Pure and jit/scan-safe; constants close over the returned
    function.

    parity_split=None (auto) switches the four transform GEMMs to the
    half-flop even/odd engine (`_parity_split_ops`) on large grids; True/
    False force it. Results differ from the full-GEMM path only by fp
    reassociation."""
    if nx < 3 or ny < 3:
        raise ValueError(f"need nx, ny >= 3, got {nx}x{ny}")
    m, k = nx - 2, ny - 2
    Sx_h, lamx = _dst_basis(m, dx)
    Sy_h, lamy = _dst_basis(k, dy)
    inv_denom_h = 1.0 / (lamx[:, None] + lamy[None, :])  # all < 0: safe
    use_parity = _resolve_parity(parity_split, m, k)

    if use_parity:
        fxl, _, ixl, _, permx = _parity_split_ops(Sx_h, dtype, precision)
        _, fyr, _, iyr, permy = _parity_split_ops(Sy_h, dtype, precision)
        inv_denom = jnp.asarray(inv_denom_h[np.ix_(permx, permy)], dtype)
    else:
        Sx = jnp.asarray(Sx_h, dtype)
        Sy = jnp.asarray(Sy_h, dtype)
        inv_denom = jnp.asarray(inv_denom_h, dtype)
        mm = partial(jnp.matmul, precision=precision)

    def solve(p: Array, f: Array) -> Array:
        p = p.astype(dtype)
        fi = f.astype(dtype)[1:-1, 1:-1]
        # lift the fixed boundary values onto the interior RHS
        inv_dx2 = 1.0 / (dx * dx)
        inv_dy2 = 1.0 / (dy * dy)
        fi = fi.at[0, :].add(-p[0, 1:-1] * inv_dx2)
        fi = fi.at[-1, :].add(-p[-1, 1:-1] * inv_dx2)
        fi = fi.at[:, 0].add(-p[1:-1, 0] * inv_dy2)
        fi = fi.at[:, -1].add(-p[1:-1, -1] * inv_dy2)
        # P = Sx ((Sx F' Sy) * inv_denom) Sy   (Sx, Sy symmetric)
        if use_parity:
            G = fyr(fxl(fi)) * inv_denom  # eigen-space in permuted order
            P = iyr(ixl(G))
        else:
            G = mm(mm(Sx, fi), Sy) * inv_denom
            P = mm(mm(Sx, G), Sy)
        return p.at[1:-1, 1:-1].set(P)

    return solve


def make_dst_helmholtz(nx: int, ny: int, dx: float, dy: float, coeff: float,
                       dtype=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST,
                       parity_split: bool | None = None):
    """Build `solve(ring, rhs_int) -> w` for the Helmholtz problem

        (I - coeff * laplace) w = rhs   (5-point) on the interior,

    with w's boundary ring fixed to `ring`'s edge values (Dirichlet
    frame). For coeff = dt*nu/2 this is the unsplit Crank-Nicolson
    diffusion solve used by chorin_fd's corrected `method='helmholtz'`
    predictor (replacing the reference's ADI splitting,
    chorin_fd/simulate.py:93-167). The eigen-denominators
    1 - coeff*(lam_x + lam_y) are >= 1 (lam < 0): unconditionally
    well-conditioned."""
    if nx < 3 or ny < 3:
        raise ValueError(f"need nx, ny >= 3, got {nx}x{ny}")
    if coeff < 0:
        raise ValueError(f"need coeff >= 0, got {coeff}")
    m, k = nx - 2, ny - 2
    Sx_h, lamx = _dst_basis(m, dx)
    Sy_h, lamy = _dst_basis(k, dy)
    inv_den_h = 1.0 / (1.0 - coeff * (lamx[:, None] + lamy[None, :]))
    use_parity = _resolve_parity(parity_split, m, k)

    if use_parity:
        fxl, _, ixl, _, permx = _parity_split_ops(Sx_h, dtype, precision)
        _, fyr, _, iyr, permy = _parity_split_ops(Sy_h, dtype, precision)
        inv_den = jnp.asarray(inv_den_h[np.ix_(permx, permy)], dtype)
    else:
        Sx = jnp.asarray(Sx_h, dtype)
        Sy = jnp.asarray(Sy_h, dtype)
        inv_den = jnp.asarray(inv_den_h, dtype)
        mm = partial(jnp.matmul, precision=precision)

    def solve(ring: Array, rhs_int: Array) -> Array:
        ring = ring.astype(dtype)
        rhs = rhs_int.astype(dtype)
        # (I - coeff*lap) couples boundary-adjacent interior cells to the
        # fixed ring: -coeff*w_b/h^2 moves to the RHS as +coeff*w_b/h^2
        cx = coeff / (dx * dx)
        cy = coeff / (dy * dy)
        rhs = rhs.at[0, :].add(cx * ring[0, 1:-1])
        rhs = rhs.at[-1, :].add(cx * ring[-1, 1:-1])
        rhs = rhs.at[:, 0].add(cy * ring[1:-1, 0])
        rhs = rhs.at[:, -1].add(cy * ring[1:-1, -1])
        if use_parity:
            G = fyr(fxl(rhs)) * inv_den
            W = iyr(ixl(G))
        else:
            G = mm(mm(Sx, rhs), Sy) * inv_den
            W = mm(mm(Sx, G), Sy)
        return ring.at[1:-1, 1:-1].set(W)

    return solve


def _mixed_axis_operator(n_total: int, h: float, lo, hi):
    """1D interior second-difference operator for one axis with the
    fixed-point BC relations folded in.

    lo/hi are ('dirichlet', value, step) or ('neumann', value, step) for
    the low/high edge of the axis, where `step` is the BC object's own
    dx/dy constant (the reference's one-sided difference always uses
    bc.dx for left/right and bc.dy for bottom/top, boundary.py:56-86 —
    NOT necessarily the axis grid spacing h). Folding (low edge; high is
    symmetric):
      - dirichlet c:  p[0] = c            -> rhs lift -c/h^2
      - neumann g:    p[0] = p[1]-step*g  -> diagonal -2 -> -1,
                                             rhs lift +step*g/h^2
    Returns (V, lam, rhs_lift) with V orthonormal (np.linalg.eigh of the
    symmetric tridiagonal), all in float64."""
    m = n_total - 2
    L = (np.diag(np.full(m, -2.0)) + np.diag(np.ones(m - 1), 1)
         + np.diag(np.ones(m - 1), -1))
    lift = np.zeros(m)
    for end, (kind, value, step), sign in ((0, lo, +1.0), (m - 1, hi, -1.0)):
        if kind == "neumann":
            L[end, end] += 1.0  # -2 -> -1 (+= so m == 1 folds both ends)
            lift[end] += sign * value * step / (h * h)
        else:
            lift[end] -= value / (h * h)
    L /= h * h
    lam, V = np.linalg.eigh(L)
    return V, lam, lift


def _side_bcs(p_bc) -> dict:
    """Effective (kind, value, step) per side: the LAST BC in list order
    writing a side determines the edge values the interior reads (corners
    are order-dependent but never read by the 5-point stencil). `step` is
    the one-sided-difference constant the BC itself carries: bc.dx for
    left/right edges, bc.dy for bottom/top (boundary.py:56-86)."""
    eff = {}
    for bc in p_bc:
        step = bc.dx if bc.side in ("left", "right") else bc.dy
        eff[bc.side] = (bc.kind, float(bc.value), float(step))
    missing = [s for s in ("left", "right", "bottom", "top") if s not in eff]
    if missing:
        raise ValueError(
            f"exact mixed-BC solve needs one BC per side; missing {missing} "
            "(an unconstrained edge would pin to its previous values, which "
            "the direct solve cannot represent)")
    return eff


def make_mixed_poisson(nx: int, ny: int, h0: float, h1: float, p_bc,
                       dtype=None,
                       precision=jax.lax.Precision.HIGHEST):
    """Direct solver for the fixed point of (Jacobi sweep + apply_bcs) —
    the converged limit of the reference direct_fd pressure iteration
    (direct_fd/simulate.py:68-88), which its fixed nit=50 sweeps only
    approximate.

    The system: interior cells satisfy (d2/daxis0^2)/h0^2 +
    (d2/daxis1^2)/h1^2 applied to p equals b, and each edge satisfies its
    BC relation. With one BC per side this separates: each axis's 1D
    operator absorbs its Dirichlet/Neumann ends (`_mixed_axis_operator`,
    eigendecomposed on host in float64), and the solve is four GEMMs in
    the mixed eigenbasis. `left`/`right` are the axis-0 edges and
    `bottom`/`top` the axis-1 edges (core/bc.py edge naming); pass
    h0/h1 as the spacings dividing the axis-0/axis-1 differences
    (direct_fd: h0=dy, h1=dx — ref :60-65 axis convention).

    All-Neumann problems are singular (constant nullspace): the zero
    eigenpair is deflated, returning the particular solution with no
    nullspace component (the compatible part of b is solved exactly).

    Returns `solve(b) -> p`: full-grid p with interior from the direct
    solve and edges/corners rebuilt by `apply_bcs` in list order (exact
    reference edge semantics). With dtype=None the solve follows b's
    dtype (constants converted at trace time)."""
    from ns_tpu.core.bc import apply_bcs

    eff = _side_bcs(p_bc)
    V0_h, lam0, lift0 = _mixed_axis_operator(nx, h0, eff["left"],
                                             eff["right"])
    V1_h, lam1, lift1 = _mixed_axis_operator(ny, h1, eff["bottom"],
                                             eff["top"])
    den = lam0[:, None] + lam1[None, :]
    # deflate the all-Neumann nullspace pair (|lam| ~ 0 only there)
    tiny = np.abs(den) < 1e-12 * max(1.0 / h0**2, 1.0 / h1**2)
    inv_den_h = np.where(tiny, 0.0, 1.0 / np.where(tiny, 1.0, den))
    lift_h = lift0[:, None] + lift1[None, :]
    mm = partial(jnp.matmul, precision=precision)
    bcs = list(p_bc)

    def solve(b: Array) -> Array:
        dt_ = dtype or b.dtype
        V0 = jnp.asarray(V0_h, dt_)
        V1 = jnp.asarray(V1_h, dt_)
        rhs = b.astype(dt_)[1:-1, 1:-1] + jnp.asarray(lift_h, dt_)
        G = mm(mm(V0.T, rhs), V1) * jnp.asarray(inv_den_h, dt_)
        P = mm(mm(V0, G), V1.T)
        p = jnp.zeros(b.shape, dt_).at[1:-1, 1:-1].set(P)
        return apply_bcs(p, bcs)

    return solve


@lru_cache(maxsize=32)
def _cached_dst_solver(nx: int, ny: int, dx: float, dy: float,
                       dtype_name: str, precision):
    return make_dst_poisson(nx, ny, dx, dy,
                            dtype=jnp.dtype(dtype_name), precision=precision)


def poisson_dst(p: Array, f: Array, dx: float, dy: float,
                precision=jax.lax.Precision.HIGHEST) -> Array:
    """One-shot convenience wrapper (same signature family as
    `poisson_multigrid`). The O(n^2) host-NumPy basis setup is memoized on
    (shape, spacing, dtype, precision), so repeated eager calls in a loop
    pay it once; inside jit the constants fold regardless. Prefer
    `make_dst_poisson` when you control the call site."""
    solve = _cached_dst_solver(p.shape[0], p.shape[1], float(dx), float(dy),
                               jnp.dtype(p.dtype).name, precision)
    return solve(p, f)
