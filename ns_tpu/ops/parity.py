"""Half-flop application of reversal-parity operators (general engine).

`ops/fast_poisson.py::_parity_split_ops` exploits the DST-I matrix's
index-reversal symmetry to halve every transform GEMM's MACs. The
Chebyshev collocation operators of the corrected chorin_spectral family
have the SAME structure (VERDICT r3 weak #1): on the symmetric
Gauss-Lobatto grid x_i = cos(pi i/(N-1)) (ref chorin_spectral/
simulate.py:395-399), index reversal i -> N-1-i is the spatial reflection
x -> -x, so

  - the corrected derivative matrix D (ops/cheb.py::d_matrix,
    quirk_compat=False; ref :443-481) is reversal-ODD:
    D[N-1-i, N-1-j] = -D[i, j]  (differentiation anticommutes with
    reflection),
  - D^2 and every Helmholtz / Uzawa operator built from it is
    reversal-EVEN: M[rev, rev] = M  (they commute with reflection).

An even operator maps symmetric operands to symmetric and antisymmetric
to antisymmetric; an odd operator swaps the families. Splitting the
operand into its symmetric/antisymmetric halves therefore turns every
m x n GEMM into two half-size GEMMs — half the MACs — at the cost of one
add/subtract fold and a mirrored concat, exactly the DST trick
generalized to arbitrary (non-symmetric, rectangular) parity-equivariant
matrices.

For the eigen-diagonalized solves (Helmholtz predictor ref :284-298,
Uzawa correction ref :339-383), the even operator additionally
BLOCK-DIAGONALIZES in the parity basis: restricted to the symmetric
subspace it is a (ceil(m/2))^2 matrix, to the antisymmetric subspace a
(floor(m/2))^2 one. `ParityEig` eigendecomposes the two blocks
separately (host float64, like all setup) so the per-step eigen
transforms are two half-size GEMMs per side instead of one full-size.

The quirk-compat matrices do NOT have this symmetry (the reference's
M = N sin-denominators and single-endpoint bar_c break reflection
equivariance, ops/cheb.py docstring) — parity mode is corrected-mode
only, and `reversal_parity` is the runtime guard.

All results differ from the dense path only by fp reassociation
(float64 equality tests in tests/test_parity_cheb.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def reversal_parity(M: np.ndarray, rtol: float = 1e-9) -> int | None:
    """+1 if M[rev, rev] == M, -1 if == -M (within rtol * max|M|),
    else None. Works for rectangular M (independent reversal per axis).

    The tolerance admits construction rounding: the corrected Chebyshev
    matrices are parity-exact in exact arithmetic but their host-f64
    construction carries ~1e-12 relative asymmetry by N=512 (measured
    256-1024: 1.7e-14..1e-12). The quirk matrices break parity at O(1),
    so 1e-9 separates cleanly. Downstream, `_half_blocks` acts on the
    fold-averaged halves — i.e. the engine uses the operator's exact
    parity projection, an fp-level (<= the detected asymmetry) operator
    perturbation."""
    R = M[::-1, ::-1]
    scale = np.abs(M).max() or 1.0
    if np.abs(R - M).max() <= rtol * scale:
        return +1
    if np.abs(R + M).max() <= rtol * scale:
        return -1
    return None


def _fold(X: Array, axis: int, n: int):
    """Split X along `axis` (length n) into its symmetric half s
    (ceil(n/2) entries: pair sums / 2, middle kept as-is) and
    antisymmetric half d (floor(n/2) entries: pair differences / 2)."""
    q = n // 2
    idx = [slice(None)] * X.ndim
    lo, hi, mid = list(idx), list(idx), list(idx)
    lo[axis] = slice(0, q)
    hi[axis] = slice(n - q, n)
    Xl, Xh = X[tuple(lo)], jnp.flip(X[tuple(hi)], axis=axis)
    s = 0.5 * (Xl + Xh)
    d = 0.5 * (Xl - Xh)
    if n % 2 == 1:
        mid[axis] = slice(q, q + 1)
        s = jnp.concatenate([s, X[tuple(mid)]], axis=axis)
    return s, d


def _unfold(s: Array, d: Array, axis: int, n: int) -> Array:
    """Inverse of the parity assembly: natural-order X from its symmetric
    part s (ceil(n/2)) and antisymmetric part d (floor(n/2)):
    X[:q] = s[:q] + d, X[mid] = s[mid], X[rev] = s[:q] - d."""
    q = n // 2
    idx = [slice(None)] * s.ndim
    lo, mid = list(idx), list(idx)
    lo[axis] = slice(0, q)
    s_lo = s[tuple(lo)]
    parts = [s_lo + d]
    if n % 2 == 1:
        mid[axis] = slice(q, q + 1)
        parts.append(s[tuple(mid)])
    parts.append(jnp.flip(s_lo - d, axis=axis))
    return jnp.concatenate(parts, axis=axis)


def _half_blocks(M: np.ndarray):
    """(M_ss, M_aa) for even parity or (M_sa, M_as) for odd, as the
    operator's action on half-vector parameterizations.

    Even M: symmetric input y (first ceil(c/2) entries, pair value shared)
    maps to symmetric output via
      E[a, b<q] = M[a, b] + M[a, c-1-b],  E[a, mid] = M[a, mid]
    (rows a < ceil(r/2)); antisymmetric via
      O[a, b] = M[a, b] - M[a, c-1-b]     (rows a < floor(r/2)).
    Odd M swaps the output families: the sym-input block keeps only
    floor(r/2) rows (output is antisymmetric) and the antisym-input block
    ceil(r/2) rows (output symmetric)."""
    r, c = M.shape
    qr, cr = r // 2, (r + 1) // 2
    qc, cc = c // 2, (c + 1) // 2
    sym_in = M[:, :qc] + M[:, c - qc:][:, ::-1]
    if c % 2 == 1:
        sym_in = np.concatenate([sym_in, M[:, qc:qc + 1]], axis=1)  # (r, cc)
    anti_in = M[:, :qc] - M[:, c - qc:][:, ::-1]                    # (r, qc)
    return sym_in, anti_in, qr, cr


def make_parity_apply(M_h: np.ndarray, dtype, side: str = "left"):
    """Half-flop closure for a reversal-parity matrix M.

    side='left':  f(X) = M @ X    (M applied to X's axis -2)
    side='right': f(X) = X @ M.T  (M applied to X's axis -1)

    Leading batch dimensions broadcast. Raises if M has no parity.
    Matmul precision follows the ambient `jax.default_matmul_precision`
    context (chorin_spectral bakes cfg.matmul_precision around the traced
    step body)."""
    sign = reversal_parity(M_h)
    if sign is None:
        raise ValueError("matrix has no reversal parity; use the dense path")
    r, c = M_h.shape
    sym_in, anti_in, qr, cr = _half_blocks(M_h)
    if sign == +1:
        # sym->sym keeps ceil(r/2) rows; anti->anti floor(r/2)
        A = jnp.asarray(sym_in[:cr], dtype)    # (cr, cc)
        B = jnp.asarray(anti_in[:qr], dtype)   # (qr, qc)
    else:
        # sym->anti keeps floor(r/2) rows; anti->sym ceil(r/2)
        A = jnp.asarray(anti_in[:cr], dtype)   # (cr, qc)  anti-in -> sym-out
        B = jnp.asarray(sym_in[:qr], dtype)    # (qr, cc)  sym-in -> anti-out

    if side == "left":
        def apply(X: Array) -> Array:
            s, d = _fold(X, -2, c)
            if sign == +1:
                out_s = jnp.matmul(A, s)
                out_d = jnp.matmul(B, d)
            else:
                out_s = jnp.matmul(A, d)
                out_d = jnp.matmul(B, s)
            return _unfold(out_s, out_d, -2, r)
    elif side == "right":
        At, Bt = A.swapaxes(-1, -2), B.swapaxes(-1, -2)

        def apply(X: Array) -> Array:
            s, d = _fold(X, -1, c)
            if sign == +1:
                out_s = jnp.matmul(s, At)
                out_d = jnp.matmul(d, Bt)
            else:
                out_s = jnp.matmul(d, At)
                out_d = jnp.matmul(s, Bt)
            return _unfold(out_s, out_d, -1, r)
    else:
        raise ValueError(f"side must be left|right, got {side!r}")
    return apply


class ParityEig:
    """Parity-block eigen machinery for a reversal-EVEN square operator.

    The operator block-diagonalizes over the symmetric/antisymmetric
    subspaces; each block is eigendecomposed separately (host float64 via
    ops/cheb.py::eig_real, preserving its complex-spectrum guard). The
    per-step transforms run as two half-size GEMMs per side:

      forward(F, axis): eigen-basis coefficients of F along `axis`,
        PARITY-ORDERED (symmetric-block eigenvalues first) — use `.lam`
        (same order) for the eigen divides;
      inverse(G, axis): back to natural order.

    Functionally identical (up to fp reassociation) to multiplying by the
    dense eigenvector inverse / matrix of the full operator with columns
    permuted to parity order — the permutation cancels between forward
    and inverse, so callers only ever see natural-order fields.
    """

    def __init__(self, M_h: np.ndarray, label: str, dtype):
        from ns_tpu.ops.cheb import eig_real
        if reversal_parity(M_h) != +1:
            raise ValueError(f"{label}: operator is not reversal-even; "
                             "parity eigen solve does not apply")
        m = M_h.shape[0]
        self.m = m
        q, ce = m // 2, (m + 1) // 2
        sym_in, anti_in, _, _ = _half_blocks(M_h)
        Me = sym_in[:ce]            # (ce, ce): action on symmetric halves
        Mo = anti_in[:q]            # (q, q): action on antisymmetric halves
        lam_e, Ve = eig_real(Me, f"{label} (even block)")
        lam_o, Vo = eig_real(Mo, f"{label} (odd block)")
        self.lam = jnp.asarray(np.concatenate([lam_e, lam_o]), dtype)
        self.Ve = jnp.asarray(Ve, dtype)
        self.Vo = jnp.asarray(Vo, dtype)
        self.Ve_inv = jnp.asarray(np.linalg.inv(Ve), dtype)
        self.Vo_inv = jnp.asarray(np.linalg.inv(Vo), dtype)
        # host-side copies for cross-instance operator-equality checks
        self._Me_np, self._Mo_np = Me, Mo

    def forward(self, F: Array, axis: int) -> Array:
        s, d = _fold(F, axis, self.m)
        if axis in (-2, F.ndim - 2):
            ge = jnp.matmul(self.Ve_inv, s)
            go = jnp.matmul(self.Vo_inv, d)
        else:
            ge = jnp.matmul(s, self.Ve_inv.swapaxes(-1, -2))
            go = jnp.matmul(d, self.Vo_inv.swapaxes(-1, -2))
        return jnp.concatenate([ge, go], axis=axis)

    def inverse(self, G: Array, axis: int) -> Array:
        q, ce = self.m // 2, (self.m + 1) // 2
        idx = [slice(None)] * G.ndim
        e_idx, o_idx = list(idx), list(idx)
        e_idx[axis] = slice(0, ce)
        o_idx[axis] = slice(ce, self.m)
        Ge, Go = G[tuple(e_idx)], G[tuple(o_idx)]
        if axis in (-2, G.ndim - 2):
            s = jnp.matmul(self.Ve, Ge)
            d = jnp.matmul(self.Vo, Go)
        else:
            s = jnp.matmul(Ge, self.Ve.swapaxes(-1, -2))
            d = jnp.matmul(Go, self.Vo.swapaxes(-1, -2))
        return _unfold(s, d, axis, self.m)

    def same_blocks(self, other: "ParityEig") -> bool:
        return (np.array_equal(self._Me_np, other._Me_np)
                and np.array_equal(self._Mo_np, other._Mo_np))


class ParityEig2D:
    """Separable two-axis eigen solve in QUADRANT form.

    `hx.forward / hy.forward -> eigen divide -> hy.inverse / hx.inverse`
    materializes a parity-ordered concatenation after every transform —
    at 1024^2 that is four full-array HBM concats per solve that the
    GEMMs never needed. This solver folds the operand once per axis into
    its four parity quadrants (ss, sd, ds, dd), transforms each quadrant
    with its (x-block, y-block) eigenbasis pair, divides by the matching
    eigenvalue grid, and mirrors straight back — same MAC count, zero
    parity-order concats. Differs from the ParityEig composition only by
    fp reassociation (the y-fold commutes with the x-contraction in
    exact arithmetic); f64 equality tests in tests/test_parity_cheb.py
    hold it to the dense path at the same tolerance.

    The eigenvalue grids are setup-time constants, so callers build the
    four per-quadrant RECIPROCAL grids once (`denoms(fn)` -> mask/invert
    -> pass to `solve`) and the hot path multiplies instead of divides;
    nullspace deflation (chorin_spectral's _psolve) becomes a zero in
    the reciprocal."""

    def __init__(self, hx: ParityEig, hy: ParityEig):
        self.hx, self.hy = hx, hy
        cex, cey = (hx.m + 1) // 2, (hy.m + 1) // 2
        self._lams = ((hx.lam[:cex], hy.lam[:cey]),
                      (hx.lam[:cex], hy.lam[cey:]),
                      (hx.lam[cex:], hy.lam[:cey]),
                      (hx.lam[cex:], hy.lam[cey:]))

    def quadrants(self, F: Array):
        """(ss, sd, ds, dd) parity quadrants of F over its last two axes."""
        s, d = _fold(F, -2, self.hx.m)
        ss, sd = _fold(s, -1, self.hy.m)
        ds, dd = _fold(d, -1, self.hy.m)
        return ss, sd, ds, dd

    def assemble(self, ss: Array, sd: Array, ds: Array, dd: Array) -> Array:
        s = _unfold(ss, sd, -1, self.hy.m)
        d = _unfold(ds, dd, -1, self.hy.m)
        return _unfold(s, d, -2, self.hx.m)

    def denoms(self, denom_fn):
        """The four quadrant divisor grids (ee, eo, oe, oo order)."""
        return tuple(denom_fn(lx[:, None], ly[None, :])
                     for lx, ly in self._lams)

    def solve(self, F: Array, recips) -> Array:
        """F -> eigen solve with per-quadrant reciprocal grids `recips`
        (built once from .denoms at setup; multiply, never divide)."""
        hx, hy = self.hx, self.hy
        quads = self.quadrants(F)
        xf = (hx.Ve_inv, hx.Ve_inv, hx.Vo_inv, hx.Vo_inv)
        yf = (hy.Ve_inv, hy.Vo_inv, hy.Ve_inv, hy.Vo_inv)
        xb = (hx.Ve, hx.Ve, hx.Vo, hx.Vo)
        yb = (hy.Ve, hy.Vo, hy.Ve, hy.Vo)
        out = []
        for q, A, B, Ai, Bi, r in zip(quads, xf, yf, xb, yb, recips):
            g = jnp.matmul(jnp.matmul(A, q), B.swapaxes(-1, -2)) * r
            out.append(jnp.matmul(jnp.matmul(Ai, g), Bi.swapaxes(-1, -2)))
        return self.assemble(*out)

    def full_recip(self, recips) -> Array:
        """Quadrant reciprocal grids -> one parity-ordered (m_x, m_y)
        grid for `solve_composed` (even-block rows/cols first, matching
        ParityEig.forward's output order)."""
        top = jnp.concatenate([recips[0], recips[1]], axis=-1)
        bot = jnp.concatenate([recips[2], recips[3]], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    def solve_composed(self, F: Array, full_recip: Array) -> Array:
        """Same solve via the per-axis forward/inverse composition.

        Mathematically identical to `solve` (fp reassociation only) but a
        different GEMM schedule: per-axis transforms on the full second
        axis (fatter GEMMs, but one parity-ordered concat after each of
        the four transforms). Measured (tools/verify_parity_cheb.py
        --form both, v5e, f32 'highest'): the two schedules are within
        ~1-5% of each other at 256^2-1024^2 once both use setup-time
        reciprocal grids (composed 47.8/178.1/961.8 us/step vs quadrant
        46.1/186.5/981.4) — the concats XLA emits for the composed form
        are cheaper than its fatter GEMMs are faster, and vice versa.
        chorin_spectral defaults to composed (best at the north-star
        1024^2) and exposes the choice as cfg.parity_eig_form."""
        G = self.hy.forward(self.hx.forward(F, -2), -1)
        return self.hx.inverse(self.hy.inverse(G * full_recip, -1), -2)
