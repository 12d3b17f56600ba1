"""Unit tests for the BC spec against the reference edge semantics
(reference src/boundary.py:34-48, 56-86)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.core.bc import BC, apply_bc, apply_bcs, dirichlet, neumann


def base():
    return jnp.arange(20.0, dtype=jnp.float64).reshape(4, 5)


def test_dirichlet_edges():
    A = base()
    np.testing.assert_array_equal(apply_bc(A, dirichlet(7.0, "left"))[0, :], 7.0)
    np.testing.assert_array_equal(apply_bc(A, dirichlet(7.0, "right"))[-1, :], 7.0)
    np.testing.assert_array_equal(apply_bc(A, dirichlet(7.0, "bottom"))[:, 0], 7.0)
    np.testing.assert_array_equal(apply_bc(A, dirichlet(7.0, "top"))[:, -1], 7.0)


def test_dirichlet_only_touches_edge():
    A = base()
    out = apply_bc(A, dirichlet(7.0, "left"))
    np.testing.assert_array_equal(np.asarray(out)[1:], np.asarray(A)[1:])


def test_neumann_one_sided_differences():
    # left: A[0,:] = A[1,:] - dx*g   (boundary.py:73-75)
    A = base()
    dx, dy, g = 0.5, 0.25, 2.0
    out = apply_bc(A, neumann(g, "left", dx, dy))
    np.testing.assert_allclose(np.asarray(out)[0, :], np.asarray(A)[1, :] - dx * g)
    out = apply_bc(A, neumann(g, "right", dx, dy))
    np.testing.assert_allclose(np.asarray(out)[-1, :], np.asarray(A)[-2, :] + dx * g)
    out = apply_bc(A, neumann(g, "bottom", dx, dy))
    np.testing.assert_allclose(np.asarray(out)[:, 0], np.asarray(A)[:, 1] - dy * g)
    out = apply_bc(A, neumann(g, "top", dx, dy))
    np.testing.assert_allclose(np.asarray(out)[:, -1], np.asarray(A)[:, -2] + dy * g)


def test_sequential_order_at_corners():
    # Later BCs overwrite earlier ones at shared corners — the reference's
    # sequential-mutation semantics (direct_fd/simulate.py:121-125).
    A = jnp.zeros((3, 3), dtype=jnp.float64)
    out = apply_bcs(A, [dirichlet(1.0, "left"), dirichlet(2.0, "top")])
    assert out[0, -1] == 2.0
    out = apply_bcs(A, [dirichlet(2.0, "top"), dirichlet(1.0, "left")])
    assert out[0, -1] == 1.0


def test_invalid_side_raises():
    with pytest.raises(ValueError):
        BC("dirichlet", 0.0, "middle")
    with pytest.raises(ValueError):
        BC("robin", 0.0, "left")


def test_reference_named_constructors():
    """Reference-style class constructors (boundary.py:29,51 signature
    (value, boundary, dx, dy)) build the same BCs, and the attribute
    mirrors reference code reads (.type, .boundary, .value, .dx, .dy)
    all work."""
    from ns_tpu.core.bc import (BC, DirichletBoundaryCondition,
                                NeumannBoundaryCondition, apply_bc,
                                dirichlet, neumann)

    d = DirichletBoundaryCondition(1.0, "top", 0.1, 0.1)
    assert d == dirichlet(1.0, "top", 0.1, 0.1)
    assert d.type == "dirichlet" and d.boundary == "top"
    n = NeumannBoundaryCondition(0.5, "left", 0.1, 0.2)
    assert n == neumann(0.5, "left", 0.1, 0.2)
    A = jnp.zeros((4, 4))
    np.testing.assert_allclose(np.asarray(apply_bc(A, d))[:, -1], 1.0)
