"""GridFunction operations: projection, error norms, integration.

Reference analog: ``GridFunction`` (``fem/gridfunc.hpp:49``) —
``ProjectCoefficient``, ``ComputeL2Error``, ``ComputeH1Error``.  Here a grid
function is just a flat dof vector (jnp array); the space provides the
interpretation.  Nodal projection = evaluation at ``fes.dof_coords``
(exactly the reference's nodal-element ProjectCoefficient path).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..utils.config import real_t
from .build import basis_for, geom_factors_for, restriction_for
from .quadinterp import eval_grad, eval_values
from .geom_factors import adjugate


def project(fes, f: Callable, dtype=None) -> jnp.ndarray:
    """Nodal interpolation of f(x) onto the space → (ndof,) L-vector."""
    vals = f(fes.dof_coords)
    return jnp.asarray(np.asarray(vals), dtype=real_t(dtype)).reshape(-1)


def values_at_quad(fes, u: jnp.ndarray, nq1d=None, dtype=None) -> jnp.ndarray:
    """u_h at quadrature points → (ne, nq)."""
    db = basis_for(fes, nq1d, dtype)
    e = restriction_for(fes).mult(u)
    return eval_values(db, e)


def phys_grad_at_quad(fes, u: jnp.ndarray, nq1d=None, dtype=None) -> jnp.ndarray:
    """Physical gradient ∇_x u_h at quadrature points → (ne, nq, dim)."""
    db = basis_for(fes, nq1d, dtype)
    gf = geom_factors_for(fes, nq1d, dtype)
    e = restriction_for(fes).mult(u)
    g = eval_grad(db, e)                                   # reference grads
    A = adjugate(gf.jac)
    # ∇_x = J^{-T} ∇_ξ = adjᵀ/det ∇_ξ
    return jnp.einsum("eqab,eqa->eqb", A, g) / gf.det[..., None]


def integrate(fes, q: jnp.ndarray, nq1d=None, dtype=None) -> jnp.ndarray:
    """∫ q dΩ for an (ne, nq) Q-vector."""
    gf = geom_factors_for(fes, nq1d, dtype)
    return jnp.sum(gf.wdet * q)


def l2_error(fes, u: jnp.ndarray, exact: Callable, nq1d=None, dtype=None):
    """‖u_h − exact‖_L2 via quadrature (ComputeL2Error, fem/gridfunc.cpp)."""
    gf = geom_factors_for(fes, nq1d, dtype)
    uq = values_at_quad(fes, u, nq1d, dtype)
    eq = jnp.asarray(exact(gf.x), dtype=uq.dtype)
    return jnp.sqrt(jnp.sum(gf.wdet * (uq - eq) ** 2))


def h1_seminorm_error(fes, u, exact_grad: Callable, nq1d=None, dtype=None):
    """|u_h − exact|_H1 via quadrature (ComputeH1Error analog)."""
    gf = geom_factors_for(fes, nq1d, dtype)
    gq = phys_grad_at_quad(fes, u, nq1d, dtype)
    eg = jnp.asarray(exact_grad(gf.x), dtype=gq.dtype)
    return jnp.sqrt(jnp.sum(gf.wdet * jnp.sum((gq - eg) ** 2, axis=-1)))


def l2_norm(fes, u, nq1d=None, dtype=None):
    gf = geom_factors_for(fes, nq1d, dtype)
    uq = values_at_quad(fes, u, nq1d, dtype)
    return jnp.sqrt(jnp.sum(gf.wdet * uq**2))
