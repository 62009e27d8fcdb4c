"""Convection integrator (v·∇u, w), partial assembly.

Reference analog: ``ConvectionIntegrator`` (``fem/bilininteg.hpp:2481``), PA
kernels ``fem/integ/bilininteg_convection_pa.cpp``: qdata maps the velocity
through the adjugate so the apply is ``Bᵀ (qdata · (G u))``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.geom_factors import GeometricFactors, adjugate
from ..fem.quadinterp import DeviceBasis, eval_grad, eval_values_t


def setup(gf: GeometricFactors, coeff_q=None, vel_q=None) -> jnp.ndarray:
    """qdata[e,q,d] = w · adj(J) v (physical velocity pulled back to reference).

    (v·∇_x u, w): ∇_x u = J^{-T} ∇_ξ u  ⇒  v·∇_x u detJ = (adj(J) v)·∇_ξ u.
    ``vel_q``: (ne, nq, dim) physical velocity at quad points.
    """
    if vel_q is None:
        raise ValueError("convection requires a vector velocity coefficient")
    A = adjugate(gf.jac)                              # (ne, nq, dim, dim)
    qd = jnp.einsum("eqba,eqa->eqb", A, vel_q)        # (adj(J) v)_b
    qd = qd * gf.w[None, :, None]
    if coeff_q is not None:
        qd = qd * coeff_q[..., None]
    return qd


def apply(db: DeviceBasis, qdata: jnp.ndarray, u_e: jnp.ndarray) -> jnp.ndarray:
    g = eval_grad(db, u_e)                            # (ne, nq, dim[, c])
    if u_e.ndim > 2:
        v = jnp.einsum("eqd,eqd...->eq...", qdata, g)
    else:
        v = jnp.einsum("eqd,eqd->eq", qdata, g)
    return eval_values_t(db, v)


def diagonal(db: DeviceBasis, qdata: jnp.ndarray) -> jnp.ndarray:
    """diag(Bᵀ qd·G): per-node Σ_q B[q,n] qd[q,d] G_d[q,n]."""
    if not db.tensor:
        return jnp.einsum("qn,eqd,qnd->en", db.B, qdata, db.G)
    from ..fem.quadinterp import contract_q_to_e

    B, G = db.B1, db.G1
    BB, BG = B * B, B * G
    out = None
    for d in range(db.dim):
        facs = tuple(BG if dd == d else BB for dd in range(db.dim))
        term = contract_q_to_e(facs, qdata[:, :, d])
        out = term if out is None else out + term
    return out
