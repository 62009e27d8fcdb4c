"""Mass integrator, partial assembly.

Reference analog: ``MassIntegrator`` (``fem/bilininteg.hpp:2367``) with PA
setup/apply kernels in ``fem/integ/bilininteg_mass_*.cpp``: qdata is
``w_q · detJ_q · coeff_q`` and the apply is ``Bᵀ (qdata ∘ (B u))``.

All functions are pure and jit-safe; ``qdata`` is an (ne, nq) array.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.geom_factors import GeometricFactors
from ..fem.quadinterp import (
    DeviceBasis,
    contract_q_to_e,
    eval_values,
    eval_values_t,
)


def setup(gf: GeometricFactors, coeff_q=None) -> jnp.ndarray:
    """qdata = w · detJ · coeff at each quadrature point → (ne, nq)."""
    qd = gf.wdet
    if coeff_q is not None:
        qd = qd * coeff_q
    return qd


def apply(db: DeviceBasis, qdata: jnp.ndarray, u_e: jnp.ndarray) -> jnp.ndarray:
    """(ne, nd[, c]) → (ne, nd[, c]): Bᵀ diag(qdata) B u."""
    import jax

    with jax.named_scope("mass-apply"):
        v = eval_values(db, u_e)
        if u_e.ndim > 2:
            v = v * qdata[..., None]
        else:
            v = v * qdata
        return eval_values_t(db, v)


def diagonal(db: DeviceBasis, qdata: jnp.ndarray) -> jnp.ndarray:
    """diag(Bᵀ diag(qdata) B) per element → (ne, nd)."""
    if not db.tensor:
        return jnp.einsum("qn,eq,qn->en", db.B, qdata, db.B)
    Bsq = db.B1 * db.B1
    return contract_q_to_e((Bsq,) * db.dim, qdata)
