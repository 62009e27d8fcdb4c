"""Diffusion integrator, partial assembly.

Reference analog: ``DiffusionIntegrator`` (``fem/bilininteg.hpp:2177``); PA
setup ``PADiffusionSetup3D`` computes per-qpt
``D = (w/detJ) · adj(J) · C · adj(J)ᵀ``
(``fem/integ/bilininteg_diffusion_kernels.cpp:243-300``) and the apply is the
sum-factorized ``Gᵀ (D ∘ (G u))`` (``bilininteg_diffusion_kernels.hpp:796``).

Here qdata is the full symmetric (ne, nq, dim, dim) matrix (the reference
stores 6 packed entries; XLA fuses either way — packing is a later memory
optimization), and both scalar and matrix coefficients are supported.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fem.geom_factors import GeometricFactors, adjugate
from ..fem.quadinterp import (
    DeviceBasis,
    contract_q_to_e,
    eval_grad,
    eval_grad_t,
)


def setup(gf: GeometricFactors, coeff_q=None) -> jnp.ndarray:
    """qdata[e,q] = (w/detJ) adj(J) C adj(J)ᵀ → (ne, nq, dim, dim).

    ``coeff_q``: None (unit), (ne, nq) scalar, or (ne, nq, dim, dim) matrix
    conductivity.
    """
    A = adjugate(gf.jac)                               # (ne, nq, dim, dim)
    w_over_det = gf.w[None, :] / gf.det
    if coeff_q is None:
        D = jnp.einsum("eqab,eqcb->eqac", A, A)
    elif coeff_q.ndim == 2:
        D = jnp.einsum("eqab,eqcb->eqac", A, A) * coeff_q[..., None, None]
        return D * w_over_det[..., None, None]
    else:
        D = jnp.einsum("eqab,eqbc,eqdc->eqad", A, coeff_q, A)
    return D * w_over_det[..., None, None]


def apply(db: DeviceBasis, qdata: jnp.ndarray, u_e: jnp.ndarray) -> jnp.ndarray:
    """(ne, nd[, c]) → (ne, nd[, c]): Gᵀ (D · (G u))."""
    g = eval_grad(db, u_e)                             # (ne, nq, dim[, c])
    if u_e.ndim > 2:
        Dg = jnp.einsum("eqab,eqb...->eqa...", qdata, g)
    else:
        Dg = jnp.einsum("eqab,eqb->eqa", qdata, g)
    return eval_grad_t(db, Dg)


def diagonal(db: DeviceBasis, qdata: jnp.ndarray) -> jnp.ndarray:
    """diag(Gᵀ D G) per element → (ne, nd).

    Tensor path: the (a,b) qdata component contributes a contraction whose
    1D factor along axis d is (G∘G) if d==a==b, (B∘G)/(G∘B) for the cross
    terms, (B∘B) otherwise (reference: AssembleDiagonalPA kernels in
    fem/integ/bilininteg_diffusion_kernels.hpp).
    """
    if not db.tensor:
        return jnp.einsum("qna,eqab,qnb->en", db.G, qdata, db.G)
    B, G = db.B1, db.G1
    BB, BG, GG = B * B, B * G, G * G   # elementwise; B∘G == G∘B
    dim = db.dim
    out = None
    for a in range(dim):
        for b in range(dim):
            facs = []
            for d in range(dim):
                if d == a and d == b:
                    facs.append(GG)
                elif d == a or d == b:
                    facs.append(BG)
                else:
                    facs.append(BB)
            term = contract_q_to_e(tuple(facs), qdata[:, :, a, b])
            out = term if out is None else out + term
    return out
