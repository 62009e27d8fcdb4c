"""Linear elasticity integrator, partial assembly.

Reference analog: ``ElasticityIntegrator`` (``fem/bilininteg.hpp``) with PA/EA
kernels in ``fem/integ/bilininteg_elasticity_*.cpp``:

    a(u,v) = ∫ λ (div u)(div v) + 2μ ε(u):ε(v)

qdata = (adj(J), w·λ/det, w·μ/det).  The apply pulls reference gradients to
physical space through adj(J), forms the stress, and pulls back:

    H = adjᵀ g            (scaled physical gradient, per component)
    S = λ* tr(H) I + μ* (H + Hᵀ)
    W = adj · S           → y = Gᵀ W

E-vectors carry vdim == dim components: (ne, nd, dim).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..fem.geom_factors import GeometricFactors, adjugate
from ..fem.quadinterp import DeviceBasis, contract_q_to_e, eval_grad, eval_grad_t


def setup(gf: GeometricFactors, lam_q=None, mu_q=None) -> Tuple:
    """qdata tuple (adj, w·λ/det, w·μ/det); λ, μ scalars or (ne, nq)."""
    A = adjugate(gf.jac)
    w_over_det = gf.w[None, :] / gf.det
    lam = 1.0 if lam_q is None else lam_q
    mu = 1.0 if mu_q is None else mu_q
    return (A, lam * w_over_det, mu * w_over_det)


def apply(db: DeviceBasis, qdata: Tuple, u_e: jnp.ndarray) -> jnp.ndarray:
    A, lam, mu = qdata
    g = eval_grad(db, u_e)                           # (ne, nq, dim, vdim)
    # H[a,c] = Σ_s adj[s,a] g[s,c]  (det-scaled physical gradient)
    H = jnp.einsum("eqsa,eqsc->eqac", A, g)
    trH = jnp.trace(H, axis1=2, axis2=3)
    dim = H.shape[-1]
    eye = jnp.eye(dim, dtype=H.dtype)
    S = (
        lam[..., None, None] * trH[..., None, None] * eye
        + mu[..., None, None] * (H + jnp.swapaxes(H, 2, 3))
    )
    W = jnp.einsum("eqra,eqac->eqrc", A, S)
    return eval_grad_t(db, W)


def diagonal(db: DeviceBasis, qdata: Tuple) -> jnp.ndarray:
    """(ne, nd, vdim): for φ_n e_c the energy density is
    (λ*+2μ*) h_c² + μ* Σ_{a≠c} h_a², h = adjᵀ g_n — per-component quadratic
    forms K_c[r,s] contracted like the diffusion diagonal."""
    A, lam, mu = qdata
    dim = A.shape[-1]
    # C_a[r,s] = adj[r,a] adj[s,a]
    C = jnp.einsum("eqra,eqsa->eqars", A, A)         # (ne, nq, a, r, s)
    diags = []
    for c in range(dim):
        K = (lam + 2.0 * mu)[..., None, None] * C[:, :, c]
        for a in range(dim):
            if a != c:
                K = K + mu[..., None, None] * C[:, :, a]
        diags.append(_diag_quadform(db, K))
    return jnp.stack(diags, axis=-1)


def _diag_quadform(db: DeviceBasis, K: jnp.ndarray) -> jnp.ndarray:
    """diag_n = Σ_q Σ_rs K[r,s] (g_n)_r (g_n)_s  (cf. diffusion.diagonal)."""
    if not db.tensor:
        return jnp.einsum("qnr,eqrs,qns->en", db.G, K, db.G)
    B, G = db.B1, db.G1
    BB, BG, GG = B * B, B * G, G * G
    dim = db.dim
    out = None
    for r in range(dim):
        for s in range(dim):
            facs = []
            for d in range(dim):
                if d == r and d == s:
                    facs.append(GG)
                elif d == r or d == s:
                    facs.append(BG)
                else:
                    facs.append(BB)
            term = contract_q_to_e(tuple(facs), K[:, :, r, s])
            out = term if out is None else out + term
    return out
