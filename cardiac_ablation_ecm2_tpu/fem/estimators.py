"""Error estimators for AMR.

Reference analog: ``ZienkiewiczZhuEstimator`` (``fem/estimators.hpp:88``) and
``KellyErrorEstimator`` (``:555``) feeding ``ThresholdRefiner``.

ZZ here: recover a nodal gradient field G(u_h) by mass-lumped L2 projection
of the elementwise gradients, then
``eta_K = ‖∇u_h − G(u_h)‖_L2(K)`` — all einsum/quadrature machinery already
in place, fully device-executable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .build import basis_for, geom_factors_for, restriction_for
from .gridfunction import phys_grad_at_quad
from .quadinterp import eval_values, eval_values_t


def zz_estimator(fes, u, nq1d=None, dtype=None) -> np.ndarray:
    """Zienkiewicz-Zhu recovery estimate per element → (ne,) numpy."""
    db = basis_for(fes, nq1d, dtype)
    gf = geom_factors_for(fes, nq1d, dtype)
    restr = restriction_for(fes)
    g = phys_grad_at_quad(fes, u, nq1d, dtype)           # (ne, nq, dim)
    dim = g.shape[-1]

    # mass-lumped nodal recovery: G_i = Σ_q w detJ B g / Σ_q w detJ B
    wd = gf.wdet
    num_e = eval_values_t(db, wd[..., None] * g)         # (ne, nd, dim)
    den_e = eval_values_t(db, wd)                        # (ne, nd)
    num = restr.mult_transpose(num_e)                    # (ndof, dim)
    den = restr.mult_transpose(den_e)                    # (ndof,)
    G = num / den[:, None]

    Gq = eval_values(db, restr.mult(G))                  # (ne, nq, dim)
    diff2 = jnp.sum((Gq - g) ** 2, axis=-1)
    eta2 = jnp.sum(wd * diff2, axis=1)
    return np.sqrt(np.maximum(np.asarray(eta2), 0.0))


def kelly_estimator(fes, u, nq1d=None, dtype=None) -> np.ndarray:
    """Kelly flux-jump estimator (KellyErrorEstimator, fem/estimators.hpp:555):
    η_K² = Σ_{F⊂∂K} h_F ∮_F [∇u·n]² /2, computed with the face machinery."""
    from .faces import build_face_data

    mesh = fes.mesh
    fd = build_face_data(mesh, fes.order, nq1d, with_gradients=True)
    restr = restriction_for(fes)
    e = np.asarray(restr.mult(jnp.asarray(u)))            # (ne, nd)
    # normal flux from each side at face qpts
    g0 = np.einsum("fqnd,fqd,fn->fq", fd.G0, fd.normal, e[fd.elem0])
    g1 = np.einsum("fqnd,fqd,fn->fq", fd.G1, fd.normal, e[fd.elem1])
    jump2 = (g0 - g1) ** 2
    h_f = 0.5 * (fd.h0 + fd.h1)
    face_eta = h_f * np.sum(fd.wdet * jump2, axis=1)      # (nfi,)
    eta2 = np.zeros(mesh.ne)
    np.add.at(eta2, fd.elem0, 0.5 * face_eta)
    np.add.at(eta2, fd.elem1, 0.5 * face_eta)
    return np.sqrt(eta2)
