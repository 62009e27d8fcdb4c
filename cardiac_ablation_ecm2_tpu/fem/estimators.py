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


def lszz_estimator(fes, u, nq1d=None, dtype=None) -> np.ndarray:
    """Least-squares ZZ estimator (LSZienkiewiczZhuEstimator,
    fem/estimators.hpp:241): per-vertex patch weighted least-squares fit of
    an affine gradient model, evaluated at the vertex — an osc-reducing
    variant of plain mass-lumped ZZ recovery.

    η_K = ‖∇u_h − G_ls(u_h)‖_L2(K), with G_ls the P1 interpolant of the
    patch-recovered vertex gradients.  Batched: patches are padded to the
    max patch size and all nv (dim+1)×(dim+1) normal systems are solved in
    one jnp.linalg.solve.
    """
    mesh = fes.mesh
    gf = geom_factors_for(fes, nq1d, dtype)
    g = phys_grad_at_quad(fes, u, nq1d, dtype)           # (ne, nq, dim)
    xq = gf.x                                            # (ne, nq, dim)
    wd = gf.wdet                                         # (ne, nq)
    ne, nq, dim = g.shape
    nv = mesh.nv

    # vertex → incident-element patch (padded; pad weight 0)
    nvpe = mesh.elements.shape[1]
    counts = np.zeros(nv, dtype=np.int64)
    for vs in mesh.elements:
        counts[vs] += 1
    pmax = int(counts.max())
    patch = np.zeros((nv, pmax), dtype=np.int64)
    pw = np.zeros((nv, pmax))
    fill = np.zeros(nv, dtype=np.int64)
    for e in range(ne):
        for v in mesh.elements[e]:
            patch[v, fill[v]] = e
            pw[v, fill[v]] = 1.0
            fill[v] += 1

    # samples per vertex: (nv, pmax*nq, ...)
    xs = jnp.asarray(xq)[patch].reshape(nv, pmax * nq, dim)
    gs = jnp.asarray(g)[patch].reshape(nv, pmax * nq, dim)
    ws = (jnp.asarray(wd)[patch] * pw[:, :, None]).reshape(nv, pmax * nq)
    xv = jnp.asarray(mesh.vertices[:, :dim])
    dx = xs - xv[:, None, :]
    # basis [1, dx_1..dx_dim]; weighted normal equations per vertex
    one = jnp.ones_like(ws)
    phi = jnp.concatenate([one[..., None], dx], axis=-1)  # (nv, S, dim+1)
    M = jnp.einsum("vs,vsi,vsj->vij", ws, phi, phi)
    rhs = jnp.einsum("vs,vsi,vsd->vid", ws, phi, gs)
    # regularize degenerate corners (few samples) — affine term dominates
    M = M + 1e-12 * jnp.eye(dim + 1)[None]
    sol = jnp.linalg.solve(M, rhs)                        # (nv, dim+1, dim)
    Gv = sol[:, 0, :]                                     # (nv, dim)

    # P1/Q1 interpolation of Gv at the fes quadrature points (element
    # vertex ordering — tensor product of (1−ξ, ξ) factors or barycentric)
    d2q = fes.d2q if nq1d is None else fes.dof_to_quad(nq1d)
    S = _vertex_basis_at(mesh.geom, np.asarray(d2q.points))   # (nq, nvpe)
    Gq = jnp.einsum("qn,end->eqd", jnp.asarray(S, Gv.dtype),
                    Gv[jnp.asarray(mesh.elements)])
    diff2 = jnp.sum((Gq - jnp.asarray(g)) ** 2, axis=-1)
    eta2 = jnp.sum(jnp.asarray(wd) * diff2, axis=1)
    return np.sqrt(np.maximum(np.asarray(eta2), 0.0))


def _vertex_basis_at(geom, pts: np.ndarray) -> np.ndarray:
    """Linear vertex shape functions (element vertex order) at ref points."""
    from .geometry import REF_VERTS, Geometry

    if geom in (Geometry.TRIANGLE, Geometry.TETRAHEDRON):
        lam0 = 1.0 - pts.sum(axis=1)
        return np.concatenate([lam0[:, None], pts], axis=1)
    rv = np.asarray(REF_VERTS[geom])                      # (nvpe, dim)
    S = np.ones((len(pts), len(rv)))
    for n, v in enumerate(rv):
        for d in range(rv.shape[1]):
            S[:, n] *= np.where(v[d] > 0.5, pts[:, d], 1.0 - pts[:, d])
    return S
