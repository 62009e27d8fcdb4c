"""LinearForm: RHS vector assembly.

Reference analog: ``LinearForm`` (``fem/linearform.hpp:24``) with
``DomainLFIntegrator`` / ``BoundaryLFIntegrator`` (``fem/lininteg.hpp:107,192``)
and the device fast path ``fem/integ/lininteg_domain*.cpp``.

TPU-native: (f, v) = Rᵀ Bᵀ (w·detJ·f(x_q)) in two einsum contractions;
boundary terms run the same pipeline on the boundary-face "mesh" (the
boundary elements with their own lower-dimensional geometry and the
``bdr_gather_map`` restriction into volume L-dofs).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..fem.build import bdr_restriction_for, restriction_for
from ..fem.basis import make_dof_to_quad
from ..fem.coefficient import eval_coeff
from ..fem.fespace import element_node_coords
from ..fem.geom_factors import compute_geometric_factors
from ..fem.quadinterp import device_basis, eval_values_t, eval_grad_t
from ..fem.build import basis_for, geom_factors_for
from ..mesh.mesh import Mesh
from ..fem.geometry import FACE_GEOM
from ..utils.config import real_t
import functools


def domain_lf(fes, coeff, nq1d: Optional[int] = None, dtype=None) -> jnp.ndarray:
    """(f, v) over the domain → L-vector (DomainLFIntegrator, lininteg.hpp:107)."""
    gf = geom_factors_for(fes, nq1d, dtype)
    db = basis_for(fes, nq1d, dtype)
    fq = eval_coeff(coeff, gf, dtype)
    q = gf.wdet if fq is None else gf.wdet * fq
    b_e = eval_values_t(db, q)
    return restriction_for(fes).mult_transpose(b_e)


def domain_lf_from_qvec(fes, fq: jnp.ndarray, nq1d=None, dtype=None) -> jnp.ndarray:
    """(f, v) with f given as an (ne, nq) Q-vector (QuadratureLFIntegrator)."""
    gf = geom_factors_for(fes, nq1d, dtype)
    db = basis_for(fes, nq1d, dtype)
    b_e = eval_values_t(db, gf.wdet * fq)
    return restriction_for(fes).mult_transpose(b_e)


@functools.lru_cache(maxsize=None)
def _bdr_geom(fes, nq1d, dtype_str):
    """Geometric factors + device basis of the boundary-face mesh."""
    mesh = fes.mesh
    bgeom = mesh.bdr_geom
    p = fes.order
    d2q = make_dof_to_quad(bgeom, p, nq1d or (p + 2))
    # boundary element node coords via Q1/P1 map of face vertices
    bmesh = Mesh(
        geom=bgeom,
        vertices=mesh.vertices,
        elements=mesh.boundary,
        attributes=mesh.bdr_attributes,
        boundary=np.zeros((0, 1), dtype=np.int64),
        bdr_attributes=np.zeros(0, dtype=np.int64),
    )
    X = element_node_coords(bmesh, p)
    gf = compute_geometric_factors(X, d2q, dtype=dtype_str)
    db = device_basis(d2q, dtype_str)
    return gf, db


def domain_lf_vector(fes, vec, nq1d: Optional[int] = None,
                     dtype=None) -> jnp.ndarray:
    """(f, v) for vector f on a vdim space → byNODES flat vector
    (VectorDomainLFIntegrator, lininteg.hpp:267) — body forces etc."""
    gf = geom_factors_for(fes, nq1d, dtype)
    db = basis_for(fes, nq1d, dtype)
    rt = real_t(dtype)
    if callable(vec):
        fq = jnp.asarray(vec(gf.x), rt)
    else:
        arr = jnp.asarray(vec, rt)
        ne, nq = gf.det.shape
        fq = jnp.broadcast_to(arr[None, None, :], (ne, nq, arr.shape[0]))
    b_e = eval_values_t(db, gf.wdet[..., None] * fq)      # (ne, nd, vdim)
    b = restriction_for(fes).mult_transpose(b_e)          # (ndof, vdim)
    return b.T.reshape(-1)


def boundary_lf_vector(
    fes, vec, bdr_marker=None, nq1d: Optional[int] = None, dtype=None
) -> jnp.ndarray:
    """(f, v)_∂Ω for vector f on a vdim space → (ndof_scalar·vdim,) byNODES
    (VectorBoundaryLFIntegrator, lininteg.hpp:339)."""
    mesh = fes.mesh
    rt = real_t(dtype)
    if mesh.nbe == 0:
        return jnp.zeros(fes.ndof, dtype=rt)
    gf, db = _bdr_geom(fes, nq1d, str(rt))
    if callable(vec):
        fq = jnp.asarray(vec(gf.x), dtype=rt)           # (nbe, nq, vdim)
    else:
        arr = jnp.asarray(vec, dtype=rt)
        nbe, nq = gf.det.shape
        fq = jnp.broadcast_to(arr[None, None, :], (nbe, nq, arr.shape[0]))
    q = gf.wdet[..., None] * fq
    if bdr_marker is not None:
        sel = np.isin(mesh.bdr_attributes, np.asarray(list(bdr_marker)))
        q = q * jnp.asarray(sel.astype(float), dtype=rt)[:, None, None]
    b_e = eval_values_t(db, q)                           # (nbe, ndf, vdim)
    b = bdr_restriction_for(fes).mult_transpose(b_e)     # (ndof_scalar, vdim)
    return b.T.reshape(-1)


def boundary_lf(
    fes, coeff, bdr_marker=None, nq1d: Optional[int] = None, dtype=None
) -> jnp.ndarray:
    """(g, v) over marked boundary faces (BoundaryLFIntegrator, lininteg.hpp:192).

    The face Jacobian is rectangular (sdim × dim-1); ``detJ`` is the surface
    measure sqrt(det(JᵀJ)) — see geom_factors.determinant.
    """
    mesh = fes.mesh
    if mesh.nbe == 0:
        return jnp.zeros(fes.ndof, dtype=real_t(dtype))
    gf, db = _bdr_geom(fes, nq1d, str(real_t(dtype)))
    fq = eval_coeff(coeff, gf, dtype)
    q = gf.wdet if fq is None else gf.wdet * fq
    if bdr_marker is not None:
        sel = np.isin(mesh.bdr_attributes, np.asarray(list(bdr_marker)))
        mask = jnp.asarray(sel.astype(np.float64), dtype=real_t(dtype))
        q = q * mask[:, None]
    b_e = eval_values_t(db, q)
    return bdr_restriction_for(fes).mult_transpose(b_e)
