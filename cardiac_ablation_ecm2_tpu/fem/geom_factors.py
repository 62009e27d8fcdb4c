"""Geometric factors: Jacobians, determinants, physical coordinates at
quadrature points.

Reference analog: ``Mesh::GetGeometricFactors`` (``mesh/mesh.hpp:3086``,
impl ``mesh/mesh.cpp:15195``), which runs the QuadratureInterpolator over the
mesh's nodal field.  Same here: the geometry E-vector (element node
coordinates) goes through ``quadinterp.eval_grad`` and small fixed-dim
closed-form adjugate/determinant formulas (no LAPACK, fully fused by XLA).

Jacobian convention: ``J[e, q, s, d] = ∂x_s/∂ξ_d`` (physical row, reference
column), so for square J, ``grad_x u = J^{-T} grad_ξ u``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..utils.config import real_t
from .basis import DofToQuad
from .quadinterp import device_basis, eval_grad, eval_values


@dataclasses.dataclass(frozen=True, eq=False)
class GeometricFactors:
    """Per-quadrature-point geometry data (device arrays)."""

    x: jnp.ndarray       # (ne, nq, sdim) physical coordinates
    jac: jnp.ndarray     # (ne, nq, sdim, dim)
    det: jnp.ndarray     # (ne, nq) |J| (volume factor)
    w: jnp.ndarray       # (nq,) reference quadrature weights

    @property
    def wdet(self) -> jnp.ndarray:
        """w_q · detJ — the volume measure at each quad point."""
        return self.det * self.w[None, :]


def det_2x2(J):
    return J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]


def det_3x3(J):
    return (
        J[..., 0, 0] * (J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1])
        - J[..., 0, 1] * (J[..., 1, 0] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 0])
        + J[..., 0, 2] * (J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0])
    )


def adjugate_2x2(J):
    """adj(J) with J @ adj(J) = det(J) I."""
    a, b = J[..., 0, 0], J[..., 0, 1]
    c, d = J[..., 1, 0], J[..., 1, 1]
    return jnp.stack(
        [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)], axis=-2
    )


def adjugate_3x3(J):
    cof = jnp.stack(
        [
            jnp.stack(
                [
                    J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1],
                    J[..., 0, 2] * J[..., 2, 1] - J[..., 0, 1] * J[..., 2, 2],
                    J[..., 0, 1] * J[..., 1, 2] - J[..., 0, 2] * J[..., 1, 1],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    J[..., 1, 2] * J[..., 2, 0] - J[..., 1, 0] * J[..., 2, 2],
                    J[..., 0, 0] * J[..., 2, 2] - J[..., 0, 2] * J[..., 2, 0],
                    J[..., 0, 2] * J[..., 1, 0] - J[..., 0, 0] * J[..., 1, 2],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0],
                    J[..., 0, 1] * J[..., 2, 0] - J[..., 0, 0] * J[..., 2, 1],
                    J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0],
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    return cof


def adjugate(J):
    d = J.shape[-1]
    if d == 1:
        return jnp.ones_like(J)
    if d == 2:
        return adjugate_2x2(J)
    return adjugate_3x3(J)


def determinant(J):
    """det for square J; for surface meshes (sdim > dim) use metric sqrt."""
    s, d = J.shape[-2], J.shape[-1]
    if s == d:
        if d == 1:
            return J[..., 0, 0]
        return det_2x2(J) if d == 2 else det_3x3(J)
    # embedded: sqrt(det(JᵀJ))
    JtJ = jnp.einsum("...sd,...se->...de", J, J)
    if d == 1:
        return jnp.sqrt(JtJ[..., 0, 0])
    return jnp.sqrt(det_2x2(JtJ) if d == 2 else det_3x3(JtJ))


def affine_element_jacobians(mesh) -> "Optional[np.ndarray]":
    """Constant per-element Jacobians (ne, dim, dim), f64 host numpy, for
    meshes whose geometry map is affine BY CONSTRUCTION: straight-sided
    simplices with no curved ``nodes`` field.  Returns None otherwise.

    Rationale: the affine fast path (ops/lanemajor.py) wants per-element
    factors d = adj(J)·adj(J)ᵀ/detJ.  Detecting separability from f32
    device qdata fails on low-quality elements (sliver tets condition the
    adjugate ~1e4× → ~1e-3 local roundoff, measured on the cardiac Delaunay
    mesh), so for known-affine geometry the factors are computed here in
    f64 directly from the vertices — exact, and MORE accurate than the f32
    per-qpt qdata they replace."""
    from .basis import simplex_basis_matrices
    from .geometry import Geometry

    if getattr(mesh, "nodes", None) is not None:
        return None
    if mesh.geom not in (Geometry.TRIANGLE, Geometry.TETRAHEDRON):
        return None
    dim = 2 if mesh.geom == Geometry.TRIANGLE else 3
    if mesh.vertices.shape[1] != dim:      # embedded/surface mesh
        return None
    # P1 geometry gradient at any single point (constant); same convention
    # as compute_geometric_factors: J[e, s, d] = Σ_n G[n, d] X[e, n, s]
    ref = np.full((1, dim), 1.0 / (dim + 1))
    _B, G = simplex_basis_matrices(mesh.geom, 1, ref)   # (1, nv[, dim])
    G = np.asarray(G, np.float64).reshape(-1, dim + 1, dim)[0]  # (nv, dim)
    X = np.asarray(mesh.vertices, np.float64)[mesh.elements]    # (ne, nv, s)
    return np.einsum("nd,ens->esd", G, X)


def _np_det_adj(J: np.ndarray):
    """f64 host det + adjugate for (ne, d, d), d in {2, 3}."""
    d = J.shape[-1]
    if d == 2:
        det = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
        adj = np.empty_like(J)
        adj[:, 0, 0], adj[:, 0, 1] = J[:, 1, 1], -J[:, 0, 1]
        adj[:, 1, 0], adj[:, 1, 1] = -J[:, 1, 0], J[:, 0, 0]
        return det, adj
    c = np.empty_like(J)
    for i in range(3):
        i1, i2 = (i + 1) % 3, (i + 2) % 3
        for j in range(3):
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            c[:, j, i] = (J[:, i1, j1] * J[:, i2, j2]
                          - J[:, i1, j2] * J[:, i2, j1])
    det = (J[:, 0, 0] * c[:, 0, 0] + J[:, 0, 1] * c[:, 1, 0]
           + J[:, 0, 2] * c[:, 2, 0])
    return det, c


def affine_packed_factors(J: np.ndarray):
    """Per-element affine qdata factors from constant Jacobians (f64 host):

    returns ``(det, dk)`` with ``det`` (ne,) = detJ (the mass factor — mass
    qdata is w_q·detJ·coeff) and ``dk`` (3|6, ne) the packed-symmetric
    diffusion factors adj(J)·adj(J)ᵀ/detJ (diffusion qdata is w_q·dk·coeff).
    Packing order matches ``ops.diffusion.pack_sym``."""
    det, A = _np_det_adj(J)
    # SIGNED det, exactly like the general square-Jacobian qdata path
    # (geom_factors.determinant): both paths assume positively-oriented
    # elements (the reference makes the same assumption and fixes
    # orientation at mesh load); keeping the sign preserves bit-parity
    # between the affine collapse and the full qdata path.
    d = J.shape[-1]
    pairs = ([(0, 0), (1, 1), (0, 1)] if d == 2 else
             [(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)])
    dk = np.stack(
        [np.einsum("eb,eb->e", A[:, a], A[:, c]) / det for a, c in pairs],
        axis=0,
    )
    return det, dk


def compute_geometric_factors(
    node_coords: np.ndarray, d2q: DofToQuad, dtype=None
) -> GeometricFactors:
    """Build GeometricFactors from element node coordinates (ne, nd, sdim)."""
    db = device_basis(d2q, dtype)
    X = jnp.asarray(node_coords, dtype=real_t(dtype))
    xq = eval_values(db, X)                      # (ne, nq, sdim)
    g = eval_grad(db, X)                         # (ne, nq, dim, sdim)
    J = jnp.swapaxes(g, 2, 3)                    # (ne, nq, sdim, dim)
    det = determinant(J)
    return GeometricFactors(x=xq, jac=J, det=det, w=db.W)
