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
