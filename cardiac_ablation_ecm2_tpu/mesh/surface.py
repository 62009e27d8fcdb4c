"""Embedded surface meshes (dim < sdim) — ex7/ex29 capability.

Reference analog: ``examples/ex7.cpp`` (Laplace on an embedded sphere) and
``ex29.cpp`` (surface PDE): a Mesh whose elements are 2D (quads/tris) with
3D vertex coordinates.  All mesh/space machinery here is already
shape-generic; the volume measure uses the metric √det(JᵀJ)
(``geom_factors.determinant``) and tangential diffusion uses the metric
inverse (``ops.surface``)."""

from __future__ import annotations

import numpy as np

from ..fem.geometry import Geometry
from .mesh import Mesh


def make_sphere_quad(n: int = 8, radius: float = 1.0,
                     curved_order: int = 0) -> Mesh:
    """Quadrilateral sphere surface: cube faces, each n×n, projected to
    the sphere (the classic cubed-sphere grid; ex7's mesh analog).

    ``curved_order`` > 0 attaches an order-q curved ``nodes`` field with
    every geometry node projected onto the sphere (ex7's SetCurvature) —
    drops the O(h²) faceting error in areas/eigenvalues."""
    verts = {}
    coords = []

    def vid(p):
        key = tuple(np.round(p, 12))
        if key not in verts:
            verts[key] = len(coords)
            coords.append(p)
        return verts[key]

    elems = []
    # 6 faces of [-1,1]^3; (u,v) grids; outward orientation
    axes = [(0, 1, 2, +1), (0, 1, 2, -1), (1, 2, 0, +1),
            (1, 2, 0, -1), (2, 0, 1, +1), (2, 0, 1, -1)]
    lin = np.linspace(-1.0, 1.0, n + 1)
    for (a, b, c, s) in axes:
        for i in range(n):
            for j in range(n):
                quad = []
                for (di, dj) in ((0, 0), (1, 0), (1, 1), (0, 1)):
                    p = np.zeros(3)
                    p[a] = lin[i + di]
                    p[b] = lin[j + dj]
                    p[c] = s
                    p = radius * p / np.linalg.norm(p)
                    quad.append(vid(p))
                if s < 0:
                    quad = [quad[0], quad[3], quad[2], quad[1]]
                elems.append(quad)

    mesh = Mesh(
        geom=Geometry.SQUARE,
        vertices=np.array(coords),
        elements=np.array(elems, dtype=np.int64),
        attributes=np.ones(len(elems), dtype=np.int64),
        boundary=np.zeros((0, 2), dtype=np.int64),
        bdr_attributes=np.zeros(0, dtype=np.int64),
    )
    if curved_order > 0:
        from ..fem.fespace import element_node_coords
        import dataclasses as _dc

        X = element_node_coords(mesh, curved_order)     # (ne, nd, 3)
        X = radius * X / np.linalg.norm(X, axis=-1, keepdims=True)
        mesh = _dc.replace(mesh, nodes=X, nodes_order=curved_order)
    return mesh
