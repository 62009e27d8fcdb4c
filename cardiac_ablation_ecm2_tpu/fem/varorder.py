"""Variable-order (p-adaptive) H1 spaces on quad meshes.

Reference analog: variable-order ``FiniteElementSpace`` + ``pRefinement``
(``fem/fespace.hpp:63``; edge dofs take the MINIMUM order of the adjacent
elements, and higher-order element traces are constrained to interpolate
the lower-order edge polynomial — the conforming p-adaptive rule).

TPU-native design: elements are grouped by order; each group applies its
own sum-factorized PA kernel on (ne_g, nd_g) E-vectors.  Conformity is a
per-element linear map ``u_E = T_e · u_slots`` where slots gather the
element's global entity dofs: T is identity on own-order entities and a 1D
GLL interpolation block on demoted edges.  T is batched per group (dense
(nd, nslot) matmuls — MXU-friendly), and the transpose scatter reuses the
deterministic segment-sum restriction.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np

from ..mesh.mesh import Mesh, unique_edges
from ..utils.config import index_t
from .basis import h1_nodes_1d, lagrange_matrices, lattice_multi_index
from .geometry import EDGES, Geometry


@dataclasses.dataclass(eq=False)
class VarOrderFESpace:
    """p-adaptive H1 space on a quad mesh with per-element orders."""

    mesh: Mesh
    orders: np.ndarray                  # (ne,) int

    def __post_init__(self):
        mesh = self.mesh
        assert mesh.geom == Geometry.SQUARE, "varorder: quad meshes (round 2)"
        orders = np.asarray(self.orders, dtype=np.int64)
        assert len(orders) == mesh.ne
        self.orders = orders

        edges, elem_edge = unique_edges(mesh)
        nedge = len(edges)
        # edge order = min of adjacent element orders
        edge_order = np.full(nedge, 10 ** 9, dtype=np.int64)
        loc_edges = np.array(EDGES[mesh.geom])
        for e in range(mesh.ne):
            for le in range(4):
                eid = elem_edge[e, le]
                edge_order[eid] = min(edge_order[eid], orders[e])

        # global dof numbering: vertices, edge interiors, cell interiors
        nv = mesh.nv
        edge_base = np.zeros(nedge + 1, dtype=np.int64)
        np.cumsum(np.maximum(edge_order - 1, 0), out=edge_base[1:])
        edge_base = nv + edge_base
        cell_base = np.zeros(mesh.ne + 1, dtype=np.int64)
        np.cumsum((orders - 1) ** 2, out=cell_base[1:])
        cell_base = edge_base[-1] + cell_base
        self.ndof = int(cell_base[-1])
        self.edge_order = edge_order

        # per element: slot list (global dofs feeding its T map) and T
        groups: Dict[int, List[int]] = {}
        for e in range(mesh.ne):
            groups.setdefault(int(orders[e]), []).append(e)
        self.groups = {}
        V = mesh.vertices

        for p, els in groups.items():
            mi = lattice_multi_index(Geometry.SQUARE, p)
            nd = len(mi)
            latt_index = {tuple(q): i for i, q in enumerate(mi)}
            # max slots: 4 vertices + 4 edges (own order) + interior
            slot_rows, T_rows = [], []
            max_ns = 4 + sum(1 for _ in range(4)) * (p - 1) + (p - 1) ** 2
            for e in els:
                conn = [int(v) for v in mesh.elements[e]]
                slots: List[int] = []
                T = np.zeros((nd, max_ns))

                def add_slot(g):
                    slots.append(g)
                    return len(slots) - 1

                # vertices: lattice corners
                corner_latt = [(0, 0), (p, 0), (p, p), (0, p)]
                for lv, latt in enumerate(corner_latt):
                    s = add_slot(conn[lv])
                    T[latt_index[latt], s] = 1.0
                # edges
                gll_p = h1_nodes_1d(p)
                for le, (a, b) in enumerate(EDGES[Geometry.SQUARE]):
                    eid = elem_edge[e, le]
                    q = int(edge_order[eid])
                    ga, gb = conn[a], conn[b]
                    fwd = ga < gb          # global edge dir: min→max id
                    # lattice points of this local edge, in local a→b order
                    la = np.array(corner_latt[a])
                    lb = np.array(corner_latt[b])
                    pts = [tuple(la + (lb - la) * t // p)
                           for t in range(1, p)]
                    # local parameters along global direction
                    tloc = gll_p[1:p]
                    tglob = tloc if fwd else 1.0 - tloc
                    if q == p:
                        # own order: direct edge dofs (stored min→max)
                        for k in range(p - 1):
                            g = int(edge_base[eid] + k)
                            s = add_slot(g)
                            # dof k sits at global param gll_p[k+1]
                            # local lattice point with tglob == gll_p[k+1]
                            idx = k if fwd else (p - 2 - k)
                            T[latt_index[pts[idx]], s] = 1.0
                    else:
                        # demoted edge: interpolate the order-q edge
                        # polynomial (vertex + edge dofs) at our points
                        gll_q = h1_nodes_1d(q)
                        B, _ = lagrange_matrices(gll_q, np.asarray(tglob))
                        # B: (p-1, q+1) — columns: q-order nodes in global
                        # direction: [0, 1, interior(1..q-1)] ordering is
                        # positional: gll_q sorted ascending: node 0 = min
                        # endpoint, node q = max endpoint, k interior
                        for j, latt in enumerate(pts):
                            r = latt_index[latt]
                            # endpoint contributions
                            vmin, vmax = (ga, gb) if fwd else (gb, ga)
                            # find slot of each vertex (already added)
                            smin = slots.index(min(ga, gb))
                            smax = slots.index(max(ga, gb))
                            T[r, smin] += B[j, 0]
                            T[r, smax] += B[j, q]
                            for k in range(q - 1):
                                g = int(edge_base[eid] + k)
                                try:
                                    s = slots.index(g)
                                except ValueError:
                                    s = add_slot(g)
                                T[r, s] += B[j, k + 1]
                # interior
                for jj in range(1, p):
                    for ii in range(1, p):
                        g = int(cell_base[e] + (jj - 1) * (p - 1) + (ii - 1))
                        s = add_slot(g)
                        T[latt_index[(ii, jj)], s] = 1.0
                slot_rows.append(slots)
                T_rows.append(T[:, : len(slots)])
            ns = max(len(s) for s in slot_rows)
            S = np.full((len(els), ns), self.ndof, dtype=np.int64)  # pad
            Tb = np.zeros((len(els), nd, ns))
            for i, (sl, Tm) in enumerate(zip(slot_rows, T_rows)):
                S[i, : len(sl)] = sl
                Tb[i, :, : Tm.shape[1]] = Tm
            self.groups[p] = {
                "elems": np.array(els, dtype=np.int64),
                "slots": S, "T": Tb,
            }

    # ------------------------------------------------------------------
    def dof_coords(self) -> np.ndarray:
        """Physical coordinates of every global dof (for BCs/projection)."""
        import numpy as np

        X = np.zeros((self.ndof, self.mesh.sdim))
        X[: self.mesh.nv] = self.mesh.vertices
        got = np.zeros(self.ndof, dtype=bool)
        got[: self.mesh.nv] = True
        for p, g in self.groups.items():
            mi = lattice_multi_index(Geometry.SQUARE, p)
            gll = h1_nodes_1d(p)
            ref = gll[mi]                                # (nd, 2)
            for i, e in enumerate(g["elems"]):
                quad = self.mesh.vertices[self.mesh.elements[e]]
                # bilinear map
                u, v = ref[:, 0], ref[:, 1]
                phys = ((1 - u)[:, None] * (1 - v)[:, None] * quad[0]
                        + u[:, None] * (1 - v)[:, None] * quad[1]
                        + u[:, None] * v[:, None] * quad[2]
                        + (1 - u)[:, None] * v[:, None] * quad[3])
                T = g["T"][i]
                slots = g["slots"][i]
                # a dof owned at its own interpolation point: T column has
                # a single 1 in an identity row
                for s, gdof in enumerate(slots):
                    if gdof >= self.ndof or got[gdof]:
                        continue
                    col = T[:, s]
                    ones = np.nonzero(col == 1.0)[0]
                    if len(ones) == 1 and np.count_nonzero(col) == 1:
                        X[gdof] = phys[ones[0]]
                        got[gdof] = True
        return X

    def essential_dofs(self, bdr_marker=None) -> np.ndarray:
        """Global dofs on marked boundary attributes (vertices + edges)."""
        mesh = self.mesh
        edges, elem_edge = unique_edges(mesh)
        ekey = {tuple(sorted(map(int, r))): i for i, r in enumerate(edges)}
        nv = mesh.nv
        edge_base = np.zeros(len(edges) + 1, dtype=np.int64)
        np.cumsum(np.maximum(self.edge_order - 1, 0), out=edge_base[1:])
        edge_base = nv + edge_base
        out = set()
        for row, a in zip(mesh.boundary, mesh.bdr_attributes):
            if bdr_marker is not None and int(a) not in set(bdr_marker):
                continue
            va, vb = int(row[0]), int(row[1])
            out.add(va)
            out.add(vb)
            eid = ekey[tuple(sorted((va, vb)))]
            q = int(self.edge_order[eid])
            for k in range(q - 1):
                out.add(int(edge_base[eid] + k))
        return np.array(sorted(out), dtype=np.int64)


def diffusion_operator(sp: VarOrderFESpace, dtype=None):
    """Matrix-free (∇u, ∇v) on the variable-order space.

    Returns (mult, diagonal) closures over per-group batched tensors.
    """
    import jax
    import jax.numpy as jnp

    from ..utils.config import real_t
    from .basis import make_dof_to_quad
    from .geom_factors import compute_geometric_factors
    from .quadinterp import device_basis
    from ..ops import diffusion as dmod

    rt = real_t(dtype)
    mesh = sp.mesh
    gops = []
    for p, g in sp.groups.items():
        d2q = make_dof_to_quad(Geometry.SQUARE, p)
        db = device_basis(d2q, dtype)
        X = mesh.vertices[mesh.elements[g["elems"]]]     # (neg, 4, 2)
        # order-p nodes of each element via bilinear map
        mi = lattice_multi_index(Geometry.SQUARE, p)
        gll = h1_nodes_1d(p)
        u, v = gll[mi[:, 0]], gll[mi[:, 1]]
        Xe = ((1 - u)[None, :, None] * (1 - v)[None, :, None] * X[:, 0:1]
              + u[None, :, None] * (1 - v)[None, :, None] * X[:, 1:2]
              + u[None, :, None] * v[None, :, None] * X[:, 2:3]
              + (1 - u)[None, :, None] * v[None, :, None] * X[:, 3:4])
        gf = compute_geometric_factors(jnp.asarray(Xe, rt), d2q, dtype)
        qd = dmod.setup_packed(gf, 1.0)
        gops.append({
            "db": db, "qd": qd,
            "slots": jnp.asarray(g["slots"], index_t()),
            "T": jnp.asarray(g["T"], rt),
        })
    ndof = sp.ndof

    def mult(x):
        xp = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
        y = jnp.zeros(ndof + 1, x.dtype)
        for go in gops:
            us = xp[go["slots"]]                          # (neg, ns)
            ue = jnp.einsum("ens,es->en", go["T"], us)
            ye = dmod.apply(go["db"], go["qd"], ue)
            ys = jnp.einsum("ens,en->es", go["T"], ye)
            y = y.at[go["slots"].reshape(-1)].add(ys.reshape(-1))
        return y[:ndof]

    def diagonal():
        y = jnp.zeros(ndof + 1)
        for go in gops:
            de = dmod.diagonal(go["db"], go["qd"])        # (neg, nd)
            # diag of Tᵀ D T ≈ Σ_n T[n,s]² d[n] (exact for diagonal D_e)
            ds = jnp.einsum("ens,en->es", go["T"] ** 2, de)
            y = y.at[go["slots"].reshape(-1)].add(ds.reshape(-1))
        return y[:ndof]

    return mult, diagonal
