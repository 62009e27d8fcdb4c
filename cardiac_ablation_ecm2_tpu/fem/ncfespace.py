"""Conforming FE space on a nonconforming (hanging-node) mesh.

Reference analog: the conforming prolongation/restriction ``cP/cR`` that
``FiniteElementSpace`` builds on NC meshes (``fem/fespace.hpp:299-301``) and
applies in ``FormLinearSystem`` as PᵀAP (``fem/bilinearform.cpp:760``).

TPU-native: the broken space is the ordinary key-based FESpace on the refined
mesh (continuous everywhere except across NC interfaces).  Each slave dof
(hanging vertex + slave-edge interior nodes) is an interpolation of the p+1
master-edge dofs; the prolongation is stored as three arrays

    slave_idx (ns,), slave_masters (ns, p+1), slave_w (ns, p+1)

so P and Pᵀ are one gather/segment-scatter each — no sparse matrices.
Transitive (chained) constraints are resolved at build time.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..mesh.ncmesh import NCQuadMesh
from ..utils.config import index_t, real_t
from ..utils.native import encode_rows
from .basis import h1_nodes_1d, lagrange_matrices
from .fespace import (
    FESpace,
    _EDGE,
    _KEYLEN,
    _VERT,
    _elem_node_keys,
    _meta,
)


def _vert_key(v):
    return [int(v), -1, -1, -1, _meta(_VERT)]


def _edge_key(a, b, t):
    lo, hi = (a, b) if a < b else (b, a)
    return [int(lo), int(hi), -1, -1, _meta(_EDGE, t)]


def _sigma_on_master(mesh, v, lo, hi):
    return _sigma_pos(mesh, mesh.vertices[v], lo, hi)


def _sigma_pos(mesh, pos, lo, hi):
    plo, phi = mesh.vertices[lo], mesh.vertices[hi]
    return float(np.linalg.norm(pos - plo) / np.linalg.norm(phi - plo))


@dataclasses.dataclass(eq=False)
class NCFESpace:
    nc: NCQuadMesh
    order: int

    def __post_init__(self):
        p = self.order
        self.fes = FESpace(self.nc.mesh, p)
        fes = self.fes
        mesh = self.nc.mesh
        nL = fes.ndof_scalar
        nodes1d = h1_nodes_1d(p)

        # exact entity-key dof lookup: coincident-but-distinct dofs at NC
        # interfaces (hanging vertex vs master-edge node share a position for
        # even p) are disambiguated by entity identity, not coordinates
        main_keys = _elem_node_keys(
            mesh.geom, p, mesh.elements, np.arange(mesh.ne, dtype=np.int64)
        ).reshape(-1, _KEYLEN)

        queries = []
        per_con = []   # (master_slots, [(slave_slot, sigma), …]) per constraint
        for (v, a, b) in self.nc.constraints:
            lo, hi = (a, b) if a < b else (b, a)
            m_slots = [len(queries)]
            queries.append(_vert_key(lo))
            for t in range(1, p):
                m_slots.append(len(queries))
                queries.append(_edge_key(lo, hi, t))
            m_slots.append(len(queries))
            queries.append(_vert_key(hi))

            s_list = [(len(queries), _sigma_on_master(mesh, v, lo, hi))]
            queries.append(_vert_key(v))
            for (c0, c1) in ((a, v), (v, b)):
                clo, chi = (c0, c1) if c0 < c1 else (c1, c0)
                for t in range(1, p):
                    pos = mesh.vertices[clo] + nodes1d[t] * (
                        mesh.vertices[chi] - mesh.vertices[clo]
                    )
                    s_list.append(
                        (len(queries), _sigma_pos(mesh, pos, lo, hi))
                    )
                    queries.append(_edge_key(clo, chi, t))
            per_con.append((m_slots, s_list))

        if queries:
            _, _, qids = encode_rows(
                main_keys, np.asarray(queries, dtype=np.int64)
            )
            assert (qids >= 0).all(), "NC constraint dof lookup failed"
        rows = {}                     # slave L-dof -> [(master L-dof, w)]
        for (m_slots, s_list) in per_con:
            masters = [int(qids[i]) for i in m_slots]
            for (slot, sigma) in s_list:
                s = int(qids[slot])
                W, _ = lagrange_matrices(nodes1d, np.array([sigma]))
                rows[s] = list(zip(masters, W[0]))

        # resolve chained constraints (slave's master itself slave)
        for _ in range(32):
            changed = False
            for s, terms in list(rows.items()):
                if any(m in rows for m, _ in terms):
                    out = {}
                    for m, w in terms:
                        if m in rows:
                            for m2, w2 in rows[m]:
                                out[m2] = out.get(m2, 0.0) + w * w2
                        else:
                            out[m] = out.get(m, 0.0) + w
                    rows[s] = list(out.items())
                    changed = True
            if not changed:
                break

        ns = len(rows)
        slave_ids = np.array(sorted(rows), dtype=np.int64)
        width = max((len(rows[s]) for s in slave_ids), default=1)
        sm = np.zeros((ns, width), dtype=np.int64)
        sw = np.zeros((ns, width))
        for i, s in enumerate(slave_ids):
            for j, (m, w) in enumerate(rows[s]):
                sm[i, j] = m
                sw[i, j] = w

        is_slave = np.zeros(nL, dtype=bool)
        is_slave[slave_ids] = True
        conf_of_L = np.full(nL, -1, dtype=np.int64)
        conf_of_L[~is_slave] = np.arange((~is_slave).sum())
        self.ndof_conf = int((~is_slave).sum())
        self.L_of_conf = np.nonzero(~is_slave)[0]

        self._slave_idx = jnp.asarray(slave_ids, index_t())
        self._slave_masters = jnp.asarray(conf_of_L[sm], index_t())
        self._slave_w = jnp.asarray(sw, real_t())
        self._L_of_conf = jnp.asarray(self.L_of_conf, index_t())
        self._conf_of_L = conf_of_L
        self.n_slaves = ns

    # ------------------------------------------------------------------
    def prolongate(self, uc: jnp.ndarray) -> jnp.ndarray:
        """Conforming → broken L-vector (cP analog)."""
        uL = jnp.zeros(self.fes.ndof_scalar, dtype=uc.dtype)
        uL = uL.at[self._L_of_conf].set(uc)
        sv = jnp.sum(uc[self._slave_masters] * self._slave_w, axis=1)
        return uL.at[self._slave_idx].set(sv)

    def restrict_t(self, vL: jnp.ndarray) -> jnp.ndarray:
        """Pᵀ: broken L-residual → conforming (exact adjoint)."""
        vc = vL[self._L_of_conf]
        contrib = vL[self._slave_idx][:, None] * self._slave_w
        return vc.at[self._slave_masters.reshape(-1)].add(contrib.reshape(-1))

    def constrained_operator(self, A_L):
        """A_C(x) = Pᵀ A_L(P x) — the PᵀAP conforming assembly."""

        def mult(x):
            return self.restrict_t(A_L(self.prolongate(x)))

        return mult

    def essential_dofs(self, bdr_marker=None) -> np.ndarray:
        essL = self.fes.essential_dofs(bdr_marker)
        conf = self._conf_of_L[essL]
        return np.unique(conf[conf >= 0]).astype(np.int32)

    @property
    def dof_coords(self) -> np.ndarray:
        return self.fes.dof_coords[self.L_of_conf]
